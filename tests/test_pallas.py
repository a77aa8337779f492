"""Pallas megakernel vs the jnp integrator (interpret mode on CPU).

The megakernel must reproduce the jnp wavefront integrator's output at
fixed RNG — same streams, same math — up to rare discrete tie flips at
geometry edges (f32 op-ordering).  On real TPU the same comparison runs
in the driver bench; here interpret mode keeps it hermetic.
"""

import dataclasses

import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.ops.pallas.megakernel import pathtrace_iteration_pallas


@pytest.fixture(scope="module")
def small(cornell_scene):
    return dataclasses.replace(
        cornell_scene, resolution=(32, 32), trace_depth=4
    )


def test_matches_jnp_integrator(small):
    rad_p, counts_p = pathtrace_iteration_pallas(small, 1, interpret=True)
    rad_j, counts_j = pt.pathtrace_iteration(small, 1)
    d = np.abs(np.asarray(rad_p) - np.asarray(rad_j)).max(axis=-1)
    assert (d > 1e-3).mean() < 0.005
    np.testing.assert_allclose(
        np.asarray(counts_p), np.asarray(counts_j), rtol=0.02
    )


def test_deterministic(small):
    a, _ = pathtrace_iteration_pallas(small, 5, interpret=True)
    b, _ = pathtrace_iteration_pallas(small, 5, interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_nonsquare_and_padding(cornell_scene):
    # 40*24=960 pixels: not a multiple of the 4096-ray tile -> exercises
    # the valid-lane mask and output crop
    odd = dataclasses.replace(
        cornell_scene, resolution=(40, 24), trace_depth=3
    )
    rad_p, _ = pathtrace_iteration_pallas(odd, 1, interpret=True)
    rad_j, _ = pt.pathtrace_iteration(odd, 1)
    assert np.asarray(rad_p).shape == (960, 3)
    d = np.abs(np.asarray(rad_p) - np.asarray(rad_j)).max(axis=-1)
    assert (d > 1e-3).mean() < 0.01


def test_mesh_scene_matches_jnp(tmp_path, cornell_scene):
    import textwrap

    obj = tmp_path / "t.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    txt = (
        open("scenes/cornell.txt").read()
        + textwrap.dedent(
            f"""
            OBJECT 7
            mesh {obj}
            material 1
            TRANS       0 2 0
            ROTAT       0 0 0
            SCALE       1 1 1
            """
        )
    )
    scene = pt.parse_scene(txt)
    scene = dataclasses.replace(scene, resolution=(16, 16), trace_depth=2)
    rad, counts = pathtrace_iteration_pallas(scene, 1, interpret=True)
    rad_j, _ = pt.pathtrace_iteration(scene, 1)
    d = np.abs(np.asarray(rad) - np.asarray(rad_j)).max(axis=-1)
    assert (d > 1e-3).mean() < 0.01


def test_rr_matches_jnp_integrator(small):
    """Russian roulette in-kernel: same Draw.RR stream, clip range and
    boost as integrator._bounce — images and per-bounce live counts
    must line up (RR kills rays from bounce 3 on, so counts at depth 3
    diverge from the no-RR render)."""
    deep = dataclasses.replace(small, trace_depth=6)
    rad_p, counts_p = pathtrace_iteration_pallas(
        deep, 2, interpret=True, rr=True
    )
    rad_j, counts_j = pt.pathtrace_iteration(deep, 2, rr=True)
    d = np.abs(np.asarray(rad_p) - np.asarray(rad_j)).max(axis=-1)
    assert (d > 1e-3).mean() < 0.005
    # u_rr < p_srv flips for rays whose p_srv differs by an ulp
    # between engines (f32 op ordering) — a few rays out of ~1500
    np.testing.assert_allclose(
        np.asarray(counts_p), np.asarray(counts_j), rtol=0.05
    )
    # RR actually terminated something vs the plain render
    _, counts_no = pathtrace_iteration_pallas(deep, 2, interpret=True)
    assert np.asarray(counts_p)[4:].sum() < np.asarray(counts_no)[4:].sum()
