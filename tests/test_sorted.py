"""Sorted engine (round 5): per-bounce ray re-sort.

One span kernel per bounce with the whole wavefront re-sorted between
bounces by (dead, quantized origin cell, direction octant) — the
reference's stream-compaction slot (/root/reference/README.md:83-86)
at LANE granularity, built because the honest mesh timings showed
incoherent bounces cost 3-8x more per live ray than coherent ones
(BENCHMARKS.md "Mesh scenes" depth sweep).  The carried pixel id keys
the RNG, so any permutation renders the identical image per ray —
these tests pin EXACT equality with the monolithic megakernel.
"""

import dataclasses

import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.ops.pallas.megakernel import (
    pathtrace_batch_pallas,
    pathtrace_batch_sorted,
)


def _cmp(scene, nee=False, n=2):
    a, ca = pathtrace_batch_pallas(scene, 1, n, interpret=True,
                                   nee=nee)
    b, cb = pathtrace_batch_sorted(scene, 1, n, interpret=True,
                                   nee=nee)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(np.asarray(ca), np.asarray(cb))
    assert float(np.asarray(a).sum()) > 0


@pytest.mark.parametrize("nee", [False, True], ids=["bsdf", "nee"])
def test_mesh_scene_exact(nee):
    sc = pt.load_scene("scenes/cornell_mesh.txt")
    sc = dataclasses.replace(sc, resolution=(16, 16), trace_depth=3)
    _cmp(sc, nee=nee)


def test_glass_scene_exact():
    """Glass + imperfect specular: the permuted state carries every
    lobe's continuation exactly."""
    sc = pt.load_scene("scenes/cornell_glass.txt")
    sc = dataclasses.replace(sc, resolution=(16, 16), trace_depth=3)
    _cmp(sc)


def test_motion_sss_state_keys():
    """Scenes with extra state planes (shutter time, SSS medium) carry
    them through the permutation."""
    for name in ("cornell_checker", "cornell.txt"):
        path = name if name.endswith(".txt") else f"{name}.txt"
        sc = pt.load_scene(f"scenes/{path}")
        sc = dataclasses.replace(sc, resolution=(16, 16),
                                 trace_depth=2)
        _cmp(sc)


def test_streamed_mesh_spans_exact():
    """Over-budget meshes stream their HBM tables INSIDE the sorted
    spans (round-5 follow-up): forced streaming must stay bit-equal to
    the monolithic kernel (itself stream-parity-pinned in
    tests/test_stream.py)."""
    sc = pt.load_scene("scenes/cornell_mesh.txt")
    sc = dataclasses.replace(sc, resolution=(16, 16), trace_depth=3)
    a, ca = pathtrace_batch_sorted(sc, 1, 1, interpret=True,
                                   stream=True)
    b, cb = pathtrace_batch_pallas(sc, 1, 1, interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(np.asarray(ca), np.asarray(cb))
    assert float(np.asarray(a).sum()) > 0


@pytest.mark.parametrize("nee", [False, True], ids=["bsdf", "nee"])
def test_subtile_spans_exact(nee):
    """Sub-tile traversal inside the sorted spans (SPAN_SUBTILE):
    bit-equal to the full-tile walk.  The path was blocked by a Mosaic
    ApplyVectorLayout abort until round 5 root-caused it (strided
    slices of sublane-REPLICATED planes — bounce-0 camera-ray
    broadcasts; fixed by the bit-exact select anchor in the subtile
    branch).  Gate dropped so the 39-node cornell_mesh tree exercises
    the group walks."""
    from pathtrace_tpu.ops.pallas import megakernel as mk

    sc = pt.load_scene("scenes/cornell_mesh.txt")
    sc = dataclasses.replace(sc, resolution=(16, 16), trace_depth=3)
    a, ca = pathtrace_batch_sorted(sc, 1, 1, interpret=True, nee=nee)
    mk._batch_sorted_jit.clear_cache()
    try:
        mk.SPAN_SUBTILE = True
        mk.SUBTILE_MIN_NODES = 1
        b, cb = pathtrace_batch_sorted(sc, 1, 1, interpret=True,
                                       nee=nee)
    finally:
        mk.SPAN_SUBTILE = False
        mk.SUBTILE_MIN_NODES = 4096
        mk._batch_sorted_jit.clear_cache()
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(np.asarray(ca), np.asarray(cb))
    assert float(np.asarray(a).sum()) > 0


def test_streamed_tex_spans_exact():
    """Over-resident textures stream their HBM tables inside the
    sorted spans (round-5 follow-up: previously the sorted engine
    ROUTED big-texture scenes to the monolithic kernel, which lost
    the sort's mesh-traversal win on combined mesh+texture scenes).
    Forced tex streaming must stay bit-equal to the monolithic
    streamed fetch AND to the resident sorted fetch."""
    sc = pt.load_scene("scenes/cornell_tex.txt")
    sc = dataclasses.replace(sc, resolution=(16, 16), trace_depth=3)
    a, _ = pathtrace_batch_pallas(sc, 1, 1, interpret=True,
                                  tex_stream=True)
    b, _ = pathtrace_batch_sorted(sc, 1, 1, interpret=True,
                                  tex_stream=True)
    c, _ = pathtrace_batch_sorted(sc, 1, 1, interpret=True,
                                  tex_stream=False)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(np.asarray(b), np.asarray(c))
    assert float(np.asarray(b).sum()) > 0
