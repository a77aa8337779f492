"""Full in-kernel reverse sweep vs XLA autodiff.

``render_vjp_pallas`` transposes the VMEM trace inside the megakernel
(``jax.vjp`` through ``_make_tracer(mode='vjp')``) and chains table
cotangents to scene parameters through the differentiable packers.  It
must reproduce ``jax.grad`` of the jnp integrator for EVERY parameter
group — materials (incl. IOR/spec exponent), geometry TRS, camera —
once interpret-vs-jit tie-flipped pixels are masked from the cotangent
on both sides (the standard forward-parity caveat).

NEE mode is the meaningful geometry case: pure BSDF sampling at fixed
RNG is piecewise-constant in geometry (grads correctly zero a.e.);
NEE's cos·cos'/r² term carries the continuous dependence
(render/diff.py module docstring; ops/lights.py).
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.ops.pallas.megakernel import render_vjp_pallas
from pathtrace_tpu.render.diff import merge_params, split_params
from pathtrace_tpu.render.integrator import trace_pixels


def _masked_ct(scene, nee, n_spp=1, seed=0):
    P = scene.pixel_count
    pix = jnp.arange(P, dtype=jnp.int32)

    def fwd():
        tot = jnp.zeros((P, 3), jnp.float32)
        for it in range(1, n_spp + 1):
            r, _ = trace_pixels(scene, it, pix, remat=False, nee=nee)
            tot = tot + r
        return tot

    rj = np.asarray(jax.jit(fwd)())
    rk, _ = render_vjp_pallas(
        scene, np.ones((P, 3), np.float32), 1, n_spp,
        interpret=True, nee=nee,
    )
    agree = np.abs(np.asarray(rk) - rj).max(-1) < 1e-4
    assert agree.mean() > 0.95
    return np.where(
        agree[:, None], np.random.RandomState(seed).rand(P, 3), 0
    ).astype(np.float32)


def _ref_grads(scene, ct, nee, n_spp=1):
    P = scene.pixel_count
    pix = jnp.arange(P, dtype=jnp.int32)

    def loss(params):
        sc = merge_params(scene, params)
        tot = jnp.zeros((P, 3), jnp.float32)
        for it in range(1, n_spp + 1):
            r, _ = trace_pixels(sc, it, pix, remat=False, nee=nee)
            tot = tot + r
        return jnp.sum(jnp.asarray(ct) * tot)

    return jax.jit(jax.grad(loss))(split_params(scene))


def _assert_close(a, b, rtol=2e-4, atol=3e-4):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=rtol, atol=atol
    )


class TestReverseSweep:
    def test_materials_cornell(self, cornell_scene):
        scene = dc.replace(
            cornell_scene, resolution=(16, 16), trace_depth=3
        )
        ct = _masked_ct(scene, nee=False)
        _, g = render_vjp_pallas(scene, ct, 1, 1, interpret=True)
        gref = _ref_grads(scene, ct, nee=False)
        _assert_close(g["materials"].color, gref["materials"].color)
        _assert_close(
            g["materials"].emittance, gref["materials"].emittance
        )
        _assert_close(
            g["materials"].has_reflective,
            gref["materials"].has_reflective,
        )

    def test_geometry_camera_nee(self, cornell_scene):
        """The headline case: nonzero TRS + camera + light grads via
        the NEE geometric term, matching autodiff."""
        scene = dc.replace(
            cornell_scene, resolution=(16, 16), trace_depth=3
        )
        ct = _masked_ct(scene, nee=True)
        _, g = render_vjp_pallas(scene, ct, 1, 1, interpret=True,
                                 nee=True)
        gref = _ref_grads(scene, ct, nee=True)
        # geometry gradients are actually nonzero in this regime
        assert np.abs(np.asarray(gref["translation"])).max() > 0.1
        _assert_close(g["translation"], gref["translation"])
        _assert_close(g["rotation"], gref["rotation"])
        _assert_close(g["scale"], gref["scale"], rtol=3e-4, atol=5e-4)
        _assert_close(
            g["camera"].position, gref["camera"].position
        )
        _assert_close(g["camera"].view, gref["camera"].view)
        _assert_close(g["materials"].color, gref["materials"].color)
        _assert_close(
            g["materials"].emittance, gref["materials"].emittance
        )

    def test_glass_scene_grads(self):
        """Glass scene through the reverse sweep.  IOR grads are a.e.
        zero by design (detached lobe choice + 1/p cancellation —
        tests/test_diff.py::test_ior_grad_finite documents the same for
        the XLA engine); what must match is that the sweep reproduces
        autodiff exactly, zeros included."""
        # depth 3 (enter glass / exit / hit light) keeps the unrolled
        # fwd+bwd graph tractable for the XLA-CPU interpret compile —
        # depth 4 with the glass feature set compiled for >40 min
        scene = dc.replace(
            pt.load_scene("scenes/cornell_glass.txt"),
            resolution=(16, 16), trace_depth=3,
        )
        scene = dc.replace(
            scene,
            camera=dc.replace(scene.camera, aperture=np.float32(0.0)),
        )
        ct = _masked_ct(scene, nee=False)
        _, g = render_vjp_pallas(scene, ct, 1, 1, interpret=True)
        gref = _ref_grads(scene, ct, nee=False)
        _assert_close(g["materials"].ior, gref["materials"].ior,
                      rtol=1e-3, atol=1e-3)
        _assert_close(g["materials"].color, gref["materials"].color,
                      rtol=1e-3, atol=1e-3)
        _assert_close(g["materials"].spec_color,
                      gref["materials"].spec_color,
                      rtol=1e-3, atol=1e-3)

    def test_multi_spp(self, cornell_scene):
        scene = dc.replace(
            cornell_scene, resolution=(12, 12), trace_depth=3
        )
        ct = _masked_ct(scene, nee=True, n_spp=2)
        _, g = render_vjp_pallas(scene, ct, 1, 2, interpret=True,
                                 nee=True)
        gref = _ref_grads(scene, ct, nee=True, n_spp=2)
        _assert_close(g["translation"], gref["translation"])
        _assert_close(g["materials"].color, gref["materials"].color)

    def test_mesh_rejected(self):
        scene = pt.load_scene("scenes/cornell_mesh.txt")
        with pytest.raises(NotImplementedError):
            render_vjp_pallas(
                scene, np.ones((scene.pixel_count, 3), np.float32),
                1, 1,
            )
