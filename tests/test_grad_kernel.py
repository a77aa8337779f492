"""Analytic material-gradient megakernel vs XLA autodiff.

The kernel counts per-material throughput factors along each fixed-RNG
path and emits closed-form parameter gradients — they must equal
``jax.grad`` of the jnp integrator exactly, once the handful of
interpret-vs-jit tie-flipped pixels are masked out of the cotangent on
both sides (the standard forward-parity caveat).
"""

import dataclasses
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.ops.pallas.megakernel import material_grads_pallas
from pathtrace_tpu.render.integrator import trace_pixels


def _masked_ct(scene, n_spp=1, seed=0):
    """Cotangent that zeroes pixels where kernel/jnp forwards diverge."""
    P = scene.pixel_count
    pix = jnp.arange(P, dtype=jnp.int32)

    def fwd():
        tot = jnp.zeros((P, 3), jnp.float32)
        for it in range(1, n_spp + 1):
            r, _ = trace_pixels(scene, it, pix, remat=False)
            tot = tot + r
        return tot

    rj = np.asarray(jax.jit(fwd)())
    rk, _ = material_grads_pallas(
        scene, np.ones((P, 3), np.float32), 1, n_spp, interpret=True
    )
    agree = np.abs(np.asarray(rk) - rj).max(-1) < 1e-4
    assert agree.mean() > 0.98
    ct = np.where(
        agree[:, None], np.random.RandomState(seed).rand(P, 3), 0
    ).astype(np.float32)
    return ct


def _ref_grads(scene, ct, n_spp=1):
    P = scene.pixel_count
    pix = jnp.arange(P, dtype=jnp.int32)

    def loss(mats):
        sc = dc.replace(scene, materials=mats)
        tot = jnp.zeros((P, 3), jnp.float32)
        for it in range(1, n_spp + 1):
            r, _ = trace_pixels(sc, it, pix, remat=False)
            tot = tot + r
        return jnp.sum(jnp.asarray(ct) * tot)

    return jax.jit(jax.grad(loss))(scene.materials)


class TestMaterialGradKernel:
    def test_cornell_exact(self, cornell_scene):
        scene = dataclasses.replace(
            cornell_scene, resolution=(16, 16), trace_depth=3
        )
        ct = _masked_ct(scene)
        _, g = material_grads_pallas(scene, ct, 1, 1, interpret=True)
        gref = _ref_grads(scene, ct)
        np.testing.assert_allclose(
            np.asarray(g["color"]), np.asarray(gref.color),
            rtol=1e-5, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(g["spec_color"]), np.asarray(gref.spec_color),
            rtol=1e-5, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(g["emittance"]), np.asarray(gref.emittance),
            rtol=1e-5, atol=1e-4,
        )

    def test_multi_spp(self, cornell_scene):
        scene = dataclasses.replace(
            cornell_scene, resolution=(12, 12), trace_depth=3
        )
        ct = _masked_ct(scene, n_spp=3)
        _, g = material_grads_pallas(scene, ct, 1, 3, interpret=True)
        gref = _ref_grads(scene, ct, n_spp=3)
        np.testing.assert_allclose(
            np.asarray(g["color"]), np.asarray(gref.color),
            rtol=1e-5, atol=1e-4,
        )

    def test_glass_scene(self):
        scene = dataclasses.replace(
            pt.load_scene("scenes/cornell_glass.txt"),
            resolution=(16, 16), trace_depth=4,
        )
        # disable DoF so the forward matches exactly more often
        scene = dataclasses.replace(
            scene,
            camera=dataclasses.replace(
                scene.camera, aperture=np.float32(0.0)
            ),
        )
        ct = _masked_ct(scene)
        _, g = material_grads_pallas(scene, ct, 1, 1, interpret=True)
        gref = _ref_grads(scene, ct)
        np.testing.assert_allclose(
            np.asarray(g["color"]), np.asarray(gref.color),
            rtol=1e-4, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(g["spec_color"]), np.asarray(gref.spec_color),
            rtol=1e-4, atol=1e-3,
        )

    def test_reflective_probability_grad_off_boundary(self, cornell_scene):
        """has_reflective gradients at non-boundary p (the clip
        subgradient at p in {0,1} differs by convention)."""
        m = cornell_scene.materials
        refl = np.asarray(m.has_reflective).copy()
        refl[1] = 0.4  # white walls become 40% glossy
        scene = dataclasses.replace(
            cornell_scene,
            materials=dataclasses.replace(m, has_reflective=refl),
            resolution=(12, 12), trace_depth=3,
        )
        ct = _masked_ct(scene)
        _, g = material_grads_pallas(scene, ct, 1, 1, interpret=True)
        gref = _ref_grads(scene, ct)
        a = float(np.asarray(g["has_reflective"])[1])
        b = float(np.asarray(gref.has_reflective)[1])
        assert a == pytest.approx(b, rel=1e-4, abs=1e-3)

    def test_checker_rejected(self):
        scene = pt.load_scene("scenes/cornell_checker.txt")
        with pytest.raises(NotImplementedError, match="CHECKER"):
            material_grads_pallas(
                scene, np.ones((scene.pixel_count, 3), np.float32), 1, 1
            )
