"""Next-event estimation (direct lighting): unbiasedness, variance,
and the geometry gradients it enables."""

import dataclasses

import jax
import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.ops import lights as L
from pathtrace_tpu.render import diff


class TestLightSampling:
    def test_cube_light_area_and_normals(self):
        from pathtrace_tpu.core import vecmath as vm

        # cornell's light: TRANS (0,10,0) SCALE (3,.3,3)
        fwd = vm.trs_matrix(
            np.asarray([0, 10, 0.0], np.float32),
            np.asarray([0, 0, 0.0], np.float32),
            np.asarray([3, 0.3, 3.0], np.float32), xp=np,
        )
        tab = L.cube_light_tables(fwd, xp=np)
        # areas: two 3x3 y-faces (9), four 3x0.3 side faces (0.9)
        np.testing.assert_allclose(
            np.sort(tab["area"]), [0.9, 0.9, 0.9, 0.9, 9.0, 9.0], atol=1e-5
        )
        # normals are unit and outward (dot with center offset > 0)
        for f in range(6):
            n = tab["normal"][f]
            assert abs(np.linalg.norm(n) - 1) < 1e-5
            assert np.dot(n, tab["origin"][f] - [0, 10, 0]) > 0

    def test_cube_sampling_uniform_by_area(self):
        from pathtrace_tpu.core import vecmath as vm

        fwd = vm.trs_matrix(
            np.asarray([0, 10, 0.0], np.float32),
            np.asarray([0, 0, 0.0], np.float32),
            np.asarray([3, 0.3, 3.0], np.float32), xp=np,
        )
        n = 200000
        rs = np.random.RandomState(0)
        pts, normals, total = L.sample_cube_light(
            fwd, rs.rand(n).astype(np.float32),
            rs.rand(n).astype(np.float32), rs.rand(n).astype(np.float32),
            xp=np,
        )
        assert total == pytest.approx(2 * 9 + 4 * 0.9, rel=1e-5)
        # fraction on top/bottom faces = 18/21.6
        on_y = np.abs(np.abs(pts[:, 1] - 10.0) - 0.15) < 1e-4
        assert abs(on_y.mean() - 18 / 21.6) < 0.01
        # all points on the box surface
        assert np.abs(pts[:, 0]).max() <= 1.5 + 1e-4
        assert np.abs(pts[:, 2]).max() <= 1.5 + 1e-4

    def test_sphere_sampling_on_surface(self):
        from pathtrace_tpu.core import vecmath as vm

        fwd = vm.trs_matrix(
            np.asarray([1, 2, 3.0], np.float32),
            np.asarray([0, 0, 0.0], np.float32),
            np.asarray([2, 2, 2.0], np.float32), xp=np,
        )
        inv = vm.trs_inverse(
            np.asarray([1, 2, 3.0], np.float32),
            np.asarray([0, 0, 0.0], np.float32),
            np.asarray([2, 2, 2.0], np.float32), xp=np,
        )
        n = 50000
        rs = np.random.RandomState(1)
        pts, normals, area = L.sample_sphere_light(
            fwd, np.swapaxes(inv, -1, -2),
            rs.rand(n).astype(np.float32), rs.rand(n).astype(np.float32),
            xp=np,
        )
        r = np.linalg.norm(pts - [1, 2, 3], axis=1)
        np.testing.assert_allclose(r, 1.0, atol=1e-5)  # radius 0.5*2
        # uniform scale: the per-sample weight is the constant sphere area
        np.testing.assert_allclose(area, 4 * np.pi, rtol=1e-5)
        # normals point radially outward
        out = (pts - [1, 2, 3]) / r[:, None]
        np.testing.assert_allclose(normals, out, atol=1e-4)

    def test_sphere_sampling_anisotropic_exact(self):
        """Non-uniformly scaled sphere light: the per-sample inverse-pdf
        weight must integrate to the true ellipsoid surface area (the
        round-1 mean-scale approximation was biased here)."""
        from pathtrace_tpu.core import vecmath as vm

        scale = np.asarray([1.0, 2.0, 3.0], np.float32)
        zero = np.zeros(3, np.float32)
        fwd = vm.trs_matrix(zero, zero, scale, xp=np)
        inv = vm.trs_inverse(zero, zero, scale, xp=np)
        n = 400000
        rs = np.random.RandomState(2)
        pts, normals, w = L.sample_sphere_light(
            fwd, np.swapaxes(inv, -1, -2),
            rs.rand(n).astype(np.float32), rs.rand(n).astype(np.float32),
            xp=np,
        )
        # E[weight] over uniform unit-sphere directions = ellipsoid area
        a, b, c = 0.5 * scale  # semi-axes
        p = 1.6075  # Knud Thomsen approximation (~0.1% accurate)
        area_ref = 4 * np.pi * (
            ((a * b) ** p + (a * c) ** p + (b * c) ** p) / 3
        ) ** (1 / p)
        assert w.mean() == pytest.approx(area_ref, rel=0.01)
        # points lie on the ellipsoid; normals match the analytic
        # ellipsoid normal (x/a^2, y/b^2, z/c^2)
        q = pts / (0.5 * scale)[None]
        np.testing.assert_allclose(
            np.linalg.norm(q, axis=1), 1.0, atol=1e-5
        )
        n_ref = pts / (0.5 * scale[None]) ** 2
        n_ref /= np.linalg.norm(n_ref, axis=1, keepdims=True)
        np.testing.assert_allclose(normals, n_ref, atol=1e-4)


class TestNEEUnbiased:
    def test_nee_matches_bsdf_expectation(self, cornell_scene):
        small = dataclasses.replace(
            cornell_scene, resolution=(32, 32), trace_depth=4
        )
        rad_nee, _ = pt.pathtrace_batch(small, 1, 32, nee=True, remat=False)
        rad_pt, _ = pt.pathtrace_batch(small, 1, 256, remat=False)
        m_nee = float(np.asarray(rad_nee).mean()) / 32
        m_pt = float(np.asarray(rad_pt).mean()) / 256
        assert m_nee == pytest.approx(m_pt, rel=0.12)

    def test_nee_reduces_variance(self, cornell_scene):
        """Per-iteration pixel variance across iterations must drop
        substantially with NEE (the point of direct lighting)."""
        small = dataclasses.replace(
            cornell_scene, resolution=(16, 16), trace_depth=3
        )

        def iter_stack(nee):
            outs = []
            for it in range(1, 17):
                r, _ = pt.pathtrace_iteration(small, it, nee=nee)
                outs.append(np.asarray(r))
            return np.stack(outs)

        v_plain = iter_stack(False).var(axis=0).mean()
        v_nee = iter_stack(True).var(axis=0).mean()
        assert v_nee < v_plain * 0.6

    def test_oracle_matches_nee(self, cornell_scene):
        from pathtrace_tpu.reference_oracle import oracle_iteration

        small = dataclasses.replace(
            cornell_scene, resolution=(32, 32), trace_depth=3
        )
        rad_j, _ = pt.pathtrace_iteration(small, 1, nee=True)
        rad_n, _ = oracle_iteration(small, 1, nee=True)
        d = np.abs(np.asarray(rad_j) - rad_n).max(axis=-1)
        assert (d > 1e-3).mean() < 0.01


class TestNEEGeometryGradients:
    def test_light_translation_grad_nonzero_matches_fd(self, cornell_scene):
        tiny = dataclasses.replace(
            cornell_scene, resolution=(16, 16), trace_depth=2
        )
        params = diff.split_params(tiny)

        def loss(p):
            img = diff.render_mean(
                diff.merge_params(tiny, p), 1, 2, nee=True
            )
            return (img**2).mean()

        g = jax.jit(jax.grad(loss))(params)
        an = float(np.asarray(g["translation"])[0, 1])  # light height
        assert np.isfinite(an) and an != 0.0

        eps = 1e-3
        def at(dy):
            p2 = jax.tree.map(lambda x: np.asarray(x).copy(), params)
            t = p2["translation"].copy()
            t[0, 1] += dy
            p2["translation"] = t
            return float(jax.jit(loss)(p2))

        fd = (at(eps) - at(-eps)) / (2 * eps)
        assert an == pytest.approx(fd, rel=0.05)

    def test_receiver_scale_grad_nonzero(self, cornell_scene):
        tiny = dataclasses.replace(
            cornell_scene, resolution=(16, 16), trace_depth=2
        )
        params = diff.split_params(tiny)

        def loss(p):
            img = diff.render_mean(
                diff.merge_params(tiny, p), 1, 2, nee=True
            )
            return (img**2).mean()

        g = jax.jit(jax.grad(loss))(params)
        assert np.abs(np.asarray(g["scale"])).sum() > 0
        assert np.abs(np.asarray(g["rotation"])).sum() >= 0  # finite
        assert np.isfinite(np.asarray(g["rotation"])).all()


NO_LIGHT = """\
MATERIAL 0
RGB         .7 .7 .7
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   0

CAMERA
RES         16 16
FOVY        45
ITERATIONS  4
DEPTH       3
FILE        dark
EYE         0 0 8
VIEW        0 0 -1
UP          0 1 0

OBJECT 0
cube
material 0
TRANS       0 0 0
ROTAT       0 0 0
SCALE       2 2 2
"""


class TestZeroLights:
    """NEE on a scene with no emissive geoms must degrade to the
    plain render (the light loop is empty), not crash."""

    def test_jnp_nee_no_lights(self):
        s = pt.parse_scene(NO_LIGHT)
        assert s.light_indices == ()
        r_nee, _ = pt.pathtrace_iteration(s, 1, nee=True)
        r_plain, _ = pt.pathtrace_iteration(s, 1)
        np.testing.assert_array_equal(np.asarray(r_nee),
                                      np.asarray(r_plain))

    def test_pallas_nee_no_lights(self):
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_iteration_pallas,
        )

        s = pt.parse_scene(NO_LIGHT)
        r_nee, _ = pathtrace_iteration_pallas(s, 1, interpret=True,
                                              nee=True)
        r_plain, _ = pathtrace_iteration_pallas(s, 1, interpret=True)
        np.testing.assert_array_equal(np.asarray(r_nee),
                                      np.asarray(r_plain))


class TestNEEMegakernel:
    def test_pallas_nee_matches_jnp(self, cornell_scene):
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_iteration_pallas,
        )

        small = dataclasses.replace(
            cornell_scene, resolution=(32, 32), trace_depth=3
        )
        rp, _ = pathtrace_iteration_pallas(small, 1, interpret=True,
                                           nee=True)
        rj, _ = pt.pathtrace_iteration(small, 1, nee=True)
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(axis=-1)
        # NEE amplifies the usual jit-vs-interpret primary-hit tie flips
        # (a flipped hit changes the direct-light cosine wholesale)
        assert (d > 1e-3).mean() < 0.01

    def test_pallas_nee_sphere_light(self, sphere_scene):
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_iteration_pallas,
        )

        small = dataclasses.replace(
            sphere_scene, resolution=(32, 32), trace_depth=3
        )
        rp, _ = pathtrace_iteration_pallas(small, 1, interpret=True,
                                           nee=True)
        rj, _ = pt.pathtrace_iteration(small, 1, nee=True)
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(axis=-1)
        assert (d > 1e-3).mean() < 0.01

    def test_pallas_nee_unbiased_vs_plain(self, cornell_scene):
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_batch_pallas,
        )

        small = dataclasses.replace(
            cornell_scene, resolution=(24, 24), trace_depth=3
        )
        a, _ = pathtrace_batch_pallas(small, 1, 24, interpret=True,
                                      nee=True)
        b, _ = pathtrace_batch_pallas(small, 1, 192, interpret=True)
        m_nee = float(np.asarray(a).mean()) / 24
        m_pt = float(np.asarray(b).mean()) / 192
        assert m_nee == pytest.approx(m_pt, rel=0.15)


ANISO_LIGHT = """\
MATERIAL 0
RGB         1 1 1
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   4

MATERIAL 1
RGB         .6 .6 .6
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   0

CAMERA
RES         16 16
FOVY        45
ITERATIONS  8
DEPTH       3
FILE        aniso
EYE         0 1 6
VIEW        0 0 -1
UP          0 1 0

OBJECT 0
sphere
material 0
TRANS       0 4 0
ROTAT       0 30 0
SCALE       1 2.5 0.6

OBJECT 1
cube
material 1
TRANS       0 -1 0
ROTAT       0 0 0
SCALE       8 .2 8
"""


class TestAnisotropicSphereLightNEE:
    """End-to-end: an anisotropically scaled (and rotated) sphere light
    must render unbiased under NEE — exact per-sample weight, not the
    round-1 mean-scale approximation."""

    def test_nee_matches_plain_render(self):
        s = pt.parse_scene(ANISO_LIGHT)
        rad_nee, _ = pt.pathtrace_batch(s, 1, 64, nee=True, remat=False)
        rad_pt, _ = pt.pathtrace_batch(s, 1, 512, remat=False)
        m_nee = float(np.asarray(rad_nee).mean()) / 64
        m_pt = float(np.asarray(rad_pt).mean()) / 512
        assert m_nee == pytest.approx(m_pt, rel=0.1)

    def test_pallas_matches_jnp(self):
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_iteration_pallas,
        )

        s = pt.parse_scene(ANISO_LIGHT)
        rp, _ = pathtrace_iteration_pallas(s, 1, interpret=True, nee=True)
        rj, _ = pt.pathtrace_iteration(s, 1, nee=True)
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(axis=-1)
        assert (d > 1e-3).mean() < 0.01


class TestScalarRederivation:
    """Independent pencil-and-paper check of the NEE estimator term —
    NOT the shared ops code re-run (VERDICT: the oracle shares ops/, so
    these scalar re-derivations carry the math-correctness burden).

    Rendering equation, direct term, area sampling:
      L_o = f_d * E * A * cos(th_s) cos(th_l) / r^2,  f_d = albedo/pi
    """

    def test_overhead_light_closed_form(self):
        from pathtrace_tpu.ops.lights import nee_contribution

        albedo = np.array([[0.6, 0.5, 0.4]], np.float32)
        # receiver at origin facing +y; sample 2 above, facing down;
        # area 4, emission 5: L = albedo/pi * 5 * 4 * (1*1/4) = 5a/pi
        out = nee_contribution(
            np.zeros((1, 3), np.float32),
            np.array([[0.0, 1.0, 0.0]], np.float32),
            albedo,
            np.ones((1, 3), np.float32),
            np.array([[0.0, 2.0, 0.0]], np.float32),
            np.array([[0.0, -1.0, 0.0]], np.float32),
            np.array([4.0], np.float32),
            np.array([5.0, 5.0, 5.0], np.float32),
            np.array([False]),
            xp=np,
        )
        np.testing.assert_allclose(
            out, albedo * 5.0 / np.pi, rtol=1e-6
        )

    def test_oblique_light_closed_form(self):
        from pathtrace_tpu.ops.lights import nee_contribution

        # sample at (1,1,0): w = (1,1,0)/sqrt2, cos_s = 1/sqrt2,
        # light normal (0,-1,0): cos_l = 1/sqrt2, r^2 = 2
        # => G = (1/2)/2 = 1/4
        albedo = np.array([[1.0, 1.0, 1.0]], np.float32)
        out = nee_contribution(
            np.zeros((1, 3), np.float32),
            np.array([[0.0, 1.0, 0.0]], np.float32),
            albedo,
            np.ones((1, 3), np.float32),
            np.array([[1.0, 1.0, 0.0]], np.float32),
            np.array([[0.0, -1.0, 0.0]], np.float32),
            np.array([2.0], np.float32),
            np.array([3.0, 3.0, 3.0], np.float32),
            np.array([False]),
            xp=np,
        )
        np.testing.assert_allclose(
            out, np.full((1, 3), 3.0 * 2.0 * 0.25 / np.pi), rtol=1e-6
        )
        # backfacing light sample contributes nothing
        out2 = nee_contribution(
            np.zeros((1, 3), np.float32),
            np.array([[0.0, 1.0, 0.0]], np.float32),
            albedo,
            np.ones((1, 3), np.float32),
            np.array([[1.0, 1.0, 0.0]], np.float32),
            np.array([[0.0, 1.0, 0.0]], np.float32),  # facing away
            np.array([2.0], np.float32),
            np.array([3.0, 3.0, 3.0], np.float32),
            np.array([False]),
            xp=np,
        )
        assert float(np.abs(out2).max()) == 0.0
