"""Subsurface scattering (SSS extension): random-walk medium."""

import dataclasses

import numpy as np
import pytest

import pathtrace_tpu as pt

BASE = """\
MATERIAL 0
RGB         1 1 1
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   5

MATERIAL 1
RGB         .98 .98 .98
SPECEX      0
SPECRGB     .98 .98 .98
REFL        0
REFR        1
REFRIOR     1.3
EMITTANCE   0
{SSS_LINE}
CAMERA
RES         64 64
FOVY        45
ITERATIONS  64
DEPTH       8
FILE        sss
EYE         0 0 8
VIEW        0 0 -1
UP          0 1 0

OBJECT 0
cube
material 0
TRANS       0 0 -6
ROTAT       0 0 0
SCALE       6 6 .3

OBJECT 1
sphere
material 1
TRANS       0 0 0
ROTAT       0 0 0
SCALE       3 3 3
"""


def _scene(sss_line=""):
    return pt.parse_scene(BASE.replace("{SSS_LINE}", sss_line))


class TestSSS:
    def test_parser_and_native(self):
        s = _scene("SSS         2.0 .9 .6 .4\n")
        np.testing.assert_allclose(s.materials.sss_sigma, [0, 2])
        np.testing.assert_allclose(
            s.materials.sss_albedo[1], [0.9, 0.6, 0.4]
        )
        assert _scene().materials.sss_sigma is None
        from pathtrace_tpu.native import lib as N

        if N.available():
            import jax

            a = N.parse_scene_native(
                text=BASE.replace("{SSS_LINE}", "SSS 2.0 .9 .6 .4\n")
            )
            b = pt.parse_scene(
                BASE.replace("{SSS_LINE}", "SSS 2.0 .9 .6 .4\n")
            )
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_oracle_parity(self):
        from pathtrace_tpu.reference_oracle import oracle_iteration

        s = _scene("SSS         2.0 .9 .6 .4\n")
        rj, _ = pt.pathtrace_iteration(s, 1)
        rn, _ = oracle_iteration(s, 1)
        d = np.abs(np.asarray(rj) - rn).max(-1)
        assert (d > 1e-3).mean() < 0.005

    def test_tiny_sigma_approximates_clear_glass(self):
        """sigma -> 0: free paths exceed the object, the walk never
        scatters, behavior reduces to the plain Fresnel glass."""
        glass = _scene()
        sss = _scene("SSS         1e-6 .5 .5 .5\n")
        a, _ = pt.pathtrace_batch(glass, 1, 16, remat=False)
        b, _ = pt.pathtrace_batch(sss, 1, 16, remat=False)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4
        )

    def test_scattering_diffuses_transmission(self):
        """A dense medium spreads the transmitted light: the bright
        directly-transmitted core dims and energy spreads outward."""
        glass = _scene()
        dense = _scene("SSS         3.0 .95 .95 .95\n")
        spp = 64
        a = np.asarray(pt.pathtrace_batch(glass, 1, spp,
                                          remat=False)[0]) / spp
        b = np.asarray(pt.pathtrace_batch(dense, 1, spp,
                                          remat=False)[0]) / spp
        img_a = a.reshape(64, 64, 3).mean(-1)
        img_b = b.reshape(64, 64, 3).mean(-1)
        # inside the sphere's ~6px disk: focused transmission through
        # clear glass is far brighter than through the dense medium
        core_a = img_a[28:37, 28:37].mean()
        core_b = img_b[28:37, 28:37].mean()
        assert core_b < core_a * 0.25

    def test_albedo_tints_transmission(self):
        red = _scene("SSS         2.0 .95 .2 .2\n")
        spp = 48
        img = np.asarray(pt.pathtrace_batch(red, 1, spp,
                                            remat=False)[0]) / spp
        img = img.reshape(64, 64, 3)
        sphere = img[28:37, 28:37]  # inside the disk only
        # multiple scattering events tint the medium red
        assert sphere[..., 0].mean() > 1.3 * sphere[..., 1].mean()

    def test_energy_not_created(self):
        """Unit-albedo medium must not amplify energy vs clear glass
        (it only redistributes and delays termination)."""
        glass = _scene()
        white = _scene("SSS         2.0 1 1 1\n")
        spp = 64
        a = np.asarray(pt.pathtrace_batch(glass, 1, spp,
                                          remat=False)[0]).mean() / spp
        b = np.asarray(pt.pathtrace_batch(white, 1, spp,
                                          remat=False)[0]).mean() / spp
        assert b < a * 1.15

    def test_pallas_engine_parity(self):
        """SSS in the megakernel (round 2 — no more XLA fallback):
        same Draw.SSS_* streams as integrator._bounce, so the images
        agree up to f32 tie flips."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            material_grads_pallas,
            pathtrace_iteration_pallas,
        )

        s = _scene("SSS         2.0 .9 .6 .4\n")
        rp, _ = pathtrace_iteration_pallas(s, 1, interpret=True)
        rj, _ = pt.pathtrace_iteration(s, 1)
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(-1)
        assert (d > 1e-3).mean() < 0.005
        # the factor-counting material-grad kernel still rejects SSS
        # (albedo factors are not countable); the reverse sweep
        # (render_vjp_pallas) is the Pallas gradient path for SSS
        with pytest.raises(NotImplementedError, match="SSS"):
            material_grads_pallas(
                s, np.ones((s.pixel_count, 3), np.float32), 1, 1
            )

    def test_pallas_nee_parity(self):
        """SSS + NEE: interior scattering events skip NEE and re-arm
        BSDF emission collection (emit_ok) — engines must agree."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_iteration_pallas,
        )

        s = _scene("SSS         2.0 .9 .6 .4\n")
        rp, _ = pathtrace_iteration_pallas(s, 3, interpret=True,
                                           nee=True)
        rj, _ = pt.pathtrace_iteration(s, 3, nee=True)
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(-1)
        assert (d > 1e-3).mean() < 0.005

    def test_vjp_kernel_accepts_sss(self):
        """The reverse sweep differentiates SSS scenes (it transposes
        the same tracer the forward kernel runs): radiance must match
        the XLA forward, gradients must be finite, and the emittance
        gradient nonzero."""
        import dataclasses as dc

        import jax

        from pathtrace_tpu.ops.pallas.megakernel import render_vjp_pallas

        s = dc.replace(
            _scene("SSS         2.0 .9 .6 .4\n"),
            resolution=(12, 12), trace_depth=3,
        )
        ct = np.ones((s.pixel_count, 3), np.float32)
        rad, g = render_vjp_pallas(s, ct, 1, 1, interpret=True)
        rj, _ = pt.pathtrace_iteration(s, 1)
        d = np.abs(np.asarray(rad) - np.asarray(rj)).max(-1)
        assert (d > 1e-3).mean() < 0.05
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        assert float(np.abs(np.asarray(g["materials"].emittance)).sum()) > 0

    def test_beer_lambert_slab(self):
        """Independent physics check (not a re-run of the sampling
        code): with albedo 0 every interior scattering event kills the
        path, so the radiance seen through a slab of extinction sigma
        and thickness d is Beer-Lambert E*exp(-sigma*d).  IOR 1 makes
        the interfaces non-reflective and non-bending, so the analytic
        prediction is exact up to Monte-Carlo noise."""
        slab = """\
MATERIAL 0
RGB         1 1 1
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   4

MATERIAL 1
RGB         1 1 1
SPECEX      0
SPECRGB     1 1 1
REFL        0
REFR        1
REFRIOR     1.0
EMITTANCE   0
SSS         {SIGMA} 0 0 0

CAMERA
RES         32 32
FOVY        20
ITERATIONS  64
DEPTH       6
FILE        slab
EYE         0 0 6
VIEW        0 0 -1
UP          0 1 0

OBJECT 0
cube
material 0
TRANS       0 0 -4
ROTAT       0 0 0
SCALE       8 8 .3

OBJECT 1
cube
material 1
TRANS       0 0 0
ROTAT       0 0 0
SCALE       8 8 2
"""
        spp = 256
        vals = {}
        for sigma in (0.4, 1.0):
            s = pt.parse_scene(slab.replace("{SIGMA}", str(sigma)))
            img = np.asarray(
                pt.pathtrace_batch(s, 1, spp, remat=False)[0]
            ) / spp
            vals[sigma] = img.mean()
        # ratio cancels the interface epsilons: exp(-(1.0-0.4)*2)
        got = vals[1.0] / vals[0.4]
        want = np.exp(-(1.0 - 0.4) * 2.0)
        assert abs(got - want) < 0.05 * want, (got, want)
