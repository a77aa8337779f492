"""CHECKER procedural texture (texture-mapping extra, README.md:103)."""

import dataclasses

import numpy as np
import pytest

import pathtrace_tpu as pt

CHECKER_SCENE = """\
MATERIAL 0
RGB         1 1 1
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   5

MATERIAL 1
RGB         .9 .1 .1
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   0
CHECKER     4 .1 .1 .9

CAMERA
RES         64 64
FOVY        45
ITERATIONS  16
DEPTH       3
FILE        checker
EYE         0 2 6
VIEW        0 -0.2 -1
UP          0 1 0

OBJECT 0
cube
material 0
TRANS       0 8 0
ROTAT       0 0 0
SCALE       6 .3 6

OBJECT 1
cube
material 1
TRANS       0 -0.5 0
ROTAT       0 0 0
SCALE       20 1 20
"""


class TestChecker:
    def test_parser(self):
        s = pt.parse_scene(CHECKER_SCENE)
        np.testing.assert_allclose(s.materials.checker_scale, [0, 4])
        np.testing.assert_allclose(
            s.materials.checker_color[1], [0.1, 0.1, 0.9]
        )
        plain = pt.parse_scene(
            CHECKER_SCENE.replace("CHECKER     4 .1 .1 .9\n", "")
        )
        assert plain.materials.checker_scale is None

    def test_native_parser_matches(self):
        from pathtrace_tpu.native import lib as N

        if not N.available():
            pytest.skip("no native lib")
        import jax

        a = N.parse_scene_native(text=CHECKER_SCENE)
        b = pt.parse_scene(CHECKER_SCENE)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_checker_produces_two_albedos(self):
        s = pt.parse_scene(CHECKER_SCENE)
        acc, _ = pt.pathtrace_batch(s, 1, 32, remat=False)
        img = np.asarray(acc).reshape(64, 64, 3) / 32
        # floor pixels: some red-dominant, some blue-dominant
        red = (img[..., 0] > 2 * img[..., 2]) & (img[..., 0] > 0.05)
        blue = (img[..., 2] > 2 * img[..., 0]) & (img[..., 2] > 0.05)
        assert red.sum() > 50 and blue.sum() > 50

    def test_no_checker_single_albedo(self):
        plain = pt.parse_scene(
            CHECKER_SCENE.replace("CHECKER     4 .1 .1 .9\n", "")
        )
        acc, _ = pt.pathtrace_batch(plain, 1, 32, remat=False)
        img = np.asarray(acc).reshape(64, 64, 3) / 32
        blue = (img[..., 2] > 2 * img[..., 0]) & (img[..., 2] > 0.05)
        assert blue.sum() == 0

    def test_oracle_parity(self):
        from pathtrace_tpu.reference_oracle import oracle_iteration

        s = pt.parse_scene(CHECKER_SCENE)
        rad_j, _ = pt.pathtrace_iteration(s, 1)
        rad_n, _ = oracle_iteration(s, 1)
        d = np.abs(np.asarray(rad_j) - rad_n).max(axis=-1)
        assert (d > 1e-3).mean() < 0.005

    def test_pallas_parity(self):
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_iteration_pallas,
        )

        s = pt.parse_scene(CHECKER_SCENE)
        rp, _ = pathtrace_iteration_pallas(s, 1, interpret=True)
        rj, _ = pt.pathtrace_iteration(s, 1)
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(axis=-1)
        assert (d > 1e-3).mean() < 0.005

    def test_checker_sticks_to_moving_object(self):
        moving = CHECKER_SCENE.replace(
            "TRANS       0 -0.5 0",
            "TRANS       0 -0.5 0\nMOTION      2 0 0",
        )
        s = pt.parse_scene(moving)
        rad, _ = pt.pathtrace_iteration(s, 1)
        assert np.isfinite(np.asarray(rad)).all()


BUMP_SCENE = CHECKER_SCENE.replace("CHECKER     4 .1 .1 .9",
                                   "BUMP        2 0.6")


class TestBump:
    def test_parser_and_native(self):
        s = pt.parse_scene(BUMP_SCENE)
        np.testing.assert_allclose(s.materials.bump_scale, [0, 2])
        np.testing.assert_allclose(s.materials.bump_strength, [0, 0.6])
        plain = pt.parse_scene(BUMP_SCENE.replace("BUMP        2 0.6\n", ""))
        assert plain.materials.bump_strength is None
        from pathtrace_tpu.native import lib as N

        if N.available():
            import jax

            a = N.parse_scene_native(text=BUMP_SCENE)
            for x, y in zip(jax.tree.leaves(a),
                            jax.tree.leaves(pt.parse_scene(BUMP_SCENE))):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_engines_agree(self):
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_iteration_pallas,
        )
        from pathtrace_tpu.reference_oracle import oracle_iteration

        s = pt.parse_scene(BUMP_SCENE)
        rj, _ = pt.pathtrace_iteration(s, 1)
        rn, _ = oracle_iteration(s, 1)
        rp, _ = pathtrace_iteration_pallas(s, 1, interpret=True)
        assert (np.abs(np.asarray(rj) - rn).max(axis=-1) > 1e-3).mean() < 0.005
        assert (
            np.abs(np.asarray(rp) - np.asarray(rj)).max(axis=-1) > 1e-3
        ).mean() < 0.005

    def test_bump_visible_under_nee(self):
        s = pt.parse_scene(BUMP_SCENE)
        plain = pt.parse_scene(BUMP_SCENE.replace("BUMP        2 0.6\n", ""))
        a, _ = pt.pathtrace_batch(s, 1, 8, nee=True, remat=False)
        b, _ = pt.pathtrace_batch(plain, 1, 8, nee=True, remat=False)
        diff = np.abs(np.asarray(a) / 8 - np.asarray(b) / 8).max(axis=-1)
        # the perturbed shading normal shifts the direct-light cosine on
        # a large fraction of floor pixels
        assert (diff > 0.01).mean() > 0.15

    def test_zero_strength_noop(self):
        s = pt.parse_scene(
            BUMP_SCENE.replace("BUMP        2 0.6", "BUMP        2 0.0")
        )
        assert s.materials.bump_strength is None
