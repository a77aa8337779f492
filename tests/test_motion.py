"""Motion blur (MOTION extension): streaking, parity, invariance."""

import dataclasses

import numpy as np
import pytest

import pathtrace_tpu as pt

MOVING_SPHERE = """\
MATERIAL 0
RGB         1 1 1
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   5

CAMERA
RES         96 96
FOVY        45
ITERATIONS  32
DEPTH       2
FILE        moving
EYE         0.0 5 10.5
VIEW        0 0 -1
UP          0 1 0

OBJECT 0
sphere
material 0
TRANS       0 5 0
ROTAT       0 0 0
SCALE       2 2 2
MOTION      4 0 0
"""


def _bright_bbox(img, w, h):
    im = np.asarray(img).reshape(h, w, 3)
    mask = im.max(axis=-1) > 0.5
    ys, xs = np.where(mask)
    return xs.min(), xs.max(), ys.min(), ys.max()


class TestMotionBlur:
    def test_parser_velocity(self):
        s = pt.parse_scene(MOVING_SPHERE)
        np.testing.assert_allclose(s.geoms.velocity, [[4, 0, 0]])
        static = pt.parse_scene(MOVING_SPHERE.replace("MOTION      4 0 0", ""))
        assert static.geoms.velocity is None

    def test_motion_streaks_along_velocity(self):
        s = pt.parse_scene(MOVING_SPHERE)
        static = pt.parse_scene(
            MOVING_SPHERE.replace("MOTION      4 0 0", "")
        )
        acc_m, _ = pt.pathtrace_batch(s, 1, 32, remat=False)
        acc_s, _ = pt.pathtrace_batch(static, 1, 32, remat=False)
        x0m, x1m, y0m, y1m = _bright_bbox(np.asarray(acc_m) / 32, 96, 96)
        x0s, x1s, y0s, y1s = _bright_bbox(np.asarray(acc_s) / 32, 96, 96)
        # streak: wider in x (motion direction), same height
        assert (x1m - x0m) > (x1s - x0s) + 5
        assert abs((y1m - y0m) - (y1s - y0s)) <= 2
        # the static sphere's t=0 position is the streak's start
        assert abs(x0m - x0s) <= 2 or abs(x1m - x1s) <= 2

    def test_zero_velocity_identical_to_none(self):
        static = pt.parse_scene(
            MOVING_SPHERE.replace("MOTION      4 0 0", "")
        )
        zeroed = dataclasses.replace(
            static,
            geoms=dataclasses.replace(
                static.geoms, velocity=np.zeros((1, 3), np.float32)
            ),
        )
        a, _ = pt.pathtrace_iteration(static, 1)
        b, _ = pt.pathtrace_iteration(zeroed, 1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_oracle_parity(self):
        from pathtrace_tpu.reference_oracle import oracle_iteration

        s = pt.parse_scene(MOVING_SPHERE)
        rad_j, _ = pt.pathtrace_iteration(s, 1)
        rad_n, _ = oracle_iteration(s, 1)
        d = np.abs(np.asarray(rad_j) - rad_n).max(axis=-1)
        assert (d > 1e-3).mean() < 0.005

    def test_pallas_parity(self):
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_iteration_pallas,
        )

        s = pt.parse_scene(MOVING_SPHERE)
        rp, _ = pathtrace_iteration_pallas(s, 1, interpret=True)
        rj, _ = pt.pathtrace_iteration(s, 1)
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(axis=-1)
        assert (d > 1e-3).mean() < 0.005

    def test_native_parser_motion(self, tmp_path):
        from pathtrace_tpu.native import lib as N

        if not N.available():
            pytest.skip("no native lib")
        sc = N.parse_scene_native(text=MOVING_SPHERE)
        np.testing.assert_allclose(sc.geoms.velocity, [[4, 0, 0]])
        static = N.parse_scene_native(
            text=MOVING_SPHERE.replace("MOTION      4 0 0", "")
        )
        assert static.geoms.velocity is None
