"""Interactive camera semantics (reference src/main.cpp:72-94,115-137).

The contract under test: key events move the camera with the
reference's exact orbit/translate math, and ANY camera change restarts
accumulation from iteration 0 — after which the restarted render is
bit-identical to a fresh render with the moved camera (counter-based
RNG keyed on iteration makes restart == fresh).
"""

import dataclasses

import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.render.interact import (
    KEY_MOTION,
    InteractiveSession,
    apply_camera_motion,
    send_key,
)


@pytest.fixture
def cam(cornell_scene):
    return cornell_scene.camera


class TestCameraMotion:
    def test_orbit_preserves_orthonormal_basis(self, cam):
        c = apply_camera_motion(cam, 0.1, -0.1, (0.0, 0.0, 0.0))
        v = np.asarray(c.view, np.float64)
        u = np.asarray(c.up, np.float64)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-6
        assert abs(np.linalg.norm(u) - 1.0) < 1e-6
        assert abs(float(v @ u)) < 1e-6

    def test_phi_rotates_about_up(self, cam):
        """phi spins view about up (src/main.cpp:79): up invariant,
        view rotated by exactly phi."""
        c = apply_camera_motion(cam, 0.0, 0.3, (0.0, 0.0, 0.0))
        np.testing.assert_allclose(c.up, cam.up, atol=1e-6)
        cosang = float(
            np.asarray(c.view, np.float64)
            @ np.asarray(cam.view, np.float64)
        )
        assert abs(cosang - np.cos(0.3)) < 1e-6

    def test_theta_rotates_about_right(self, cam):
        v0 = np.asarray(cam.view, np.float64)
        u0 = np.asarray(cam.up, np.float64)
        r0 = np.cross(v0, u0)
        c = apply_camera_motion(cam, 0.25, 0.0, (0.0, 0.0, 0.0))
        # right axis invariant under rotation about itself
        np.testing.assert_allclose(
            np.cross(np.asarray(c.view, np.float64),
                     np.asarray(c.up, np.float64)),
            r0, atol=1e-6,
        )
        cosang = float(np.asarray(c.view, np.float64) @ v0)
        assert abs(cosang - np.cos(0.25)) < 1e-6

    def test_translation_basis(self, cam):
        """w/s along view, a/d along right, r/f along up, +-0.1
        (src/main.cpp:125-134)."""
        v = np.asarray(cam.view, np.float64)
        u = np.asarray(cam.up, np.float64)
        r = np.cross(v, u)
        for key, axis, sign in [
            ("w", v, +1), ("s", v, -1), ("d", r, +1), ("a", r, -1),
            ("r", u, +1), ("f", u, -1),
        ]:
            th, ph, mv = KEY_MOTION[key]
            c = apply_camera_motion(cam, th, ph, mv)
            np.testing.assert_allclose(
                np.asarray(c.position, np.float64),
                np.asarray(cam.position, np.float64) + sign * 0.1 * axis,
                atol=1e-6, err_msg=key,
            )
            np.testing.assert_allclose(c.view, cam.view, atol=1e-7)

    def test_arrow_key_signs(self, cam):
        """up/down = +-theta, left/right = +-phi exactly as the
        reference keyCallback."""
        assert KEY_MOTION["up"][0] == pytest.approx(0.1)
        assert KEY_MOTION["down"][0] == pytest.approx(-0.1)
        assert KEY_MOTION["left"][1] == pytest.approx(0.1)
        assert KEY_MOTION["right"][1] == pytest.approx(-0.1)


class TestSession:
    def test_stale_events_ignored(self, tmp_path, cam):
        ctrl = str(tmp_path / "c.ctrl")
        send_key(ctrl, "left")  # before the session starts
        sess = InteractiveSession(ctrl)
        _, changed, save, quit_ = sess.poll(cam)
        assert not (changed or save or quit_)

    def test_event_kinds(self, tmp_path, cam):
        ctrl = str(tmp_path / "c.ctrl")
        sess = InteractiveSession(ctrl)
        send_key(ctrl, "space")
        send_key(ctrl, "left")
        send_key(ctrl, "esc")
        cam2, changed, save, quit_ = sess.poll(cam)
        assert changed and save and quit_
        assert not np.allclose(cam2.view, cam.view)
        # drained: a second poll sees nothing
        _, changed, save, quit_ = sess.poll(cam)
        assert not (changed or save or quit_)

    def test_partial_line_not_consumed(self, tmp_path, cam):
        ctrl = str(tmp_path / "c.ctrl")
        sess = InteractiveSession(ctrl)
        with open(ctrl, "a") as f:
            f.write("lef")  # writer mid-append
        _, changed, _, _ = sess.poll(cam)
        assert not changed
        with open(ctrl, "a") as f:
            f.write("t\n")
        _, changed, _, _ = sess.poll(cam)
        assert changed


class TestRestartSemantics:
    def test_restart_equals_fresh_render(self, tmp_path, cornell_scene):
        """The camchanged -> iteration=0 contract end-to-end: render,
        move the camera via a key event, restart accumulation — the
        result is bit-identical to a fresh render of the moved scene
        (iteration-keyed RNG makes the restart exact)."""
        scene = dataclasses.replace(
            cornell_scene, resolution=(16, 16), trace_depth=2
        )
        ctrl = str(tmp_path / "c.ctrl")
        sess = InteractiveSession(ctrl)

        accum = np.zeros((scene.pixel_count, 3), np.float32)
        done = 0
        for it in (1, 2):  # pre-move samples, about to be discarded
            rad, _ = pt.pathtrace_iteration(scene, it)
            accum = accum + np.asarray(rad)
            done += 1

        send_key(ctrl, "left")
        cam2, changed, _, _ = sess.poll(scene.camera)
        assert changed
        scene = dataclasses.replace(scene, camera=cam2)
        accum = np.zeros((scene.pixel_count, 3), np.float32)  # restart
        done = 0
        for it in (1, 2, 3):
            rad, _ = pt.pathtrace_iteration(scene, it)
            accum = accum + np.asarray(rad)
            done += 1

        moved = dataclasses.replace(
            dataclasses.replace(
                cornell_scene, resolution=(16, 16), trace_depth=2
            ),
            camera=apply_camera_motion(
                cornell_scene.camera, *KEY_MOTION["left"]
            ),
        )
        fresh = np.zeros_like(accum)
        for it in (1, 2, 3):
            rad, _ = pt.pathtrace_iteration(moved, it)
            fresh = fresh + np.asarray(rad)
        assert done == 3
        np.testing.assert_array_equal(accum, fresh)

    def test_camera_actually_changes_image(self, cornell_scene):
        # an orbit key changes every primary ray direction (a pure
        # translation 'w' can leave a 16x16 axis-aligned cornell
        # render bit-identical: same directions, same walls hit —
        # radiance is piecewise constant in eye position)
        scene = dataclasses.replace(
            cornell_scene, resolution=(16, 16), trace_depth=2
        )
        moved = dataclasses.replace(
            scene,
            camera=apply_camera_motion(
                scene.camera, *KEY_MOTION["left"]
            ),
        )
        a, _ = pt.pathtrace_iteration(scene, 1)
        b, _ = pt.pathtrace_iteration(moved, 1)
        assert not np.array_equal(np.asarray(a), np.asarray(b))
