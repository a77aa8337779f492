"""Interactive camera control + accumulation-restart semantics.

The reference's interaction loop (src/main.cpp:72-94,115-137): arrow
keys orbit the view (rotate about the camera's right and up axes by
+-0.1 rad), WASD/RF translate the eye by +-0.1 along right/view/up,
and ANY camera change sets ``iteration = 0`` — the accumulation buffer
restarts from scratch (src/main.cpp:74,91-94).  Space saves the
current image; Esc saves and quits (src/main.cpp:118-124).

TPU pods are headless, so the GLFW key callback becomes a *control
file*: the terminal viewer (tools/watch.py --ctrl) appends one key
name per line; the CLI polls the file between device dispatches and
applies pending keys through :class:`InteractiveSession`.  The camera
math itself (:func:`apply_camera_motion`) replicates the reference's
update exactly: ``r = view x up``, ``rot = R(theta, r) @ R(phi, up)``
applied to both view and up, ``position += move.x*r + move.y*up +
move.z*view``.

Because the RNG is counter-based on (iteration, pixel, depth), a
restarted accumulation is bit-identical to a fresh render with the
moved camera — tested in tests/test_interactive.py.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

# key -> (theta, phi, move) exactly as src/main.cpp:125-134
KEY_MOTION = {
    "down":  (-0.1, 0.0, (0.0, 0.0, 0.0)),
    "up":    (+0.1, 0.0, (0.0, 0.0, 0.0)),
    "right": (0.0, -0.1, (0.0, 0.0, 0.0)),
    "left":  (0.0, +0.1, (0.0, 0.0, 0.0)),
    "a":     (0.0, 0.0, (-0.1, 0.0, 0.0)),
    "d":     (0.0, 0.0, (+0.1, 0.0, 0.0)),
    "w":     (0.0, 0.0, (0.0, 0.0, +0.1)),
    "s":     (0.0, 0.0, (0.0, 0.0, -0.1)),
    "r":     (0.0, 0.0, (0.0, +0.1, 0.0)),
    "f":     (0.0, 0.0, (0.0, -0.1, 0.0)),
}


def _axis_rotation(angle: float, axis) -> np.ndarray:
    """Rodrigues rotation matrix about ``axis`` (normalized here, as
    glm::rotate expects a unit axis), the role of glm::rotate at
    src/main.cpp:79."""
    axis = np.asarray(axis, np.float64)
    n = np.linalg.norm(axis)
    if n < 1e-12:
        return np.eye(3)
    x, y, z = axis / n
    c, s = np.cos(angle), np.sin(angle)
    C = 1.0 - c
    return np.array([
        [c + x * x * C, x * y * C - z * s, x * z * C + y * s],
        [y * x * C + z * s, c + y * y * C, y * z * C - x * s],
        [z * x * C - y * s, z * y * C + x * s, c + z * z * C],
    ])


def apply_camera_motion(camera, theta: float, phi: float, move):
    """One camchanged update (src/main.cpp:73-86): rotate view and up
    by ``R(theta, right) @ R(phi, up)``, translate the eye by ``move``
    in the (right, up, view) basis.  Returns a new Camera."""
    v = np.asarray(camera.view, np.float64)
    u = np.asarray(camera.up, np.float64)
    r = np.cross(v, u)
    rot = _axis_rotation(theta, r) @ _axis_rotation(phi, u)
    new_v = rot @ v
    new_u = rot @ u
    pos = (np.asarray(camera.position, np.float64)
           + move[0] * r + move[1] * u + move[2] * v)
    return dataclasses.replace(
        camera,
        position=pos.astype(np.float32),
        view=new_v.astype(np.float32),
        up=new_u.astype(np.float32),
    )


class InteractiveSession:
    """Polls a control file for key events and owns the
    iteration-reset contract.

    ``poll(camera)`` reads any newly appended lines from the control
    file and returns ``(camera, camera_changed, save, quit)``.  A
    camera-motion key means the caller MUST restart accumulation
    (set its iteration counter to 0 and zero the buffer) — the
    reference's ``camchanged -> iteration = 0`` at src/main.cpp:74.
    """

    def __init__(self, ctrl_path: str):
        self.ctrl_path = ctrl_path
        self._offset = 0
        # events written before the render started are stale input —
        # consume them (like key events before the window opens)
        if os.path.exists(ctrl_path):
            self._offset = os.path.getsize(ctrl_path)

    def _read_new_keys(self):
        try:
            size = os.path.getsize(self.ctrl_path)
        except OSError:
            return []
        if size <= self._offset:
            return []
        with open(self.ctrl_path, "r") as f:
            f.seek(self._offset)
            chunk = f.read()
        # only consume complete lines (a writer may be mid-append)
        upto = chunk.rfind("\n")
        if upto < 0:
            return []
        self._offset += upto + 1
        return [
            ln.strip().lower()
            for ln in chunk[: upto + 1].splitlines()
            if ln.strip()
        ]

    def poll(self, camera):
        changed = False
        save = False
        quit_ = False
        for key in self._read_new_keys():
            if key in KEY_MOTION:
                theta, phi, move = KEY_MOTION[key]
                camera = apply_camera_motion(camera, theta, phi, move)
                changed = True
            elif key == "space":
                save = True
            elif key in ("esc", "escape", "q"):
                quit_ = True
        return camera, changed, save, quit_


def send_key(ctrl_path: str, key: str) -> None:
    """Append one key event (the viewer side of the protocol)."""
    with open(ctrl_path, "a") as f:
        f.write(key + "\n")
        f.flush()
        os.fsync(f.fileno())
