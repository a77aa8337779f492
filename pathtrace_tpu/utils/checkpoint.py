"""Checkpoint/resume for progressive renders.

The renderer's entire mutable state is (accumulation image, iteration
count) — exactly as in the reference (src/pathtrace.cu:70-71), where
any Space-press saves mid-render (src/main.cpp:122-124).  Because the
RNG is counter-based on (iter, pixel, depth), resuming at iteration k
is *exact*: the continued render is bit-identical to an uninterrupted
one.  A scene fingerprint guards against resuming onto a different
scene (the reference instead resets accumulation on camera change,
src/main.cpp:74).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

import jax


def scene_fingerprint(scene) -> str:
    """Stable hash of all scene leaves + static config."""
    h = hashlib.sha256()
    leaves, treedef = jax.tree.flatten(scene)
    h.update(str(treedef).encode())
    h.update(
        json.dumps(
            [scene.resolution, scene.trace_depth, scene.image_name]
        ).encode()
    )
    for leaf in leaves:
        arr = np.asarray(leaf)
        h.update(arr.tobytes())
        h.update(str(arr.dtype).encode())
    return h.hexdigest()[:16]


def save(path: str, accum, iteration: int, scene) -> None:
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp if tmp.endswith(".npz") else tmp,
        accum=np.asarray(accum),
        iteration=np.int64(iteration),
        fingerprint=np.bytes_(scene_fingerprint(scene).encode()),
    )
    # np.savez appends .npz to paths without it
    actual = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual, path)


def load(path: str, scene):
    """Returns (accum, iteration) or raises ValueError on scene mismatch."""
    with np.load(path) as z:
        fp = bytes(z["fingerprint"]).decode()
        if fp != scene_fingerprint(scene):
            raise ValueError(
                "checkpoint was created for a different scene "
                f"(fingerprint {fp} != {scene_fingerprint(scene)})"
            )
        return z["accum"].copy(), int(z["iteration"])
