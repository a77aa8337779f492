"""Minimal Wavefront OBJ loader for the `mesh` geometry extension.

Covers the subset needed for "arbitrary mesh loading and rendering"
(reference README.md:113-117): ``v`` positions and ``f`` faces
(fan-triangulated, 1-based or negative indices, ``v/vt/vn`` forms).
"""

from __future__ import annotations

import numpy as np


def load_obj(path: str) -> np.ndarray:
    """Return triangle vertices with shape (T, 3, 3), float32."""
    verts = []
    tris = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if parts[0] == "v" and len(parts) >= 4:
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif parts[0] == "f" and len(parts) >= 4:
                idx = []
                for tok in parts[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):  # fan triangulation
                    tris.append((idx[0], idx[k], idx[k + 1]))
    if not tris:
        return np.zeros((0, 3, 3), dtype=np.float32)
    v = np.asarray(verts, dtype=np.float32)
    t = np.asarray(tris, dtype=np.int64)
    return v[t]  # (T, 3, 3)
