"""Generate a subdivided-icosahedron OBJ (a unit-ish sphere mesh) for
BVH scale testing: level L has 20 * 4^L triangles (L=6 -> 81,920).

Usage: python tools/gen_mesh.py LEVEL OUT.obj
"""

import sys

import numpy as np


def icosahedron():
    t = (1.0 + 5 ** 0.5) / 2.0
    v = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int64)
    return v, f


def subdivide(v, f):
    """One 4-way loop split, re-projected to the unit sphere."""
    edge_mid = {}
    verts = list(v)

    def mid(a, b):
        key = (min(a, b), max(a, b))
        if key not in edge_mid:
            m = verts[a] + verts[b]
            m = m / np.linalg.norm(m)
            edge_mid[key] = len(verts)
            verts.append(m)
        return edge_mid[key]

    nf = []
    for a, b, c in f:
        ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
        nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
    return np.asarray(verts), np.asarray(nf, np.int64)


def gen(level):
    v, f = icosahedron()
    for _ in range(level):
        v, f = subdivide(v, f)
    return v, f


def write_obj(path, v, f):
    with open(path, "w") as fh:
        fh.write(f"# icosphere {f.shape[0]} tris\n")
        for p in v:
            fh.write("v %.7f %.7f %.7f\n" % (p[0], p[1], p[2]))
        for a, b, c in f + 1:
            fh.write(f"f {a} {b} {c}\n")


if __name__ == "__main__":
    level, out = int(sys.argv[1]), sys.argv[2]
    v, f = gen(level)
    write_obj(out, v, f)
    print(f"{out}: {v.shape[0]} verts, {f.shape[0]} tris")
