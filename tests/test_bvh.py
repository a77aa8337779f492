"""BVH builder invariants + traversal equivalence vs the linear fold.

The acceleration structure must be an *optimization only*: the
megakernel with ``bvh_meta`` populated must reproduce the linear
per-triangle fold (same Moller-Trumbore math, different visit order)
on every scene.  Builder invariants are checked exhaustively; engine
equivalence in interpret mode (hermetic, CPU).
"""

import dataclasses as dc

import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.core import types as T
from pathtrace_tpu.scene.bvh import (
    LEAF_K, build_geom_bvh, build_mesh_bvh, with_bvh,
)


def _rand_tris(n, seed=0):
    r = np.random.RandomState(seed)
    base = r.rand(n, 1, 3) * 8 - 4
    return (base + r.rand(n, 3, 3) * 0.5).astype(np.float32)


class TestBuilder:
    def test_invariants(self):
        tv = _rand_tris(333)
        nodes, order = build_geom_bvh(tv)
        # permutation
        assert sorted(order.tolist()) == list(range(333))
        lo = tv.min(axis=1)
        hi = tv.max(axis=1)
        covered = 0
        for i, n in enumerate(nodes):
            s, c = int(n[7]), int(n[8])
            skip = int(n[6])
            # skip link bounds: forward, within table + sentinel
            assert i < skip <= len(nodes)
            if c > 0:
                assert c <= LEAF_K
                covered += c
                sub = order[s:s + c]
                assert (lo[sub].min(0) >= n[0:3] - 1e-6).all()
                assert (hi[sub].max(0) <= n[3:6] + 1e-6).all()
                assert skip == i + 1  # leaves are their own subtree
        assert covered == 333  # every tri in exactly one leaf

    def test_dfs_reaches_all_leaves(self):
        """Walking hit-everything (cursor+1 on internal, skip on leaf)
        visits every node exactly once — the skip links thread a valid
        DFS."""
        tv = _rand_tris(100, seed=3)
        nodes, _ = build_geom_bvh(tv)
        n, visited = 0, 0
        while n < len(nodes):
            visited += 1
            n = int(nodes[n][6]) if nodes[n][8] > 0 else n + 1
        assert visited == len(nodes)

    def test_per_geom_offsets(self):
        tv = np.concatenate([_rand_tris(40), _rand_tris(25, 1)])
        tg = np.array([0] * 40 + [2] * 25, np.int32)
        nodes, order, meta = build_mesh_bvh(tv, tg, 3)
        assert [m[0] for m in meta] == [0, 2]
        g0, g2 = meta
        assert g0[3] == 0 and g0[4] == 40
        assert g2[3] == 40 and g2[4] == 25
        assert g0[2] + g2[2] == nodes.shape[0]
        # order maps each geom's slot range to that geom's tris
        assert set(order[:40].tolist()) == set(range(40))
        assert set(order[40:].tolist()) == set(range(40, 65))


@pytest.fixture(scope="module")
def mesh_small():
    sc = pt.load_scene("scenes/cornell_mesh.txt")
    return dc.replace(sc, resolution=(32, 24), trace_depth=4)


def _strip_bvh(scene):
    return dc.replace(
        scene,
        mesh=dc.replace(scene.mesh, bvh_nodes=None, bvh_order=None,
                        bvh_meta=()),
    )


class TestTraversalEquivalence:
    def test_matches_linear_fold(self, mesh_small):
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_iteration_pallas,
        )

        rad_b, counts_b = pathtrace_iteration_pallas(
            mesh_small, 5, interpret=True
        )
        rad_l, counts_l = pathtrace_iteration_pallas(
            _strip_bvh(mesh_small), 5, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(rad_b), np.asarray(rad_l), rtol=1e-5, atol=1e-5
        )
        assert np.array_equal(np.asarray(counts_b),
                              np.asarray(counts_l))

    def test_matches_linear_fold_nee(self, mesh_small):
        """Shadow rays traverse the BVH too (live-masked)."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_iteration_pallas,
        )

        rad_b, _ = pathtrace_iteration_pallas(
            mesh_small, 3, interpret=True, nee=True
        )
        rad_l, _ = pathtrace_iteration_pallas(
            _strip_bvh(mesh_small), 3, interpret=True, nee=True
        )
        np.testing.assert_allclose(
            np.asarray(rad_b), np.asarray(rad_l), rtol=1e-5, atol=1e-5
        )

    def test_two_mesh_instances(self, mesh_small):
        """Multiple MESH geoms: one BVH per instance, same image as
        the linear fold over the concatenated soup."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_iteration_pallas,
        )

        sc = _strip_bvh(mesh_small)
        g = sc.geoms
        g2 = T.Geoms(
            type=g.type + (T.MESH,),
            material_id=np.concatenate(
                [g.material_id, np.array([1], np.int32)]
            ),
            translation=np.concatenate(
                [g.translation, np.array([[-2.5, 6.0, 0.5]], np.float32)]
            ),
            rotation=np.concatenate(
                [g.rotation, np.array([[10.0, 0.0, 45.0]], np.float32)]
            ),
            scale=np.concatenate(
                [g.scale, np.array([[1.5, 0.8, 1.5]], np.float32)]
            ),
        )
        tv = np.asarray(sc.mesh.tri_verts)
        tg = np.asarray(sc.mesh.tri_geom)
        mesh2 = T.TriMesh(
            tri_verts=np.concatenate([tv, tv]),
            tri_geom=np.concatenate(
                [tg, np.full_like(tg, len(g.type))]
            ),
        )
        sc_lin = dc.replace(sc, geoms=g2, mesh=mesh2)
        sc_bvh = dc.replace(
            sc, geoms=g2, mesh=with_bvh(mesh2, len(g2.type))
        )
        rad_b, _ = pathtrace_iteration_pallas(sc_bvh, 2, interpret=True)
        rad_l, _ = pathtrace_iteration_pallas(sc_lin, 2, interpret=True)
        np.testing.assert_allclose(
            np.asarray(rad_b), np.asarray(rad_l), rtol=1e-5, atol=1e-5
        )
