"""HBM mesh streaming (round 4): past MESH_STREAM_BYTES the triangle
and BVH node tables stay in HBM and the megakernel traversal DMAs them
on demand (megakernel.NODE_WINDOW docstring).  These tests force
``stream=True`` on small meshes so the streamed program runs in
interpret mode and must be bit-identical to the resident path.

Reference anchor: the mesh extra (/root/reference/README.md:113-117)
at scales the reference's GPU could not hold resident either.
"""

import dataclasses

import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.ops.pallas.megakernel import (
    MESH_STREAM_BYTES,
    pathtrace_batch_pallas,
)


@pytest.fixture(scope="module", params=["cornell_mesh", "cornell_bigmesh"])
def mesh_scene(request):
    sc = pt.load_scene(f"scenes/{request.param}.txt")
    return dataclasses.replace(sc, resolution=(16, 16), trace_depth=3)


def test_streamed_matches_resident(mesh_scene):
    a, ca = pathtrace_batch_pallas(
        mesh_scene, 1, 2, interpret=True, stream=False
    )
    b, cb = pathtrace_batch_pallas(
        mesh_scene, 1, 2, interpret=True, stream=True
    )
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(np.asarray(ca), np.asarray(cb))
    assert float(np.asarray(a).sum()) > 0


def test_streamed_nee_matches_resident():
    sc = pt.load_scene("scenes/cornell_mesh.txt")
    sc = dataclasses.replace(sc, resolution=(16, 16), trace_depth=3)
    a, _ = pathtrace_batch_pallas(sc, 1, 1, interpret=True, nee=True,
                                  stream=False)
    b, _ = pathtrace_batch_pallas(sc, 1, 1, interpret=True, nee=True,
                                  stream=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_auto_threshold_is_shape_static():
    """The auto decision streams exactly when the lane-padded tables
    exceed the budget — bigmesh (82k tris + 33k nodes ~ 59 MB) sits
    just UNDER the 64 MB default and must stay resident."""
    sc = pt.load_scene("scenes/cornell_bigmesh.txt")
    rows = sc.mesh.tri_verts.shape[0] + np.asarray(sc.mesh.bvh_nodes).shape[0]
    assert rows * 512 < MESH_STREAM_BYTES


def test_grad_mode_over_budget_raises(monkeypatch):
    """In-kernel gradients cannot stream (the reverse sweep would need
    the tables resident); over-budget mesh scenes must raise toward
    the planes engine, not OOM."""
    import pathtrace_tpu.ops.pallas.megakernel as mk

    sc = pt.load_scene("scenes/cornell_mesh.txt")
    sc = dataclasses.replace(sc, resolution=(16, 16), trace_depth=2)
    monkeypatch.setattr(mk, "MESH_STREAM_BYTES", 1024)
    target = np.zeros((sc.pixel_count, 3), np.float32)
    with pytest.raises(NotImplementedError, match="planes"):
        mk.render_vjp_pallas(sc, target, 1, 1, interpret=True)
