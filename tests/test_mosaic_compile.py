"""Mosaic compilability — AOT TPU compiles without hardware.

Interpret-mode tests execute the kernel's MATH but never run Mosaic's
lowering, and AOT *lowering* (StableHLO) stops short of it too: round
2 shipped an in-kernel texture design whose gather could never compile
on hardware ("Not implemented: Multiple source vregs along gather
dimension" — tpu.dynamic_gather takes single-vreg sources only), and
nothing caught it while the TPU tunnel was down.  These tests close
that hole: ``jax.experimental.topologies`` compiles the real kernels
for a v5e target on any machine (libtpu does the compile; no chips
needed), so a kernel that cannot lower fails HERE, on CPU, in CI.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.ops.pallas import megakernel as mk


@pytest.fixture(scope="module")
def tpu_dev():
    from jax.experimental import topologies

    try:
        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x2"
        )
    except Exception as e:  # pragma: no cover - no libtpu
        pytest.skip(f"no TPU topology support: {e}")
    return topo.devices[0]


def _compile_fwd(scene, dev, nee=False, stream=None):
    tg, tu, bg = mk._tex_statics(scene)
    feats = mk._scene_features(scene)
    with jax.default_device(dev):
        mk._batch_jit.lower(
            scene, 1, 2, False, False, feats, nee, False, tg, tu, bg,
            stream=stream,
        ).compile()


def test_textured_kernel_compiles(tpu_dev):
    """cornell_tex: albedo map + BUMPTEX through the chunked 2D
    in-vreg gather (_tex_fetch).  The round-2 design failed here."""
    sc = dc.replace(pt.load_scene("scenes/cornell_tex.txt"),
                    resolution=(64, 64), trace_depth=3)
    assert mk._tex_in_kernel(sc)
    _compile_fwd(sc, tpu_dev)


def test_mesh_bumptex_kernel_compiles(tpu_dev):
    """cornell_bumpmesh: mesh tangent frames + height-map taps."""
    sc = dc.replace(pt.load_scene("scenes/cornell_bumpmesh.txt"),
                    resolution=(64, 64), trace_depth=3)
    _compile_fwd(sc, tpu_dev, nee=True)


def test_mesh_vjp_kernel_compiles(tpu_dev):
    """The in-kernel reverse sweep on a mesh scene ('carry'-mode BVH
    traversal): the per-bounce jax.vjp must stay Mosaic-lowerable."""
    from pathtrace_tpu.render.diff import split_params

    sc = dc.replace(pt.load_scene("scenes/cornell_mesh.txt"),
                    resolution=(32, 32), trace_depth=2)
    params = split_params(sc)
    ct = jnp.ones((sc.pixel_count, 3), jnp.float32)
    nee_lights = tuple(
        (int(li), int(sc.geoms.type[li])) for li in sc.light_indices
    )
    feats = mk._scene_features(sc)
    with jax.default_device(tpu_dev):
        mk._render_vjp_jit.lower(
            sc, params, ct, 1, 1, False, feats, True, nee_lights
        ).compile()


def test_streamed_mesh_kernel_compiles(tpu_dev):
    """The HBM-streaming BVH traversal (NODE_WINDOW forward cache +
    per-leaf DMA slabs): interpret mode never runs Mosaic's DMA
    lowering, and the first streamed build hanged on hardware from an
    unaligned DMA base — this AOT compile is the lowering guard the
    round-4 verdict flagged as the riskiest untested surface."""
    sc = dc.replace(pt.load_scene("scenes/cornell_mesh.txt"),
                    resolution=(64, 64), trace_depth=3)
    _compile_fwd(sc, tpu_dev, stream=True)


def test_streamed_mesh_nee_kernel_compiles(tpu_dev):
    """Streamed traversal composed with NEE shadow rays (the second
    traversal site inside the bounce body)."""
    sc = dc.replace(pt.load_scene("scenes/cornell_mesh.txt"),
                    resolution=(64, 64), trace_depth=3)
    _compile_fwd(sc, tpu_dev, nee=True, stream=True)


def test_streamed_texture_kernel_compiles(tpu_dev):
    """The HBM texture-table slab-serving fetch (round 5): a
    while_loop of aligned 8-row DMAs + per-row lane gathers.  Same
    guard class as the mesh-streaming test — interpret mode never runs
    Mosaic's DMA/gather lowering."""
    sc = dc.replace(pt.load_scene("scenes/cornell_tex.txt"),
                    resolution=(64, 64), trace_depth=3)
    assert mk._tex_in_kernel(sc)
    tg, tu, bg = mk._tex_statics(sc)
    feats = mk._scene_features(sc)
    with jax.default_device(tpu_dev):
        mk._batch_jit.lower(
            sc, 1, 2, False, False, feats, False, False, tg, tu, bg,
            tex_stream=True,
        ).compile()


def test_split_engine_compiles(tpu_dev):
    """The span kernels + scalar-prefetched resume grid."""
    sc = dc.replace(pt.load_scene("scenes/cornell.txt"),
                    resolution=(64, 64), trace_depth=4)
    feats = mk._scene_features(sc)
    with jax.default_device(tpu_dev):
        mk._batch_split_jit.lower(sc, 1, 2, 2, False, feats).compile()


def test_sorted_engine_compiles(tpu_dev):
    """The sorted engine's carry-pixel span kernels (per-bounce spans
    + XLA sort/gather glue between them) on a mesh scene."""
    sc = dc.replace(pt.load_scene("scenes/cornell_mesh.txt"),
                    resolution=(64, 64), trace_depth=3)
    feats = mk._scene_features(sc)
    with jax.default_device(tpu_dev):
        mk._batch_sorted_jit.lower(sc, 1, 2, False, feats).compile()


def test_sorted_streamed_span_compiles(tpu_dev):
    """Streamed mesh tables inside the sorted spans (DMA windows in
    the carry-pixel kernel)."""
    sc = dc.replace(pt.load_scene("scenes/cornell_mesh.txt"),
                    resolution=(64, 64), trace_depth=3)
    feats = mk._scene_features(sc)
    with jax.default_device(tpu_dev):
        mk._batch_sorted_jit.lower(
            sc, 1, 2, False, feats, stream=True
        ).compile()


def test_subtile_span_compiles(tpu_dev):
    """Sub-tile group walks inside the sorted spans: the strided
    slices that crashed ApplyVectorLayout (Array::Slice limits>dim on
    sublane-replicated bounce-0 planes) must keep lowering with the
    select-anchor fix in place.  Gate dropped so the small tree takes
    the subtile branch."""
    sc = dc.replace(pt.load_scene("scenes/cornell_mesh.txt"),
                    resolution=(64, 64), trace_depth=3)
    feats = mk._scene_features(sc)
    mk._batch_sorted_jit.clear_cache()
    try:
        mk.SPAN_SUBTILE = True
        mk.SUBTILE_MIN_NODES = 1
        with jax.default_device(tpu_dev):
            mk._batch_sorted_jit.lower(
                sc, 1, 2, False, feats
            ).compile()
    finally:
        mk.SPAN_SUBTILE = False
        mk.SUBTILE_MIN_NODES = 4096
        mk._batch_sorted_jit.clear_cache()


def test_sorted_streamed_tex_span_compiles(tpu_dev):
    """Streamed texture tables inside the sorted spans (slab-serving
    fetch + DMA scratch in the carry-pixel kernel)."""
    sc = dc.replace(pt.load_scene("scenes/cornell_tex.txt"),
                    resolution=(64, 64), trace_depth=3)
    feats = mk._scene_features(sc)
    tg, tu, bg = mk._tex_statics(sc)
    with jax.default_device(tpu_dev):
        mk._batch_sorted_jit.lower(
            sc, 1, 2, False, feats, False, False, tg, tu, bg,
            tex_stream=True,
        ).compile()


def test_rowskip_stream_tex_compiles(tpu_dev):
    """The slab-server row-skip (per-row scalar lax.cond around the
    serve sweep) must stay Mosaic-lowerable — threshold dropped so
    the small map takes the cond path."""
    sc = dc.replace(pt.load_scene("scenes/cornell_tex.txt"),
                    resolution=(64, 64), trace_depth=3)
    feats = mk._scene_features(sc)
    tg, tu, bg = mk._tex_statics(sc)
    mk._batch_jit.clear_cache()
    try:
        mk.TEX_STREAM_ROWSKIP = True
        mk.TEX_ROWSKIP_MIN_ROWS = 0
        with jax.default_device(tpu_dev):
            mk._batch_jit.lower(
                sc, 1, 2, False, False, feats, False, False, tg, tu,
                bg, tex_stream=True,
            ).compile()
    finally:
        mk.TEX_STREAM_ROWSKIP = False
        mk.TEX_ROWSKIP_MIN_ROWS = 4096
        mk._batch_jit.clear_cache()
