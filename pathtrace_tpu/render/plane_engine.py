"""Fused-plane XLA engine: the megakernel's trace, compiled by XLA.

The round-1 wavefront integrator (render/integrator.py) carries (N,3)
vectors through the bounce scan; XLA materializes every stack/slice
round trip, and the path measures ~80 GB of HBM traffic per bounce —
purely bandwidth-bound (BENCHMARKS.md, "XLA-path analysis").  The fix
is the same formulation the Pallas megakernel already uses: (SUB,
LANES) f32 *planes* per ray component, one fused elementwise chain per
bounce.  This module runs that exact trace — ``megakernel._make_tracer``
is pure jnp and takes tables as values (the reverse sweep already
relies on that) — under ``jax.vmap`` over ray tiles instead of a
Pallas grid.  Same ops in the same order, so the output is
bit-identical to the megakernel (up to XLA-vs-Mosaic fusion tie
flips), but everything lowers through stock XLA:

- works on any backend (CPU tests, TPU without Mosaic),
- differentiable with plain ``jax.grad`` (it is ordinary traced jnp),
- no texture ceilings at all: image textures beyond even the kernel's
  round-5 STREAMED caps (or off the u8 grid) run here via native XLA
  row gathers (megakernel._xla_fallback), which replaced the old
  ~800x-slower wavefront fallback.

Semantics: identical RNG streams and math as both other engines —
reference contract citations live in ops/intersect.py / ops/bsdf.py
(src/intersections.h, src/interactions.h, src/pathtrace.cu:135-158).
The wavefront integrator remains the readable semantics/autodiff
reference; this engine is the *fast* XLA path (VERDICT round 1, item
5: the 2,000 ms/iter wavefront number needed a restructure, not
acceptance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.pallas import megakernel as mk
from ..ops.pallas.megakernel import LANES, SUB, TILE


def _tex_fetch_direct(tab, flat_idx):
    """Texel tap as ROW gather + one-hot lane contraction.

    ``tab`` is the (rows, 128) f32 table (megakernel._pack_textures,
    packed=False).  The previous formulation — ``take_along_axis`` on
    a (HWtot, 1) table — lowers to an XLA:TPU per-ELEMENT gather that
    serializes (~8 ms per 640k-lane tap, the reason textured planes
    measured 0.5-2.4 s/iter; round-4 verdict task 3).  Row gathers
    move whole 128-lane vectors and measured 3.3x cheaper in the
    split-engine analysis (BENCHMARKS.md: 2.4 ms vs 7.9 ms per 655k
    elements); the lane select is then a one-hot where+sum — pure VPU
    work XLA fuses.  Exact: the sum picks exactly one element (all
    other addends are 0.0), so output matches ``mk._tex_fetch``
    bit-for-bit.

    No ``stop_gradient`` here: the kernel's is a Mosaic limitation,
    not semantics — texel gradients flow through the row gather's
    scatter-add transpose exactly as through the old element gather."""
    r = jax.lax.shift_right_logical(flat_idx, 7)
    lane = flat_idx & 127
    rows = tab[r]                                 # (SUB, LANES, 128)
    oh = lane[..., None] == jnp.arange(LANES, dtype=jnp.int32)
    return jnp.sum(jnp.where(oh, rows, 0.0), axis=-1)


def _run_planes(cam, mats, gmat, tri, lights, it, resolution,
                trace_depth, geom_types, n_spp, features, nee_lights,
                nodes=None, bvh_meta=(), rr_mode=False, tex_geom=(),
                btex_geom=(), texs=None, pix0=None, local_pixels=None,
                bvh_grad=False):
    """vmap-over-tiles mirror of megakernel._run: same tile/pixel
    mapping (global flat pixel id keyed RNG, so any pixel sharding
    renders the identical image), same in-trace spp loop, same
    (rad (P,3), counts (depth,)) outputs."""
    width, height = resolution
    n_pixels = width * height
    n_local = local_pixels if local_pixels is not None else n_pixels
    n_tiles = -(-n_local // TILE)
    n_tris = 0 if tri is None else tri.shape[0]
    texr, texg, texb = texs if texs is not None else (None, None, None)
    row = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
    p0 = jnp.asarray(0 if pix0 is None else pix0, jnp.int32)
    it = jnp.asarray(it, jnp.int32)

    def tile_trace(tile):
        pixel = (tile * SUB + row) * LANES + lane + p0
        valid = pixel < n_pixels
        pix_u = mk._u32(pixel)
        fx = (pixel % width).astype(jnp.float32)
        fy = (pixel // width).astype(jnp.float32)
        trace_one = mk._make_tracer(
            cam, mats, gmat, tri, lights, geom_types=geom_types,
            width=width, height=height, depth=trace_depth,
            n_tris=n_tris, features=features, nee_lights=nee_lights,
            pix_u=pix_u, fx=fx, fy=fy, valid=valid, nodes=nodes,
            bvh_meta=bvh_meta, rr_mode=rr_mode, tex_geom=tex_geom,
            btex_geom=btex_geom, texr=texr, texg=texg, texb=texb,
            tex_fetch=_tex_fetch_direct, bvh_grad=bvh_grad,
        )

        def one_sample(sidx, acc):
            acc_r, acc_g, acc_b, counts_acc = acc
            it_u = mk._u32(
                jnp.full((SUB, LANES), it + sidx, jnp.int32)
            )
            st, counts_acc = trace_one(it_u, counts_acc)
            return (acc_r + st["rr"], acc_g + st["rg"],
                    acc_b + st["rb"], counts_acc)

        zeros = jnp.zeros((SUB, LANES), jnp.float32)
        init = (zeros, zeros, zeros,
                jnp.zeros((8, LANES), jnp.int32))
        return jax.lax.fori_loop(0, n_spp, one_sample, init)

    rad_r, rad_g, rad_b, counts = jax.vmap(tile_trace)(
        jnp.arange(n_tiles, dtype=jnp.int32)
    )
    rad = jnp.stack(
        [rad_r.reshape(-1), rad_g.reshape(-1), rad_b.reshape(-1)],
        axis=-1,
    )[:n_local]
    counts = jnp.sum(counts[:, 0, :trace_depth], axis=0)
    return rad, counts


def _tex_statics_planes(scene):
    """Like megakernel._tex_statics but WITHOUT the in-kernel VMEM
    caps: the tables live in HBM here, so any texture the loader
    accepts (scene/textures.py) runs in this engine."""
    used = mk._tex_used(scene)
    if not used:
        return (), (), ()
    tg = mk._tex_spec(scene)
    bg = mk._btex_spec(scene)
    if not any(t[0] >= 0 for t in tg):
        tg = ()
    if not any(t[0] >= 0 for t in bg):
        bg = ()
    return tg, (used if (tg or bg) else ()), bg


@functools.partial(jax.jit, static_argnames=(
    "n_iters", "features", "nee", "rr", "tex_geom", "tex_used",
    "btex_geom", "local_pixels", "use_bvh", "bvh_grad"))
def _batch_jit_planes(scene, it0, n_iters, features, nee=False,
                      rr=False, tex_geom=(), tex_used=(), btex_geom=(),
                      pix0=None, local_pixels=None, use_bvh=True,
                      bvh_grad=False):
    if not use_bvh and scene.mesh.bvh_meta:
        # the linear scan-fold expects the legacy per-tri 128-col
        # layout; _pack_scene keys the layout off bvh_meta, so strip
        # the BVH before packing.  (Without this the fold read v0/e1
        # from past the compact 16-col rows — gather clamp made every
        # triangle degenerate and the mesh silently invisible.)
        import dataclasses as _dc

        scene = _dc.replace(scene, mesh=_dc.replace(
            scene.mesh, bvh_nodes=None, bvh_order=None, bvh_meta=(),
        ))
    cam, mats, gmat, tri, nodes = mk._pack_scene(scene, tex_geom, btex_geom)
    lights, nee_lights = (
        mk._pack_lights(scene) if nee else (None, ())
    )
    texs = (mk._pack_textures(scene, tex_used)
            if (tex_geom or btex_geom) else None)
    return _run_planes(
        cam, mats, gmat, tri, lights, jnp.asarray(it0, jnp.int32),
        tuple(scene.resolution), int(scene.trace_depth),
        tuple(scene.geoms.type), n_iters, features, nee_lights,
        nodes=nodes if use_bvh else None,
        bvh_meta=scene.mesh.bvh_meta if use_bvh else (), rr_mode=rr,
        tex_geom=tex_geom, btex_geom=btex_geom, texs=texs, pix0=pix0,
        local_pixels=local_pixels, bvh_grad=bvh_grad,
    )


def pathtrace_batch_planes(scene, it0, n_iters: int, nee=False,
                           rr=False, use_bvh=True, bvh_grad=False):
    """``n_iters`` samples/pixel in one jit call on the fused-plane
    XLA engine.  Returns (accumulated radiance (P,3), counts (depth,)
    summed over samples) — the same contract as
    megakernel.pathtrace_batch_pallas, bit-compatible output.

    ``bvh_grad=True`` keeps the BVH but makes mesh scenes reverse-mode
    differentiable: the while_loop traverses detached values and
    records the winning triangle per lane; the hit is recomputed
    differentiably from the winner row (bit-identical forward, exact
    gradients wherever the detached estimator is) — the fast-gradient
    setting render/diff.py uses.  ``use_bvh=False`` is the legacy
    O(T) linear scan-fold (differentiable but ~BVH-speedup slower);
    kept as the oracle the bvh_grad tests compare against.  Caveat:
    the legacy fold does NOT carry per-triangle UV tangent frames, so
    mesh BUMPTEX is inert on it (flat shading) while the BVH paths
    apply it — oracle comparisons must skip mesh-bump scenes (warned
    at call time)."""
    tg, tu, bg = _tex_statics_planes(scene)
    if not use_bvh and bg and scene.mesh.count:
        from ..core.types import MESH

        mesh_bump = any(
            b[0] >= 0 and scene.geoms.type[g] == MESH
            for g, b in enumerate(bg)
        )
        if mesh_bump:
            print(
                "[pathtrace_tpu] WARNING: use_bvh=False (legacy linear "
                "fold) ignores mesh BUMPTEX charts — this render will "
                "diverge from the BVH/kernel engines on mesh-bump "
                "scenes",
                flush=True,
            )
    return _batch_jit_planes(
        scene, it0, n_iters, mk._scene_features(scene), nee, rr,
        tg, tu, bg, use_bvh=use_bvh, bvh_grad=bvh_grad,
    )


def pathtrace_iteration_planes(scene, it, nee=False, rr=False):
    """One sample/pixel — drop-in for pathtrace_iteration (mask-mode
    semantics) on the fused-plane engine."""
    return pathtrace_batch_planes(scene, it, 1, nee=nee, rr=rr)
