"""Pallas TPU megakernel: the whole path trace in VMEM.

The reference's per-iteration pipeline is a chain of global-memory
kernels — raygen, per-depth intersect + shade, compaction
(src/pathtrace.cu:135-158) — each streaming every ray through HBM.
The TPU-native speed-of-light design inverts that: one kernel, grid
over ray tiles, with the *entire* bounce loop running on a tile of
rays resident in VMEM.  HBM traffic per ray is then just the final
radiance write (plus tiny replicated scene tables), instead of
~2 × state × depth.

Layout: rays are laid out as (SUBLANES, 128) f32 planes per component
(ox, oy, oz, dx, ...) — every op is an aligned VPU op.  The scene
(geom transforms + per-geom material table) is a few hundred scalars,
replicated into VMEM for every tile; the geom loop is unrolled with
static primitive types, exactly like ops/intersect.intersect_scene.

Compaction, TPU-style: lanes are predicated (no SIMT divergence cost,
and — unlike the CUDA design — no HBM traffic for dead lanes to
eliminate, since the whole loop lives in VMEM).  An optional per-tile
early exit (`early_exit=True`: lax.cond skips remaining bounces once a
tile is all-dead) is available but off by default — Mosaic compiles the
duplicated branch body very slowly, and the predicated-lane cost it
saves is small.  Per-bounce live counts are still emitted per tile for
the reference's mandated analysis (README.md:284-293).

Semantics are identical to the jnp integrator (same RNG streams, same
intersection/BSDF math — see ops/intersect.py, ops/bsdf.py for the
reference-contract citations); tests compare the two paths directly.
Differentiation goes through the jnp path; this kernel is the
inference/throughput path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import types as T
from ...core.constants import (
    NO_HIT, RAY_OFFSET, TWO_PI, SQRT_OF_ONE_THIRD, PI,
    TRANSMISSION_PUSH as T_PUSH,
)
from ...core.rng import Draw
from ...render.integrator import camera_basis, geom_transforms
from ...scene.bvh import LEAF_K

SUB = 32          # sublane rows per tile
LANES = 128
TILE = SUB * LANES  # rays per tile (4096)

# HBM mesh streaming (round 4 — the VMEM mesh ceiling named in
# BENCHMARKS.md "Mesh scenes"): when the lane-padded triangle + BVH
# node tables exceed MESH_STREAM_BYTES, they stay in HBM
# (memory_space=ANY) and the traversal DMAs them on demand — LEAF_K
# triangle rows per leaf visit into a VMEM scratch, and a
# NODE_WINDOW-row forward cache for the skip-link node walk (DFS
# layout: the cursor only moves to n+1 or a forward skip link, so a
# window refilled AT the cursor has high hit rate).  Below the budget
# the resident path is untouched.
NODE_WINDOW = 64
MESH_STREAM_BYTES = 64 * 1024 * 1024
# Round 5: the PRIMAL resident-mesh traversal reuses the bvh_grad
# "carry" machinery — the while_loop runs the cheap Moller-Trumbore
# distance test per leaf row (~60 vector ops) and carries the winning
# row's value planes; the full shade fold (several hundred ops + ~20
# best-plane selects per row in the legacy path) then runs ONCE per
# geom on the carried winner.  Identical predicates on identical
# values -> bit-identical output (pinned by the engine-parity tests);
# measured 1.3-1.9x on mesh scenes (BENCHMARKS.md "Mesh scenes").
# False restores the legacy full-fold-in-leaf traversal.
MESH_WINNER_FOLD_PRIMAL = True
# Sub-tile traversal (round 5): the primal resident walk runs one
# while_loop per 8-row vreg group instead of one per (32,128) tile —
# each walk's any-lane test prunes against 1024 rays instead of 4096
# and its vector ops are single-vreg, at the cost of re-walking shared
# nodes per group.  Bit-identical (a group's any-lane test is a subset
# of the tile's but still a superset of each member lane's hits).
# Grad modes and the streamed walk keep full-tile traversal.
MESH_SUBTILE_TRAVERSAL = True
# Sub-tile traversal inside the SPAN kernels (split/sorted engines):
# gated separately because Mosaic's ApplyVectorLayout crashed on the
# (8,128) row slices there (vector_extract_strided_slice check
# failure) when taken directly off the span state loads.  Flipped by
# experiments / once a lowering that avoids the crash is in place.
SPAN_SUBTILE = False
# sub-tile only pays on big trees: re-walking an 11-node tree 4x
# measured 2x WORSE on cornell_mesh (monolithic).  Module constant so
# parity tests can drop the gate and exercise the path on small trees.
SUBTILE_MIN_NODES = 4096
# Sorted engine: resort the wavefront before every k-th bounce.  Any
# value renders the bit-identical image (the carried pixel id keys
# the RNG); 1 = every bounce, measured fastest on mesh scenes.
SORT_CADENCE = 1
# Streamed-texture slab server: skip serve sweeps for slab rows no tap
# lands in (scalar lax.cond per row).  Measured NULL at 2048^2 (12
# interleaved samples: medians 1112 vs 1152 ms, mins within 1%) and
# HARMFUL at <=1024^2 (535->752 ms at 512^2) — the serve sweep
# overlaps the next slab's DMA, so skipping it buys nothing.  Kept
# lowerable (parity + AOT tests) but OFF; see BENCHMARKS.md.
TEX_STREAM_ROWSKIP = False
# ...enabled only past this many word rows (2048^2 maps and up); below
# it the per-row cond is pure overhead (measured, BENCHMARKS.md).
# Module constant so parity tests can drop it.
TEX_ROWSKIP_MIN_ROWS = 4096
# The streamed leaf slab is 2*LEAF_K rows starting at the &~7-aligned
# base, so a leaf fits only if lo (<=7, the alignment remainder) plus
# count (<=LEAF_K) stays inside it — lowering LEAF_K below 7 in
# scene/bvh.py would silently read triangles outside the slab.
assert 7 + LEAF_K <= 2 * LEAF_K, "streamed leaf slab needs LEAF_K >= 7"


# ----------------------------------------------------------------------------
# in-kernel counter RNG: THE SAME function as core/rng.py (no duplicate
# stream to drift) — core.rng routes its u32->f32 cast via int32, which
# Mosaic supports, so the exact library code lowers inside the kernel.
# ----------------------------------------------------------------------------

def _u32(x):
    return x.astype(jnp.uint32)


def _uniform(it_u32, pix_u32, depth, draw: int):
    # ``depth`` may be a traced scalar (fori_loop index); broadcast both
    # scalar counters to planes so every lane hashes its own 4-tuple.
    from ...core import rng as _rng

    return _rng.uniform(
        it_u32,
        pix_u32,
        jnp.full_like(pix_u32, depth).astype(jnp.uint32),
        jnp.full_like(pix_u32, jnp.uint32(draw)),
        xp=jnp,
    )


# ----------------------------------------------------------------------------
# kernel body helpers (all on (SUB,128) planes)
# ----------------------------------------------------------------------------

def _normalize3(x, y, z):
    # 1/sqrt (not rsqrt) for bit-parity with the jnp integrator path
    inv = 1.0 / jnp.sqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _imperfect_specular(m_ex, mrx, mry, mrz, u_s1, u_s2):
    """GPU Gems 3 ch.20 power-cosine sample about the mirror direction
    (README.md:171-185), on (SUB,128) planes."""
    s3 = jnp.float32(SQRT_OF_ONE_THIRD)
    n1 = 1.0 / (m_ex + 1.0)
    cos_t = jnp.power(jnp.maximum(u_s1, 1e-12), n1)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = u_s2 * jnp.float32(TWO_PI)
    use_xm = jnp.abs(mrx) < s3
    use_ym = (~use_xm) & (jnp.abs(mry) < s3)
    nmx = jnp.where(use_xm, 1.0, 0.0)
    nmy = jnp.where(use_ym, 1.0, 0.0)
    nmz = jnp.where(use_xm | use_ym, 0.0, 1.0)
    q1x = mry * nmz - mrz * nmy
    q1y = mrz * nmx - mrx * nmz
    q1z = mrx * nmy - mry * nmx
    q1x, q1y, q1z = _normalize3(q1x, q1y, q1z)
    q2x = mry * q1z - mrz * q1y
    q2y = mrz * q1x - mrx * q1z
    q2z = mrx * q1y - mry * q1x
    q2x, q2y, q2z = _normalize3(q2x, q2y, q2z)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    imx = cos_t * mrx + cp * sin_t * q1x + sp * sin_t * q2x
    imy = cos_t * mry + cp * sin_t * q1y + sp * sin_t * q2y
    imz = cos_t * mrz + cp * sin_t * q1z + sp * sin_t * q2z
    use_imp = m_ex > 0.0
    return (
        jnp.where(use_imp, imx, mrx),
        jnp.where(use_imp, imy, mry),
        jnp.where(use_imp, imz, mrz),
    )


def _bump_perturb(nx, ny, nz, qx, qy, qz, bs, bk,
                  t00, t01, t02, t10, t11, t12, t20, t21, t22):
    """Procedural bump mapping on planes (BUMP extension): perturb the
    shading normal by the analytic gradient of
    h = sin(w qx) sin(w qy) sin(w qz), transformed by the geom's
    inverse-transpose (t** scalars).  Matches integrator._bump_normal."""
    w = bs * jnp.float32(TWO_PI)
    ph = jnp.float32(0.5)  # phase: non-degenerate on cube faces
    sx, cx = jnp.sin(w * qx + ph), jnp.cos(w * qx + ph)
    sy, cy = jnp.sin(w * qy + ph), jnp.cos(w * qy + ph)
    sz, cz = jnp.sin(w * qz + ph), jnp.cos(w * qz + ph)
    gx_o = w * cx * sy * sz
    gy_o = w * sx * cy * sz
    gz_o = w * sx * sy * cz
    gx = t00 * gx_o + t01 * gy_o + t02 * gz_o
    gy = t10 * gx_o + t11 * gy_o + t12 * gz_o
    gz = t20 * gx_o + t21 * gy_o + t22 * gz_o
    gdn = gx * nx + gy * ny + gz * nz
    tx = gx - gdn * nx
    ty = gy - gdn * ny
    tz = gz - gdn * nz
    px, py, pz = _normalize3(nx - bk * tx, ny - bk * ty, nz - bk * tz)
    on = bk > 0.0
    return (
        jnp.where(on, px, nx),
        jnp.where(on, py, ny),
        jnp.where(on, pz, nz),
    )


def _atan_poly(t):
    """Degree-11 odd minimax atan on [0,1] (max err ~1e-7 rad).  Mosaic
    has no atan/atan2/asin lowering; the error is orders below the
    engine-parity thresholds (a 1e-7 UV shift moves bilinear weights by
    ~1e-5 texel)."""
    t2 = t * t
    return t * (0.9999993329
                + t2 * (-0.3332985605
                        + t2 * (0.1994653599
                                + t2 * (-0.1390853351
                                        + t2 * (0.0964200441
                                                + t2 * (-0.0559098861
                                                        + t2 * (0.0218612288
                                                                + t2 * -0.0040540580)))))))


def _atan2(y, x):
    """atan2 on planes via :func:`_atan_poly` + quadrant selects
    (integrator sphere-UV chart, ops/intersect.py _one_sphere)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, jnp.float32(1e-30))
    r = _atan_poly(t)
    r = jnp.where(ay > ax, jnp.float32(0.5 * PI) - r, r)
    r = jnp.where(x < 0.0, jnp.float32(PI) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _asin(t):
    """asin via atan2(t, sqrt(1-t^2)); t pre-clipped to [-1,1]."""
    return _atan2(t, jnp.sqrt(jnp.maximum(1.0 - t * t, 0.0)))


def _tex_fetch_multi(tab, idxs):
    """N texel taps from a u8-packed word table in ONE row sweep.

    ``tab`` (n_rows, LANES) i32: the flat texel stream u8-packed
    four-to-a-word (:func:`_pack_textures` ``packed=True``), words laid
    out row-major 128 to a row — NOT lane-replicated.  ``idxs``:
    sequence of (SUB, LANES) i32 texel indices (e.g. the 4 bilinear
    taps); returns the matching f32 texel planes.

    Hardware constraint (found by AOT-compiling for v5e,
    tools/compile_table.py / tests/test_mosaic_compile.py — Mosaic:
    "Not implemented: Multiple source vregs along gather dimension"):
    ``tpu.dynamic_gather`` only lowers when the source is a SINGLE
    vreg along the gathered dimension, so the round-2 design
    (lane-replicated (HWtot,128) tables, one big sublane gather) never
    compiled for hardware at any useful size.  The working primitive
    unrolls over the table's WORD-ROWS: broadcast each 128-word row to
    all sublanes (static slice), lane-gather it by the raw per-lane
    lane index (axis=1, always one vreg wide along the gather dim),
    and compare-select by the wanted row.  A true two-level (sublane
    then lane) in-vreg gather would cover 8 rows per step, but no
    composition of two single-index gathers computes
    ``chunk[r[s,l], c[s,l]]`` for arbitrary 2-D indices (round-4 probe:
    it compiles and returns the WRONG ROW — ``r`` is applied at the
    gathered lane position, caught by test_textures'
    test_tex_fetch_exact); the row sweep is the honest optimum under
    the single-vreg constraint.  Cost is linear in table size, so this
    multi-tap form amortizes the row broadcast + index prep across all
    N taps of a bilinear (the dominant per-row cost after the gather
    itself), and KTEX_MAX_TEXELS is set at the measured in-kernel /
    planes-engine crossover (BENCHMARKS.md "texture crossover").

    Texels are u8-sourced (scene/textures.py loads PNGs as u8/255), so
    ``f32(u8)/255`` reproduces the f32 value the XLA engines fetch,
    bit-for-bit."""
    n_rows = tab.shape[0]
    tab = jax.lax.stop_gradient(tab)
    shape = idxs[0].shape
    pre = []
    for flat_idx in idxs:
        word_idx = jax.lax.shift_right_logical(flat_idx, 2)
        row_t = jax.lax.shift_right_logical(word_idx, 7)
        lane_t = word_idx & 127
        pre.append((row_t, lane_t,
                    jnp.zeros(shape, jnp.int32)))
    for r in range(n_rows):
        row = jnp.broadcast_to(tab[r:r + 1, :], shape)
        pre = [
            (row_t, lane_t,
             jnp.where(row_t == r,
                       jnp.take_along_axis(row, lane_t, axis=1), word))
            for (row_t, lane_t, word) in pre
        ]
    outs = []
    for flat_idx, (_, _, word) in zip(idxs, pre):
        shift = jax.lax.shift_left(flat_idx & 3, 3)   # 8 * (t % 4)
        byte = jax.lax.shift_right_logical(word, shift) & 0xFF
        outs.append(byte.astype(jnp.float32) / jnp.float32(255.0))
    return outs


def _tex_fetch(tab, flat_idx):
    """One texel tap — see :func:`_tex_fetch_multi`."""
    return _tex_fetch_multi(tab, (flat_idx,))[0]


def _make_tracer(cam, mats, gmat, tri, lights, *, geom_types, width,
                 height, depth, n_tris=0, features=(True,) * 7,
                 nee_lights=(), grad_mats=(), early_exit=False,
                 pix_u=None, fx=None, fy=None, valid=None,
                 nodes=None, bvh_meta=(), rr_mode=False,
                 tex_geom=(), btex_geom=(), texr=None, texg=None,
                 texb=None, tex_fetch=None, bvh_grad=False,
                 stream=None, tex_stream=None, subtile_ok=True):
    """Builds the per-sample tile tracer ``trace_one(it_u, counts_acc)
    -> (final state, counts_acc)`` for one (SUB, LANES) tile of rays.

    ``cam``/``mats``/``gmat``/``tri``/``lights`` may be Pallas VMEM refs
    (the forward kernel — indexed reads stay zero-copy) or loaded jnp
    arrays: the reverse-mode kernel loads the tables once and lets
    ``jax.vjp`` differentiate straight through this function, so the
    SAME trace code serves forward and backward (no hand-written
    adjoint to drift).

    The returned ``trace_one`` runs the depth loop as ``fori_loop``
    (cheapest to compile) with per-bounce live-count metrics; its
    ``.init_state`` / ``.bounce`` attributes expose the pieces the
    reverse sweep (:func:`_vjp_kernel`) differentiates bounce-by-bounce.
    """
    (has_glass, has_imperfect, has_dof, has_motion,
     has_checker, has_bump, has_sss) = features
    nee = bool(nee_lights)
    grad_mode = bool(grad_mats)   # grad_mats = (M, geom->material map)
    n_mats = grad_mats[0] if grad_mode else 0
    mat_of_geom = grad_mats[1:] if grad_mode else ()
    tri_ref = tri        # inner code keeps the _ref names (ref or value)
    lights_ref = lights
    nodes_ref = nodes    # BVH node table (scene/bvh.py layout)
    # image textures (TEXTURE extension): tex_geom is the static
    # per-geom (flat_offset, H, W) chart into the lane-replicated
    # per-channel texture tables ((-1,0,0) = untextured geom)
    tex_mode = bool(tex_geom) and any(t[0] >= 0 for t in tex_geom)
    btex_mode = bool(btex_geom) and any(t[0] >= 0 for t in btex_geom)
    # texel tap: the Mosaic sublane dynamic-gather by default; the
    # fused-plane XLA engine (render/plane_engine.py) passes XLA's
    # native unpadded gather — identical output, no (HWtot, LANES)
    # index materialization
    if tex_fetch is None:
        tex_fetch = _tex_fetch
        # kernel path: one row sweep serves all taps of a bilinear
        tex_fetch_multi = _tex_fetch_multi
    else:
        # XLA engines: native gather per tap, nothing to amortize
        tex_fetch_multi = (
            lambda tab, idxs, _f=tex_fetch: [_f(tab, i) for i in idxs]
        )

    if tex_stream is not None:
        t_slabs, t_sems = tex_stream
        # row-skip pays only when taps are SPARSE in slab rows: at
        # ≤1024² (≤2048 word rows) most slab rows carry a tap and the
        # per-row scalar cond is pure overhead (measured 535→752
        # ms/iter at 512²); at 2048² (8192 rows) the skip wins 1.26x
        # (975 vs 1230).  Static threshold at trace time.
        _rowskip = TEX_STREAM_ROWSKIP and \
            texr.shape[0] > TEX_ROWSKIP_MIN_ROWS

        def fetch3(idxs):
            """All-channel texel taps from HBM-resident u8-packed
            tables via a need-driven slab-serving while_loop (the
            KTEX_STREAM_TEXELS design): each iteration DMAs, per
            channel, the aligned 8-row slab holding the MINIMUM
            still-unserved word-row among the tile's taps, then
            serves every tap landing in it with the proven per-row
            lane-gather.  Terminates after exactly as many iterations
            as distinct slabs the taps touch; compile cost is one
            loop body regardless of table size.  Returns
            [r_taps, g_taps, b_taps], bit-identical to the resident
            row sweep (tests/test_textures.py stream parity)."""
            shape = idxs[0].shape
            n_t = len(idxs)
            rows_t, lanes_t, shifts = [], [], []
            for fi in idxs:
                w = jax.lax.shift_right_logical(fi, 2)
                rows_t.append(jax.lax.shift_right_logical(w, 7))
                lanes_t.append(w & 127)
                shifts.append(jax.lax.shift_left(fi & 3, 3))
            big = jnp.int32(2 ** 30)
            # unserved masks carry as int32 0/1 — i1 vectors in a
            # while_loop carry fail Mosaic's scf.yield legalization
            init = (
                tuple(jnp.zeros(shape, jnp.int32)
                      for _ in range(3 * n_t)),
                tuple(jnp.ones(shape, jnp.int32) for _ in range(n_t)),
            )

            def cond(c):
                any_un = None
                for u in c[1]:
                    a = jnp.any(u > 0)
                    any_un = a if any_un is None else (any_un | a)
                return any_un

            def body(c):
                words, uns = list(c[0]), list(c[1])
                rmin = big
                for u, rt in zip(uns, rows_t):
                    rmin = jnp.minimum(
                        rmin, jnp.min(jnp.where(u > 0, rt, big))
                    )
                ra = rmin & ~7
                cps = [
                    pltpu.make_async_copy(
                        tab.at[pl.ds(ra, 8)], slab, sem
                    )
                    for tab, slab, sem in zip(
                        (texr, texg, texb), t_slabs, t_sems
                    )
                ]
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
                for j in range(8):
                    rowv = [
                        jnp.broadcast_to(slab[j:j + 1, :], shape)
                        for slab in t_slabs
                    ]
                    ms = [(uns[t] > 0) & (rows_t[t] == ra + j)
                          for t in range(n_t)]
                    anym = ms[0]
                    for m in ms[1:]:
                        anym = anym | m

                    # row-skip (round 5): when taps are scattered,
                    # most of a slab's 8 rows serve nothing — the
                    # lane gathers are the expensive part, so skip
                    # them behind one scalar any-test per row.
                    # Bit-identical: the skipped serve is a no-op.
                    def serve(c, rowv=rowv, ms=ms):
                        w, u = list(c[0]), list(c[1])
                        for t in range(n_t):
                            for ch in range(3):
                                g = jnp.take_along_axis(
                                    rowv[ch], lanes_t[t], axis=1
                                )
                                k = ch * n_t + t
                                w[k] = jnp.where(ms[t], g, w[k])
                            u[t] = jnp.where(ms[t], 0, u[t])
                        return tuple(w), tuple(u)

                    if _rowskip:
                        words_uns = jax.lax.cond(
                            jnp.any(anym), serve, lambda c: c,
                            (tuple(words), tuple(uns)),
                        )
                    else:
                        words_uns = serve((tuple(words), tuple(uns)))
                    words = list(words_uns[0])
                    uns = list(words_uns[1])
                return tuple(words), tuple(uns)

            words, _ = jax.lax.while_loop(cond, body, init)
            outs = []
            for ch in range(3):
                taps = []
                for t in range(n_t):
                    byte = jax.lax.shift_right_logical(
                        words[ch * n_t + t], shifts[t]
                    ) & 0xFF
                    taps.append(
                        byte.astype(jnp.float32) / jnp.float32(255.0)
                    )
                outs.append(taps)
            return outs
    else:
        def fetch3(idxs):
            return [tex_fetch_multi(tab, idxs)
                    for tab in (texr, texg, texb)]

    c = lambda k: cam[0, k]
    pos_x, pos_y, pos_z = c(0), c(1), c(2)
    v_x, v_y, v_z = c(3), c(4), c(5)
    r_x, r_y, r_z = c(6), c(7), c(8)
    u_x, u_y, u_z = c(9), c(10), c(11)
    tan_x, tan_y = c(12), c(13)
    aperture, focal = c(14), c(15)

    def raygen_state(it_u):
        ujx = _uniform(it_u, pix_u, 0, Draw.AA_X)
        ujy = _uniform(it_u, pix_u, 0, Draw.AA_Y)
        sx = (fx + ujx) * jnp.float32(2.0 / width) - 1.0
        sy = (fy + ujy) * jnp.float32(2.0 / height) - 1.0
        dx = v_x - r_x * (tan_x * sx) - u_x * (tan_y * sy)
        dy = v_y - r_y * (tan_x * sx) - u_y * (tan_y * sy)
        dz = v_z - r_z * (tan_x * sx) - u_z * (tan_y * sy)
        dx, dy, dz = _normalize3(dx, dy, dz)
        ox = jnp.full((SUB, LANES), pos_x, jnp.float32)
        oy = jnp.full((SUB, LANES), pos_y, jnp.float32)
        oz = jnp.full((SUB, LANES), pos_z, jnp.float32)

        if has_dof:
            ox, oy, oz, dx, dy, dz = dof_offsets(
                it_u, ox, oy, oz, dx, dy, dz
            )

        st = dict(
            ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
            tr=jnp.ones((SUB, LANES), jnp.float32),
            tg=jnp.ones((SUB, LANES), jnp.float32),
            tb=jnp.ones((SUB, LANES), jnp.float32),
            rr=jnp.zeros((SUB, LANES), jnp.float32),
            rg=jnp.zeros((SUB, LANES), jnp.float32),
            rb=jnp.zeros((SUB, LANES), jnp.float32),
            # f32 mask, not bool: Mosaic can't round-trip i1 vectors
            # through lax.cond-carried state
            live=jnp.where(valid, 1.0, 0.0).astype(jnp.float32),
        )
        if grad_mode:
            # packed factor counters, 2 planes per material instead of
            # 5 (compile-time: grad-mode carry state across the depth
            # fori_loop was the dominant cost, VERDICT #7).  c_a packs
            # 4 counters as base-64 digits of an integer-valued f32 —
            # exact while every counter < 64 (counters increment at
            # most once per bounce; material_grads_pallas guards
            # depth <= 63): c_col + 64 c_spec + 4096 c_emit +
            # 262144 c_dp.  c_b = c_d1p.
            for mm in range(n_mats):
                st[f"c_a_{mm}"] = jnp.zeros((SUB, LANES), jnp.float32)
                st[f"c_b_{mm}"] = jnp.zeros((SUB, LANES), jnp.float32)
        return st

    def dof_offsets(it_u, ox, oy, oz, dx, dy, dz):
        u1 = _uniform(it_u, pix_u, 0, Draw.DOF_U)
        u2 = _uniform(it_u, pix_u, 0, Draw.DOF_V)
        r_lens = aperture * jnp.sqrt(u1)
        theta = u2 * jnp.float32(TWO_PI)
        off_x = r_x * (r_lens * jnp.cos(theta)) \
            + u_x * (r_lens * jnp.sin(theta))
        off_y = r_y * (r_lens * jnp.cos(theta)) \
            + u_y * (r_lens * jnp.sin(theta))
        off_z = r_z * (r_lens * jnp.cos(theta)) \
            + u_z * (r_lens * jnp.sin(theta))
        cos_v = dx * v_x + dy * v_y + dz * v_z
        ft = focal / jnp.maximum(cos_v, 1e-6)
        pfx, pfy, pfz = ox + dx * ft, oy + dy * ft, oz + dz * ft
        ndx, ndy, ndz = _normalize3(pfx - (ox + off_x), pfy - (oy + off_y),
                                    pfz - (oz + off_z))
        use_dof = aperture > 0.0
        ox = jnp.where(use_dof, ox + off_x, ox)
        oy = jnp.where(use_dof, oy + off_y, oy)
        oz = jnp.where(use_dof, oz + off_z, oz)
        dx = jnp.where(use_dof, ndx, dx)
        dy = jnp.where(use_dof, ndy, dy)
        dz = jnp.where(use_dof, ndz, dz)
        return ox, oy, oz, dx, dy, dz

    def trace_nearest(ox, oy, oz, dx, dy, dz, tpl, live=None,
                      want_tex=False, winners=None, collect=None,
                      shadow=False):
        """Nearest hit over unrolled geoms (and VMEM triangles) for
        arbitrary ray planes — used for both path rays and NEE shadow
        rays.  Returns plane dict.  ``live`` (optional f32 bool plane)
        only narrows BVH traversal: dead lanes stop pulling nodes into
        the any-lane test (their best entries are unused by shade).

        ``shadow=True`` (NEE visibility): the fold keeps only
        ``dist``/``gidx``/``hit`` — the three planes ``_nee_add``'s
        nearest-is-the-light test reads — and skips all normal,
        material, bump, checker and UV work per geom.  The distance
        math and the ``dist < best`` winner predicate are untouched,
        so visibility is bit-identical to a full trace (round-4 NEE
        pass; the reference's shadow rays are full intersections,
        spec README.md:112-114, but nothing downstream reads more
        than the winner's identity)."""
        tex_here = tex_mode and want_tex and not shadow
        btex_here = btex_mode and want_tex and not shadow
        # mesh bump mapping: any MESH geom with a BUMPTEX chart means
        # the fold also carries the winner triangle's UV tangent
        # frames (grad_u, grad_v — packed at tri cols 18..23)
        btex_mesh_here = btex_here and any(
            btex_geom[g][0] >= 0 and geom_types[g] == T.MESH
            for g in range(len(geom_types))
        )
        TANG_KEYS = ("bgux", "bguy", "bguz", "bgvx", "bgvy", "bgvz")
        big = jnp.float32(NO_HIT)
        if shadow:
            best = dict(
                dist=jnp.full((SUB, LANES), big, jnp.float32),
                gidx=jnp.full((SUB, LANES), -1.0, jnp.float32),
            )
        else:
            best = dict(
                dist=jnp.full((SUB, LANES), big, jnp.float32),
                px=ox, py=oy, pz=oz,
                nx=jnp.zeros((SUB, LANES), jnp.float32),
                ny=jnp.zeros((SUB, LANES), jnp.float32),
                nz=jnp.zeros((SUB, LANES), jnp.float32),
                outside=jnp.zeros((SUB, LANES), jnp.float32),  # f32 mask
                # material planes selected during the fold
                mc_r=jnp.zeros((SUB, LANES), jnp.float32),
                mc_g=jnp.zeros((SUB, LANES), jnp.float32),
                mc_b=jnp.zeros((SUB, LANES), jnp.float32),
                ms_r=jnp.zeros((SUB, LANES), jnp.float32),
                ms_g=jnp.zeros((SUB, LANES), jnp.float32),
                ms_b=jnp.zeros((SUB, LANES), jnp.float32),
                m_ex=jnp.zeros((SUB, LANES), jnp.float32),
                m_refl=jnp.zeros((SUB, LANES), jnp.float32),
                m_refr=jnp.zeros((SUB, LANES), jnp.float32),
                m_ior=jnp.zeros((SUB, LANES), jnp.float32),
                m_emit=jnp.zeros((SUB, LANES), jnp.float32),
                gidx=jnp.full((SUB, LANES), -1.0, jnp.float32),
                push=jnp.zeros((SUB, LANES), jnp.float32),
            )
        if tex_here:
            # winner texture chart: flat table offset (-1 = none) + the
            # texture's (H, W) + hit UV — sampled ONCE after the fold.
            # With CHECKER on the same material the odd cells REPLACE
            # the albedo (integrator order: texture multiplies, checker
            # then overrides — integrator._bounce:183-199), so the odd
            # mask rides along to gate the texel multiply off.
            best["t_off"] = jnp.full((SUB, LANES), -1.0, jnp.float32)
            best["t_h"] = jnp.zeros((SUB, LANES), jnp.float32)
            best["t_w"] = jnp.zeros((SUB, LANES), jnp.float32)
            if has_checker:
                best["t_chk"] = jnp.zeros((SUB, LANES), jnp.float32)
        if tex_here or btex_here:
            best["u"] = jnp.zeros((SUB, LANES), jnp.float32)
            best["v"] = jnp.zeros((SUB, LANES), jnp.float32)
        if btex_here:
            # winner's object-space hit point (the BUMPTEX chart
            # gradients need it; static per-geom data folds by gidx)
            best["qx"] = jnp.zeros((SUB, LANES), jnp.float32)
            best["qy"] = jnp.zeros((SUB, LANES), jnp.float32)
            best["qz"] = jnp.zeros((SUB, LANES), jnp.float32)
        if btex_mesh_here:
            for k_t in TANG_KEYS:
                best[k_t] = jnp.zeros((SUB, LANES), jnp.float32)

        for g, gtype in enumerate(geom_types):
            if gtype == T.MESH:
                continue
            m = lambda k: gmat[g, k]
            # motion blur: shift the ray origin back by t * velocity
            # (translation-only motion; ops/intersect.py)
            if has_motion:
                gox = ox - tpl * m(33)
                goy = oy - tpl * m(34)
                goz = oz - tpl * m(35)
            else:
                gox, goy, goz = ox, oy, oz
            # object-space ray (explicit mul-adds; see ops/intersect.py
            # on why never a matmul)
            i00, i01, i02, i03 = m(12), m(13), m(14), m(15)
            i10, i11, i12, i13 = m(16), m(17), m(18), m(19)
            i20, i21, i22, i23 = m(20), m(21), m(22), m(23)
            rox = i00 * gox + i01 * goy + i02 * goz + i03
            roy = i10 * gox + i11 * goy + i12 * goz + i13
            roz = i20 * gox + i21 * goy + i22 * goz + i23
            rdx = i00 * dx + i01 * dy + i02 * dz
            rdy = i10 * dx + i11 * dy + i12 * dz
            rdz = i20 * dx + i21 * dy + i22 * dz
            rdx, rdy, rdz = _normalize3(rdx, rdy, rdz)

            if gtype == T.SPHERE:
                vdd = rox * rdx + roy * rdy + roz * rdz
                rad2 = vdd * vdd - (
                    rox * rox + roy * roy + roz * roz - 0.25
                )
                has_root = rad2 >= 0
                sq = jnp.sqrt(jnp.where(has_root, rad2, 1.0))
                t1 = -vdd + sq
                t2 = -vdd - sq
                both_neg = (t1 < 0) & (t2 < 0)
                both_pos = (t1 > 0) & (t2 > 0)
                t_use = jnp.where(
                    both_pos, jnp.minimum(t1, t2), jnp.maximum(t1, t2)
                )
                hit = has_root & ~both_neg
                out_raw = both_pos
                tofs = t_use - jnp.float32(RAY_OFFSET)
                qx, qy, qz = rox + tofs * rdx, roy + tofs * rdy, roz + tofs * rdz
                if not shadow:
                    # normal via invT (rows 24..32), flipped inside
                    nx0 = m(24) * qx + m(25) * qy + m(26) * qz
                    ny0 = m(27) * qx + m(28) * qy + m(29) * qz
                    nz0 = m(30) * qx + m(31) * qy + m(32) * qz
                    nx0, ny0, nz0 = _normalize3(nx0, ny0, nz0)
                    flip = jnp.where(out_raw, 1.0, -1.0)
                    nx0, ny0, nz0 = nx0 * flip, ny0 * flip, nz0 * flip
                    outside = hit & out_raw
            else:  # CUBE: slab test, sequential-axis semantics
                tmin = jnp.full((SUB, LANES), -1e38, jnp.float32)
                tmax = jnp.full((SUB, LANES), 1e38, jnp.float32)
                nmin = [jnp.zeros((SUB, LANES), jnp.float32)] * 3
                nmax = [jnp.zeros((SUB, LANES), jnp.float32)] * 3
                nan_axis = jnp.zeros((SUB, LANES), jnp.bool_)
                for ax, (qo, qd) in enumerate(
                    [(rox, rdx), (roy, rdy), (roz, rdz)]
                ):
                    t1 = (-0.5 - qo) / qd
                    t2 = (0.5 - qo) / qd
                    ta = jnp.minimum(t1, t2)
                    tb = jnp.maximum(t1, t2)
                    # 0/0 slabs (origin exactly on a face plane with a
                    # zero direction component) produce NaN; _one_box's
                    # min() propagates it into tmax -> miss, so match
                    nan_axis = nan_axis | jnp.isnan(t1) | jnp.isnan(t2)
                    upd_min = (ta > 0) & (ta > tmin)
                    tmin = jnp.where(upd_min, ta, tmin)
                    upd_max = tb < tmax
                    tmax = jnp.where(upd_max, tb, tmax)
                    if not shadow:  # face-normal tracking
                        sign = jnp.where(t2 < t1, 1.0, -1.0)
                        nmin = [
                            jnp.where(upd_min, sign if k == ax else 0.0,
                                      nmin[k])
                            for k in range(3)
                        ]
                        nmax = [
                            jnp.where(upd_max, sign if k == ax else 0.0,
                                      nmax[k])
                            for k in range(3)
                        ]
                hit = (tmax >= tmin) & (tmax > 0) & ~nan_axis
                inside = tmin <= 0
                t_use = jnp.where(inside, tmax, tmin)
                tofs = t_use - jnp.float32(RAY_OFFSET)
                qx, qy, qz = rox + tofs * rdx, roy + tofs * rdy, roz + tofs * rdz
                if not shadow:
                    nox = jnp.where(inside, nmax[0], nmin[0])
                    noy = jnp.where(inside, nmax[1], nmin[1])
                    noz = jnp.where(inside, nmax[2], nmin[2])
                    outside = hit & ~inside
                    # quirk: box normal via the FORWARD transform
                    # (src/intersections.h:85); fwd rows are 0..12
                    nx0 = m(0) * nox + m(1) * noy + m(2) * noz
                    ny0 = m(4) * nox + m(5) * noy + m(6) * noz
                    nz0 = m(8) * nox + m(9) * noy + m(10) * noz
                    nx0, ny0, nz0 = _normalize3(nx0, ny0, nz0)

            # world point + world distance (fwd rows 0..12)
            pxw = m(0) * qx + m(1) * qy + m(2) * qz + m(3)
            pyw = m(4) * qx + m(5) * qy + m(6) * qz + m(7)
            pzw = m(8) * qx + m(9) * qy + m(10) * qz + m(11)
            ddx, ddy, ddz = gox - pxw, goy - pyw, goz - pzw
            if has_motion:
                # hit point back to shutter time t on the moved object
                pxw = pxw + tpl * m(33)
                pyw = pyw + tpl * m(34)
                pzw = pzw + tpl * m(35)
            dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
            dist = jnp.where(hit, dist, jnp.float32(NO_HIT))

            better = dist < best["dist"]
            mt = lambda k: mats[g, k]
            sel = lambda a, b: jnp.where(better, a, b)
            if shadow:
                best = dict(
                    dist=sel(dist, best["dist"]),
                    gidx=sel(jnp.full((SUB, LANES), float(g),
                                      jnp.float32), best["gidx"]),
                )
                continue
            if has_bump:
                nx0, ny0, nz0 = _bump_perturb(
                    nx0, ny0, nz0, qx, qy, qz, mt(15), mt(16),
                    m(24), m(25), m(26), m(27), m(28), m(29),
                    m(30), m(31), m(32),
                )
            if has_checker:
                # object-space checker albedo (CHECKER extension);
                # phase offset matches integrator._checker_albedo
                cs = mt(11)
                ph = jnp.float32(0.015625)
                cells = (jnp.floor(qx * cs - ph) + jnp.floor(qy * cs - ph)
                         + jnp.floor(qz * cs - ph))
                odd = (cs > 0.0) & (cells - 2.0 * jnp.floor(cells * 0.5)
                                    >= 1.0)
                al_r = jnp.where(odd, mt(12), mt(0))
                al_g = jnp.where(odd, mt(13), mt(1))
                al_b = jnp.where(odd, mt(14), mt(2))
            else:
                al_r = jnp.full((SUB, LANES), mt(0), jnp.float32)
                al_g = jnp.full((SUB, LANES), mt(1), jnp.float32)
                al_b = jnp.full((SUB, LANES), mt(2), jnp.float32)
            upd = dict(
                dist=sel(dist, best["dist"]),
                px=sel(pxw, best["px"]), py=sel(pyw, best["py"]),
                pz=sel(pzw, best["pz"]),
                nx=sel(nx0, best["nx"]), ny=sel(ny0, best["ny"]),
                nz=sel(nz0, best["nz"]),
                outside=sel(jnp.where(outside, 1.0, 0.0).astype(jnp.float32),
                            best["outside"]),
                gidx=sel(jnp.full((SUB, LANES), float(g), jnp.float32),
                         best["gidx"]),
                push=sel(jnp.full((SUB, LANES), gmat[g, 36],
                                  jnp.float32), best["push"]),
                mc_r=sel(al_r, best["mc_r"]), mc_g=sel(al_g, best["mc_g"]),
                mc_b=sel(al_b, best["mc_b"]),
                ms_r=sel(mt(3), best["ms_r"]), ms_g=sel(mt(4), best["ms_g"]),
                ms_b=sel(mt(5), best["ms_b"]),
                m_ex=sel(mt(6), best["m_ex"]),
                m_refl=sel(mt(7), best["m_refl"]),
                m_refr=sel(mt(8), best["m_refr"]),
                m_ior=sel(mt(9), best["m_ior"]),
                m_emit=sel(mt(10), best["m_emit"]),
            )
            if tex_here:
                g_off, g_h, g_w = tex_geom[g]
                if has_checker:
                    upd["t_chk"] = sel(
                        jnp.where(odd, 1.0, 0.0).astype(jnp.float32),
                        best["t_chk"],
                    )
                upd["t_off"] = sel(
                    jnp.full((SUB, LANES), float(g_off), jnp.float32),
                    best["t_off"],
                )
                upd["t_h"] = sel(
                    jnp.full((SUB, LANES), float(g_h), jnp.float32),
                    best["t_h"],
                )
                upd["t_w"] = sel(
                    jnp.full((SUB, LANES), float(g_w), jnp.float32),
                    best["t_w"],
                )
            if tex_here or btex_here:
                a_on = tex_here and tex_geom[g][0] >= 0
                b_on = btex_here and btex_geom[g][0] >= 0
                if a_on or b_on:
                    # parametric UV chart (ops/intersect.py
                    # _one_sphere/_one_box want_uv semantics)
                    if gtype == T.SPHERE:
                        uu = 0.5 + _atan2(qz, qx) * jnp.float32(
                            1.0 / TWO_PI
                        )
                        vv_t = 0.5 + _asin(
                            jnp.clip(2.0 * qy, -1.0, 1.0)
                        ) * jnp.float32(1.0 / PI)
                    else:  # CUBE: face-planar (dominant object normal)
                        ax0 = jnp.abs(nox) > 0.0
                        ax1 = jnp.abs(noy) > 0.0
                        uu = jnp.where(ax0, qz, qx) + 0.5
                        vv_t = jnp.where(ax1, qz, qy) + 0.5
                else:
                    uu = vv_t = jnp.zeros((SUB, LANES), jnp.float32)
                upd["u"] = sel(uu, best["u"])
                upd["v"] = sel(vv_t, best["v"])
            if btex_here:
                upd["qx"] = sel(qx, best["qx"])
                upd["qy"] = sel(qy, best["qy"])
                upd["qz"] = sel(qz, best["qz"])
            if btex_mesh_here:
                # primitive winners have analytic charts — pass the
                # mesh tangent planes through (unused on these lanes)
                for k_t in TANG_KEYS:
                    upd[k_t] = best[k_t]
            best = upd
        if n_tris and not bvh_meta:
            def tri_body(t, best):
                m = lambda k: tri_ref[t, k]
                if has_motion:
                    gox = ox - tpl * m(56)
                    goy = oy - tpl * m(57)
                    goz = oz - tpl * m(58)
                else:
                    gox, goy, goz = ox, oy, oz
                rox = m(0) * gox + m(1) * goy + m(2) * goz + m(3)
                roy = m(4) * gox + m(5) * goy + m(6) * goz + m(7)
                roz = m(8) * gox + m(9) * goy + m(10) * goz + m(11)
                rdx = m(0) * dx + m(1) * dy + m(2) * dz
                rdy = m(4) * dx + m(5) * dy + m(6) * dz
                rdz = m(8) * dx + m(9) * dy + m(10) * dz
                rdx, rdy, rdz = _normalize3(rdx, rdy, rdz)

                v0x, v0y, v0z = m(33), m(34), m(35)
                e1x, e1y, e1z = m(36), m(37), m(38)
                e2x, e2y, e2z = m(39), m(40), m(41)
                # pvec = rd x e2
                pvx = rdy * e2z - rdz * e2y
                pvy = rdz * e2x - rdx * e2z
                pvz = rdx * e2y - rdy * e2x
                det = pvx * e1x + pvy * e1y + pvz * e1z
                ok = jnp.abs(det) > 1e-12
                inv_det = 1.0 / jnp.where(ok, det, 1.0)
                tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                # qvec = tvec x e1
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                vv = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
                tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                hit = ok & (u >= 0.0) & (vv >= 0.0) & (u + vv <= 1.0) \
                    & (tt > 0.0)
                tofs = tt - jnp.float32(RAY_OFFSET)
                qx = rox + tofs * rdx
                qy = roy + tofs * rdy
                qz = roz + tofs * rdz
                pxw = m(12) * qx + m(13) * qy + m(14) * qz + m(15)
                pyw = m(16) * qx + m(17) * qy + m(18) * qz + m(19)
                pzw = m(20) * qx + m(21) * qy + m(22) * qz + m(23)
                if has_motion:
                    dtx = gox - pxw
                    dty = goy - pyw
                    dtz = goz - pzw
                    pxw = pxw + tpl * m(56)
                    pyw = pyw + tpl * m(57)
                    pzw = pzw + tpl * m(58)
                if not shadow:
                    # ray-facing object normal, then invT to world
                    nox, noy, noz = m(42), m(43), m(44)
                    face = rdx * nox + rdy * noy + rdz * noz
                    flip = jnp.where(face < 0.0, 1.0, -1.0)
                    nx0 = (m(24) * nox + m(25) * noy + m(26) * noz) * flip
                    ny0 = (m(27) * nox + m(28) * noy + m(29) * noz) * flip
                    nz0 = (m(30) * nox + m(31) * noy + m(32) * noz) * flip
                    nx0, ny0, nz0 = _normalize3(nx0, ny0, nz0)
                    outside = hit & (face < 0.0)
                if has_motion:
                    ddx, ddy, ddz = dtx, dty, dtz
                else:
                    ddx, ddy, ddz = ox - pxw, oy - pyw, oz - pzw
                dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
                dist = jnp.where(hit, dist, jnp.float32(NO_HIT))

                better = dist < best["dist"]
                sel = lambda a, b: jnp.where(better, a, b)
                if shadow:
                    return dict(
                        dist=sel(dist, best["dist"]),
                        gidx=sel(jnp.full((SUB, LANES), m(65),
                                          jnp.float32), best["gidx"]),
                    )
                if has_bump:
                    nx0, ny0, nz0 = _bump_perturb(
                        nx0, ny0, nz0, qx, qy, qz, m(63), m(64),
                        m(24), m(25), m(26), m(27), m(28), m(29),
                        m(30), m(31), m(32),
                    )
                if has_checker:
                    cs = m(59)
                    ph = jnp.float32(0.015625)
                    cells = (jnp.floor(qx * cs - ph)
                             + jnp.floor(qy * cs - ph)
                             + jnp.floor(qz * cs - ph))
                    odd = (cs > 0.0) & (
                        cells - 2.0 * jnp.floor(cells * 0.5) >= 1.0
                    )
                    al_r = jnp.where(odd, m(60), m(45))
                    al_g = jnp.where(odd, m(61), m(46))
                    al_b = jnp.where(odd, m(62), m(47))
                else:
                    al_r = jnp.full((SUB, LANES), m(45), jnp.float32)
                    al_g = jnp.full((SUB, LANES), m(46), jnp.float32)
                    al_b = jnp.full((SUB, LANES), m(47), jnp.float32)
                out_t = dict(
                    dist=sel(dist, best["dist"]),
                    px=sel(pxw, best["px"]), py=sel(pyw, best["py"]),
                    pz=sel(pzw, best["pz"]),
                    nx=sel(nx0, best["nx"]), ny=sel(ny0, best["ny"]),
                    nz=sel(nz0, best["nz"]),
                    outside=sel(
                        jnp.where(outside, 1.0, 0.0).astype(jnp.float32),
                        best["outside"],
                    ),
                    gidx=sel(jnp.full((SUB, LANES), m(65), jnp.float32),
                             best["gidx"]),
                    push=sel(jnp.full((SUB, LANES), m(66), jnp.float32),
                             best["push"]),
                    mc_r=sel(al_r, best["mc_r"]),
                    mc_g=sel(al_g, best["mc_g"]),
                    mc_b=sel(al_b, best["mc_b"]),
                    ms_r=sel(m(48), best["ms_r"]),
                    ms_g=sel(m(49), best["ms_g"]),
                    ms_b=sel(m(50), best["ms_b"]),
                    m_ex=sel(m(51), best["m_ex"]),
                    m_refl=sel(m(52), best["m_refl"]),
                    m_refr=sel(m(53), best["m_refr"]),
                    m_ior=sel(m(54), best["m_ior"]),
                    m_emit=sel(m(55), best["m_emit"]),
                )
                if tex_here:
                    # per-tri chart cols 67..69, vt corners 70..75
                    # (barycentric interpolation, _one_triangle uv3)
                    if has_checker:
                        out_t["t_chk"] = sel(
                            jnp.where(odd, 1.0, 0.0)
                            .astype(jnp.float32),
                            best["t_chk"],
                        )
                    out_t["t_off"] = sel(
                        jnp.full((SUB, LANES), m(67), jnp.float32),
                        best["t_off"],
                    )
                    out_t["t_h"] = sel(
                        jnp.full((SUB, LANES), m(68), jnp.float32),
                        best["t_h"],
                    )
                    out_t["t_w"] = sel(
                        jnp.full((SUB, LANES), m(69), jnp.float32),
                        best["t_w"],
                    )
                if tex_here:
                    bw = 1.0 - u - vv
                    out_t["u"] = sel(
                        bw * m(70) + u * m(72) + vv * m(74),
                        best["u"],
                    )
                    out_t["v"] = sel(
                        bw * m(71) + u * m(73) + vv * m(75),
                        best["v"],
                    )
                elif btex_here:
                    # mesh winners are never bumptexed (_btex_spec
                    # charts them (-1,0,0)) so their u/v/q values are
                    # never read — pass the carry through unchanged,
                    # zero selects in the hot per-triangle loop
                    out_t["u"] = best["u"]
                    out_t["v"] = best["v"]
                if btex_here:
                    out_t["qx"] = best["qx"]
                    out_t["qy"] = best["qy"]
                    out_t["qz"] = best["qz"]
                if btex_mesh_here:
                    # legacy linear-fold path (stripped-BVH oracle):
                    # mesh bump inert — tang planes pass through
                    for k_t in TANG_KEYS:
                        out_t[k_t] = best[k_t]
                return out_t

            best = jax.lax.fori_loop(0, n_tris, tri_body, best)

        if n_tris and bvh_meta:
            # BVH engine: one skip-link traversal per mesh geom
            # (scene/bvh.py).  The whole (SUB, LANES) tile walks a
            # single coherent node sequence — a scalar cursor in a
            # while_loop, advanced to the first child on any-lane AABB
            # hit and to the skip link otherwise — so control flow is
            # uniform (the TPU has no per-lane divergence) and pruning
            # is the vectorized slab test itself.  Everything static
            # per geom (transforms, material, checker/bump) loads like
            # the primitive branches above; the leaf fold is Moller-
            # Trumbore on compact (T,16) rows, identical math to
            # tri_body.
            #
            # ``bvh_grad`` (the autodiff engines): lax.while_loop has
            # no transpose rule, so the traversal runs on DETACHED
            # values and records only the winning triangle row per
            # lane; the hit is then recomputed differentiably from
            # gathered winner rows (one Moller-Trumbore per lane,
            # through the same mt_shade_fold ops — bit-identical
            # forward).  The winner is piecewise-constant in the scene
            # parameters, so this is exact wherever the detached
            # estimator is (render/diff.py docstring), and it gives
            # mesh scenes reverse-mode gradients at traversal speed
            # instead of the O(T) linear fold (reference mesh extra,
            # README.md:113-117 + BASELINE differentiability).
            for (g, node_off, n_nodes_g, tri_off, _ntg) in bvh_meta:
                m = lambda k: gmat[g, k]
                mt = lambda k: mats[g, k]
                if has_motion:
                    gox = ox - tpl * m(33)
                    goy = oy - tpl * m(34)
                    goz = oz - tpl * m(35)
                else:
                    gox, goy, goz = ox, oy, oz
                i00, i01, i02, i03 = m(12), m(13), m(14), m(15)
                i10, i11, i12, i13 = m(16), m(17), m(18), m(19)
                i20, i21, i22, i23 = m(20), m(21), m(22), m(23)
                rox = i00 * gox + i01 * goy + i02 * goz + i03
                roy = i10 * gox + i11 * goy + i12 * goz + i13
                roz = i20 * gox + i21 * goy + i22 * goz + i23
                rdx = i00 * dx + i01 * dy + i02 * dz
                rdy = i10 * dx + i11 * dy + i12 * dz
                rdz = i20 * dx + i21 * dy + i22 * dz
                rdx, rdy, rdz = _normalize3(rdx, rdy, rdz)
                irdx, irdy, irdz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz

                # exact object-space pruning bound from the current
                # world-space winner: dist = (t - RAY_OFFSET) * |L rd|
                # with L the linear part of fwd (monotonic in t), so
                # t_bound = dist / |L rd| + RAY_OFFSET (+ slack).
                wdx = m(0) * rdx + m(1) * rdy + m(2) * rdz
                wdy = m(4) * rdx + m(5) * rdy + m(6) * rdz
                wdz = m(8) * rdx + m(9) * rdy + m(10) * rdz
                s_ray = jnp.sqrt(wdx * wdx + wdy * wdy + wdz * wdz)
                t0 = (best["dist"] / jnp.maximum(s_ray, 1e-20)
                      * jnp.float32(1.0 + 1e-5)
                      + jnp.float32(RAY_OFFSET) + jnp.float32(1e-4))

                def slab(mn, mx, o, ird):
                    t1 = (mn - o) * ird
                    t2 = (mx - o) * ird
                    ta = jnp.minimum(t1, t2)
                    tb = jnp.maximum(t1, t2)
                    # 0 * inf NaN (origin on a slab plane with zero
                    # direction component): unconstrain the axis —
                    # conservative, never misses a real hit
                    ta = jnp.where(jnp.isnan(ta), -jnp.inf, ta)
                    tb = jnp.where(jnp.isnan(tb), jnp.inf, tb)
                    return ta, tb

                def mt_shade_fold(tm, best, extra_hit=None, *,
                                  rox=rox, roy=roy, roz=roz,
                                  rdx=rdx, rdy=rdy, rdz=rdz, gox=gox,
                                  goy=goy, goz=goz, m=m, mt=mt, g=g):
                    """Moller-Trumbore + winner fold for triangle data
                    accessor ``tm``: scalar row loads in the leaf fold
                    (tm(k) = tri[sl, k]); gathered (SUB, LANES) planes
                    in the bvh_grad recompute.  Returns
                    (best', tt, hit)."""
                    v0x, v0y, v0z = tm(0), tm(1), tm(2)
                    e1x, e1y, e1z = tm(3), tm(4), tm(5)
                    e2x, e2y, e2z = tm(6), tm(7), tm(8)
                    nox, noy, noz = tm(9), tm(10), tm(11)
                    pvx = rdy * e2z - rdz * e2y
                    pvy = rdz * e2x - rdx * e2z
                    pvz = rdx * e2y - rdy * e2x
                    det = pvx * e1x + pvy * e1y + pvz * e1z
                    ok = jnp.abs(det) > 1e-12
                    inv_det = 1.0 / jnp.where(ok, det, 1.0)
                    tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
                    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    vv = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
                    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    hit = ok & (u >= 0.0) & (vv >= 0.0) \
                        & (u + vv <= 1.0) & (tt > 0.0)
                    if extra_hit is not None:
                        hit = hit & extra_hit
                    tofs = tt - jnp.float32(RAY_OFFSET)
                    qx = rox + tofs * rdx
                    qy = roy + tofs * rdy
                    qz = roz + tofs * rdz
                    pxw = m(0) * qx + m(1) * qy + m(2) * qz + m(3)
                    pyw = m(4) * qx + m(5) * qy + m(6) * qz + m(7)
                    pzw = m(8) * qx + m(9) * qy + m(10) * qz + m(11)
                    if not shadow:
                        if extra_hit is not None:
                            # detached-recompute modes: no-winner lanes
                            # carry an all-zero row ("carry") — a zero
                            # object normal reaches _normalize3 and its
                            # 1/sqrt(0) VJP poisons the gmat cotangents
                            # (NaN in TRS grads).  Substitute a unit
                            # axis on miss lanes: output-neutral
                            # (better=False discards them below),
                            # forward-identical on every hit lane.
                            nox = jnp.where(hit, nox, 1.0)
                            noy = jnp.where(hit, noy, 0.0)
                            noz = jnp.where(hit, noz, 0.0)
                        face = rdx * nox + rdy * noy + rdz * noz
                        flip = jnp.where(face < 0.0, 1.0, -1.0)
                        nx0 = (m(24) * nox + m(25) * noy
                               + m(26) * noz) * flip
                        ny0 = (m(27) * nox + m(28) * noy
                               + m(29) * noz) * flip
                        nz0 = (m(30) * nox + m(31) * noy
                               + m(32) * noz) * flip
                        nx0, ny0, nz0 = _normalize3(nx0, ny0, nz0)
                        outside = hit & (face < 0.0)
                    ddx, ddy, ddz = gox - pxw, goy - pyw, goz - pzw
                    if has_motion:
                        pxw = pxw + tpl * m(33)
                        pyw = pyw + tpl * m(34)
                        pzw = pzw + tpl * m(35)
                    # guard the radicand for miss lanes: output-neutral
                    # (masked to NO_HIT below) but keeps sqrt's VJP off
                    # exact zeros in the bvh_grad recompute
                    dd2 = ddx * ddx + ddy * ddy + ddz * ddz
                    dist = jnp.sqrt(jnp.where(hit, dd2, 1.0))
                    dist = jnp.where(hit, dist, jnp.float32(NO_HIT))

                    better = dist < best["dist"]
                    sel = lambda a, b: jnp.where(better, a, b)
                    if shadow:
                        best = dict(
                            dist=sel(dist, best["dist"]),
                            gidx=sel(
                                jnp.full((SUB, LANES), float(g),
                                         jnp.float32), best["gidx"],
                            ),
                        )
                        return best, tt, hit
                    if has_bump:
                        nx0, ny0, nz0 = _bump_perturb(
                            nx0, ny0, nz0, qx, qy, qz, mt(15), mt(16),
                            m(24), m(25), m(26), m(27), m(28), m(29),
                            m(30), m(31), m(32),
                        )
                    if has_checker:
                        cs = mt(11)
                        ph = jnp.float32(0.015625)
                        cells = (jnp.floor(qx * cs - ph)
                                 + jnp.floor(qy * cs - ph)
                                 + jnp.floor(qz * cs - ph))
                        odd = (cs > 0.0) & (
                            cells - 2.0 * jnp.floor(cells * 0.5) >= 1.0
                        )
                        al_r = jnp.where(odd, mt(12), mt(0))
                        al_g = jnp.where(odd, mt(13), mt(1))
                        al_b = jnp.where(odd, mt(14), mt(2))
                    else:
                        al_r = jnp.full((SUB, LANES), mt(0), jnp.float32)
                        al_g = jnp.full((SUB, LANES), mt(1), jnp.float32)
                        al_b = jnp.full((SUB, LANES), mt(2), jnp.float32)
                    prev = best
                    best = dict(
                        dist=sel(dist, best["dist"]),
                        px=sel(pxw, best["px"]),
                        py=sel(pyw, best["py"]),
                        pz=sel(pzw, best["pz"]),
                        nx=sel(nx0, best["nx"]),
                        ny=sel(ny0, best["ny"]),
                        nz=sel(nz0, best["nz"]),
                        outside=sel(
                            jnp.where(outside, 1.0, 0.0)
                            .astype(jnp.float32),
                            best["outside"],
                        ),
                        gidx=sel(
                            jnp.full((SUB, LANES), float(g), jnp.float32),
                            best["gidx"],
                        ),
                        push=sel(
                            jnp.full((SUB, LANES), gmat[g, 36],
                                     jnp.float32),
                            best["push"],
                        ),
                        mc_r=sel(al_r, best["mc_r"]),
                        mc_g=sel(al_g, best["mc_g"]),
                        mc_b=sel(al_b, best["mc_b"]),
                        ms_r=sel(mt(3), best["ms_r"]),
                        ms_g=sel(mt(4), best["ms_g"]),
                        ms_b=sel(mt(5), best["ms_b"]),
                        m_ex=sel(mt(6), best["m_ex"]),
                        m_refl=sel(mt(7), best["m_refl"]),
                        m_refr=sel(mt(8), best["m_refr"]),
                        m_ior=sel(mt(9), best["m_ior"]),
                        m_emit=sel(mt(10), best["m_emit"]),
                    )
                    if tex_here:
                        # geom-static chart + vt corners at compact
                        # cols 12..17 (barycentric interp)
                        g_off, g_h, g_w = tex_geom[g]
                        if has_checker:
                            best["t_chk"] = sel(
                                jnp.where(odd, 1.0, 0.0)
                                .astype(jnp.float32),
                                prev["t_chk"],
                            )
                        best["t_off"] = sel(
                            jnp.full((SUB, LANES), float(g_off),
                                     jnp.float32),
                            prev["t_off"],
                        )
                        best["t_h"] = sel(
                            jnp.full((SUB, LANES), float(g_h),
                                     jnp.float32),
                            prev["t_h"],
                        )
                        best["t_w"] = sel(
                            jnp.full((SUB, LANES), float(g_w),
                                     jnp.float32),
                            prev["t_w"],
                        )
                    g_has_btex = (btex_here
                                  and btex_geom[g][0] >= 0)
                    if tex_here or g_has_btex:
                        # barycentric vt interp (uv cols 12..17 are
                        # packed whenever albedo textures OR mesh
                        # BUMPTEX are on — _pack_scene)
                        bw = 1.0 - u - vv
                        best["u"] = sel(
                            bw * tm(12) + u * tm(14) + vv * tm(16),
                            prev["u"],
                        )
                        best["v"] = sel(
                            bw * tm(13) + u * tm(15) + vv * tm(17),
                            prev["v"],
                        )
                    elif btex_here:
                        best["u"] = prev["u"]
                        best["v"] = prev["v"]
                    if btex_mesh_here:
                        # winner triangle's UV tangent frame
                        # (grad_u, grad_v) for the post-fold mesh
                        # bump chart; cols 18..23
                        for i_t, k_t in enumerate(TANG_KEYS):
                            best[k_t] = (
                                sel(tm(18 + i_t), prev[k_t])
                                if g_has_btex else prev[k_t]
                            )
                    if btex_here:
                        best["qx"] = prev["qx"]
                        best["qy"] = prev["qy"]
                        best["qz"] = prev["qz"]
                    return best, tt, hit

                if stream is not None and not bvh_grad:
                    # ---- HBM-streaming traversal (round 4; round 5:
                    # winner-fold leaves) ----
                    # tri_ref / nodes_ref are HBM (ANY) refs; node rows
                    # read through a NODE_WINDOW forward cache refilled
                    # at the cursor on miss, leaf triangles DMA'd
                    # LEAF_K rows per visited leaf.  Leaves run the
                    # same cheap Moller-Trumbore winner test as the
                    # resident carry path (MESH_WINNER_FOLD_PRIMAL) —
                    # the full shade fold runs ONCE on the carried
                    # winner, which keeps the two paths structurally
                    # identical (same fma fusion -> bit-equal; a 1-ulp
                    # flip between full-fold and winner-fold shapes is
                    # what this design retired) and gives streaming
                    # the same leaf-cost win.
                    tri_leaf, node_win, sem_t, sem_n = stream
                    n_vcols_s = (24 if btex_mesh_here
                                 else 18 if tex_here else 12)

                    def leaf_body_s(j, carry, *, tri_leaf=tri_leaf,
                                    rox=rox, roy=roy, roz=roz,
                                    rdx=rdx, rdy=rdy, rdz=rdz):
                        widx, t_loc, vals = carry
                        tm = lambda k: tri_leaf[j, k]
                        v0x, v0y, v0z = tm(0), tm(1), tm(2)
                        e1x, e1y, e1z = tm(3), tm(4), tm(5)
                        e2x, e2y, e2z = tm(6), tm(7), tm(8)
                        pvx = rdy * e2z - rdz * e2y
                        pvy = rdz * e2x - rdx * e2z
                        pvz = rdx * e2y - rdy * e2x
                        det = pvx * e1x + pvy * e1y + pvz * e1z
                        ok = jnp.abs(det) > 1e-12
                        inv_det = 1.0 / jnp.where(ok, det, 1.0)
                        tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
                        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                        qvx = tvy * e1z - tvz * e1y
                        qvy = tvz * e1x - tvx * e1z
                        qvz = tvx * e1y - tvy * e1x
                        vv = (rdx * qvx + rdy * qvy + rdz * qvz) \
                            * inv_det
                        tt = (e2x * qvx + e2y * qvy + e2z * qvz) \
                            * inv_det
                        hit = ok & (u >= 0.0) & (vv >= 0.0) \
                            & (u + vv <= 1.0) & (tt > 0.0)
                        upd = hit & (tt < t_loc)
                        vals = tuple(
                            jnp.where(upd, tm(k), v)
                            for k, v in enumerate(vals)
                        )
                        return (jnp.where(upd, j, widx),
                                jnp.where(upd, tt, t_loc), vals)

                    def trav_body_s(carry, *, rox=rox, roy=roy, roz=roz,
                                    irdx=irdx, irdy=irdy, irdz=irdz,
                                    slab=slab, leaf_body_s=leaf_body_s,
                                    node_off=node_off, tri_off=tri_off,
                                    tri_leaf=tri_leaf,
                                    node_win=node_win,
                                    sem_t=sem_t, sem_n=sem_n):
                        n, wb, widx, t_loc, vals = carry
                        # wb = ALIGNED global row base of the cached
                        # window.  DMA bases must sit on (8,128) f32
                        # tile rows — an unaligned sublane start reads
                        # the wrong rows, and a garbage skip link spins
                        # the walk forever (found the hard way: the
                        # first unaligned build wedged the TPU worker)
                        gn = node_off + n
                        need = (gn < wb) | (gn >= wb + NODE_WINDOW)
                        wb2 = jnp.where(need, gn & ~7, wb)

                        @pl.when(need)
                        def _refill():
                            cp = pltpu.make_async_copy(
                                nodes_ref.at[
                                    pl.ds(wb2, NODE_WINDOW)
                                ],
                                node_win, sem_n,
                            )
                            cp.start()
                            cp.wait()

                        nm = lambda k: node_win[gn - wb2, k]
                        tax, tbx = slab(nm(0), nm(3), rox, irdx)
                        tay, tby = slab(nm(1), nm(4), roy, irdy)
                        taz, tbz = slab(nm(2), nm(5), roz, irdz)
                        tnear = jnp.maximum(
                            jnp.maximum(tax, tay),
                            jnp.maximum(taz, jnp.float32(0.0)),
                        )
                        tfar = jnp.minimum(jnp.minimum(tbx, tby), tbz)
                        lane_hit = (tnear <= tfar) & (tnear < t_loc)
                        if live is not None:
                            lane_hit = lane_hit & (live > 0.0)
                        any_hit = jnp.any(lane_hit)
                        skip = nm(6).astype(jnp.int32)
                        start = nm(7).astype(jnp.int32)
                        count = nm(8).astype(jnp.int32)
                        is_leaf = count > 0
                        fetch = any_hit & is_leaf
                        # leaf rows [gstart, gstart+count) live inside
                        # the 2-tile (16-row) aligned slab at ga
                        gstart = tri_off + start
                        ga = gstart & ~7

                        @pl.when(fetch)
                        def _fetch_leaf():
                            cp = pltpu.make_async_copy(
                                tri_ref.at[pl.ds(ga, 2 * LEAF_K)],
                                tri_leaf, sem_t,
                            )
                            cp.start()
                            cp.wait()

                        # fori over the leaf's rows inside the slab on
                        # fetch, empty range otherwise — replaces the
                        # resident path's lax.cond(do_leaf)
                        lo = gstart - ga
                        widx, t_loc, vals = jax.lax.fori_loop(
                            lo, lo + jnp.where(fetch, count, 0),
                            leaf_body_s, (widx, t_loc, vals),
                        )
                        nxt = jnp.where(is_leaf | ~any_hit, skip, n + 1)
                        return nxt, wb2, widx, t_loc, vals

                    zero_s = jnp.zeros((SUB, LANES), jnp.float32)
                    _, _, widx, _, wvals = jax.lax.while_loop(
                        lambda c: c[0] < n_nodes_g, trav_body_s,
                        (jnp.int32(0), jnp.int32(-2 * NODE_WINDOW),
                         jnp.full((SUB, LANES), -1, jnp.int32), t0,
                         tuple(zero_s for _ in range(n_vcols_s))),
                    )
                    # one full shade fold on the carried winner —
                    # identical predicates/values as the resident
                    # carry path's recompute
                    best, _, _ = mt_shade_fold(
                        lambda k: wvals[k], best, extra_hit=widx >= 0
                    )
                    continue

                def leaf_body(sl, carry, *, mt_shade_fold=mt_shade_fold):
                    best, t_loc = carry
                    tm = lambda k: tri_ref[sl, k]
                    best, tt, hit = mt_shade_fold(tm, best)
                    # any in-geom hit bounds the in-geom search (world
                    # distance is monotonic in object t per ray)
                    t_loc = jnp.where(hit & (tt < t_loc), tt, t_loc)
                    return best, t_loc

                def trav_body(carry, *, rox=rox, roy=roy, roz=roz,
                              irdx=irdx, irdy=irdy, irdz=irdz,
                              slab=slab, leaf_body=leaf_body,
                              node_off=node_off, tri_off=tri_off):
                    n, best, t_loc = carry
                    nm = lambda k: nodes_ref[node_off + n, k]
                    tax, tbx = slab(nm(0), nm(3), rox, irdx)
                    tay, tby = slab(nm(1), nm(4), roy, irdy)
                    taz, tbz = slab(nm(2), nm(5), roz, irdz)
                    tnear = jnp.maximum(
                        jnp.maximum(tax, tay),
                        jnp.maximum(taz, jnp.float32(0.0)),
                    )
                    tfar = jnp.minimum(jnp.minimum(tbx, tby), tbz)
                    lane_hit = (tnear <= tfar) & (tnear < t_loc)
                    if live is not None:
                        lane_hit = lane_hit & (live > 0.0)
                    any_hit = jnp.any(lane_hit)
                    skip = nm(6).astype(jnp.int32)
                    start = nm(7).astype(jnp.int32)
                    count = nm(8).astype(jnp.int32)
                    is_leaf = count > 0

                    def do_leaf(c):
                        return jax.lax.fori_loop(
                            tri_off + start, tri_off + start + count,
                            leaf_body, c,
                        )

                    best, t_loc = jax.lax.cond(
                        any_hit & is_leaf, do_leaf, lambda c: c,
                        (best, t_loc),
                    )
                    nxt = jnp.where(is_leaf | ~any_hit, skip, n + 1)
                    return nxt, best, t_loc

                if not bvh_grad and not MESH_WINNER_FOLD_PRIMAL:
                    # legacy primal traversal: full shade fold per
                    # visited leaf row
                    _, best, _ = jax.lax.while_loop(
                        lambda c: c[0] < n_nodes_g, trav_body,
                        (jnp.int32(0), best, t0),
                    )
                    continue

                # ---- bvh_grad: detached winner traversal ----
                # two flavors, one traversal:
                #   "gather" (True) — record the winning row INDEX,
                #     gather the row after the loop and recompute its
                #     hit differentiably.  Full gradients incl.
                #     tri_verts; XLA engines only (the gather's
                #     transpose is a scatter-add Mosaic cannot lower,
                #     and lane-replicating (T, LANES) tables to feed
                #     tpu.dynamic_gather would blow VMEM at mesh scale).
                #   "carry" — carry the winning row's VALUES (12/18
                #     planes, detached) through the while_loop and
                #     recompute from those.  No gather at all, so the
                #     in-kernel reverse sweep (_vjp_kernel) lowers on
                #     Mosaic: TRS/camera/material/NEE gradients for
                #     mesh scenes in-kernel; tri_verts gradients stay
                #     on the planes engine (same Mosaic-scatter
                #     exclusion as texel gradients).
                # primal rides carry mode too (MESH_WINNER_FOLD_PRIMAL
                # above): the sg() detachments are no-ops forward
                carry_vals = (bvh_grad == "carry") or not bvh_grad
                n_vcols = (24 if btex_mesh_here
                           else 18 if tex_here else 12)
                sg = jax.lax.stop_gradient
                live_sg = None if live is None else sg(live)

                def run_walk(rox_w, roy_w, roz_w, rdx_w, rdy_w, rdz_w,
                             irdx_w, irdy_w, irdz_w, live_w, t0_w):
                    """Detached winner walk over one block of ray
                    rows — the full (SUB,LANES) tile, or one 8-row
                    vreg group (MESH_SUBTILE_TRAVERSAL)."""
                    shape_w = rox_w.shape

                    def leaf_w(sl, carry):
                        widx, t_loc, vals = carry
                        # sg per READ, not on the table: tri_ref may
                        # be a Pallas REF (the vjp kernel's carry mode
                        # — ref dynamic indexing lowers on Mosaic
                        # where a value dynamic_slice does not)
                        tm = lambda k: sg(tri_ref[sl, k])
                        v0x, v0y, v0z = tm(0), tm(1), tm(2)
                        e1x, e1y, e1z = tm(3), tm(4), tm(5)
                        e2x, e2y, e2z = tm(6), tm(7), tm(8)
                        pvx = rdy_w * e2z - rdz_w * e2y
                        pvy = rdz_w * e2x - rdx_w * e2z
                        pvz = rdx_w * e2y - rdy_w * e2x
                        det = pvx * e1x + pvy * e1y + pvz * e1z
                        ok = jnp.abs(det) > 1e-12
                        inv_det = 1.0 / jnp.where(ok, det, 1.0)
                        tvx = rox_w - v0x
                        tvy = roy_w - v0y
                        tvz = roz_w - v0z
                        u = (tvx * pvx + tvy * pvy + tvz * pvz) \
                            * inv_det
                        qvx = tvy * e1z - tvz * e1y
                        qvy = tvz * e1x - tvx * e1z
                        qvz = tvx * e1y - tvy * e1x
                        vv = (rdx_w * qvx + rdy_w * qvy
                              + rdz_w * qvz) * inv_det
                        tt = (e2x * qvx + e2y * qvy + e2z * qvz) \
                            * inv_det
                        hit = ok & (u >= 0.0) & (vv >= 0.0) \
                            & (u + vv <= 1.0) & (tt > 0.0)
                        upd = hit & (tt < t_loc)
                        if carry_vals:
                            vals = tuple(
                                jnp.where(upd, tm(k), v)
                                for k, v in enumerate(vals)
                            )
                        return (jnp.where(upd, sl, widx),
                                jnp.where(upd, tt, t_loc), vals)

                    def trav_w(carry):
                        n, widx, t_loc, vals = carry
                        nm = lambda k: nodes_ref[node_off + n, k]
                        tax, tbx = slab(nm(0), nm(3), rox_w, irdx_w)
                        tay, tby = slab(nm(1), nm(4), roy_w, irdy_w)
                        taz, tbz = slab(nm(2), nm(5), roz_w, irdz_w)
                        tnear = jnp.maximum(
                            jnp.maximum(tax, tay),
                            jnp.maximum(taz, jnp.float32(0.0)),
                        )
                        tfar = jnp.minimum(jnp.minimum(tbx, tby), tbz)
                        lane_hit = (tnear <= tfar) & (tnear < t_loc)
                        if live_w is not None:
                            lane_hit = lane_hit & (live_w > 0.0)
                        any_hit = jnp.any(lane_hit)
                        skip = nm(6).astype(jnp.int32)
                        start = nm(7).astype(jnp.int32)
                        count = nm(8).astype(jnp.int32)
                        is_leaf = count > 0

                        def do_leaf(c):
                            return jax.lax.fori_loop(
                                tri_off + start,
                                tri_off + start + count, leaf_w, c,
                            )

                        widx, t_loc, vals = jax.lax.cond(
                            any_hit & is_leaf, do_leaf, lambda c: c,
                            (widx, t_loc, vals),
                        )
                        nxt = jnp.where(is_leaf | ~any_hit, skip,
                                        n + 1)
                        return nxt, widx, t_loc, vals

                    zero_p = jnp.zeros(shape_w, jnp.float32)
                    vals0 = tuple(zero_p for _ in range(n_vcols)) \
                        if carry_vals else ()
                    _, widx, _, wvals = jax.lax.while_loop(
                        lambda c: c[0] < n_nodes_g, trav_w,
                        (jnp.int32(0),
                         jnp.full(shape_w, -1, jnp.int32),
                         t0_w, vals0),
                    )
                    return widx, wvals

                if winners is not None:
                    # the reverse sweep hoists traversal OUT of
                    # jax.vjp (ref reads discharge to dynamic_slice
                    # there, which Mosaic cannot lower): consume the
                    # winner planes the forward sweep collected for
                    # this trace call, in call order
                    widx, wvals = winners.pop(0)
                else:
                    # sub-tile only pays on big trees (re-walking an
                    # 11-node tree 4x measured 2x WORSE on
                    # cornell_mesh; bigmesh ~2% better) — n_nodes_g is
                    # static, so the gate is free.  subtile_ok: the
                    # SPAN kernels exclude it — Mosaic's
                    # ApplyVectorLayout crashes on the (8,128) slices
                    # there (vector_extract_strided_slice check
                    # failure; compiler bug, monolithic kernel
                    # lowers the same slices fine).
                    n_grp = (SUB // 8 if (MESH_SUBTILE_TRAVERSAL
                                          and subtile_ok
                                          and not bvh_grad
                                          and rox.shape[0] == SUB
                                          and n_nodes_g
                                          >= SUBTILE_MIN_NODES)
                             else 1)
                    if n_grp == 1:
                        widx, wvals = run_walk(
                            sg(rox), sg(roy), sg(roz), sg(rdx),
                            sg(rdy), sg(rdz), sg(irdx), sg(irdy),
                            sg(irdz), live_sg, sg(t0),
                        )
                    else:
                        # sub-tile walks: one per 8-row vreg group.
                        # Each lane's needed nodes are always visited
                        # by its OWN group's any-lane test (a subset
                        # never loses a lane's hits), so per-lane
                        # winners — and the image — stay bit-identical
                        # while each walk prunes against 1024 rays
                        # instead of 4096 and its vector ops are
                        # single-vreg.
                        # Mosaic's strided-slice rule aborts (hard
                        # SIGABRT: Array::Slice limits>dim) when the
                        # source vreg layout is sublane-REPLICATED —
                        # which bounce-0 camera-ray planes are in the
                        # span kernels (origin = broadcast scalar;
                        # the monolithic kernel's loop carry gave
                        # every plane a concrete layout, which is why
                        # it never crashed there).  Anchor each plane
                        # with a select against an all-true sublane-
                        # varying iota predicate: bit-identical
                        # (select passes x through untouched — safe
                        # for -0.0 and the 1/dx inf signs, unlike
                        # x+0.0) but forces a materialized per-
                        # sublane layout the slice rule can cut.
                        row_ok = jax.lax.broadcasted_iota(
                            jnp.int32, (rox.shape[0], LANES), 0
                        ) >= 0
                        anch = lambda x: jnp.where(
                            row_ok, x, jnp.zeros_like(x)
                        )
                        parts = []
                        for gi in range(n_grp):
                            rs = slice(8 * gi, 8 * (gi + 1))
                            parts.append(run_walk(
                                anch(sg(rox))[rs], anch(sg(roy))[rs],
                                anch(sg(roz))[rs], anch(sg(rdx))[rs],
                                anch(sg(rdy))[rs], anch(sg(rdz))[rs],
                                anch(sg(irdx))[rs],
                                anch(sg(irdy))[rs],
                                anch(sg(irdz))[rs],
                                None if live_sg is None
                                else anch(live_sg)[rs],
                                anch(sg(t0))[rs],
                            ))
                        widx = jnp.concatenate(
                            [p[0] for p in parts], axis=0
                        )
                        wvals = tuple(
                            jnp.concatenate(
                                [p[1][k] for p in parts], axis=0
                            )
                            for k in range(n_vcols)
                        ) if carry_vals else ()
                    if collect is not None:
                        collect.append((widx, wvals))
                # ---- differentiable recompute of the winner's hit:
                # the winner's triangle row per lane (gathered, or the
                # carried value planes) through the SAME fold ops
                # (identical predicates on identical values ->
                # bit-parity with the fused traversal fold).
                if carry_vals:
                    tmw = lambda k: wvals[k]
                else:
                    wsafe = jnp.maximum(widx, 0)
                    tmw = lambda k: tri_ref[wsafe, k]
                best, _, _ = mt_shade_fold(tmw, best,
                                           extra_hit=widx >= 0)

        if tex_here or btex_here:
            def _bilin3(off_p, th, tw, uu, vv):
                """Bilinear rgb sample on planes: mirrors
                scene/textures.sample_texture exactly (wrap-then-
                filter, texel centers at integer+0.5).

                Untextured/miss lanes (off_p < 0) carry garbage UVs
                (possibly inf/NaN from the fold) — zero them before
                the weight math.  Forward output for those lanes is
                discarded by the tex_on masks, but under reverse-mode
                a NaN weight times a zero cotangent scatters NaN into
                texel 0 (0*NaN = NaN); this guard keeps texel
                gradients clean on the plane engine and is identity
                for every textured lane (bit-parity preserved)."""
                on = off_p >= 0.0
                uu = jnp.where(on, uu, 0.0)
                vv = jnp.where(on, vv, 0.0)
                x = uu * tw - 0.5
                y = vv * th - 0.5
                x0f = jnp.floor(x)
                y0f = jnp.floor(y)
                fx_w = x - x0f
                fy_w = y - y0f
                wi = jnp.maximum(tw.astype(jnp.int32), 1)
                hi = jnp.maximum(th.astype(jnp.int32), 1)
                x0 = jnp.mod(x0f.astype(jnp.int32), wi)
                x1 = jnp.mod(x0 + 1, wi)
                y0 = jnp.mod(y0f.astype(jnp.int32), hi)
                y1 = jnp.mod(y0 + 1, hi)
                off_i = jnp.maximum(off_p.astype(jnp.int32), 0)
                i00 = off_i + y0 * wi + x0
                i01 = off_i + y0 * wi + x1
                i10 = off_i + y1 * wi + x0
                i11 = off_i + y1 * wi + x1
                out = []
                for c00, c01, c10, c11 in fetch3((i00, i01, i10, i11)):
                    top = c00 * (1.0 - fx_w) + c01 * fx_w
                    bot = c10 * (1.0 - fx_w) + c11 * fx_w
                    out.append(top * (1.0 - fy_w) + bot * fy_w)
                return out

        if tex_here:
            # ONE bilinear albedo sample for the whole tile, after the
            # fold, addressed by the winner's chart planes; albedo is
            # MULTIPLIED in (integrator._texture_albedo).
            smp = _bilin3(best["t_off"], best["t_h"], best["t_w"],
                          best["u"], best["v"])
            tex_on = best["t_off"] >= 0.0
            if live is not None:
                # dead lanes can still "hit" a textured geom (their
                # state is garbage and discarded by the live masks in
                # shade) — keep them out of the texture sample so the
                # backward pass never routes their NaN cotangents into
                # texel gradients (0 * NaN = NaN).  Forward-identical:
                # dead-lane shading output is already discarded.
                tex_on = tex_on & (live > 0.0)
            if has_checker:
                # integrator composition order: checker REPLACES the
                # (textured) albedo on odd cells
                tex_on = tex_on & (best["t_chk"] < 0.5)
            for ch, smp_c in zip(("mc_r", "mc_g", "mc_b"), smp):
                best[ch] = jnp.where(
                    tex_on, best[ch] * smp_c, best[ch]
                )

        if btex_here:
            # BUMPTEX normal perturbation (integrator._bumptex_normal):
            # central differences of the height map's luminance in UV,
            # chained through the per-primitive chart gradients to an
            # object-space gradient, then invT to world and projected
            # tangentially.  All per-geom statics (chart, strength k,
            # invT rows, primitive type) fold by the winner's gidx.
            zplane = jnp.zeros((SUB, LANES), jnp.float32)
            b_off = jnp.full((SUB, LANES), -1.0, jnp.float32)
            b_h = zplane
            b_w = zplane
            b_k = zplane
            sph_m = zplane
            mesh_m = zplane
            tinv = [zplane] * 9
            for g_b in range(len(geom_types)):
                go_b, gh_b, gw_b = btex_geom[g_b]
                if go_b < 0:
                    continue
                selg = best["gidx"] == float(g_b)
                b_off = jnp.where(selg, float(go_b), b_off)
                b_h = jnp.where(selg, float(gh_b), b_h)
                b_w = jnp.where(selg, float(gw_b), b_w)
                b_k = jnp.where(selg, mats[g_b, 21], b_k)
                tinv = [
                    jnp.where(selg, gmat[g_b, 24 + i_t], tinv[i_t])
                    for i_t in range(9)
                ]
                if geom_types[g_b] == T.SPHERE:
                    sph_m = jnp.where(selg, 1.0, sph_m)
                elif geom_types[g_b] == T.MESH:
                    mesh_m = jnp.where(selg, 1.0, mesh_m)

            eu = 1.0 / jnp.maximum(b_w, 1.0)
            ev = 1.0 / jnp.maximum(b_h, 1.0)

            def _lum(du, dv):
                r3 = _bilin3(b_off, b_h, b_w,
                             best["u"] + du, best["v"] + dv)
                return (r3[0] + r3[1] + r3[2]) * jnp.float32(1.0 / 3.0)

            hu = (_lum(eu, zplane) - _lum(-eu, zplane)) / (2.0 * eu)
            hv = (_lum(zplane, ev) - _lum(zplane, -ev)) / (2.0 * ev)

            qx_w, qy_w, qz_w = best["qx"], best["qy"], best["qz"]
            # sphere chart gradients (integrator._bumptex_normal)
            r2s = jnp.maximum(qx_w * qx_w + qz_w * qz_w, 1e-12)
            inv2pir2 = 1.0 / (jnp.float32(TWO_PI) * r2s)
            den = jnp.sqrt(jnp.maximum(1.0 - 4.0 * qy_w * qy_w, 1e-12))
            s_gux = -qz_w * inv2pir2
            s_guz = qx_w * inv2pir2
            s_gvy = 2.0 / (jnp.float32(PI) * den)
            # cube face: dominant |q| axis (argmax, first max wins)
            aqx, aqy, aqz = (jnp.abs(qx_w), jnp.abs(qy_w),
                             jnp.abs(qz_w))
            ax_is0 = (aqx >= aqy) & (aqx >= aqz)
            ax_is1 = ~ax_is0 & (aqy >= aqz)
            # gu = ax==0 ? ez : ex ; gv = ax==1 ? ez : ey
            c_gux = jnp.where(ax_is0, 0.0, 1.0)
            c_guz = jnp.where(ax_is0, 1.0, 0.0)
            c_gvy = jnp.where(ax_is1, 0.0, 1.0)
            c_gvz = jnp.where(ax_is1, 1.0, 0.0)
            gux = jnp.where(sph_m > 0.0, s_gux, c_gux)
            guy = zplane
            guz = jnp.where(sph_m > 0.0, s_guz, c_guz)
            gvx = zplane
            gvy = jnp.where(sph_m > 0.0, s_gvy, c_gvy)
            gvz = jnp.where(sph_m > 0.0, 0.0, c_gvz)
            if btex_mesh_here:
                # mesh winners: per-triangle UV-chart gradients carried
                # through the fold (ops/intersect.triangle_uv_gradients
                # values, packed by _pack_scene at tri cols 18..23)
                mm = mesh_m > 0.0
                gux = jnp.where(mm, best["bgux"], gux)
                guy = jnp.where(mm, best["bguy"], guy)
                guz = jnp.where(mm, best["bguz"], guz)
                gvx = jnp.where(mm, best["bgvx"], gvx)
                gvy = jnp.where(mm, best["bgvy"], gvy)
                gvz = jnp.where(mm, best["bgvz"], gvz)
            gox_b = hu * gux + hv * gvx
            goy_b = hu * guy + hv * gvy
            goz_b = hu * guz + hv * gvz
            gwx = tinv[0] * gox_b + tinv[1] * goy_b + tinv[2] * goz_b
            gwy = tinv[3] * gox_b + tinv[4] * goy_b + tinv[5] * goz_b
            gwz = tinv[6] * gox_b + tinv[7] * goy_b + tinv[8] * goz_b
            nxb, nyb, nzb = best["nx"], best["ny"], best["nz"]
            gdn = gwx * nxb + gwy * nyb + gwz * nzb
            gtx = gwx - gdn * nxb
            gty = gwy - gdn * nyb
            gtz = gwz - gdn * nzb
            pxn = nxb - b_k * gtx
            pyn = nyb - b_k * gty
            pzn = nzb - b_k * gtz
            b_on = (b_off >= 0.0) & (b_k > 0.0)
            if live is not None:
                # same dead-lane gate as tex_on above
                b_on = b_on & (live > 0.0)
            # safe-where: guard the radicand BEFORE the sqrt.  Dead /
            # miss lanes carry an exactly-zero perturbed normal, and
            # sqrt's VJP at 0 is ct/(2*sqrt(0)) = 0/0 = NaN even under
            # a zero cotangent; a maximum() placed after the sqrt
            # blocks the primal but not the cotangent.  That NaN
            # flowed back through hu/hv into the bilinear taps and
            # scatter-added NaN into texel (0,0) (the red
            # test_texel_gradients_planes, VERDICT r2 weak #1).
            # Forward-identical for every b_on lane (len2 > 0 there).
            len2 = pxn * pxn + pyn * pyn + pzn * pzn
            nrm = jnp.sqrt(jnp.where(b_on & (len2 > 0.0), len2, 1.0))
            best["nx"] = jnp.where(b_on, pxn / nrm, nxb)
            best["ny"] = jnp.where(b_on, pyn / nrm, nyb)
            best["nz"] = jnp.where(b_on, pzn / nrm, nzb)

        best["hit"] = best["dist"] < jnp.float32(NO_HIT)
        return best

    def intersect(st, winners=None, collect=None):
        return trace_nearest(st["ox"], st["oy"], st["oz"],
                             st["dx"], st["dy"], st["dz"],
                             st.get("time"), live=st["live"],
                             want_tex=True, winners=winners,
                             collect=collect)

    def shade(st, isect, d, it_u, winners=None, collect=None):
        """Terminate-or-scatter, matching ops/bsdf.sample_bsdf."""
        live = st["live"] > 0.0
        hit = isect["hit"]
        emissive = isect["m_emit"] > 0.0

        lit = live & hit & emissive
        if nee:
            # only rays whose previous bounce was non-diffuse (or the
            # camera) collect BSDF-sampled emission (no double count)
            lit = lit & (st["emit_ok"] > 0.0)
        rr = st["rr"] + jnp.where(
            lit, st["tr"] * isect["mc_r"] * isect["m_emit"], 0.0
        )
        rg = st["rg"] + jnp.where(
            lit, st["tg"] * isect["mc_g"] * isect["m_emit"], 0.0
        )
        rb = st["rb"] + jnp.where(
            lit, st["tb"] * isect["mc_b"] * isect["m_emit"], 0.0
        )

        dep = d + 1
        u_lobe = _uniform(it_u, pix_u, dep, Draw.LOBE)
        u_d1 = _uniform(it_u, pix_u, dep, Draw.DIFF_U1)
        u_d2 = _uniform(it_u, pix_u, dep, Draw.DIFF_U2)
        if has_glass:
            u_fr = _uniform(it_u, pix_u, dep, Draw.FRESNEL)
        if has_imperfect:
            u_s1 = _uniform(it_u, pix_u, dep, Draw.SPEC_U1)
            u_s2 = _uniform(it_u, pix_u, dep, Draw.SPEC_U2)

        nx, ny, nz = isect["nx"], isect["ny"], isect["nz"]
        dx, dy, dz = st["dx"], st["dy"], st["dz"]

        # --- diffuse: cosine hemisphere w/ Peter-Kutz frame
        up = jnp.sqrt(u_d1)
        over = jnp.sqrt(jnp.maximum(1.0 - up * up, 0.0))
        around = u_d2 * jnp.float32(TWO_PI)
        s3 = jnp.float32(SQRT_OF_ONE_THIRD)
        use_x = jnp.abs(nx) < s3
        use_y = (~use_x) & (jnp.abs(ny) < s3)
        nn_x = jnp.where(use_x, 1.0, 0.0)
        nn_y = jnp.where(use_y, 1.0, 0.0)
        nn_z = jnp.where(use_x | use_y, 0.0, 1.0)
        p1x = ny * nn_z - nz * nn_y
        p1y = nz * nn_x - nx * nn_z
        p1z = nx * nn_y - ny * nn_x
        p1x, p1y, p1z = _normalize3(p1x, p1y, p1z)
        p2x = ny * p1z - nz * p1y
        p2y = nz * p1x - nx * p1z
        p2z = nx * p1y - ny * p1x
        p2x, p2y, p2z = _normalize3(p2x, p2y, p2z)
        ca, sa = jnp.cos(around), jnp.sin(around)
        ddfx = up * nx + ca * over * p1x + sa * over * p2x
        ddfy = up * ny + ca * over * p1y + sa * over * p2y
        ddfz = up * nz + ca * over * p1z + sa * over * p2z

        # --- mirror + imperfect specular
        ndoti = nx * dx + ny * dy + nz * dz
        mrx = dx - 2.0 * ndoti * nx
        mry = dy - 2.0 * ndoti * ny
        mrz = dz - 2.0 * ndoti * nz
        # power-cosine sampling split out so diffuse+mirror-only
        # scenes never pay its pow/sin/cos transcendentals
        if has_imperfect:
            spx, spy, spz = _imperfect_specular(
                isect["m_ex"], mrx, mry, mrz, u_s1, u_s2
            )
        else:
            spx, spy, spz = mrx, mry, mrz

        # --- Fresnel glass (Schlick choice + Snell refraction) —
        # emitted only when some material is refractive
        if has_glass:
            cos_i = jnp.clip(-ndoti, 0.0, 1.0)
            ior = isect["m_ior"]
            r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
            mm = jnp.maximum(1.0 - cos_i, 0.0)
            refl_p = r0 + (1.0 - r0) * mm * mm * mm * mm * mm
            eta = jnp.where(
                isect["outside"] > 0.0, 1.0 / jnp.maximum(ior, 1e-6), ior
            )
            cosi2 = nx * dx + ny * dy + nz * dz  # = -cos_i (pre-clip)
            kk = 1.0 - eta * eta * (1.0 - cosi2 * cosi2)
            k_ok = kk >= 0.0
            sqk = jnp.sqrt(jnp.where(k_ok, kk, 1.0))
            rfx = eta * dx - (eta * cosi2 + sqk) * nx
            rfy = eta * dy - (eta * cosi2 + sqk) * ny
            rfz = eta * dz - (eta * cosi2 + sqk) * nz
            tir = ~k_ok
            choose_refl = (u_fr < refl_p) | tir
            fx = jnp.where(choose_refl, mrx, rfx)
            fy = jnp.where(choose_refl, mry, rfy)
            fz = jnp.where(choose_refl, mrz, rfz)
            ftr = jnp.where(choose_refl, isect["ms_r"], isect["mc_r"])
            ftg = jnp.where(choose_refl, isect["ms_g"], isect["mc_g"])
            ftb = jnp.where(choose_refl, isect["ms_b"], isect["mc_b"])

        # --- spec/diffuse probability split
        p_spec = jnp.clip(isect["m_refl"], 0.0, 1.0)
        take_spec = u_lobe < p_spec
        p_safe = jnp.maximum(
            jnp.where(take_spec, p_spec, 1.0 - p_spec), 1e-8
        )
        sdx = jnp.where(take_spec, spx, ddfx)
        sdy = jnp.where(take_spec, spy, ddfy)
        sdz = jnp.where(take_spec, spz, ddfz)
        sdr = jnp.where(take_spec, isect["ms_r"], isect["mc_r"]) / p_safe
        sdg = jnp.where(take_spec, isect["ms_g"], isect["mc_g"]) / p_safe
        sdb = jnp.where(take_spec, isect["ms_b"], isect["mc_b"]) / p_safe

        if has_glass:
            is_glass = isect["m_refr"] > 0.0
            ndirx = jnp.where(is_glass, fx, sdx)
            ndiry = jnp.where(is_glass, fy, sdy)
            ndirz = jnp.where(is_glass, fz, sdz)
            thr_r = jnp.where(is_glass, ftr, sdr)
            thr_g = jnp.where(is_glass, ftg, sdg)
            thr_b = jnp.where(is_glass, ftb, sdb)
        else:
            ndirx, ndiry, ndirz = sdx, sdy, sdz
            thr_r, thr_g, thr_b = sdr, sdg, sdb

        cont = live & hit & ~emissive

        if has_sss:
            # subsurface scattering (integrator._bounce sss block):
            # rays inside a medium sample an exponential free path; if
            # it ends before the surface the ray scatters isotropically
            # in place (albedo attenuation), else the Fresnel interface
            # takes over at the surface.  Same Draw.SSS_* streams.
            in_med = st["med_s"] > 0.0
            u_step = _uniform(it_u, pix_u, dep, Draw.SSS_STEP)
            sss_step = -jnp.log(jnp.maximum(1.0 - u_step, 1e-7)) \
                / jnp.maximum(st["med_s"], 1e-8)
            scatter_inside = (
                in_med & live & hit & (sss_step < isect["dist"])
            )

        # transmission fix (see integrator._bounce): push refracted
        # continuations past the interface so they don't re-intersect it
        opx, opy, opz = isect["px"], isect["py"], isect["pz"]
        if has_glass:
            took_refract_g = is_glass & ~choose_refl
            pp = isect["push"]
            opx = jnp.where(took_refract_g, opx + pp * ndirx, opx)
            opy = jnp.where(took_refract_g, opy + pp * ndiry, opy)
            opz = jnp.where(took_refract_g, opz + pp * ndirz, opz)

        if grad_mode:
            # per-path factor bookkeeping for analytic material grads:
            # each bounce multiplies the throughput by one of
            # color[m]/p-ish factors; counting them per material makes
            # d(radiance)/d(param) closed-form at the path's end.
            midp = jnp.full((SUB, LANES), -1.0, jnp.float32)
            for g_i, m_i in enumerate(mat_of_geom):
                midp = jnp.where(
                    isect["gidx"] == float(g_i), float(m_i), midp
                )
            ev_diff = cont & ~take_spec
            ev_spec = cont & take_spec
            if has_glass:
                ev_diff = ev_diff & ~is_glass
                ev_spec = ev_spec & ~is_glass
                ev_grefl = cont & is_glass & choose_refl
                ev_grefr = cont & is_glass & ~choose_refl
            for mm in range(n_mats):
                sel_m = midp == float(mm)
                # packed digit increments (see init_state): diffuse
                # bounce -> col; spec bounce -> spec+dp; emissive hit
                # -> col+emit (radiance = thr * color_m * emit_m)
                add = jnp.where(ev_diff & sel_m, jnp.float32(1.0), 0.0)
                add = add + jnp.where(
                    ev_spec & sel_m, jnp.float32(64.0 + 262144.0), 0.0
                )
                add = add + jnp.where(
                    lit & sel_m, jnp.float32(1.0 + 4096.0), 0.0
                )
                if has_glass:
                    add = add + jnp.where(
                        ev_grefl & sel_m, jnp.float32(64.0), 0.0
                    )
                    add = add + jnp.where(
                        ev_grefr & sel_m, jnp.float32(1.0), 0.0
                    )
                st[f"c_a_{mm}"] = st[f"c_a_{mm}"] + add
                st[f"c_b_{mm}"] = st[f"c_b_{mm}"] + jnp.where(
                    ev_diff & sel_m, jnp.float32(1.0), 0.0
                )

        if nee:
            took_diffuse = ~take_spec
            if has_glass:
                took_diffuse = took_diffuse & ~is_glass
            rr, rg, rb = _nee_add(
                rr, rg, rb, st, isect,
                cont & ~scatter_inside if has_sss else cont,
                it_u, d + 1, winners=winners, collect=collect,
            )

        if has_sss:
            # interior scattering event: move to the sampled point,
            # bounce isotropically, attenuate by the medium's albedo
            zi = 1.0 - 2.0 * _uniform(it_u, pix_u, dep, Draw.SSS_U)
            ri = jnp.sqrt(jnp.maximum(1.0 - zi * zi, 0.0))
            phi = _uniform(it_u, pix_u, dep, Draw.SSS_V) \
                * jnp.float32(TWO_PI)
            opx = jnp.where(
                scatter_inside, st["ox"] + sss_step * st["dx"], opx
            )
            opy = jnp.where(
                scatter_inside, st["oy"] + sss_step * st["dy"], opy
            )
            opz = jnp.where(
                scatter_inside, st["oz"] + sss_step * st["dz"], opz
            )
            ndirx = jnp.where(scatter_inside, ri * jnp.cos(phi), ndirx)
            ndiry = jnp.where(scatter_inside, ri * jnp.sin(phi), ndiry)
            ndirz = jnp.where(scatter_inside, zi, ndirz)
            thr_r = jnp.where(scatter_inside, st["med_r"], thr_r)
            thr_g = jnp.where(scatter_inside, st["med_g"], thr_g)
            thr_b = jnp.where(scatter_inside, st["med_b"], thr_b)

            # medium membership changes only at surface refractions:
            # entering a sigma>0 geom from outside, or exiting from
            # inside (integrator._bounce entering/exiting)
            at_surface = cont & ~scatter_inside
            if has_glass:
                m_sss = jnp.zeros((SUB, LANES), jnp.float32)
                a_r = jnp.zeros((SUB, LANES), jnp.float32)
                a_g = jnp.zeros((SUB, LANES), jnp.float32)
                a_b = jnp.zeros((SUB, LANES), jnp.float32)
                for g_s in range(len(geom_types)):
                    sel_g = isect["gidx"] == float(g_s)
                    m_sss = jnp.where(sel_g, mats[g_s, 17], m_sss)
                    a_r = jnp.where(sel_g, mats[g_s, 18], a_r)
                    a_g = jnp.where(sel_g, mats[g_s, 19], a_g)
                    a_b = jnp.where(sel_g, mats[g_s, 20], a_b)
                outs_m = isect["outside"] > 0.0
                entering = (at_surface & took_refract_g
                            & (m_sss > 0.0) & outs_m)
                exiting = at_surface & took_refract_g & in_med & ~outs_m
                new_med_s = jnp.where(
                    entering, m_sss,
                    jnp.where(exiting, 0.0, st["med_s"]),
                )
                new_med_r = jnp.where(
                    entering, a_r, jnp.where(exiting, 1.0, st["med_r"])
                )
                new_med_g = jnp.where(
                    entering, a_g, jnp.where(exiting, 1.0, st["med_g"])
                )
                new_med_b = jnp.where(
                    entering, a_b, jnp.where(exiting, 1.0, st["med_b"])
                )
            else:
                new_med_s = st["med_s"]
                new_med_r, new_med_g, new_med_b = (
                    st["med_r"], st["med_g"], st["med_b"]
                )

        if rr_mode:
            # Russian roulette from bounce 3 on (integrator._bounce):
            # kill with prob 1-p where p tracks the post-bounce
            # throughput; boost survivors by 1/p.  Same Draw.RR stream
            # and clip range — bit-matched to the XLA engine.  Applied
            # after NEE: direct lighting at this vertex is never
            # rouletted, only the continuation ray.
            ntr = st["tr"] * thr_r
            ntg = st["tg"] * thr_g
            ntb = st["tb"] * thr_b
            p_srv = jnp.clip(
                jnp.maximum(ntr, jnp.maximum(ntg, ntb)), 0.05, 1.0
            )
            u_rr = _uniform(it_u, pix_u, d + 1, Draw.RR)
            apply_m = d >= 3
            survive = ~apply_m | (u_rr < p_srv)
            cont = cont & survive
            boost = jnp.where(apply_m & survive, 1.0 / p_srv, 1.0)
            thr_r = thr_r * boost
            thr_g = thr_g * boost
            thr_b = thr_b * boost

        out = dict(
            ox=jnp.where(cont, opx, st["ox"]),
            oy=jnp.where(cont, opy, st["oy"]),
            oz=jnp.where(cont, opz, st["oz"]),
            dx=jnp.where(cont, ndirx, st["dx"]),
            dy=jnp.where(cont, ndiry, st["dy"]),
            dz=jnp.where(cont, ndirz, st["dz"]),
            tr=jnp.where(cont, st["tr"] * thr_r, st["tr"]),
            tg=jnp.where(cont, st["tg"] * thr_g, st["tg"]),
            tb=jnp.where(cont, st["tb"] * thr_b, st["tb"]),
            rr=rr, rg=rg, rb=rb,
            live=jnp.where(cont, 1.0, 0.0).astype(jnp.float32),
        )
        if has_sss:
            out["med_s"] = new_med_s
            out["med_r"] = new_med_r
            out["med_g"] = new_med_g
            out["med_b"] = new_med_b
        if nee:
            emit_ok_n = ~took_diffuse
            if has_sss:
                # interior scattering events sample no NEE, so the
                # next BSDF-found emission must count
                emit_ok_n = emit_ok_n | scatter_inside
            out["emit_ok"] = jnp.where(emit_ok_n, 1.0, 0.0).astype(
                jnp.float32
            )
        if grad_mode:
            for key in st:
                if key.startswith("c_"):
                    out[key] = st[key]
        if "time" in st:
            out["time"] = st["time"]  # shutter time rides with the ray
        return out

    def _nee_add(rr, rg, rb, st, isect, eligible, it_u, dep,
                 winners=None, collect=None):
        """Direct lighting (NEE) on planes: one area sample + one
        shadow trace per static light; semantics mirror
        render.integrator._nee_direct exactly."""
        has_diffuse = eligible & ~(isect["m_refr"] > 0.0)
        px, py, pz = isect["px"], isect["py"], isect["pz"]
        nx, ny, nz = isect["nx"], isect["ny"], isect["nz"]
        alb_r, alb_g, alb_b = isect["mc_r"], isect["mc_g"], isect["mc_b"]
        tpl = st.get("time")
        for k, (li, ltype) in enumerate(nee_lights):
            lr = lambda c: lights_ref[k, c]
            base = Draw.NEE_BASE + 3 * k
            u_sel = _uniform(it_u, pix_u, dep, base + 0)
            u1 = _uniform(it_u, pix_u, dep, base + 1)
            u2 = _uniform(it_u, pix_u, dep, base + 2)
            if ltype == T.SPHERE:
                # uniform direction on the unit sphere -> fwd transform
                z = 1.0 - 2.0 * u1
                r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
                phi = u2 * jnp.float32(TWO_PI)
                wx, wy, wz = r * jnp.cos(phi), r * jnp.sin(phi), z
                hx, hy, hz = 0.5 * wx, 0.5 * wy, 0.5 * wz
                lpx = lr(12) * hx + lr(13) * hy + lr(14) * hz + lr(21)
                lpy = lr(15) * hx + lr(16) * hy + lr(17) * hz + lr(22)
                lpz = lr(18) * hx + lr(19) * hy + lr(20) * hz + lr(23)
                lnx = lr(24) * wx + lr(25) * wy + lr(26) * wz
                lny = lr(27) * wx + lr(28) * wy + lr(29) * wz
                lnz = lr(30) * wx + lr(31) * wy + lr(32) * wz
                # |M^{-T} w| BEFORE normalizing: the per-sample area
                # Jacobian (exact for anisotropic lights; ops/lights)
                n_len = jnp.sqrt(lnx * lnx + lny * lny + lnz * lnz)
                w_area = jnp.float32(PI) * lr(33) * n_len
                inv_nl = 1.0 / n_len
                lnx, lny, lnz = lnx * inv_nl, lny * inv_nl, lnz * inv_nl
            else:
                # cube: face by area-cdf, then (s,t) on the parallelogram
                ss = u1 - 0.5
                tt = u2 - 0.5
                lpx = jnp.zeros((SUB, LANES), jnp.float32)
                lpy = jnp.zeros((SUB, LANES), jnp.float32)
                lpz = jnp.zeros((SUB, LANES), jnp.float32)
                lnx = jnp.zeros((SUB, LANES), jnp.float32)
                lny = jnp.zeros((SUB, LANES), jnp.float32)
                lnz = jnp.zeros((SUB, LANES), jnp.float32)
                prev = jnp.float32(0.0)
                for f in range(6):
                    hi = lr(6 + f)
                    if f < 5:
                        mface = (u_sel >= prev) & (u_sel < hi)
                    else:
                        mface = u_sel >= prev
                    ox_f = 12 + 3 * f
                    eb_f = 30 + 3 * f
                    ec_f = 48 + 3 * f
                    nn_f = 66 + 3 * f
                    lpx = jnp.where(
                        mface,
                        lr(ox_f) + ss * lr(eb_f) + tt * lr(ec_f), lpx,
                    )
                    lpy = jnp.where(
                        mface,
                        lr(ox_f + 1) + ss * lr(eb_f + 1)
                        + tt * lr(ec_f + 1), lpy,
                    )
                    lpz = jnp.where(
                        mface,
                        lr(ox_f + 2) + ss * lr(eb_f + 2)
                        + tt * lr(ec_f + 2), lpz,
                    )
                    lnx = jnp.where(mface, lr(nn_f), lnx)
                    lny = jnp.where(mface, lr(nn_f + 1), lny)
                    lnz = jnp.where(mface, lr(nn_f + 2), lnz)
                    prev = hi
                w_area = lr(5)  # exact total area (cube faces)
            if has_motion:
                # moving light: shift sample point to the ray's time
                lpx = lpx + tpl * lr(120)
                lpy = lpy + tpl * lr(121)
                lpz = lpz + tpl * lr(122)

            wlx, wly, wlz = lpx - px, lpy - py, lpz - pz
            r2 = wlx * wlx + wly * wly + wlz * wlz
            r2_safe = jnp.maximum(r2, 1e-8)
            dist_l = jnp.sqrt(jnp.maximum(r2, 1e-12))
            inv_dl = 1.0 / dist_l
            sdx, sdy, sdz = wlx * inv_dl, wly * inv_dl, wlz * inv_dl

            sh = trace_nearest(
                px, py, pz, sdx, sdy, sdz, tpl,
                live=jnp.where(has_diffuse, 1.0, 0.0),
                winners=winners, collect=collect, shadow=True,
            )
            tol = jnp.maximum(1e-3, 5e-3 * dist_l)
            visible = (
                sh["hit"]
                & (sh["gidx"] == float(li))
                & (jnp.abs(sh["dist"] - dist_l) < tol)
            )

            cos_s = jnp.maximum(
                nx * sdx + ny * sdy + nz * sdz, 0.0
            )
            cos_l = jnp.maximum(
                -(lnx * sdx + lny * sdy + lnz * sdz), 0.0
            )
            gterm = cos_s * cos_l / r2_safe * w_area  # * 1/pdf_area
            w_ok = has_diffuse & visible
            f_pi = jnp.float32(1.0 / PI)
            rr = rr + jnp.where(
                w_ok, st["tr"] * alb_r * f_pi * lr(2) * gterm, 0.0
            )
            rg = rg + jnp.where(
                w_ok, st["tg"] * alb_g * f_pi * lr(3) * gterm, 0.0
            )
            rb = rb + jnp.where(
                w_ok, st["tb"] * alb_b * f_pi * lr(4) * gterm, 0.0
            )
        return rr, rg, rb

    # counts are accumulated as a one-hot plane (scalar VMEM stores are
    # not supported by Mosaic): row 0, col d holds bounce d's live count
    crow = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

    def init_state(it_u):
        """Raygen + per-sample extras — the state entering bounce 0."""
        state = raygen_state(it_u)
        if nee:
            state["emit_ok"] = jnp.ones((SUB, LANES), jnp.float32)
        if has_motion:
            # shutter-time per camera sample (motion blur)
            state["time"] = _uniform(it_u, pix_u, 0, Draw.TIME)
        if has_sss:
            # current medium: extinction sigma (0 = vacuum) + albedo
            state["med_s"] = jnp.zeros((SUB, LANES), jnp.float32)
            state["med_r"] = jnp.ones((SUB, LANES), jnp.float32)
            state["med_g"] = jnp.ones((SUB, LANES), jnp.float32)
            state["med_b"] = jnp.ones((SUB, LANES), jnp.float32)
        return state

    def bounce(st, d, it_u, winners=None, collect=None):
        """One intersect+shade step — exposed (with :func:`init_state`)
        for the reverse sweep in :func:`_vjp_kernel`, which transposes
        the trace bounce-by-bounce.  ``winners``/``collect`` hoist the
        detached BVH traversals out of the differentiated trace
        ('carry' mode): the forward sweep collects one winner set per
        trace_nearest call, the vjp'd bounce consumes them."""
        isect = intersect(st, winners=winners, collect=collect)
        return shade(st, isect, d, it_u, winners=winners,
                     collect=collect)

    def trace_one(it_u, counts_acc):
        """One sample's full trace: raygen -> depth loop.  Returns the
        final state (radiance in rr/rg/rb) and the updated live-count
        accumulator."""
        state = init_state(it_u)

        def depth_body(d, carry):
            st, counts_acc = carry
            n_live = jnp.sum(st["live"]).astype(jnp.int32)
            counts_acc = counts_acc + jnp.where(
                (crow == 0) & (ccol == d), n_live, 0
            )

            if early_exit:
                st = jax.lax.cond(
                    n_live > 0, lambda q: bounce(q, d, it_u),
                    lambda q: q, st,
                )
            else:
                st = bounce(st, d, it_u)
            return st, counts_acc

        state, counts_acc = jax.lax.fori_loop(
            0, depth, depth_body, (state, counts_acc)
        )
        return state, counts_acc

    def trace_span(it_u, state, d0, d1, counts_acc):
        """Bounces [d0, d1) from a carried state — the split-engine
        phase body (same depth_body ops as trace_one, so a split trace
        is bit-identical to the monolithic one)."""
        def depth_body(d, carry):
            st, counts_acc = carry
            n_live = jnp.sum(st["live"]).astype(jnp.int32)
            counts_acc = counts_acc + jnp.where(
                (crow == 0) & (ccol == d), n_live, 0
            )
            return bounce(st, d, it_u), counts_acc

        return jax.lax.fori_loop(
            d0, d1, depth_body, (state, counts_acc)
        )

    trace_one.init_state = init_state
    trace_one.bounce = bounce
    trace_one.trace_span = trace_span
    return trace_one


def _kernel(it_ref, cam_ref, mats_ref, gmat_ref, *rest, geom_types,
            width, height, depth, n_pixels, n_tris=0, n_spp=1,
            features=(True,) * 7, nee_lights=(), grad_mats=(),
            early_exit=False, bvh_meta=(), rr_mode=False, tex_geom=(),
            btex_geom=(), stream_mesh=False, stream_tex=False):
    """One ray tile, full trace.

    it_ref: (1,2) SMEM int32 — [iteration, pixel offset].
    cam_ref: (1,16) VMEM f32 — pos(3) view(3) right(3) up(3) tanx tany
      aperture focal.
    mats_ref: (G,24) VMEM f32 per-geom *gathered* material rows:
      color(3) spec_color(3) spec_ex refl refr ior emit | checker
      scale+color (11..14) | bump scale+strength (15..16) | SSS
      sigma+albedo (17..20) | pad
      (layout built in _pack_scene — extend there, not here).
    gmat_ref: (G,40) VMEM f32 per-geom transforms: fwd 3x4 (0..11),
      inv 3x4 (12..23), invT 3x3 (24..32), velocity (33..35),
      transmission push (36), pad.
    tri_ref (only when n_tris > 0): (T, 128) VMEM f32 per-triangle rows
      [inv 3x4 | fwd 3x4 | invT 3x3 | v0 | e1 | e2 | n_obj | material
      row (11)] — triangles live in VMEM and fold via fori_loop, the
      Pallas answer to mesh scenes (the XLA scan-fold pays ~26 full
      HBM wavefront passes per bounce; here it's all on-chip).
    rad_*_ref: (SUB,128) VMEM f32 outputs (radiance planes).
    counts_ref: (8, 128) VMEM i32 output; row 0, col d = live lanes
      entering bounce d (padded block to satisfy TPU tiling).

    ``features`` = (has_glass, has_imperfect, has_dof, has_motion,
    has_checker, has_bump): static scene facts; sections whose
    materials/camera can never trigger are not emitted at all (a
    scene-specialized kernel — the TPU version of shader
    specialization).
    """
    nee = bool(nee_lights)
    grad_mode = bool(grad_mats)
    n_mats = grad_mats[0] if grad_mode else 0
    tex_mode = bool(tex_geom) and any(t[0] >= 0 for t in tex_geom)
    btex_mode = bool(btex_geom) and any(t[0] >= 0 for t in btex_geom)
    rest = list(rest)
    # scratch refs trail the outputs in scratch_shapes order:
    # (mesh: tri_leaf, node_win, sem_t, sem_n) then
    # (tex: slab_r, slab_g, slab_b, tsem_r, tsem_g, tsem_b) —
    # pop the tex block first (declared last)
    if stream_tex:
        tsem_b = rest.pop()
        tsem_g = rest.pop()
        tsem_r = rest.pop()
        slab_b = rest.pop()
        slab_g = rest.pop()
        slab_r = rest.pop()
        tex_stream_refs = ((slab_r, slab_g, slab_b),
                           (tsem_r, tsem_g, tsem_b))
    else:
        tex_stream_refs = None
    if stream_mesh:
        sem_n = rest.pop()
        sem_t = rest.pop()
        node_win = rest.pop()
        tri_leaf = rest.pop()
        stream_refs = (tri_leaf, node_win, sem_t, sem_n)
    else:
        stream_refs = None
    tri_ref = rest.pop(0) if n_tris else None
    nodes_ref = rest.pop(0) if (n_tris and bvh_meta) else None
    lights_ref = rest.pop(0) if nee else None
    if tex_mode or btex_mode:
        if stream_tex:
            # HBM-resident tables: keep the ANY refs — the slab-serving
            # fetch DMAs 8-row windows on demand
            texr_v = rest.pop(0)
            texg_v = rest.pop(0)
            texb_v = rest.pop(0)
        else:
            # lane-replicated flat texture tables (rows, 128) VMEM;
            # loaded as values (the row-sweep gather consumes vectors)
            texr_v = rest.pop(0)[:, :]
            texg_v = rest.pop(0)[:, :]
            texb_v = rest.pop(0)[:, :]
    else:
        texr_v = texg_v = texb_v = None
    if grad_mode:
        mtab_ref = rest.pop(0)     # (M,8): color3 spec3 emit refl
        ct_r_ref = rest.pop(0)     # cotangent planes (tile blocks)
        ct_g_ref = rest.pop(0)
        ct_b_ref = rest.pop(0)
        rad_r_ref, rad_g_ref, rad_b_ref, counts_ref, gtab_ref = rest
    else:
        rad_r_ref, rad_g_ref, rad_b_ref, counts_ref = rest
    tile = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
    # global flat pixel id; it_ref[0,1] is the shard's pixel offset
    # (0 single-device; pixel-sharded rendering gives each device a
    # contiguous slab — the RNG keys on the GLOBAL id, so any sharding
    # renders the identical image)
    pixel = (tile * SUB + row) * LANES + lane + it_ref[0, 1]
    valid = pixel < n_pixels
    pix_u = _u32(pixel)

    fx = (pixel % width).astype(jnp.float32)
    fy = (pixel // width).astype(jnp.float32)
    trace_one = _make_tracer(
        cam_ref, mats_ref, gmat_ref, tri_ref, lights_ref,
        geom_types=geom_types, width=width, height=height, depth=depth,
        n_tris=n_tris, features=features, nee_lights=nee_lights,
        grad_mats=grad_mats, early_exit=early_exit, pix_u=pix_u,
        fx=fx, fy=fy, valid=valid, nodes=nodes_ref, bvh_meta=bvh_meta,
        rr_mode=rr_mode, tex_geom=tex_geom, btex_geom=btex_geom,
        texr=texr_v, texg=texg_v, texb=texb_v, stream=stream_refs,
        tex_stream=tex_stream_refs,
    )

    def one_sample(sidx, acc):
        """Full trace of one sample per pixel, accumulating in VMEM —
        the in-kernel spp loop amortizes the radiance writeback across
        samples (HBM traffic per ray per sample: zero)."""
        acc_r, acc_g, acc_b, counts_acc = acc[:4]
        it_u = _u32(
            jnp.full((SUB, LANES), it_ref[0, 0] + sidx, jnp.int32)
        )
        state, counts_acc = trace_one(it_u, counts_acc)
        out = (acc_r + state["rr"], acc_g + state["rg"],
               acc_b + state["rb"], counts_acc)
        if grad_mode:
            out = out + (_grad_accumulate(state, acc[4]),)
        return out

    def _grad_accumulate(st, gtab):
        """Fold this sample's analytic material gradients into the
        per-tile table.  Layout (8,128): rows 0-2 d/d color rgb (col=m),
        rows 3-5 d/d spec_color rgb, row 6 d/d emittance,
        row 7 d/d has_reflective."""
        ct_r = ct_r_ref[:, :]
        ct_g = ct_g_ref[:, :]
        ct_b = ct_b_ref[:, :]
        wr = ct_r * st["rr"]
        wg = ct_g * st["rg"]
        wb = ct_b * st["rb"]
        grow = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
        eps = jnp.float32(1e-8)
        for mm in range(n_mats):
            mv = lambda c: mtab_ref[mm, c]
            # unpack the base-64 digits (exact: powers of two, all
            # intermediates integer-valued < 2^24)
            a = st[f"c_a_{mm}"]
            n_dp = jnp.floor(a * jnp.float32(1.0 / 262144.0))
            a = a - n_dp * jnp.float32(262144.0)
            n_em = jnp.floor(a * jnp.float32(1.0 / 4096.0))
            a = a - n_em * jnp.float32(4096.0)
            n_sp = jnp.floor(a * jnp.float32(1.0 / 64.0))
            n_ce = a - n_sp * jnp.float32(64.0)
            n_d1 = st[f"c_b_{mm}"]
            vals = []
            for w, ci in ((wr, 0), (wg, 1), (wb, 2)):
                c = mv(ci)
                vals.append(jnp.sum(
                    jnp.where(c > eps, w * n_ce / jnp.maximum(c, eps),
                              0.0)
                ))
            for w, ci in ((wr, 3), (wg, 4), (wb, 5)):
                c = mv(ci)
                vals.append(jnp.sum(
                    jnp.where(c > eps, w * n_sp / jnp.maximum(c, eps),
                              0.0)
                ))
            e = mv(6)
            wsum = wr + wg + wb
            vals.append(jnp.sum(
                jnp.where(e > eps,
                          wsum * n_em / jnp.maximum(e, eps), 0.0)
            ))
            pm = jnp.clip(mv(7), 0.0, 1.0)
            term = (
                -jnp.where(pm > eps, n_dp / jnp.maximum(pm, eps), 0.0)
                + jnp.where(1.0 - pm > eps,
                            n_d1 / jnp.maximum(1.0 - pm, eps), 0.0)
            )
            vals.append(jnp.sum(wsum * term))
            for r_i, v in enumerate(vals):
                gtab = gtab + jnp.where(
                    (grow == r_i) & (gcol == mm), v, 0.0
                )
        return gtab

    zeros = jnp.zeros((SUB, LANES), jnp.float32)
    init = (zeros, zeros, zeros, jnp.zeros((8, LANES), jnp.int32))
    if grad_mode:
        init = init + (jnp.zeros((8, LANES), jnp.float32),)
    acc = jax.lax.fori_loop(0, n_spp, one_sample, init)
    acc_r, acc_g, acc_b, counts_acc = acc[:4]

    counts_ref[:, :] = counts_acc
    rad_r_ref[:, :] = acc_r
    rad_g_ref[:, :] = acc_g
    rad_b_ref[:, :] = acc_b
    if grad_mode:
        gtab_ref[:, :] = acc[4]


# ----------------------------------------------------------------------------
# host wrapper
# ----------------------------------------------------------------------------

# in-kernel image-texture RESIDENT ceilings.  The binding constraint
# is NOT VMEM (u8-packed tables cost HWtot/4 bytes per channel) but
# tpu.dynamic_gather's single-vreg source limit: each bilinear tap
# sweeps the table's ceil(HWtot/512) word-rows (_tex_fetch_multi;
# one lane-gather + select per tap per row), so fetch cost is LINEAR
# in the total texel count and the sweep is UNROLLED code — ~93 s
# cold compile at the bump-heavy 65,536-texel cap (round-4 HW sweep,
# tools/tex_crossover.py: in-kernel 12.8 ms at 128^2, 38.6 at 256^2,
# 181 at 256^2+bump).  Beyond these caps the tables no longer fall
# back to the planes engine — they STREAM (next block).
KTEX_MAX_SIDE = 256
KTEX_MAX_TEXELS = 65536  # e.g. one 256x256 map, or four 128x128

# Round 5: ABOVE the resident caps the tables move to HBM
# (memory_space=ANY) and the fetch switches from the unrolled row
# sweep to a need-driven slab-serving while_loop (_make_tracer
# fetch3): each iteration DMAs the 8-row aligned slab holding the
# MINIMUM still-unserved word-row of the tile's taps (the mesh-
# streaming DMA pattern at NODE_WINDOW) and serves every tap that
# lands in it.  Compile time stops scaling with texel count (one
# traced loop body) and fetch cost scales with the number of DISTINCT
# 8-row slabs the tile's taps actually touch per bounce — tap-
# coherent bounces visit a handful; the fully-decoherent worst case
# degrades to the old full sweep's gather count, never worse.  The
# stream caps below bound the f32-exact chart planes (2^24 texel
# offsets) and table HBM cost, not the kernel design.
KTEX_STREAM_MAX_SIDE = 2048
# one 2048^2 map (the loader's safety clamp, scene/textures.py) PLUS
# headroom for companion maps (bump heights etc.); the true bounds are
# f32 chart-offset exactness (2^24) and HBM cost, far above this
KTEX_STREAM_TEXELS = 6 * 1024 * 1024
# resident table rows at the resident cap: 65,536 texels, 4 u8/word,
# 128 words/row -> 128 rows; larger tables auto-stream
KTEX_RESIDENT_ROWS = KTEX_MAX_TEXELS // (4 * LANES)


def _tex_used(scene):
    """Static: texture ids (albedo AND bump maps) actually referenced
    by some geom's material, in table-offset order.  Declared-but-
    unreferenced textures neither occupy VMEM nor disqualify the scene
    (host-side only: reads concrete material ids).  Bump maps count
    for every geom kind: sphere/cube charts are analytic, mesh
    triangles carry per-face UV tangent frames
    (ops/intersect.triangle_uv_gradients via _pack_scene)."""
    mids_all = np.asarray(scene.geoms.material_id)
    mids = {int(m) for m in mids_all}
    used = {
        scene.texture_ids[m] for m in mids
        if scene.texture_ids[m] >= 0
    }
    used |= {
        scene.bump_texture_ids[m] for m in mids
        if scene.bump_texture_ids[m] >= 0
    }
    return tuple(sorted(used))


def _tex_in_kernel(scene, used=None):
    """Static: can the megakernel run this scene's image textures
    (albedo TEXTURE and BUMPTEX height maps)?  Round 5: up to
    KTEX_STREAM_MAX_SIDE per map / KTEX_STREAM_TEXELS total across the
    referenced set (under the resident caps the table sits in VMEM and
    the unrolled row sweep taps it; over them it streams from HBM via
    the slab-serving fetch — both measured faster than the planes
    fallback at every size, BENCHMARKS.md "Streamed texture tables"),
    and every texel on the u8 grid (the in-kernel tables are u8-packed
    i32 words, exact only for u8-sourced textures — scene/textures.py
    loads all images that way; a hand-built f32 texture off the grid
    runs on the planes engine instead of being silently quantized)."""
    used = _tex_used(scene) if used is None else used
    if not used:
        return False
    # resident caps OR the round-5 streamed caps (HBM tables + slab-
    # serving fetch — see KTEX_STREAM_TEXELS above); beyond those the
    # planes engine remains the fallback
    if any(
        max(scene.textures[t].shape[0], scene.textures[t].shape[1])
        > KTEX_STREAM_MAX_SIDE
        for t in used
    ):
        return False
    total = sum(
        int(scene.textures[t].shape[0]) * int(scene.textures[t].shape[1])
        for t in used
    )
    if total > KTEX_STREAM_TEXELS:
        return False
    for t in used:
        x = np.asarray(scene.textures[t], np.float32)
        if not np.array_equal(np.round(x * 255.0) / np.float32(255.0),
                              x):
            return False
    return True


def _tex_offsets(scene):
    used = _tex_used(scene)
    offs = {}
    off = 0
    for t in used:
        h, w = int(scene.textures[t].shape[0]), int(
            scene.textures[t].shape[1]
        )
        offs[t] = (off, h, w)
        off += h * w
    return offs


def _tex_spec(scene):
    """Static per-geom ALBEDO texture chart: tuple of
    (flat_offset, H, W) per geom — (-1, 0, 0) for untextured geoms.
    Offsets index the concatenated flat tables built by
    :func:`_pack_textures`."""
    offs = _tex_offsets(scene)
    out = []
    for mid in np.asarray(scene.geoms.material_id):
        t = scene.texture_ids[int(mid)]
        out.append(offs.get(t, (-1, 0, 0)) if t >= 0 else (-1, 0, 0))
    return tuple(out)


def _btex_spec(scene):
    """Static per-geom BUMPTEX height-map chart, same table offsets as
    :func:`_tex_spec` (one shared table set).  Every geom kind:
    sphere/cube charts are analytic (the post-fold section), mesh
    winners use per-face UV tangent frames packed by
    :func:`_pack_scene` and carried through the fold."""
    offs = _tex_offsets(scene)
    out = []
    for g, mid in enumerate(np.asarray(scene.geoms.material_id)):
        t = scene.bump_texture_ids[int(mid)]
        if t >= 0:
            out.append(offs[t])
        else:
            out.append((-1, 0, 0))
    return tuple(out)


def _pack_textures(scene, used, packed=False):
    """(texr, texg, texb): per-channel flat texture tables.  ``used``
    is the STATIC table order from :func:`_tex_used` (this runs under
    jit on traced scenes).

    ``packed=False`` (the XLA engines): (HWtot, 1) f32 — plain
    differentiable values, texel gradients flow through the gather.
    NOT lane-replicated: ``take_along_axis`` broadcasts the non-axis
    dim against the (SUB, LANES) index, so replicating to 128 lanes
    would only multiply HBM footprint 128x (a 2048x2048 map would
    cost 6.4 GB instead of 50 MB — the round-3 advisor finding).
    ``packed=True`` (the megakernel): (n_rows, LANES) i32, four u8
    texels per word, words row-major 128 to a row (no lane
    replication) — the only layout whose fetch Mosaic can lower (see
    :func:`_tex_fetch`); exact because loader texels are u8/255
    (``_tex_in_kernel`` verifies the u8 grid)."""
    outs = []
    for c in range(3):
        flat = jnp.concatenate([
            jnp.asarray(scene.textures[t], jnp.float32)[:, :, c]
            .reshape(-1)
            for t in used
        ])
        if packed:
            q = jnp.round(flat * 255.0).astype(jnp.int32)
            n4 = (q.shape[0] + 3) // 4
            q = jnp.concatenate(
                [q, jnp.zeros((n4 * 4 - q.shape[0],), jnp.int32)]
            ).reshape(n4, 4)
            words = (q[:, 0] | (q[:, 1] << 8) | (q[:, 2] << 16)
                     | (q[:, 3] << 24))
            n_rows = -(-words.shape[0] // LANES)
            words = jnp.concatenate([
                words,
                jnp.zeros((n_rows * LANES - words.shape[0],),
                          jnp.int32),
            ])
            outs.append(words.reshape(n_rows, LANES))
            continue
        # planes engine: (rows, 128) f32 so taps can ROW-gather + one-
        # hot-contract (plane_engine._tex_fetch_direct) instead of the
        # serializing per-element gather; zero-pad only the tail (the
        # concatenated per-texture offsets stay valid)
        n_rows = -(-flat.shape[0] // LANES)
        flat = jnp.concatenate([
            flat,
            jnp.zeros((n_rows * LANES - flat.shape[0],), jnp.float32),
        ])
        outs.append(flat.reshape(n_rows, LANES))
    return tuple(outs)


def _pack_scene(scene, tex_geom=(), btex_geom=()):
    """Scene pytree -> (cam (1,16), mats (G,16), gmat (G,36)) f32.

    ``tex_geom`` (static, from :func:`_tex_spec`, () = textures off)
    adds the per-tri texture chart/vt columns to the triangle tables;
    ``btex_geom`` (static, :func:`_btex_spec`) with a chart on a MESH
    geom additionally packs per-tri UV tangent frames
    (ops/intersect.triangle_uv_gradients) for mesh bump mapping."""
    width, height = scene.resolution
    view, right, up, tan_x, tan_y = camera_basis(
        scene.camera, width, height
    )
    cam = jnp.concatenate([
        scene.camera.position.reshape(-1), view.reshape(-1),
        right.reshape(-1), up.reshape(-1),
        jnp.stack([
            jnp.asarray(tan_x, jnp.float32),
            jnp.asarray(tan_y, jnp.float32),
            scene.camera.aperture.astype(jnp.float32),
            scene.camera.focal_dist.astype(jnp.float32),
        ]),
    ]).reshape(1, 16)

    m = scene.materials
    mid = scene.geoms.material_id
    chk_s = (m.checker_scale if m.checker_scale is not None
             else jnp.zeros((m.count,), jnp.float32))
    chk_c = (m.checker_color if m.checker_color is not None
             else jnp.zeros((m.count, 3), jnp.float32))
    bmp_s = (m.bump_scale if m.bump_scale is not None
             else jnp.zeros((m.count,), jnp.float32))
    bmp_k = (m.bump_strength if m.bump_strength is not None
             else jnp.zeros((m.count,), jnp.float32))
    sss_s = (m.sss_sigma if m.sss_sigma is not None
             else jnp.zeros((m.count,), jnp.float32))
    sss_a = (m.sss_albedo if m.sss_albedo is not None
             else jnp.ones((m.count, 3), jnp.float32))
    btx_k = (m.bumptex_strength if m.bumptex_strength is not None
             else jnp.zeros((m.count,), jnp.float32))
    mats = jnp.concatenate([
        m.color[mid], m.spec_color[mid],
        m.spec_exponent[mid][:, None], m.has_reflective[mid][:, None],
        m.has_refractive[mid][:, None], m.ior[mid][:, None],
        m.emittance[mid][:, None],
        jnp.asarray(chk_s, jnp.float32)[mid][:, None],   # 11
        jnp.asarray(chk_c, jnp.float32)[mid],            # 12..14
        jnp.asarray(bmp_s, jnp.float32)[mid][:, None],   # 15
        jnp.asarray(bmp_k, jnp.float32)[mid][:, None],   # 16
        jnp.asarray(sss_s, jnp.float32)[mid][:, None],   # 17 (SSS sigma)
        jnp.asarray(sss_a, jnp.float32)[mid],            # 18..20 (albedo)
        jnp.asarray(btx_k, jnp.float32)[mid][:, None],   # 21 (BUMPTEX k)
        jnp.zeros((mid.shape[0], 2), jnp.float32),
    ], axis=1)  # (G,24)

    fwd, inv, inv_t = geom_transforms(scene.geoms)
    vel = scene.geoms.velocity
    if vel is None:
        vel = jnp.zeros((fwd.shape[0], 3), jnp.float32)
    push = T_PUSH * jnp.max(
        jnp.abs(jnp.asarray(scene.geoms.scale, jnp.float32)), axis=-1
    )[:, None]
    gmat = jnp.concatenate([
        fwd[:, :3, :].reshape(-1, 12),
        inv[:, :3, :].reshape(-1, 12),
        inv_t[:, :3, :3].reshape(-1, 9),
        jnp.asarray(vel, jnp.float32),   # 33..35 (motion blur)
        push,                            # 36 (transmission push epsilon)
        jnp.zeros((fwd.shape[0], 3), jnp.float32),
    ], axis=1)  # (G,40)

    def _tri_uv_cols(order=None, with_chart=False):
        """Per-tri vt columns (T, 6) — barycentric-identity when the
        OBJ had none (ops/intersect.py _fold_triangles default) — and,
        for the legacy fori_loop path whose tri index is traced,
        prepended per-tri (t_off, t_h, t_w) chart columns (T, 9).
        jnp-only: runs under jit with traced scene leaves."""
        t_count_l = int(scene.mesh.tri_verts.shape[0])
        uv = scene.mesh.tri_uv
        if uv is None:
            uv_t = jnp.broadcast_to(
                jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
                            jnp.float32)[None],
                (t_count_l, 3, 2),
            )
        else:
            uv_t = jnp.asarray(uv, jnp.float32)
            if order is not None:
                uv_t = uv_t[jnp.asarray(order)]
        cols = uv_t.reshape(-1, 6)
        if with_chart:
            tg_l = jnp.asarray(scene.mesh.tri_geom)
            if order is not None:
                tg_l = tg_l[jnp.asarray(order)]
            chart = jnp.asarray(tex_geom, jnp.float32)[tg_l]  # (T,3)
            cols = jnp.concatenate([chart, cols], axis=1)
        return cols

    def _tri_tang_cols(order=None):
        """Per-tri UV-chart gradient columns (T, 6) = (grad_u, grad_v)
        in object space — the mesh tangent frames for BUMPTEX
        (integrator._bumptex_normal's mesh branch uses the same
        values via the fold)."""
        from ..intersect import triangle_uv_gradients

        tv_l = jnp.asarray(scene.mesh.tri_verts, jnp.float32)
        uv_l = scene.mesh.tri_uv
        if uv_l is None:
            uv_l = jnp.broadcast_to(
                jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
                            jnp.float32)[None],
                (tv_l.shape[0], 3, 2),
            )
        else:
            uv_l = jnp.asarray(uv_l, jnp.float32)
        if order is not None:
            tv_l = tv_l[jnp.asarray(order)]
            uv_l = uv_l[jnp.asarray(order)]
        g_u, g_v = triangle_uv_gradients(tv_l, uv_l)
        return jnp.concatenate([g_u, g_v], axis=1)

    btex_mesh = bool(btex_geom) and any(
        btex_geom[g][0] >= 0 and int(t) == T.MESH
        for g, t in enumerate(scene.geoms.type)
    )
    tri = None
    nodes = None
    if scene.mesh.count:
        if scene.mesh.bvh_meta:
            # BVH engine: compact per-triangle geometry rows in BVH
            # (leaf-contiguous) order — [v0 (3), e1 (3), e2 (3),
            # n_obj (3)].  Instance transform / material / feature data
            # are static per geom (bvh_meta) and load from gmat/mats
            # like the primitive branches, so none of it is per-tri.
            order = jnp.asarray(scene.mesh.bvh_order)
            tv = jnp.asarray(scene.mesh.tri_verts, jnp.float32)[order]
            v0 = tv[:, 0]
            e1 = tv[:, 1] - tv[:, 0]
            e2 = tv[:, 2] - tv[:, 0]
            n_obj = jnp.cross(e1, e2)
            n_obj = n_obj / jnp.maximum(
                jnp.linalg.norm(n_obj, axis=-1, keepdims=True), 1e-20
            )
            if tex_geom or btex_mesh:
                # vt corners at cols 12..17 (chart is geom-static in
                # the BVH branch); mesh-BUMPTEX tangent frames at
                # 18..23 -> (T, 24)
                tail = (_tri_tang_cols(order) if btex_mesh
                        else jnp.zeros((tv.shape[0], 6), jnp.float32))
                tri = jnp.concatenate([
                    v0, e1, e2, n_obj,
                    _tri_uv_cols(order),
                    tail,
                ], axis=1)  # (T,24)
            else:
                tri = jnp.concatenate([
                    v0, e1, e2, n_obj,
                    jnp.zeros((tv.shape[0], 4), jnp.float32),
                ], axis=1)  # (T,16)
            nodes = jnp.asarray(scene.mesh.bvh_nodes, jnp.float32)
        else:
            tg = scene.mesh.tri_geom
            tv = scene.mesh.tri_verts  # (T,3,3)
            v0 = tv[:, 0]
            e1 = tv[:, 1] - tv[:, 0]
            e2 = tv[:, 2] - tv[:, 0]
            n_obj = jnp.cross(e1, e2)
            n_obj = n_obj / jnp.maximum(
                jnp.linalg.norm(n_obj, axis=-1, keepdims=True), 1e-20
            )
            tmats = mats[:, :11][tg]  # per-geom material rows -> per-tri
            t_count = tv.shape[0]
            texcols = (
                [_tri_uv_cols(with_chart=True)]        # 67..75 (tex)
                if tex_geom else []
            )
            pad0 = 128 - 67 - (9 if tex_geom else 0)
            tri = jnp.concatenate([
                inv[tg][:, :3, :].reshape(-1, 12),     # 0..11
                fwd[tg][:, :3, :].reshape(-1, 12),     # 12..23
                inv_t[tg][:, :3, :3].reshape(-1, 9),   # 24..32
                v0, e1, e2, n_obj,                     # 33..44
                tmats,                                 # 45..55
                jnp.asarray(vel, jnp.float32)[tg],     # 56..58 (motion)
                mats[:, 11:17][tg],                    # 59..64 (checker+bump)
                jnp.asarray(tg, jnp.float32)[:, None], # 65 (geom idx)
                push[tg],                              # 66 (transmission push)
            ] + texcols + [
                jnp.zeros((t_count, pad0), jnp.float32),
            ], axis=1)  # (T,128)
    return cam, mats, gmat, tri, nodes


@functools.partial(jax.jit, static_argnames=("resolution", "trace_depth",
                                             "geom_types", "interpret",
                                             "early_exit", "n_spp",
                                             "features", "nee_lights",
                                             "grad_mats", "bvh_meta",
                                             "rr_mode", "tex_geom",
                                             "btex_geom",
                                             "local_pixels",
                                             "stream_mesh",
                                             "stream_tex"))
def _run(cam, mats, gmat, tri, lights, it, resolution, trace_depth,
         geom_types, interpret=False, early_exit=False, n_spp=1,
         features=(True,) * 7, nee_lights=(), grad_mats=(),
         mtab=None, ct=None, nodes=None, bvh_meta=(), rr_mode=False,
         tex_geom=(), btex_geom=(), texs=None, pix0=None,
         local_pixels=None, stream_mesh=None, stream_tex=None):
    width, height = resolution
    n_pixels = width * height
    # pixel-sharded rendering: this call covers local_pixels pixels
    # starting at traced offset pix0 (defaults: the whole image)
    n_local = local_pixels if local_pixels is not None else n_pixels
    n_tiles = pl.cdiv(n_local, TILE)
    pad_rows = n_tiles * SUB
    n_tris = 0 if tri is None else tri.shape[0]
    grad_mode = bool(grad_mats)
    bvh_meta = bvh_meta if n_tris else ()
    tex_mode = bool(tex_geom) and any(t[0] >= 0 for t in tex_geom)
    btex_mode = bool(btex_geom) and any(t[0] >= 0 for t in btex_geom)
    tables_mode = tex_mode or btex_mode
    assert not (tables_mode and grad_mode)

    # texture streaming: tables past the resident row budget stay in
    # HBM and the fetch slab-serves them (KTEX_STREAM_TEXELS comment).
    # Shape-static under jit; stream_tex=True/False overrides (tests).
    if stream_tex is None:
        stream_tex = bool(
            tables_mode and texs[0].shape[0] > KTEX_RESIDENT_ROWS
        )
    stream_tex = bool(tables_mode and stream_tex)
    if stream_tex:
        # pad to whole 8-row slabs so the aligned slab DMA at the last
        # occupied row never reads past the table
        texs = tuple(
            jnp.pad(t, ((0, (-t.shape[0]) % 8), (0, 0))) for t in texs
        )

    # mesh streaming: lane-padded tri+node tables past the VMEM budget
    # move to HBM and the traversal DMAs them (module docstring at
    # NODE_WINDOW).  Shapes are static under jit, so this is a
    # trace-time decision; stream_mesh=True/False overrides (tests).
    table_rows = (n_tris + (nodes.shape[0] if nodes is not None else 0))
    over_budget = bool(bvh_meta) and \
        table_rows * LANES * 4 > MESH_STREAM_BYTES
    if stream_mesh is None:
        stream_mesh = over_budget and not grad_mode
    if grad_mode and over_budget:
        raise NotImplementedError(
            f"mesh tables ({table_rows} rows ~"
            f"{table_rows * LANES * 4 // 2**20} MB lane-padded) exceed "
            "the VMEM budget for the in-kernel gradient path; use the "
            "planes engine (render.diff engine='planes', bvh_grad) — "
            "it reads tri/node tables from HBM natively"
        )
    if stream_mesh:
        assert bvh_meta, "mesh streaming requires the BVH engine"
        # pad to full 128-lane rows (tile-aligned DMA slabs) and by a
        # window/leaf block so the forward cache never reads past the
        # array on the last geom's tail
        tri = jnp.pad(tri,
                      ((0, 2 * LEAF_K), (0, LANES - tri.shape[1])))
        nodes = jnp.pad(
            nodes, ((0, NODE_WINDOW), (0, LANES - nodes.shape[1]))
        )

    kernel = functools.partial(
        _kernel, geom_types=geom_types, width=width, height=height,
        depth=trace_depth, n_pixels=n_pixels, n_tris=n_tris,
        n_spp=n_spp, features=features, nee_lights=nee_lights,
        grad_mats=grad_mats, early_exit=early_exit, bvh_meta=bvh_meta,
        rr_mode=rr_mode, tex_geom=tex_geom if tex_mode else (),
        btex_geom=btex_geom if btex_mode else (),
        stream_mesh=stream_mesh, stream_tex=stream_tex,
    )
    tile_block = lambda: pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # it (1,1)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # cam
        pl.BlockSpec(memory_space=pltpu.VMEM),   # mats
        pl.BlockSpec(memory_space=pltpu.VMEM),   # gmat
    ]
    mesh_space = pl.ANY if stream_mesh else pltpu.VMEM
    if n_tris:
        in_specs.append(pl.BlockSpec(memory_space=mesh_space))  # tri
        if bvh_meta:
            in_specs.append(pl.BlockSpec(memory_space=mesh_space))
    if nee_lights:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # lights
    if tables_mode:
        tex_space = pl.ANY if stream_tex else pltpu.VMEM
        in_specs += [pl.BlockSpec(memory_space=tex_space)] * 3  # tex rgb
    if grad_mode:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # mtab
        in_specs += [tile_block(), tile_block(), tile_block()]   # ct rgb
    out_specs = [tile_block(), tile_block(), tile_block(),
                 pl.BlockSpec((8, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [
        jax.ShapeDtypeStruct((pad_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((pad_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((pad_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.int32),
    ]
    if grad_mode:
        out_specs.append(pl.BlockSpec((8, 128), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.float32)
        )
    scratch = ()
    if stream_mesh:
        scratch = (
            pltpu.VMEM((2 * LEAF_K, LANES), jnp.float32),   # tri_leaf
            pltpu.VMEM((NODE_WINDOW, LANES), jnp.float32),  # node_win
            pltpu.SemaphoreType.DMA,                        # sem_t
            pltpu.SemaphoreType.DMA,                        # sem_n
        )
    if stream_tex:
        scratch = scratch + (
            pltpu.VMEM((8, LANES), jnp.int32),              # slab_r
            pltpu.VMEM((8, LANES), jnp.int32),              # slab_g
            pltpu.VMEM((8, LANES), jnp.int32),              # slab_b
            pltpu.SemaphoreType.DMA,                        # tsem_r
            pltpu.SemaphoreType.DMA,                        # tsem_g
            pltpu.SemaphoreType.DMA,                        # tsem_b
        )
    p0 = jnp.asarray(0 if pix0 is None else pix0, jnp.int32)
    scal = jnp.stack(
        [jnp.asarray(it, jnp.int32).reshape(()), p0.reshape(())]
    ).reshape(1, 2)
    args = [scal, cam, mats, gmat]
    if n_tris:
        args.append(tri)
        if bvh_meta:
            args.append(nodes)
    if nee_lights:
        args.append(lights)
    if tables_mode:
        args += list(texs)
    if grad_mode:
        args.append(mtab)
        args += list(ct)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        out_shape=tuple(out_shape),
        interpret=interpret,
        # large meshes: the (T,16) tri table + BVH nodes are VMEM-
        # resident (lane-padded to 128), so a 100k-tri scene holds
        # ~60MB of tables — far above the 16MB default scoped limit
        # but within the chip's physical VMEM.  Past MESH_STREAM_BYTES
        # they move to HBM and stream (see above); the limit stays for
        # the resident tiers.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
    )(*args)
    rad_r, rad_g, rad_b, counts = outs[:4]

    rad = jnp.stack(
        [rad_r.reshape(-1), rad_g.reshape(-1), rad_b.reshape(-1)], axis=-1
    )[:n_local]
    counts = counts.reshape(n_tiles, 8, 128)[:, 0, :trace_depth]
    if grad_mode:
        gtab = jnp.sum(
            outs[4].reshape(n_tiles, 8, 128), axis=0
        )
        return rad, jnp.sum(counts, axis=0), gtab
    return rad, jnp.sum(counts, axis=0)


def _pack_lights(scene):
    """(lights (L,128) f32, nee_lights static tuple ((geom_idx, type),…))
    for the in-kernel NEE loop.  Layout per row: 0 gidx | 1 type |
    2-4 emission | cube: 5 total area, 6-11 area cdf, 12-29 face
    origins, 30-47 e_b, 48-65 e_c, 66-83 outward normals | sphere:
    12-20 fwd 3x3, 21-23 center, 24-32 invT 3x3, 33 |det M3| (exact
    per-sample area weight, ops/lights) | 120-122 velocity."""
    from ...ops import lights as L

    if not scene.light_indices:
        # no emissive geoms: NEE contributes nothing — render plain
        # (matches the jnp integrator's empty light loop)
        return None, ()
    fwd, inv, inv_t = geom_transforms(scene.geoms)
    rows = []
    statics = []
    for li in scene.light_indices:
        ltype = int(scene.geoms.type[li])
        statics.append((int(li), ltype))
        mid = scene.geoms.material_id[li]
        emission = (
            jnp.asarray(scene.materials.color)[mid]
            * jnp.asarray(scene.materials.emittance)[mid]
        )
        row = jnp.zeros((128,), jnp.float32)
        row = row.at[0].set(float(li)).at[1].set(float(ltype))
        row = row.at[2:5].set(emission)
        if ltype == T.SPHERE:
            row = row.at[12:21].set(fwd[li][:3, :3].reshape(-1))
            row = row.at[21:24].set(fwd[li][:3, 3])
            row = row.at[24:33].set(inv_t[li][:3, :3].reshape(-1))
            # |det M3| for the exact per-sample area weight
            # pi |det| |M^{-T} w| (slot 33; see ops/lights)
            row = row.at[33].set(L.sphere_det3(fwd[li], xp=jnp))
        else:
            tab = L.cube_light_tables(fwd[li])
            total = jnp.sum(tab["area"])
            cdf = jnp.cumsum(tab["area"]) / jnp.maximum(total, 1e-20)
            row = row.at[5].set(total)
            row = row.at[6:12].set(cdf)
            row = row.at[12:30].set(tab["origin"].reshape(-1))
            row = row.at[30:48].set(tab["e_b"].reshape(-1))
            row = row.at[48:66].set(tab["e_c"].reshape(-1))
            row = row.at[66:84].set(tab["normal"].reshape(-1))
        if scene.geoms.velocity is not None:
            row = row.at[120:123].set(
                jnp.asarray(scene.geoms.velocity)[li]
            )
        rows.append(row)
    return jnp.stack(rows), tuple(statics)


def _scene_features(scene):
    """(has_glass, has_imperfect, has_dof): static scene facts used to
    specialize the kernel.  Requires concrete (non-traced) leaves —
    true for scenes from load_scene; the jnp integrator remains the
    path for traced/differentiated scenes."""
    m = scene.materials
    return (
        bool(np.any(np.asarray(m.has_refractive) > 0)),
        bool(np.any(np.asarray(m.spec_exponent) > 0)),
        bool(np.asarray(scene.camera.aperture) > 0),
        scene.geoms.velocity is not None,
        scene.materials.checker_scale is not None,
        scene.materials.bump_strength is not None,
        scene.materials.sss_sigma is not None,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "early_exit",
                                             "features", "nee", "rr",
                                             "tex_geom", "tex_used",
                                             "btex_geom"))
def _iteration_jit(scene, it, interpret, early_exit, features, nee=False,
                   rr=False, tex_geom=(), tex_used=(), btex_geom=()):
    cam, mats, gmat, tri, nodes = _pack_scene(scene, tex_geom, btex_geom)
    lights, nee_lights = (
        _pack_lights(scene) if nee else (None, ())
    )
    texs = (_pack_textures(scene, tex_used, packed=True)
            if (tex_geom or btex_geom) else None)
    return _run(
        cam, mats, gmat, tri, lights, jnp.asarray(it, jnp.int32),
        tuple(scene.resolution), int(scene.trace_depth),
        tuple(scene.geoms.type), interpret, early_exit, 1, features,
        nee_lights, nodes=nodes, bvh_meta=scene.mesh.bvh_meta,
        rr_mode=rr, tex_geom=tex_geom, btex_geom=btex_geom, texs=texs,
    )


def _tex_statics(scene):
    """(tex_geom, tex_used, btex_geom) statics for the jit entry
    points — () when the respective mode has nothing to do, so inactive
    modes never widen the jit cache key or the packed tables.  Computes
    the shared used-set/offset scan once (this runs per render call)."""
    used = _tex_used(scene)
    if not used or not _tex_in_kernel(scene, used):
        return (), (), ()
    tg = _tex_spec(scene)
    bg = _btex_spec(scene)
    if not any(t[0] >= 0 for t in tg):
        tg = ()
    if not any(t[0] >= 0 for t in bg):
        bg = ()
    return tg, (used if (tg or bg) else ()), bg


def _xla_fallback(scene):
    # Textures past even the STREAMED caps (KTEX_STREAM_*), or off the
    # u8 grid, run on the XLA engine (falling back beats silently
    # rendering untextured).  Only geom-REFERENCED textures count: a
    # declared-but-unused map affects neither engine.
    used = _tex_used(scene)
    return bool(used) and not _tex_in_kernel(scene, used)


def pathtrace_iteration_pallas(scene, it, interpret=False,
                               early_exit=False, nee=False, rr=False):
    """Drop-in Pallas replacement for render.integrator.pathtrace_iteration
    (mask-mode semantics), spheres/cubes AND triangle meshes — the
    triangle table lives in VMEM and folds per ray tile.  Fully jitted,
    including scene packing — eager packing ops cost a host round-trip
    each on the TPU tunnel.
    """
    if _xla_fallback(scene):
        # fused-plane XLA engine: same trace, no VMEM texture caps
        from ...render.plane_engine import pathtrace_iteration_planes

        return pathtrace_iteration_planes(scene, it, nee=nee, rr=rr)
    tg, tu, bg = _tex_statics(scene)
    return _iteration_jit(
        scene, it, interpret, early_exit, _scene_features(scene), nee,
        rr, tg, tu, bg,
    )


def pathtrace_batch_pallas(scene, it0, n_iters: int, interpret=False,
                           early_exit=False, nee=False, rr=False,
                           stream=None, tex_stream=None):
    """``n_iters`` samples/pixel in ONE kernel launch: the spp loop runs
    *inside* the megakernel, so per-sample radiance never touches HBM —
    one accumulated writeback per call.  Returns
    (accumulated radiance (P,3), counts (depth,) summed over samples).
    Not itself jitted: scene feature flags are derived eagerly from the
    concrete scene, then everything runs under _batch_jit.
    """
    if _xla_fallback(scene):
        # fused-plane XLA engine: same trace, no VMEM texture caps
        from ...render.plane_engine import pathtrace_batch_planes

        return pathtrace_batch_planes(scene, it0, n_iters, nee=nee,
                                      rr=rr)
    tg, tu, bg = _tex_statics(scene)
    return _batch_jit(
        scene, it0, n_iters, interpret, early_exit,
        _scene_features(scene), nee, rr, tg, tu, bg, stream=stream,
        tex_stream=tex_stream,
    )


@functools.partial(jax.jit, static_argnames=("n_iters", "interpret",
                                             "early_exit", "features",
                                             "nee", "rr", "tex_geom",
                                             "tex_used", "btex_geom",
                                             "local_pixels", "stream",
                                             "tex_stream"))
def _batch_jit(scene, it0, n_iters, interpret, early_exit, features,
               nee=False, rr=False, tex_geom=(), tex_used=(),
               btex_geom=(), pix0=None, local_pixels=None, stream=None,
               tex_stream=None):
    cam, mats, gmat, tri, nodes = _pack_scene(scene, tex_geom, btex_geom)
    lights, nee_lights = (
        _pack_lights(scene) if nee else (None, ())
    )
    texs = (_pack_textures(scene, tex_used, packed=True)
            if (tex_geom or btex_geom) else None)
    rad, counts = _run(
        cam, mats, gmat, tri, lights, jnp.asarray(it0, jnp.int32),
        tuple(scene.resolution), int(scene.trace_depth),
        tuple(scene.geoms.type), interpret, early_exit, n_iters,
        features, nee_lights, nodes=nodes,
        bvh_meta=scene.mesh.bvh_meta, rr_mode=rr, tex_geom=tex_geom,
        btex_geom=btex_geom, texs=texs, pix0=pix0,
        local_pixels=local_pixels, stream_mesh=stream,
        stream_tex=tex_stream,
    )
    return rad, counts


# ----------------------------------------------------------------------------
# analytic material gradients (the backward Pallas path)
# ----------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_spp", "interpret",
                                             "features", "grad_mats"))
def _grads_jit(scene, ct, it0, n_spp, interpret, features, grad_mats):
    cam, mats, gmat, tri, nodes = _pack_scene(scene)
    m = scene.materials
    mtab = jnp.concatenate([
        jnp.asarray(m.color, jnp.float32),
        jnp.asarray(m.spec_color, jnp.float32),
        jnp.asarray(m.emittance, jnp.float32)[:, None],
        jnp.asarray(m.has_reflective, jnp.float32)[:, None],
    ], axis=1)  # (M,8)
    width, height = scene.resolution
    n_pixels = width * height
    n_tiles = pl.cdiv(n_pixels, TILE)
    pad = n_tiles * TILE - n_pixels
    ct_flat = jnp.concatenate(
        [jnp.asarray(ct, jnp.float32),
         jnp.zeros((pad, 3), jnp.float32)], axis=0
    )
    ct_planes = tuple(
        ct_flat[:, c].reshape(n_tiles * SUB, LANES) for c in range(3)
    )
    rad, counts, gtab = _run(
        cam, mats, gmat, tri, None, jnp.asarray(it0, jnp.int32),
        tuple(scene.resolution), int(scene.trace_depth),
        tuple(scene.geoms.type), interpret, False, n_spp, features,
        (), grad_mats, mtab, ct_planes, nodes=nodes,
        bvh_meta=scene.mesh.bvh_meta,
    )
    n_mats = grad_mats[0]
    return rad, dict(
        color=gtab[0:3, :n_mats].T,        # (M,3)
        spec_color=gtab[3:6, :n_mats].T,   # (M,3)
        emittance=gtab[6, :n_mats],        # (M,)
        has_reflective=gtab[7, :n_mats],   # (M,)
    )


def material_grads_pallas(scene, ct, it0, n_spp, interpret=False):
    """Analytic gradients of ``sum(ct * accumulated_radiance)`` w.r.t.
    material parameters, computed inside the megakernel — the backward
    Pallas path for inverse rendering.

    At fixed RNG a path's radiance is a product of per-bounce factors
    (albedo / specular tints, 1/p probability divisions) times the
    terminal emission; counting each material's factors per path makes
    the parameter gradient closed-form — no reverse sweep, no stored
    intermediates, same single VMEM-resident forward loop.  Exact vs
    XLA autodiff of the jnp integrator (tests/test_grad_kernel.py),
    with the documented estimator caveats: detached discrete choices,
    zero-valued parameter channels get zero gradient.

    Not supported (falls back to render.diff): NEE mode, russian
    roulette, CHECKER-textured albedo.

    Args:
      scene: concrete Scene (no checker materials).
      ct: (P,3) cotangent image (e.g. dLoss/dAccum).
      it0, n_spp: iteration range to trace.

    Returns (accumulated radiance (P,3),
             grads dict: color (M,3), spec_color (M,3), emittance (M,),
             has_reflective (M,)).
    """
    if scene.materials.checker_scale is not None:
        raise NotImplementedError(
            "material_grads_pallas does not support CHECKER materials; "
            "use render.diff.render_loss_and_grad"
        )
    if scene.materials.sss_sigma is not None:
        raise NotImplementedError(
            "material_grads_pallas does not support SSS materials; "
            "use render.diff.render_loss_and_grad"
        )
    if any(t >= 0 for t in scene.texture_ids) or any(
        t >= 0 for t in scene.bump_texture_ids
    ):
        raise NotImplementedError(
            "material_grads_pallas does not support image-textured "
            "materials (the per-path color-factor count assumes the "
            "albedo is the material RGB); use "
            "render.diff.render_loss_and_grad"
        )
    if scene.materials.count > 128:
        raise NotImplementedError(
            "material_grads_pallas supports at most 128 materials "
            "(one gradient-table column per material); use "
            "render.diff.render_loss_and_grad"
        )
    if int(scene.trace_depth) > 63:
        raise NotImplementedError(
            "material_grads_pallas packs factor counters as base-64 "
            "digits (exact only while each counter < 64, i.e. "
            "trace_depth <= 63); use render.diff.render_loss_and_grad"
        )
    grad_mats = (int(scene.materials.count),) + tuple(
        int(x) for x in np.asarray(scene.geoms.material_id)
    )
    return _grads_jit(
        scene, ct, it0, n_spp, interpret, _scene_features(scene),
        grad_mats,
    )

# ----------------------------------------------------------------------------
# full reverse sweep (the general backward Pallas path)
# ----------------------------------------------------------------------------

def _vjp_kernel(it_ref, cam_ref, mats_ref, gmat_ref, *rest, geom_types,
                width, height, depth, n_pixels, n_tris=0, n_spp=1,
                features=(True,) * 7, nee_lights=(), bvh_meta=()):
    """Fused value-and-gradient tile kernel: ``jax.vjp`` straight
    through the VMEM trace.

    Loads the scene tables (cam/mats/gmat[/lights]) as values and
    transposes the trace *inside the kernel*: forward sweep storing
    each bounce's carried ray state, then per-bounce ``jax.vjp``
    walking depth backwards (Mosaic cannot lower ``lax.scan``
    transposes or ``remat2``, so the reversal is written out) — the
    whole fwd+bwd trace stays VMEM-resident per tile.  This is the
    general backward path the factor-counting ``_grad_accumulate``
    cannot express: gradients w.r.t. EVERY entry of the packed tables
    (geometry transforms, camera, IOR, spec exponent, NEE light
    tables …), chained to TRS/camera/material parameters host-side
    through the differentiable ``_pack_scene`` / ``_pack_lights``
    (render/diff.py does the same chaining for the XLA engine).

    Table-gradient outputs use a constant-index output block: the TPU
    grid is sequential, so each tile accumulates into the same
    VMEM-resident block (initialized at tile 0).

    Spec anchor: the transpose of the reference's specified per-depth
    loop, src/pathtrace.cu:135-158; BASELINE.json north star (backward
    Pallas kernels; the grad psum in parallel/shard.py is synchronous
    and latency-bound at KB scale — AOT-verified, tools/aot_overlap.py).
    """
    nee = bool(nee_lights)
    rest = list(rest)
    tri_ref = rest.pop(0) if n_tris else None
    nodes_ref = rest.pop(0) if (n_tris and bvh_meta) else None
    lights_ref = rest.pop(0) if nee else None
    ct_r_ref = rest.pop(0)
    ct_g_ref = rest.pop(0)
    ct_b_ref = rest.pop(0)
    (rad_r_ref, rad_g_ref, rad_b_ref, d_cam_ref, d_mats_ref,
     d_gmat_ref) = rest[:6]
    d_lights_ref = rest[6] if nee else None

    tile = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
    pixel = (tile * SUB + row) * LANES + lane
    valid = pixel < n_pixels
    pix_u = _u32(pixel)
    fx = (pixel % width).astype(jnp.float32)
    fy = (pixel // width).astype(jnp.float32)

    cam0 = cam_ref[:, :]
    mats0 = mats_ref[:, :]
    gmat0 = gmat_ref[:, :]
    # tri/nodes stay RAW REFS: the carry-mode traversal indexes them
    # with traced loop counters, which Mosaic lowers for refs but not
    # for loaded values (dynamic_slice has no TC lowering); they are
    # detached (closure constants) either way
    lights0 = lights_ref[:, :] if nee else None
    ct = (ct_r_ref[:, :], ct_g_ref[:, :], ct_b_ref[:, :])

    def tracer_for(tables):
        if nee:
            cam_v, mats_v, gmat_v, lights_v = tables
        else:
            (cam_v, mats_v, gmat_v), lights_v = tables, None
        # mesh scenes: detached BVH traversal carrying the winner's
        # value planes ("carry" mode) — the while_loop stays
        # primal-only under jax.vjp (no transpose, which Mosaic
        # cannot lower) and the winner recompute is straight-line
        # differentiable math.  tri0/nodes0 are closure constants:
        # tri_verts gradients ride the planes engine (Mosaic has no
        # scatter for the gather transpose).
        return _make_tracer(
            cam_v, mats_v, gmat_v, tri_ref, lights_v,
            geom_types=geom_types, width=width, height=height,
            depth=depth, n_tris=n_tris, features=features,
            nee_lights=nee_lights, pix_u=pix_u, fx=fx, fy=fy,
            valid=valid, nodes=nodes_ref, bvh_meta=bvh_meta,
            bvh_grad="carry" if bvh_meta else False,
        )

    tables0 = ((cam0, mats0, gmat0, lights0) if nee
               else (cam0, mats0, gmat0))

    def one_sample(sidx, acc):
        it_u = _u32(
            jnp.full((SUB, LANES), it_ref[0, 0] + sidx, jnp.int32)
        )
        tr0 = tracer_for(tables0)

        # ---- forward sweep, storing only the carried ray state per
        # bounce (~15 (SUB,LANES) planes each — the remat residual set;
        # Mosaic cannot lower lax.scan transposes or remat2 calls, so
        # the reversal is written out: recompute bounce d from its
        # stored input state, transpose it, walk d backwards.  Mesh
        # scenes additionally store each bounce's detached BVH winner
        # planes (collect=...): inside jax.vjp, ref reads discharge to
        # value dynamic_slices Mosaic cannot lower, so the traversal
        # runs only HERE and the vjp'd bounce consumes its winners as
        # constants — identical values, identical trace.
        states = [tr0.init_state(it_u)]
        winners = []
        for d in range(depth):
            col = []
            states.append(tr0.bounce(states[-1], d, it_u, collect=col))
            winners.append(col)
        final = states[-1]

        # ---- reverse sweep
        zero_st = {k: jnp.zeros_like(v) for k, v in final.items()}
        d_st = dict(zero_st)
        d_st["rr"], d_st["rg"], d_st["rb"] = ct
        d_tab = jax.tree.map(jnp.zeros_like, tables0)
        for d in reversed(range(depth)):
            def f_d(tables, st_in, _d=d):
                return tracer_for(tables).bounce(
                    st_in, _d, it_u, winners=list(winners[_d])
                )

            _, vjp_fn = jax.vjp(f_d, tables0, states[d])
            dt, d_st = vjp_fn(d_st)
            d_tab = jax.tree.map(jnp.add, d_tab, dt)

        # raygen / per-sample extras depend on cam (DoF, basis)
        def f_0(tables):
            return tracer_for(tables).init_state(it_u)

        _, vjp0 = jax.vjp(f_0, tables0)
        (dt0,) = vjp0(d_st)
        d_tab = jax.tree.map(jnp.add, d_tab, dt0)

        out = (acc[0] + final["rr"], acc[1] + final["rg"],
               acc[2] + final["rb"],
               acc[3] + d_tab[0], acc[4] + d_tab[1], acc[5] + d_tab[2])
        if nee:
            out = out + (acc[6] + d_tab[3],)
        return out

    zeros = jnp.zeros((SUB, LANES), jnp.float32)
    init = (zeros, zeros, zeros,
            jnp.zeros_like(cam0), jnp.zeros_like(mats0),
            jnp.zeros_like(gmat0))
    if nee:
        init = init + (jnp.zeros_like(lights0),)
    acc = jax.lax.fori_loop(0, n_spp, one_sample, init)

    rad_r_ref[:, :] = acc[0]
    rad_g_ref[:, :] = acc[1]
    rad_b_ref[:, :] = acc[2]

    # cross-tile gradient accumulation: constant-index blocks stay
    # VMEM-resident across the sequential grid
    @pl.when(tile == 0)
    def _init():
        d_cam_ref[:, :] = jnp.zeros_like(cam0)
        d_mats_ref[:, :] = jnp.zeros_like(mats0)
        d_gmat_ref[:, :] = jnp.zeros_like(gmat0)
        if nee:
            d_lights_ref[:, :] = jnp.zeros_like(lights0)

    d_cam_ref[:, :] = d_cam_ref[:, :] + acc[3]
    d_mats_ref[:, :] = d_mats_ref[:, :] + acc[4]
    d_gmat_ref[:, :] = d_gmat_ref[:, :] + acc[5]
    if nee:
        d_lights_ref[:, :] = d_lights_ref[:, :] + acc[6]


@functools.partial(jax.jit, static_argnames=(
    "resolution", "trace_depth", "geom_types", "interpret", "n_spp",
    "features", "nee_lights", "bvh_meta"))
def _run_vjp(cam, mats, gmat, tri, lights, ct_planes, it, resolution,
             trace_depth, geom_types, interpret=False, n_spp=1,
             features=(True,) * 7, nee_lights=(), nodes=None,
             bvh_meta=()):
    """pallas_call wrapper for :func:`_vjp_kernel`.  Returns
    (radiance (P,3), d_cam, d_mats, d_gmat[, d_lights]) — gradients of
    ``sum(ct * radiance)`` w.r.t. the packed tables."""
    width, height = resolution
    n_pixels = width * height
    n_tiles = pl.cdiv(n_pixels, TILE)
    pad_rows = n_tiles * SUB
    n_tris = 0 if tri is None else tri.shape[0]
    nee = bool(nee_lights)

    bvh_meta = bvh_meta if n_tris else ()
    kernel = functools.partial(
        _vjp_kernel, geom_types=geom_types, width=width, height=height,
        depth=trace_depth, n_pixels=n_pixels, n_tris=n_tris,
        n_spp=n_spp, features=features, nee_lights=nee_lights,
        bvh_meta=bvh_meta,
    )
    tile_block = lambda: pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # it (1,1)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # cam
        pl.BlockSpec(memory_space=pltpu.VMEM),   # mats
        pl.BlockSpec(memory_space=pltpu.VMEM),   # gmat
    ]
    args = [it.reshape(1, 1).astype(jnp.int32), cam, mats, gmat]
    if n_tris:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(tri)
        if bvh_meta:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(nodes)
    if nee:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(lights)
    in_specs += [tile_block(), tile_block(), tile_block()]
    args += list(ct_planes)

    out_specs = [tile_block(), tile_block(), tile_block(),
                 whole(cam), whole(mats), whole(gmat)]
    out_shape = [
        jax.ShapeDtypeStruct((pad_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((pad_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((pad_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct(cam.shape, jnp.float32),
        jax.ShapeDtypeStruct(mats.shape, jnp.float32),
        jax.ShapeDtypeStruct(gmat.shape, jnp.float32),
    ]
    if nee:
        out_specs.append(whole(lights))
        out_shape.append(jax.ShapeDtypeStruct(lights.shape, jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=(n_tiles,), in_specs=in_specs,
            out_specs=tuple(out_specs),
        ),
        out_shape=tuple(out_shape),
        interpret=interpret,
        # the fwd+bwd trace holds ~24MB of planes (stored bounce states
        # + one bounce's transpose live set) — above the 16MB default
        # scoped-vmem limit but well within v5e's 128MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(*args)
    rad = jnp.stack(
        [outs[0].reshape(-1), outs[1].reshape(-1), outs[2].reshape(-1)],
        axis=-1,
    )[:n_pixels]
    return (rad,) + tuple(outs[3:])


@functools.partial(jax.jit, static_argnames=("n_spp", "interpret",
                                             "features", "nee",
                                             "nee_lights"))
def _render_vjp_jit(scene, params, ct, it0, n_spp, interpret, features,
                    nee, nee_lights):
    from ...render.diff import merge_params

    def pack(params):
        s = merge_params(scene, params)
        cam, mats, gmat, _tri, _nodes = _pack_scene(s)
        if nee:
            lights, _ = _pack_lights(s)
            return cam, mats, gmat, lights
        return cam, mats, gmat

    tables, pack_vjp = jax.vjp(pack, params)
    cam, mats, gmat = tables[:3]
    lights = tables[3] if nee else None
    # tri/nodes are closure constants to the kernel ("carry" mode):
    # tri_verts gradients ride the planes engine (Mosaic scatter limit)
    _, _, _, tri, nodes = _pack_scene(scene)

    width, height = scene.resolution
    n_pixels = width * height
    n_tiles = pl.cdiv(n_pixels, TILE)
    pad = n_tiles * TILE - n_pixels
    ct_flat = jnp.concatenate(
        [jnp.asarray(ct, jnp.float32),
         jnp.zeros((pad, 3), jnp.float32)], axis=0
    )
    ct_planes = tuple(
        ct_flat[:, c].reshape(n_tiles * SUB, LANES) for c in range(3)
    )
    outs = _run_vjp(
        cam, mats, gmat, tri, lights, ct_planes,
        jnp.asarray(it0, jnp.int32), tuple(scene.resolution),
        int(scene.trace_depth), tuple(scene.geoms.type), interpret,
        n_spp, features, nee_lights, nodes=nodes,
        bvh_meta=scene.mesh.bvh_meta,
    )
    rad = outs[0]
    (param_grads,) = pack_vjp(tuple(outs[1:]))
    if scene.mesh.count:
        # carry mode excludes tri_verts (the winner gather's transpose
        # is a scatter Mosaic cannot lower) — mark the exclusion as
        # None rather than returning an exact-zero array a training
        # loop could mistake for a true gradient (round-3 advisor).
        # tri_verts gradients: render.diff engine='planes' (bvh_grad).
        param_grads = dict(param_grads, tri_verts=None)
    return rad, param_grads


def render_vjp_pallas(scene, ct, it0, n_spp, interpret=False,
                      nee=False):
    """Radiance + full parameter gradients, entirely on the Pallas path.

    Gradients of ``sum(ct * accumulated_radiance)`` w.r.t. ALL
    differentiable scene parameters (render/diff.split_params: material
    fields incl. IOR/spec exponent, geom TRS, camera) — the general
    reverse sweep ``material_grads_pallas`` cannot express.  The trace
    is transposed inside the megakernel (see :func:`_vjp_kernel`);
    parameter chaining through scene packing happens host-side via the
    same differentiable code the XLA engine uses.

    Mesh scenes run the detached-winner BVH traversal in "carry" mode
    (the while_loop stays primal-only and the winner recompute is
    straight-line math, so the whole sweep lowers on Mosaic):
    TRS/camera/material/NEE gradients in-kernel; ``tri_verts``
    gradients are the one exclusion (the winner gather's transpose is
    a scatter-add Mosaic cannot lower) — the returned dict carries
    ``tri_verts=None`` (NOT zeros) so callers cannot mistake the
    exclusion for a true zero gradient; those ride the planes engine
    (render.diff engine='planes', bvh_grad).  Image-textured scenes
    fall back to render.diff.render_loss_and_grad (same scatter limit
    on texel gradients).

    Returns (accumulated radiance (P,3), grads dict matching
    render.diff.split_params).
    """
    from ...render.diff import split_params

    has_tex = any(t >= 0 for t in scene.texture_ids) or any(
        t >= 0 for t in scene.bump_texture_ids
    )
    if has_tex:
        raise NotImplementedError(
            "render_vjp_pallas: textured scenes use "
            "render.diff.render_loss_and_grad(engine='planes') — "
            "measured cost of the exclusion: 899 ms/grad-iter at "
            "textured 800x800 d8 (round 5, row-gather taps; was "
            "3.46 s) vs 50 ms for this sweep (BENCHMARKS.md "
            "'Gradients'; the texel-gather transpose is a scatter "
            "Mosaic cannot lower)"
        )
    if scene.mesh.count and not scene.mesh.bvh_meta:
        raise NotImplementedError(
            "render_vjp_pallas: mesh scenes need the BVH (scene/bvh.py "
            "builds one at load); the legacy linear fold's transpose "
            "is a scan Mosaic cannot lower"
        )
    if scene.mesh.count and scene.mesh.bvh_meta:
        rows = int(scene.mesh.tri_verts.shape[0]) \
            + int(np.asarray(scene.mesh.bvh_nodes).shape[0])
        if rows * LANES * 4 > MESH_STREAM_BYTES:
            raise NotImplementedError(
                f"render_vjp_pallas: mesh tables ({rows} rows, "
                f"~{rows * LANES * 4 // 2**20} MB lane-padded) exceed "
                "the VMEM budget; the reverse sweep needs them "
                "resident.  Use the planes engine (render.diff "
                "engine='planes', bvh_grad) — it reads the tables "
                "from HBM natively"
            )
    params = split_params(scene)
    # static light structure in pure python — calling _pack_lights here
    # would run its ~30 packing ops eagerly (one tunnel round-trip each)
    nee_lights = tuple(
        (int(li), int(scene.geoms.type[li]))
        for li in scene.light_indices
    ) if nee else ()
    return _render_vjp_jit(
        scene, params, ct, it0, n_spp, interpret,
        _scene_features(scene), nee, nee_lights,
    )


# ----------------------------------------------------------------------------
# split engine: tile-redensified wavefront of megakernel spans
# ----------------------------------------------------------------------------
#
# The monolithic megakernel runs every bounce for every tile; dead
# lanes are predicated but still burn VPU issue slots (the roofline's
# named lever, BENCHMARKS.md).  This engine is the reference's stream
# compaction (README.md:83-86, spec src/pathtrace.cu:152-156) recast
# for the TPU's execution model — and the recast is the interesting
# part:
#
# * Lane-granular re-densification is a measured LOSS on TPU: any
#   per-element global shuffle at wavefront size costs ~2.5-8 ms per
#   state plane (element gather 7.9 ms, row gather 2.4 ms,
#   scatter 5.8 ms, sort 3.1 ms — measured, 655k f32) because XLA:TPU
#   lowers them serially; with ~17 carried planes one boundary costs
#   more than the whole 8-bounce trace (~5 ms).  The reference's
#   per-ray compaction is architecturally moot here, completing the
#   round-2 analysis that already showed masking beats densification
#   INSIDE the kernel.
#
# * Tile-granular re-densification is nearly FREE: phase A writes its
#   carried state pixel-ALIGNED; a tiny (n_tiles,) partition picks the
#   tiles with any live lane; phase B's pallas grid reads exactly
#   those tiles through scalar-prefetched block index maps (the DMA
#   pipeline does the "compaction" as part of its normal block
#   fetches), with the dead-tail grid steps predicated off by a
#   scalar.  No state plane ever moves through an XLA shuffle.  This
#   wins where death is spatially coherent — primary-miss scenes
#   (sphere.txt: 95% of tiles dead after bounce 1), open scenes —
#   and costs one state round-trip (~45 MB HBM) where it is not.
#
# Bit-identity with the monolithic kernel: every pixel's radiance is
# one lane's ``rr`` added exactly once per sample (dead lanes at the
# boundary, survivors at the end — the other term is +0.0 which is
# bit-neutral for the non-negative radiance), and the span body is
# trace_one's depth loop verbatim (tests/test_split.py).

def _state_keys(features, nee):
    """Static carried-state plane list for the span kernels (must
    mirror _make_tracer.init_state / shade's carry)."""
    (has_glass, has_imperfect, has_dof, has_motion,
     has_checker, has_bump, has_sss) = features
    keys = ["ox", "oy", "oz", "dx", "dy", "dz", "tr", "tg", "tb",
            "rr", "rg", "rb", "live"]
    if nee:
        keys.append("emit_ok")
    if has_motion:
        keys.append("time")
    if has_sss:
        keys += ["med_s", "med_r", "med_g", "med_b"]
    return tuple(keys)


def _span_kernel(*refs, geom_types, width, height, d0, d1, n_pixels,
                 n_tris=0, features=(True,) * 7, nee_lights=(),
                 bvh_meta=(), rr_mode=False, tex_geom=(),
                 btex_geom=(), gen=True, state_keys=(),
                 carry_pixel=False, stream_mesh=False,
                 stream_tex=False):
    """Bounces [d0, d1) of the trace for one ray tile, state planes
    pixel-ALIGNED in HBM.

    ``gen=True`` (phase A): raygen, regular grid, writes carried state.
    ``gen=False`` (resume): the grid walks the live-tile table
    ``tbl_ref`` (scalar prefetch) — grid step i processes physical
    tile tbl[i]; steps >= the live count (it_ref[0,2]) are predicated
    off and park their writes on the scratch tile the runner appends.
    The lane's pixel id is recomputed from the physical tile, so no
    pixel plane is carried."""
    refs = list(refs)
    tbl_ref = None if (gen or carry_pixel) else refs.pop(0)
    it_ref, cam_ref, mats_ref, gmat_ref = refs[:4]
    rest = refs[4:]
    nee = bool(nee_lights)
    tex_mode = bool(tex_geom) and any(t[0] >= 0 for t in tex_geom)
    btex_mode = bool(btex_geom) and any(t[0] >= 0 for t in btex_geom)
    # scratch refs trail everything, same order as _kernel: mesh
    # block first, tex block last -> pop the tex block first
    if stream_tex:
        tsem_b = rest.pop()
        tsem_g = rest.pop()
        tsem_r = rest.pop()
        slab_b = rest.pop()
        slab_g = rest.pop()
        slab_r = rest.pop()
        tex_stream_refs = ((slab_r, slab_g, slab_b),
                           (tsem_r, tsem_g, tsem_b))
    else:
        tex_stream_refs = None
    if stream_mesh:
        # HBM mesh streaming in span kernels (sorted engine on over-
        # budget meshes)
        sem_n = rest.pop()
        sem_t = rest.pop()
        node_win = rest.pop()
        tri_leaf = rest.pop()
        stream_refs = (tri_leaf, node_win, sem_t, sem_n)
    else:
        stream_refs = None
    tri_ref = rest.pop(0) if n_tris else None
    nodes_ref = rest.pop(0) if (n_tris and bvh_meta) else None
    lights_ref = rest.pop(0) if nee else None
    if tex_mode or btex_mode:
        if stream_tex:
            # HBM-resident tables: keep the ANY refs — the slab-
            # serving fetch DMAs 8-row windows on demand (same as
            # _kernel; round-5 follow-up: the sorted engine's
            # coherence is exactly what the slab server wants)
            texr_v = rest.pop(0)
            texg_v = rest.pop(0)
            texb_v = rest.pop(0)
        else:
            texr_v = rest.pop(0)[:, :]
            texg_v = rest.pop(0)[:, :]
            texb_v = rest.pop(0)[:, :]
    else:
        texr_v = texg_v = texb_v = None
    nk = len(state_keys)
    in_state = None
    if not gen:
        in_state = rest[:nk]
        rest = rest[nk:]
    out_state = rest[:nk]
    rest = rest[nk:]
    counts_ref = rest.pop(0)

    i = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
    if carry_pixel and not gen:
        # sorted engine (round 5): the permutation between bounces
        # breaks tile/pixel alignment, so the pixel id rides the state
        # as an f32 plane (exact to 2^24) and keys the RNG — any
        # permutation renders the identical image per ray
        pixel = in_state[state_keys.index("pix")][:, :].astype(
            jnp.int32
        )
    else:
        phys = i if gen else tbl_ref[i]
        pixel = (phys * SUB + row) * LANES + lane + it_ref[0, 1]
    valid = pixel < n_pixels
    pix_u = _u32(pixel)
    fx = (pixel % width).astype(jnp.float32)
    fy = (pixel // width).astype(jnp.float32)
    trace_one = _make_tracer(
        cam_ref, mats_ref, gmat_ref, tri_ref, lights_ref,
        geom_types=geom_types, width=width, height=height, depth=d1,
        n_tris=n_tris, features=features, nee_lights=nee_lights,
        pix_u=pix_u, fx=fx, fy=fy, valid=valid, nodes=nodes_ref,
        bvh_meta=bvh_meta, rr_mode=rr_mode, tex_geom=tex_geom,
        btex_geom=btex_geom, texr=texr_v, texg=texg_v, texb=texb_v,
        stream=stream_refs, tex_stream=tex_stream_refs,
        subtile_ok=SPAN_SUBTILE,
    )
    it_u = _u32(jnp.full((SUB, LANES), it_ref[0, 0], jnp.int32))

    def run():
        if gen:
            st = trace_one.init_state(it_u)
        else:
            st = {k: r[:, :] for k, r in zip(state_keys, in_state)
                  if k != "pix"}
        st, counts = trace_one.trace_span(
            it_u, st, d0, d1, jnp.zeros((8, LANES), jnp.int32)
        )
        if carry_pixel:
            st["pix"] = pixel.astype(jnp.float32)
        for k, r in zip(state_keys, out_state):
            r[:, :] = st[k]
        counts_ref[:, :] = counts

    if gen or carry_pixel:
        # sorted engine: full grid every span (dead-sorted tail tiles
        # exit the BVH walk in one step; their radiance planes must be
        # carried, so they are written, not predicated off)
        run()
    else:
        @pl.when(i < it_ref[0, 2])
        def _():
            run()


def _run_span(cam, mats, gmat, tri, nodes, lights, texs, it,
              live_tiles, tbl, state_in, *, resolution, d0, d1,
              geom_types, interpret, features, nee_lights, bvh_meta,
              rr_mode, tex_geom, btex_geom, state_keys, pix0=0,
              carry_pixel=False, stream_mesh=False, stream_tex=None):
    """pallas_call wrapper for one span.  ``state_in``/``tbl`` None ->
    phase A (raygen, aligned output).  Resume: ``tbl`` (n_tiles+pad,)
    i32 live-first physical tile table (padding entries = n_tiles, the
    scratch tile).  Returns (state dict of ((n_tiles[+1])*SUB, LANES)
    planes, counts (8,))."""
    width, height = resolution
    n_pixels = width * height
    n_tiles = pl.cdiv(n_pixels, TILE)
    n_tris = 0 if tri is None else tri.shape[0]
    bvh_meta = bvh_meta if n_tris else ()
    nee = bool(nee_lights)
    tables = texs is not None
    gen = state_in is None
    nk = len(state_keys)
    # sorted engine (carry_pixel): identity tiles, no scratch slot
    out_tiles = n_tiles if (gen or carry_pixel) else n_tiles + 1

    stream_mesh = bool(stream_mesh and bvh_meta)
    if stream_mesh:
        # pad exactly like _run: aligned slab/window DMAs must never
        # read past the tables
        tri = jnp.pad(tri,
                      ((0, 2 * LEAF_K), (0, LANES - tri.shape[1])))
        nodes = jnp.pad(
            nodes, ((0, NODE_WINDOW), (0, LANES - nodes.shape[1]))
        )
    # texture streaming in spans: same shape-static decision as _run
    if stream_tex is None:
        stream_tex = bool(
            tables and texs[0].shape[0] > KTEX_RESIDENT_ROWS
        )
    stream_tex = bool(tables and stream_tex)
    if stream_tex:
        texs = tuple(
            jnp.pad(t, ((0, (-t.shape[0]) % 8), (0, 0))) for t in texs
        )
    kernel = functools.partial(
        _span_kernel, geom_types=geom_types, width=width,
        height=height, d0=d0, d1=d1, n_pixels=n_pixels, n_tris=n_tris,
        features=features, nee_lights=nee_lights, bvh_meta=bvh_meta,
        rr_mode=rr_mode, tex_geom=tex_geom, btex_geom=btex_geom,
        gen=gen, state_keys=state_keys, carry_pixel=carry_pixel,
        stream_mesh=stream_mesh, stream_tex=stream_tex,
    )
    if gen or carry_pixel:
        tile_in = lambda: pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
        tile_out = tile_in
        counts_out = pl.BlockSpec((8, 128), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    else:
        # the live-tile table drives every block index: inputs read
        # physical tile tbl[i] (clamped: padding entries point at the
        # scratch slot which inputs do not have), outputs write it
        # (padding steps park on the scratch tile)
        tile_in = lambda: pl.BlockSpec(
            (SUB, LANES),
            lambda i, tbl: (jnp.minimum(tbl[i], n_tiles - 1), 0),
            memory_space=pltpu.VMEM,
        )
        tile_out = lambda: pl.BlockSpec(
            (SUB, LANES), lambda i, tbl: (tbl[i], 0),
            memory_space=pltpu.VMEM,
        )
        counts_out = pl.BlockSpec((8, 128), lambda i, tbl: (tbl[i], 0),
                                  memory_space=pltpu.VMEM)
    scal = jnp.stack([
        jnp.asarray(it, jnp.int32).reshape(()),
        jnp.asarray(pix0, jnp.int32).reshape(()),
        jnp.asarray(live_tiles, jnp.int32).reshape(()),
    ]).reshape(1, 3)
    if gen:
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [smem(), vmem(), vmem(), vmem()]
    args = [scal, cam, mats, gmat]
    mesh_vm = (lambda: pl.BlockSpec(memory_space=pl.ANY)) \
        if stream_mesh else vmem
    if n_tris:
        in_specs.append(mesh_vm())
        args.append(tri)
        if bvh_meta:
            in_specs.append(mesh_vm())
            args.append(nodes)
    if nee:
        in_specs.append(vmem())
        args.append(lights)
    if tables:
        tex_spec = (lambda: pl.BlockSpec(memory_space=pl.ANY)) \
            if stream_tex else vmem
        in_specs += [tex_spec()] * 3
        args += list(texs)
    if not gen:
        in_specs += [tile_in() for _ in range(nk)]
        args += [state_in[k] for k in state_keys]

    out_specs = [tile_out() for _ in range(nk)] + [counts_out]
    out_shape = (
        [jax.ShapeDtypeStruct((out_tiles * SUB, LANES), jnp.float32)
         for _ in range(nk)]
        + [jax.ShapeDtypeStruct((out_tiles * 8, 128), jnp.int32)]
    )
    scratch = ()
    if stream_mesh:
        assert gen or carry_pixel, \
            "streamed spans require the identity-grid (sorted) path"
        scratch = (
            pltpu.VMEM((2 * LEAF_K, LANES), jnp.float32),   # tri_leaf
            pltpu.VMEM((NODE_WINDOW, LANES), jnp.float32),  # node_win
            pltpu.SemaphoreType.DMA,                        # sem_t
            pltpu.SemaphoreType.DMA,                        # sem_n
        )
    if stream_tex:
        assert gen or carry_pixel, \
            "streamed-tex spans require the identity-grid (sorted) path"
        scratch = scratch + (
            pltpu.VMEM((8, LANES), jnp.int32),              # slab_r
            pltpu.VMEM((8, LANES), jnp.int32),              # slab_g
            pltpu.VMEM((8, LANES), jnp.int32),              # slab_b
            pltpu.SemaphoreType.DMA,                        # tsem_r
            pltpu.SemaphoreType.DMA,                        # tsem_g
            pltpu.SemaphoreType.DMA,                        # tsem_b
        )
    if gen or carry_pixel:
        grid_spec = pl.GridSpec(
            grid=(n_tiles,), in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        )
        call_args = args
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n_tiles,),
            in_specs=in_specs, out_specs=tuple(out_specs),
        )
        call_args = [tbl] + args
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
    )(*call_args)
    st = {k: outs[i] for i, k in enumerate(state_keys)}
    # per-tile counts: resume-mode rows for tiles the span never
    # processed are stale buffer contents — the caller masks by tile
    # liveness before reducing
    counts_tiles = outs[nk].reshape(out_tiles, 8, 128)[:n_tiles, 0, :]
    return st, counts_tiles


@functools.partial(jax.jit, static_argnames=(
    "n_iters", "split", "interpret", "features", "nee", "rr",
    "tex_geom", "tex_used", "btex_geom"))
def _batch_split_jit(scene, it0, n_iters, split, interpret, features,
                     nee=False, rr=False, tex_geom=(), tex_used=(),
                     btex_geom=()):
    cam, mats, gmat, tri, nodes = _pack_scene(scene, tex_geom,
                                              btex_geom)
    lights, nee_lights = (
        _pack_lights(scene) if nee else (None, ())
    )
    texs = (_pack_textures(scene, tex_used, packed=True)
            if (tex_geom or btex_geom) else None)
    width, height = scene.resolution
    n_pixels = width * height
    n_tiles = pl.cdiv(n_pixels, TILE)
    depth = int(scene.trace_depth)
    state_keys = _state_keys(features, nee)
    common = dict(
        resolution=tuple(scene.resolution),
        geom_types=tuple(scene.geoms.type), interpret=interpret,
        features=features, nee_lights=nee_lights,
        bvh_meta=scene.mesh.bvh_meta, rr_mode=rr, tex_geom=tex_geom,
        btex_geom=btex_geom, state_keys=state_keys,
    )

    def one_sample(sidx, carry):
        acc, counts_tot = carry
        it = jnp.asarray(it0, jnp.int32) + sidx
        stA, cntA_t = _run_span(
            cam, mats, gmat, tri, nodes, lights, texs, it, n_tiles,
            None, None, d0=0, d1=split, **common,
        )
        cntA = cntA_t.sum(0)
        live = stA["live"] > 0.0  # (n_tiles*SUB, LANES), pixel-aligned
        # dead lanes: rr is final -> accumulate now, elementwise
        radA = jnp.stack(
            [jnp.where(~live, stA[k], 0.0).reshape(-1)
             for k in ("rr", "rg", "rb")], axis=-1,
        )
        acc = acc + radA[:n_pixels]
        # consumed dead radiance zeroed; everything stays ALIGNED
        for k in ("rr", "rg", "rb"):
            stA[k] = jnp.where(live, stA[k], 0.0)
        # tile-granular re-densify: live-first physical tile table
        # (tiny — n_tiles elements), padding entries park on the
        # scratch tile the resumed span appends
        tlive = jnp.any(
            live.reshape(n_tiles, SUB, LANES), axis=(1, 2)
        )
        order = jnp.argsort(~tlive, stable=True).astype(jnp.int32)
        live_tiles = jnp.sum(tlive.astype(jnp.int32))
        idx = jnp.arange(n_tiles, dtype=jnp.int32)
        tbl = jnp.where(idx < live_tiles, order, n_tiles)
        stB, cntB_t = _run_span(
            cam, mats, gmat, tri, nodes, lights, texs, it, live_tiles,
            tbl, stA, d0=split, d1=depth, **common,
        )
        cntB = (cntB_t * tlive[:, None].astype(jnp.int32)).sum(0)
        # outputs are pixel-aligned; unprocessed (all-dead) tiles are
        # stale buffer contents -> mask by tile liveness
        m = jnp.repeat(tlive, SUB * LANES)[:n_pixels]
        radB = jnp.stack(
            [stB[k].reshape(-1)[:n_pixels] for k in ("rr", "rg", "rb")],
            axis=-1,
        )
        acc = acc + jnp.where(m[:, None], radB, 0.0)
        return acc, counts_tot + cntA[:depth] + cntB[:depth]

    acc0 = jnp.zeros((n_pixels, 3), jnp.float32)
    cnt0 = jnp.zeros((depth,), jnp.int32)
    acc, counts = jax.lax.fori_loop(
        0, n_iters, one_sample, (acc0, cnt0)
    )
    return acc, counts


def pathtrace_batch_split(scene, it0, n_iters: int, split=3,
                          interpret=False, nee=False, rr=False):
    """``n_iters`` samples/pixel on the SPLIT megakernel engine:
    bounces [0, split) for every pixel tile, a tile-granular
    re-densification (the reference's stream compaction recast as
    scalar-prefetched block index maps — see the section comment for
    why per-LANE compaction is a measured loss on TPU), then bounces
    [split, depth) on the live tiles only.  Bit-identical to
    :func:`pathtrace_batch_pallas`.  Wins where death is spatially
    coherent (primary-miss / open scenes); costs one carried-state
    HBM round-trip where it is not.  Returns (accumulated radiance
    (P,3), counts (depth,))."""
    if _xla_fallback(scene):
        from ...render.plane_engine import pathtrace_batch_planes

        return pathtrace_batch_planes(scene, it0, n_iters, nee=nee,
                                      rr=rr)
    if scene.mesh.count and scene.mesh.bvh_meta:
        rows = int(scene.mesh.tri_verts.shape[0]) \
            + int(np.asarray(scene.mesh.bvh_nodes).shape[0])
        if rows * LANES * 4 > MESH_STREAM_BYTES:
            # over-budget meshes: the split engine keeps its tables
            # resident; route to the monolithic engine, whose
            # streaming path handles any size
            return pathtrace_batch_pallas(scene, it0, n_iters,
                                          interpret=interpret,
                                          nee=nee, rr=rr)
    used = _tex_used(scene)
    if used and sum(
        int(scene.textures[t].shape[0]) * int(scene.textures[t].shape[1])
        for t in used
    ) > KTEX_MAX_TEXELS:
        # over-resident textures: the split engine keeps its tables in
        # VMEM; route to the monolithic engine, whose HBM slab-serving
        # fetch handles the streamed sizes
        return pathtrace_batch_pallas(scene, it0, n_iters,
                                      interpret=interpret, nee=nee,
                                      rr=rr)
    depth = int(scene.trace_depth)
    split = max(1, min(int(split), depth - 1)) if depth > 1 else 0
    if split == 0:
        return pathtrace_batch_pallas(scene, it0, n_iters,
                                      interpret=interpret, nee=nee,
                                      rr=rr)
    tg, tu, bg = _tex_statics(scene)
    return _batch_split_jit(
        scene, it0, n_iters, split, interpret, _scene_features(scene),
        nee, rr, tg, tu, bg,
    )


# ----------------------------------------------------------------------------
# sorted engine: per-bounce ray re-sort (round 5)
# ----------------------------------------------------------------------------
# The honest mesh timings (BENCHMARKS.md "Mesh scenes") showed deep
# bounces cost 3-8x MORE per live ray than the coherent camera bounce:
# the any-lane slab test over a 4096-ray tile stops pruning once
# bounce directions decohere (bigmesh 800^2 depth sweep: bounce 0 =
# 184 ms, bounce 2 = 746 ms at 56% live).  The round-2/3 finding that
# per-lane compaction "costs more than it saves" was measured against
# a 2.5 ms/iter cornell trace; at 500-900 ms/bounce mesh traversals
# the conclusion flips.  This engine re-sorts the ray wavefront
# between EVERY bounce by (dead, quantized origin cell, direction
# octant): dead rays sink to the back (lane-granular compaction as a
# byproduct) and live rays group into tiles with coherent
# origin+direction, which is exactly what the any-lane test prunes
# well.  The carried pixel id keys the RNG, so ANY permutation renders
# the bit-identical image per ray; radiance rides with the ray and is
# un-permuted once at the end (one stable sort by pixel id).
# Reference anchor: this is the reference's stream-compaction slot
# (README.md:83-86) finally paying off at lane granularity — on the
# scenes where the GPU original needed it least and a TPU needs it
# most.


@functools.partial(jax.jit, static_argnames=(
    "n_iters", "interpret", "features", "nee", "rr", "tex_geom",
    "tex_used", "btex_geom", "stream", "tex_stream"))
def _batch_sorted_jit(scene, it0, n_iters, interpret, features,
                      nee=False, rr=False, tex_geom=(), tex_used=(),
                      btex_geom=(), stream=None, tex_stream=None):
    cam, mats, gmat, tri, nodes = _pack_scene(scene, tex_geom,
                                              btex_geom)
    lights, nee_lights = (
        _pack_lights(scene) if nee else (None, ())
    )
    texs = (_pack_textures(scene, tex_used, packed=True)
            if (tex_geom or btex_geom) else None)
    width, height = scene.resolution
    n_pixels = width * height
    n_tiles = pl.cdiv(n_pixels, TILE)
    depth = int(scene.trace_depth)
    state_keys = _state_keys(features, nee) + ("pix",)
    # same auto-stream decision as _run: over-budget mesh tables stay
    # in HBM and the span traversal streams them
    if stream is None and scene.mesh.bvh_meta and tri is not None:
        rows = tri.shape[0] + (nodes.shape[0] if nodes is not None
                               else 0)
        stream = rows * LANES * 4 > MESH_STREAM_BYTES
    common = dict(
        resolution=tuple(scene.resolution),
        geom_types=tuple(scene.geoms.type), interpret=interpret,
        features=features, nee_lights=nee_lights,
        bvh_meta=scene.mesh.bvh_meta, rr_mode=rr, tex_geom=tex_geom,
        btex_geom=btex_geom, state_keys=state_keys, carry_pixel=True,
        stream_mesh=bool(stream), stream_tex=tex_stream,
    )
    # world-space bbox for origin quantization: instance centers +-
    # |scale| covers unit primitives; mesh vertices beyond unit scale
    # merely saturate the clip (key quality, not correctness)
    t_g = jnp.asarray(scene.geoms.translation, jnp.float32)
    s_g = jnp.abs(jnp.asarray(scene.geoms.scale, jnp.float32))
    lo = jnp.min(t_g - s_g, axis=0)
    span = jnp.maximum(jnp.max(t_g + s_g, axis=0) - lo, 1e-3)

    def sort_perm(st):
        live = (st["live"].reshape(-1) > 0.0)
        q = []
        for ax, k in enumerate(("ox", "oy", "oz")):
            v = (st[k].reshape(-1) - lo[ax]) / span[ax]
            q.append(jnp.clip(v * 31.0, 0.0, 31.0).astype(jnp.int32))
        oct_ = (
            ((st["dx"].reshape(-1) > 0).astype(jnp.int32) << 2)
            | ((st["dy"].reshape(-1) > 0).astype(jnp.int32) << 1)
            | (st["dz"].reshape(-1) > 0).astype(jnp.int32)
        )
        # Morton-interleave the 5-bit cells (cubic locality beats
        # x-major slabs for frustum tightness), octant minor
        morton = jnp.zeros_like(q[0])
        for b in range(5):
            morton = morton \
                | (((q[0] >> b) & 1) << (3 * b + 2)) \
                | (((q[1] >> b) & 1) << (3 * b + 1)) \
                | (((q[2] >> b) & 1) << (3 * b))
        key = (morton << 3) | oct_
        # dead rays last (their tiles exit the BVH walk in one step)
        key = jnp.where(live, key, jnp.int32(1) << 29)
        return jnp.argsort(key, stable=True).astype(jnp.int32)

    def permute(st, perm):
        # ONE (N, K) row gather instead of K element gathers: XLA:TPU
        # element gathers serialize (~8 ms per 640k lanes), row
        # gathers move contiguous K-wide rows at bandwidth (the same
        # finding as the planes-engine texture fetch)
        ks = list(st.keys())
        mat = jnp.stack([st[k].reshape(-1) for k in ks], axis=1)
        mat = mat[perm]
        return {
            k: mat[:, i].reshape(st[k].shape) for i, k in enumerate(ks)
        }

    def one_sample(sidx, carry):
        acc, counts_tot = carry
        it = jnp.asarray(it0, jnp.int32) + sidx
        st, cnt_t = _run_span(
            cam, mats, gmat, tri, nodes, lights, texs, it, 0, None,
            None, d0=0, d1=1, **common,
        )
        counts_tot = counts_tot + cnt_t.sum(0)[:depth]
        for d in range(1, depth):
            # SORT_CADENCE: resort before every k-th bounce.  Any
            # cadence renders the bit-identical image (the carried
            # pixel id keys the RNG; permutation never matters) —
            # this is a pure perf knob.  Measured on bigmesh/hugemesh
            # 800² d8: cadence 1 wins (BENCHMARKS.md "Sorted
            # engine"); the knob stays for other scene shapes.
            if (d - 1) % SORT_CADENCE == 0:
                st = permute(st, sort_perm(st))
            st, cnt_t = _run_span(
                cam, mats, gmat, tri, nodes, lights, texs, it, 0,
                None, st, d0=d, d1=d + 1, **common,
            )
            counts_tot = counts_tot + cnt_t.sum(0)[:depth]
        # un-permute once: every pixel id appears exactly once, so a
        # stable sort by the carried id restores pixel order
        order = jnp.argsort(
            st["pix"].reshape(-1).astype(jnp.int32), stable=True
        )
        rad = jnp.stack(
            [st[k].reshape(-1)[order][:n_pixels]
             for k in ("rr", "rg", "rb")], axis=-1,
        )
        return acc + rad, counts_tot

    acc0 = jnp.zeros((n_pixels, 3), jnp.float32)
    cnt0 = jnp.zeros((depth,), jnp.int32)
    return jax.lax.fori_loop(0, n_iters, one_sample, (acc0, cnt0))


def pathtrace_batch_sorted(scene, it0, n_iters: int, interpret=False,
                           nee=False, rr=False, stream=None,
                           tex_stream=None):
    """``n_iters`` samples/pixel on the SORTED engine: one span kernel
    per bounce, with the whole ray wavefront re-sorted between bounces
    by (dead, quantized origin cell, direction octant) — see the
    section comment.  Output equals :func:`pathtrace_batch_pallas`
    exactly (the carried pixel id keys the RNG; radiance accumulates
    per ray, so lane position never matters).  Built for mesh scenes,
    where incoherent-bounce traversal dominates — over-budget meshes
    AND over-resident textures stream their HBM tables inside the
    spans, same as the monolithic kernel (the sort groups taps into
    coherent slabs, which is exactly what the slab-serving texture
    fetch wants).  On primitive-only scenes the sort overhead exceeds
    the (already tiny) bounce cost.
    """
    if _xla_fallback(scene):
        from ...render.plane_engine import pathtrace_batch_planes

        return pathtrace_batch_planes(scene, it0, n_iters, nee=nee,
                                      rr=rr)
    tg, tu, bg = _tex_statics(scene)
    return _batch_sorted_jit(
        scene, it0, n_iters, interpret, _scene_features(scene), nee,
        rr, tg, tu, bg, stream=stream, tex_stream=tex_stream,
    )
