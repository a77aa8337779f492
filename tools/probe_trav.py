"""Standalone streamed BVH traversal over the real bigmesh tables,
one ray tile, with a step cap and step counter — hangs become
observable numbers."""
import sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import pathtrace_tpu as pt

SUB, LANES = 32, 128
W = 64
LEAF_K = 8

sc = pt.load_scene('scenes/cornell_bigmesh.txt')
nodes = np.asarray(sc.mesh.bvh_nodes, np.float32)          # (N,16)
(g, node_off, n_nodes, tri_off, n_tri) = sc.mesh.bvh_meta[0]
print("nodes", nodes.shape, "n_nodes", n_nodes, flush=True)
nodes_p = np.zeros((nodes.shape[0] + W, 128), np.float32)
nodes_p[:nodes.shape[0], :nodes.shape[1]] = nodes
order = np.asarray(sc.mesh.bvh_order)
tv = np.asarray(sc.mesh.tri_verts, np.float32)[order]
tri_p = np.zeros((tv.shape[0] + 2 * LEAF_K, 128), np.float32)
tri_p[:tv.shape[0], 0:3] = tv[:, 0]
tri_p[:tv.shape[0], 3:6] = tv[:, 1] - tv[:, 0]
tri_p[:tv.shape[0], 6:9] = tv[:, 2] - tv[:, 0]

MAXSTEP = int(sys.argv[2]) if len(sys.argv) > 2 else 200000


def kernel(x_hbm, t_hbm, o_ref, win, tleaf, sem, semt):
    # fixed ray bundle: origin just outside the unit sphere region,
    # pointing roughly through it (object space of the icosphere)
    row = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1).astype(jnp.float32)
    ox = jnp.full((SUB, LANES), -3.0) + row * 0.01
    oy = lane * 0.005 - 0.3
    oz = jnp.zeros((SUB, LANES))
    rdx = jnp.ones((SUB, LANES))
    rdy = row * 0.001
    rdz = lane * 0.0005
    n2 = jnp.sqrt(rdx*rdx + rdy*rdy + rdz*rdz)
    rdx, rdy, rdz = rdx/n2, rdy/n2, rdz/n2
    irdx, irdy, irdz = 1.0/rdx, 1.0/rdy, 1.0/rdz

    def slab(mn, mx, o, ird):
        t1 = (mn - o) * ird
        t2 = (mx - o) * ird
        ta = jnp.minimum(t1, t2)
        tb = jnp.maximum(t1, t2)
        ta = jnp.where(jnp.isnan(ta), -jnp.inf, ta)
        tb = jnp.where(jnp.isnan(tb), jnp.inf, tb)
        return ta, tb

    def body(carry):
        n, wb, steps, leaves, tsum = carry
        gn = node_off + n
        need = (gn < wb) | (gn >= wb + W)
        wb2 = jnp.where(need, gn & ~7, wb)

        @pl.when(need)
        def _refill():
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(wb2, W)], win, sem)
            cp.start(); cp.wait()

        nm = lambda k: win[gn - wb2, k]
        tax, tbx = slab(nm(0), nm(3), ox, irdx)
        tay, tby = slab(nm(1), nm(4), oy, irdy)
        taz, tbz = slab(nm(2), nm(5), oz, irdz)
        tnear = jnp.maximum(jnp.maximum(tax, tay),
                            jnp.maximum(taz, jnp.float32(0.0)))
        tfar = jnp.minimum(jnp.minimum(tbx, tby), tbz)
        lane_hit = (tnear <= tfar) & (tnear < 1e10)
        any_hit = jnp.any(lane_hit)
        skip = nm(6).astype(jnp.int32)
        start = nm(7).astype(jnp.int32)
        count = nm(8).astype(jnp.int32)
        is_leaf = count > 0
        fetch = any_hit & is_leaf
        gstart = tri_off + start
        ga = gstart & ~7

        @pl.when(fetch)
        def _fetch_leaf():
            cp = pltpu.make_async_copy(
                t_hbm.at[pl.ds(ga, 2 * LEAF_K)], tleaf, semt)
            cp.start(); cp.wait()

        lo = gstart - ga

        def leaf_body(j, acc):
            return acc + tleaf[j, 0]

        tsum = jax.lax.fori_loop(
            lo, lo + jnp.where(fetch, count, 0), leaf_body, tsum)
        nxt = jnp.where(is_leaf | ~any_hit, skip, n + 1)
        return (nxt, wb2, steps + 1,
                leaves + jnp.where(fetch, 1, 0), tsum)

    n, wb, steps, leaves, tsum = jax.lax.while_loop(
        lambda c: (c[0] < n_nodes) & (c[2] < MAXSTEP), body,
        (jnp.int32(0), jnp.int32(-2 * W), jnp.int32(0), jnp.int32(0),
         jnp.float32(0.0)),
    )
    o_ref[0, 0] = n
    o_ref[0, 1] = steps
    o_ref[0, 2] = leaves
    o_ref[0, 3] = tsum.astype(jnp.int32)


@jax.jit
def run(x):
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 4), jnp.int32),
        scratch_shapes=[pltpu.VMEM((W, 128), jnp.float32),
                        pltpu.VMEM((2 * LEAF_K, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
    )(x, jnp.asarray(tri_p))


mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
if mode == "cpu":
    import os
    # interpret
    def runi(x):
        return pl.pallas_call(
            kernel, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 4), jnp.int32),
            scratch_shapes=[pltpu.VMEM((W, 128), jnp.float32),
                            pltpu.VMEM((2 * LEAF_K, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
            interpret=True,
        )(x, jnp.asarray(tri_p))
    out = np.asarray(runi(jnp.asarray(nodes_p)))
else:
    out = np.asarray(run(jnp.asarray(nodes_p)))
print("final n", out[0, 0], "steps", out[0, 1], "leaves", out[0, 2], "tsum", out[0, 3], flush=True)
