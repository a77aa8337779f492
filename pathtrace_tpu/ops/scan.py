"""Work-efficient scan + stream compaction as reusable ops.

The reference reserves a stream-compaction *library* subproject
(CMakeLists.txt:71,81; spec README.md:83-86 — GPU Gems 3 ch.39
work-efficient scan, then scatter).  On TPU the same decomposition maps
differently and this module is the explicit statement of how:

* ``prefix_sum_pallas`` — the scan itself.  A (rows, 128) tile's
  lane-direction cumsum is a matmul with a triangular ones matrix: the
  MXU does all 128 partial sums of a row in one pass, which *is* the
  work-efficient scan — log-depth tree add replaced by a systolic
  array that exists in hardware.  Sublane combination is a (8,8)
  triangular matmul on the other side; the running carry across grid
  blocks rides in SMEM through the sequential TPU grid (the
  "scan-then-propagate-block-sums" step of Blelloch's algorithm,
  with the propagation free because TPU grids are sequential).
* ``compact`` — scan -> dense indices -> gather.  The GPU's scatter
  step is the one primitive the TPU vector core does not have
  (no dynamic-lane writes), so compaction applies the permutation by
  *gather* (one XLA take), exactly how integrator.py's sort mode
  densifies.  Results are bit-identical to a stable partition.

Precision note: f32 triangular matmuls are exact for the 0/1 counts
used here (integers < 2^24); int32 inputs are summed as f32 and cast
back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 8
TILE = SUB * LANES


def _scan_kernel(x_ref, out_ref, carry_ref, *, n_rows):
    """Exclusive prefix sum over the flattened (n_rows, LANES) block,
    row-major; carry_ref (SMEM) accumulates across sequential grid
    steps."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[0] = jnp.float32(0.0)

    x = x_ref[:, :].astype(jnp.float32)          # (SUB, LANES)
    # lane-direction inclusive scan: x @ U with U[k, j] = 1 for k <= j
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    lane_jota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    upper = (lane_iota <= lane_jota).astype(jnp.float32)
    incl = jax.lax.dot(x, upper,
                       precision=jax.lax.Precision.HIGHEST)  # (SUB,LANES)
    # row totals -> exclusive offsets down the sublanes: S @ incl[:, -1]
    row_tot = incl[:, LANES - 1:LANES]            # (SUB, 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    sub_jota = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    strict = (sub_jota < sub_iota).astype(jnp.float32)
    row_off = jax.lax.dot(strict, row_tot,
                          precision=jax.lax.Precision.HIGHEST)
    excl = incl - x + row_off + carry_ref[0]      # exclusive, global
    out_ref[:, :] = excl
    carry_ref[0] = carry_ref[0] + jnp.sum(x)


@functools.lru_cache(maxsize=None)
def _prefix_sum_impl(interpret):
    """Build the (cached-per-interpret-mode) scan implementation.

    ``sequential_vmap``: under ``jax.vmap`` (the integrator batches
    iterations over the sample axis, integrator.render_batch) the
    default pallas batching rule prepends a grid axis, which turns the
    SMEM carry output into a (B, 1) block that Mosaic's TPU lowering
    rejects ("last two dims divisible by 8 and 128") — found by driving
    ``compaction='sort'`` with a batched chunk on the real chip
    (interpret mode enforces no divisibility, so CPU tests passed).
    Mapping the batch dim sequentially keeps the kernel exactly as
    compiled for the unbatched case; the sort wavefront is the
    documented ~460x-slower mode, so a sequential sample loop costs
    nothing that matters."""

    @jax.custom_batching.sequential_vmap
    def impl(x):
        n = x.shape[0]
        n_tiles = pl.cdiv(n, TILE)
        pad = n_tiles * TILE - n
        xf = jnp.concatenate(
            [x.astype(jnp.float32), jnp.zeros((pad,), jnp.float32)]
        ).reshape(n_tiles * SUB, LANES)
        out, _ = pl.pallas_call(
            functools.partial(_scan_kernel, n_rows=n_tiles * SUB),
            grid_spec=pl.GridSpec(
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=(
                    pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles * SUB, LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.float32),
            ),
            interpret=interpret,
        )(xf)
        return out.reshape(-1)[:n]

    return impl


@functools.partial(jax.jit, static_argnames=("interpret",))
def prefix_sum_pallas(x, interpret=False):
    """Exclusive prefix sum of a 1-D array (any real dtype; summed in
    f32 — exact for 0/1 masks and counts < 2^24).  Returns f32 (N,)."""
    return _prefix_sum_impl(bool(interpret))(x)


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_indices(mask, interpret=False):
    """Stable-partition permutation from a live mask: ``perm`` (N,)
    int32 with live indices (in order) first, dead after, plus the
    live count.  ``x[perm]`` is the densified array — identical to
    ``argsort(~mask, stable)`` and to GPU scan-compact order.

    Internally this is the GPU recipe's two halves: the scan gives
    each source index its destination ``slot`` (live-first,
    order-preserving — the Gems 3 scatter addresses), and one scatter
    of ``arange`` at ``slot`` inverts that into the gather
    permutation — callers then densify by *gather*, the form the TPU
    vector core is fast at (scatters serialize; gathers do not).
    Note the split engine does NOT use this: it re-densifies at tile
    granularity via scalar-prefetched block index maps
    (megakernel.pathtrace_batch_split); lane-granular compaction at
    wavefront size measured ~100x the cost of what it saves
    (BENCHMARKS.md "Split engine")."""
    m = mask.astype(jnp.float32)
    n = mask.shape[0]
    pos_live = prefix_sum_pallas(m, interpret=interpret)
    pos_dead = prefix_sum_pallas(1.0 - m, interpret=interpret)
    n_live = (pos_live[-1] + m[-1]).astype(jnp.int32)
    slot = jnp.where(
        mask, pos_live.astype(jnp.int32),
        n_live + pos_dead.astype(jnp.int32),
    )
    perm = jnp.zeros((n,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True,
        mode="promise_in_bounds",
    )
    return perm, n_live


def compact(mask, payload, interpret=False):
    """Stream compaction: gather every pytree leaf of ``payload`` into
    stable-partition order (live-first).  Returns (dense payload,
    n_live).  The scatter half of the GPU recipe becomes one gather —
    see module docstring."""
    perm, n_live = compact_indices(mask, interpret=interpret)
    dense = jax.tree.map(lambda a: jnp.asarray(a)[perm], payload)
    return dense, n_live
