"""Scan / stream-compaction primitive (ops/scan.py) vs numpy.

The reference's stream_compaction subproject spec (README.md:83-86):
work-efficient scan + scatter.  Here: MXU-triangular-matmul scan +
gather-apply; verified exact (0/1 and integer inputs stay below 2^24,
where the f32 matmul is error-free) and bit-identical to the stable
argsort the integrator's sort mode uses.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pathtrace_tpu.ops.scan import compact, compact_indices, prefix_sum_pallas


@pytest.mark.parametrize("n", [1, 100, 1024, 1025, 4096, 10000])
def test_prefix_sum_matches_numpy(n):
    r = np.random.RandomState(n)
    x = (r.rand(n) < 0.4).astype(np.float32)
    got = np.asarray(prefix_sum_pallas(jnp.asarray(x), interpret=True))
    want = np.cumsum(x) - x  # exclusive
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_prefix_sum_integers_exact():
    r = np.random.RandomState(7)
    x = r.randint(0, 1000, size=3000).astype(np.int32)
    got = np.asarray(prefix_sum_pallas(jnp.asarray(x), interpret=True))
    want = (np.cumsum(x) - x).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_compact_matches_stable_partition():
    r = np.random.RandomState(3)
    n = 5000
    mask = r.rand(n) < 0.3
    payload = {"a": r.rand(n, 3).astype(np.float32),
               "b": np.arange(n, dtype=np.int32)}
    dense, n_live = compact(jnp.asarray(mask), payload, interpret=True)
    k = int(n_live)
    assert k == mask.sum()
    np.testing.assert_array_equal(
        np.asarray(dense["b"])[:k], np.arange(n)[mask]
    )
    np.testing.assert_array_equal(
        np.asarray(dense["b"])[k:], np.arange(n)[~mask]
    )
    np.testing.assert_array_equal(
        np.asarray(dense["a"]), payload["a"][np.asarray(dense["b"])]
    )


def test_matches_argsort_order():
    """Bit-identical to the stable argsort the integrator sort mode
    uses (same permutation -> same downstream image bits)."""
    r = np.random.RandomState(11)
    mask = r.rand(4096) < 0.5
    perm, _ = compact_indices(jnp.asarray(mask), interpret=True)
    ref = np.argsort(~mask, kind="stable")
    np.testing.assert_array_equal(np.asarray(perm), ref)


def test_vmapped_scan_is_per_row():
    """vmap(prefix_sum_pallas) must scan each batch row independently.
    Regression for the hardware-only lowering failure: pallas's default
    batching rule turns the SMEM carry into a (B, 1) block Mosaic
    rejects ("last two dims divisible by 8 and 128"), hit when the
    integrator's sort mode runs under the iteration vmap
    (render_batch) on the real chip — scan.py now sequential_vmaps the
    kernel so the batched program is B copies of the unbatched one."""
    import jax

    from pathtrace_tpu.ops.scan import prefix_sum_pallas

    r = np.random.RandomState(7)
    x = (r.rand(3, 2048) < 0.4).astype(np.float32)
    out = jax.vmap(
        lambda row: prefix_sum_pallas(row, interpret=True)
    )(jnp.asarray(x))
    ref = np.cumsum(x, axis=1) - x
    np.testing.assert_array_equal(np.asarray(out), ref.astype(np.float32))
