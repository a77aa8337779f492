"""Profiling / tracing helpers (SURVEY.md §5 tracing plan).

The reference's only timing hooks are the implicit sync in
checkCUDAError and the iteration count in the window title
(src/pathtrace.cu:17-39, src/preview.cpp:174-175), plus a mandated
manual per-bounce analysis (README.md:284-293).  Here:

* :func:`trace` — capture a ``jax.profiler`` trace viewable in
  TensorBoard / Perfetto;
* :func:`time_fn` — dispatch-aware wall timing with
  ``block_until_ready`` and forced data dependencies (an async TPU
  tunnel makes naive loops report dispatch, not compute);
* :func:`bounce_stats` — per-bounce live-ray table from the
  integrator's first-class counters.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/pathtrace_tpu_trace"):
    """``with profiling.trace(): render(...)`` → Perfetto trace in
    ``logdir`` (open with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 20, warmup: int = 2, **kwargs):
    """Median wall time of ``fn(*args, **kwargs)`` per call.

    Forces a data dependency between successive calls' outputs by
    summing the first output into a running scalar — defeating the
    async-dispatch mirage where N calls appear to cost dispatch only.
    Returns (median_seconds, last_output).
    """
    import jax
    import jax.numpy as jnp

    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    for _ in range(warmup - 1):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        first = out[0] if isinstance(out, (tuple, list)) else out
        # float() forces a device->host transfer of the reduced scalar.
        # block_until_ready() is NOT sufficient on the axon TPU tunnel
        # (it can return before device execution completes); only a
        # value transfer is a true sync.
        float(jnp.sum(first))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def bounce_stats(live_counts) -> str:
    """Human-readable per-bounce live-ray table (README.md:284-293)."""
    c = np.asarray(live_counts)
    if c.ndim > 1:
        c = c.reshape(-1, c.shape[-1]).mean(axis=0)
    lines = ["bounce  live_rays  frac_of_camera_rays"]
    for d, n in enumerate(c):
        lines.append(f"{d:6d}  {int(n):9d}  {n / max(c[0], 1):.3f}")
    return "\n".join(lines)
