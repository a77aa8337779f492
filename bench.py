"""Benchmark harness: Mrays/s/chip on cornell 800x800 (BASELINE.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

"Rays" = live path segments actually traced (the reference's
per-bounce live-ray accounting, README.md:284-293): sum over bounces of
rays entering each bounce, per iteration.  The reference publishes no
numbers (BASELINE.md), so vs_baseline is the ratio against the last
recorded round (BENCH_r*.json) when present, else 1.0.

Env knobs: PT_BENCH_SPP (default 64), PT_BENCH_CHUNK (default 16),
PT_BENCH_SCENE, PT_BENCH_KERNEL (xla|pallas).
"""

import glob
import json
import os
import sys
import time

import numpy as np


def main():
    spp = int(os.environ.get("PT_BENCH_SPP", "4000"))
    chunk = int(os.environ.get("PT_BENCH_CHUNK", "500"))
    scene_path = os.environ.get(
        "PT_BENCH_SCENE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "scenes", "cornell.txt"),
    )

    kernel = os.environ.get("PT_BENCH_KERNEL", "pallas")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

    # fail fast (not hang) if the axon relay is down: device init dials
    # the tunnel from a C extension and blocks forever when the relay
    # process is gone — a SIGALRM handler never runs (Python handlers
    # fire between bytecodes), so use a watchdog THREAD + os._exit.
    import threading

    def _stuck():
        print(
            "bench: TPU device init did not complete in 180 s — the "
            "axon relay looks down (no listener on 127.0.0.1:8082/3)",
            file=sys.stderr,
        )
        sys.stderr.flush()
        os._exit(2)

    watchdog = threading.Timer(180.0, _stuck)
    watchdog.daemon = True
    watchdog.start()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["JAX_COMPILATION_CACHE_DIR"],
    )
    jax.devices()       # the call that hangs when the relay is dead
    watchdog.cancel()   # device init OK; compiles may take minutes
    import jax.numpy as jnp

    import pathtrace_tpu as pt
    from pathtrace_tpu.ops.pallas.megakernel import pathtrace_batch_pallas

    scene = pt.load_scene(scene_path)
    spp = max(chunk, (spp // chunk) * chunk)

    if kernel == "pallas" and not scene.mesh.count:
        batch = lambda it0, n: pathtrace_batch_pallas(scene, it0, n)
    else:
        batch = lambda it0, n: pt.pathtrace_batch(
            scene, it0, n, remat=False
        )

    # warmup / compile
    rad, counts = batch(1, chunk)
    rad.block_until_ready()
    segs_per_chunk = int(np.asarray(counts).sum())

    # timed: accumulate on device, single sync at the end
    accum = jnp.zeros_like(rad)
    n_chunks = spp // chunk
    t0 = time.time()
    for k in range(n_chunks):
        r, _ = batch(1 + chunk * k, chunk)
        accum = accum + r
    # force a host transfer: on the axon tunnel block_until_ready can
    # return before device execution completes (utils/profiling.py)
    _sink = float(jnp.sum(accum))
    dt = time.time() - t0

    mrays = segs_per_chunk * n_chunks / dt / 1e6

    vs = 1.0
    prior = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json"
    )))
    if prior:
        try:
            with open(prior[-1]) as f:
                last = json.load(f)
            if last.get("value"):
                vs = round(mrays / float(last["value"]), 3)
        except Exception:
            pass

    print(json.dumps(dict(
        metric="Mrays/s/chip on cornell 800x800 depth 8",
        value=round(mrays, 2),
        unit="Mrays/s",
        vs_baseline=vs,
    )))
    return 0


if __name__ == "__main__":
    sys.exit(main())
