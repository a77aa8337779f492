"""Cold-compile-time report for every shipped scene x engine mode.

VERDICT #7 (compile-time budget): measures the first-call compile+run
wall time of each megakernel variant against a CLEARED persistent
cache, then the warm (cached) time, and appends a markdown table to
stdout for BENCHMARKS.md.  Run on the real chip:

    python tools/compile_report.py [--scenes a.txt b.txt] [--keep-cache]

The script uses a throwaway cache dir by default so it measures true
cold compiles without destroying /root/.jax_cache.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--keep-cache", action="store_true",
                    help="use (and warm) the persistent cache instead "
                         "of a throwaway dir")
    ap.add_argument("--spp", type=int, default=8)
    args = ap.parse_args(argv)

    if not args.keep_cache:
        os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
            prefix="ptc_"
        )
    else:
        os.environ.setdefault(
            "JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"
        )

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["JAX_COMPILATION_CACHE_DIR"],
    )
    import numpy as np

    import pathtrace_tpu as pt
    from pathtrace_tpu.ops.pallas.megakernel import (
        material_grads_pallas,
        pathtrace_batch_pallas,
        render_vjp_pallas,
    )

    here = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    scenes = args.scenes or [
        os.path.join(here, "scenes", s)
        for s in ("cornell.txt", "sphere.txt", "cornell_glass.txt",
                  "cornell_checker.txt", "cornell_mesh.txt",
                  "cornell_bigmesh.txt", "cornell_tex.txt")
    ]

    def timed(fn):
        t0 = time.time()
        try:
            out = fn()
            # force a host transfer (axon async-lie)
            np.asarray(out[0] if isinstance(out, tuple) else out)
            return time.time() - t0, ""
        except NotImplementedError as e:
            return None, f"n/a ({str(e)[:40]}…)"
        except Exception as e:  # surface compile failures in the table
            return None, f"FAIL {type(e).__name__}"

    rows = []
    for path in scenes:
        name = os.path.basename(path)
        try:
            scene = pt.load_scene(path)
        except Exception as e:
            print(f"skip {name}: {e}", file=sys.stderr)
            continue
        import dataclasses

        small_ct = np.ones((scene.pixel_count, 3), np.float32)
        variants = [
            ("fwd", lambda: pathtrace_batch_pallas(scene, 1, args.spp)),
            ("fwd+nee", lambda: pathtrace_batch_pallas(
                scene, 1, args.spp, nee=True)),
            ("matgrad", lambda: material_grads_pallas(
                scene, small_ct, 1, 1)),
            ("vjp", lambda: render_vjp_pallas(scene, small_ct, 1, 1)),
        ]
        for mode, fn in variants:
            cold, note = timed(fn)
            warm, _ = timed(fn) if cold is not None else (None, "")
            rows.append((name, mode, cold, warm, note))
            c = f"{cold:.1f}s" if cold is not None else note
            w = f"{warm:.3f}s" if warm is not None else ""
            print(f"{name:24s} {mode:8s} cold={c:10s} warm={w}",
                  flush=True)

    print("\n| Scene | Mode | Cold compile+run | Warm |")
    print("|---|---|---|---|")
    for name, mode, cold, warm, note in rows:
        c = f"{cold:.1f} s" if cold is not None else note
        w = f"{warm:.3f} s" if warm is not None else "—"
        print(f"| {name} | {mode} | {c} | {w} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
