"""Pre-warm the persistent compilation cache for common render shapes.

Mosaic/XLA compiles go through a remote helper on the axon tunnel and
take seconds-to-minutes per new (scene-features, resolution, depth,
chunk) combination; warmed entries load in ~1-3 s.  Run this once after
changing kernels:

    python -m pathtrace_tpu.tools.warmup [scene.txt ...]
"""

from __future__ import annotations

import os
import sys
import time


def main(argv=None) -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["JAX_COMPILATION_CACHE_DIR"],
    )
    import numpy as np

    import pathtrace_tpu as pt
    from pathtrace_tpu.ops.pallas.megakernel import pathtrace_batch_pallas

    here = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    scenes = (argv if argv else sys.argv[1:]) or [
        os.path.join(here, "scenes", s)
        for s in ("cornell.txt", "sphere.txt", "cornell_glass.txt",
                  "cornell_checker.txt", "cornell_mesh.txt",
                  "cornell_bigmesh.txt")
    ]
    chunks = [int(c) for c in
              os.environ.get("PT_WARMUP_CHUNKS", "8,100,500").split(",")]
    for path in scenes:
        try:
            scene = pt.load_scene(path)
        except Exception as e:
            print(f"skip {path}: {e}")
            continue
        for chunk in chunks:
            t0 = time.time()
            r, _ = pathtrace_batch_pallas(scene, 1, chunk)
            np.asarray(r)
            print(
                f"warm {os.path.basename(path)} chunk={chunk}: "
                f"{time.time() - t0:.1f}s",
                flush=True,
            )
        if os.environ.get("PT_WARMUP_EXTRA"):
            from pathtrace_tpu.ops.pallas.megakernel import (
                material_grads_pallas,
            )

            for chunk in chunks:
                t0 = time.time()
                r, _ = pathtrace_batch_pallas(scene, 1, chunk, nee=True)
                np.asarray(r)
                print(f"warm nee chunk={chunk}: {time.time()-t0:.1f}s",
                      flush=True)
            if scene.materials.checker_scale is None:
                t0 = time.time()
                ct = np.ones((scene.pixel_count, 3), np.float32)
                _, g = material_grads_pallas(scene, ct, 1, chunks[-1])
                np.asarray(g["color"])
                print(f"warm grads chunk={chunks[-1]}: "
                      f"{time.time()-t0:.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
