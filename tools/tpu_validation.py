"""One-shot real-TPU validation sweep for the round-2 kernel features.

Runs (in dependency order, cheapest first) everything that could only
be interpret-validated while the axon relay was down:

1. forward megakernel smoke on cornell (compile + parity vs XLA),
2. BVH mesh scenes (cornell_mesh + cornell_bigmesh) timing,
3. SSS kernel parity + timing,
4. image textures (albedo + BUMPTEX) kernel parity + timing — the
   open question is tpu.dynamic_gather's hardware cost,
5. the in-kernel reverse sweep fwd+bwd timing,
6. mesh(1) real-TPU pixel-sharded equality,
7. self-golden assets for the SSS and textured scenes (4000 spp,
   100x100) written to tests/goldens/.

Prints a BENCHMARKS.md-ready summary.  Run:   python tools/tpu_validation.py
"""

from __future__ import annotations

import dataclasses as dc
import os
import sys
import time


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["JAX_COMPILATION_CACHE_DIR"],
    )
    import numpy as np

    import pathtrace_tpu as pt
    from pathtrace_tpu.ops.pallas.megakernel import (
        _tex_in_kernel,
        pathtrace_batch_pallas,
        pathtrace_iteration_pallas,
        render_vjp_pallas,
    )

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")
    on_tpu = dev.platform in ("tpu",) or "axon" in str(dev).lower()
    assert on_tpu, "run this on the TPU (the whole point)"

    def timed(fn, label, iters=1):
        fn()  # compile
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        _ = float(np.asarray(out[0] if isinstance(out, tuple) else out)
                  .sum())  # forced transfer (axon async-lie)
        dt = (time.time() - t0) / iters
        print(f"  {label}: {dt * 1e3:.2f} ms")
        return dt

    def parity(scene, label, nee=False, tol=2e-3, frac=0.01):
        rp, _ = pathtrace_iteration_pallas(scene, 1, nee=nee)
        rj, _ = pt.pathtrace_iteration(scene, 1, nee=nee)
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(-1)
        f = float((d > tol).mean())
        print(f"  {label} parity frac>{tol}: {f:.5f}")
        assert f < frac, (label, f)

    print("[1] cornell forward")
    sc = pt.load_scene(os.path.join(here, "scenes", "cornell.txt"))
    timed(lambda: pathtrace_batch_pallas(sc, 1, 100), "100 spp batch")
    parity(dc.replace(sc, resolution=(128, 128)), "cornell 128^2")

    print("[2] BVH meshes")
    for name in ("cornell_mesh.txt", "cornell_bigmesh.txt"):
        m = pt.load_scene(os.path.join(here, "scenes", name))
        timed(lambda m=m: pathtrace_batch_pallas(m, 1, 10),
              f"{name} 10 spp (per-iter = /10)")

    print("[3] SSS")
    import tests.test_sss as ts

    s3 = ts._scene("SSS         2.0 .9 .6 .4\n")
    parity(s3, "sss 64^2", tol=1e-3)
    timed(lambda: pathtrace_batch_pallas(s3, 1, 50), "sss 50 spp")

    print("[4] image textures (gather cost)")
    tx = pt.load_scene(os.path.join(here, "scenes", "cornell_tex.txt"))
    assert _tex_in_kernel(tx)
    parity(dc.replace(tx, resolution=(128, 128)), "tex+bumptex 128^2")
    t_tex = timed(lambda: pathtrace_batch_pallas(tx, 1, 50),
                  "cornell_tex 50 spp")
    t_plain = timed(lambda: pathtrace_batch_pallas(sc, 1, 50),
                    "cornell (no tex) 50 spp, same spp")
    print(f"  texture overhead: {t_tex / t_plain:.2f}x")

    print("[5] reverse sweep fwd+bwd")
    ct = np.ones((sc.pixel_count, 3), np.float32)
    timed(lambda: render_vjp_pallas(sc, ct, 1, 1, nee=True),
          "render_vjp cornell 800^2 nee")

    print("[6] mesh(1) pixel-sharded equality on the real chip")
    from pathtrace_tpu.parallel import shard as ps

    mesh1 = ps.make_mesh(1)
    small = dc.replace(sc, resolution=(128, 128), trace_depth=4)
    rad_s, _ = ps.render_pixel_sharded_pallas(small, 1, 4, mesh1)
    rad_r, _ = pathtrace_batch_pallas(small, 1, 4)
    assert np.array_equal(np.asarray(rad_s), np.asarray(rad_r))
    print("  pixel-sharded mesh(1) == single-device: OK")

    print("[7] self-golden assets (sss + textured), 4000 spp 100x100")
    from PIL import Image

    from pathtrace_tpu.io.image_io import to_display

    gold_dir = os.path.join(here, "tests", "goldens")
    os.makedirs(gold_dir, exist_ok=True)
    for name, scene in (("cornell_tex", tx),):
        g = dc.replace(scene, resolution=(100, 100))
        spp = 4000
        acc = np.zeros((g.pixel_count, 3), np.float32)
        for k in range(0, spp, 500):
            acc = acc + np.asarray(
                pathtrace_batch_pallas(g, 1 + k, 500)[0]
            )
        img = np.clip(to_display(acc, 100, 100, spp), 0, 1)
        out = os.path.join(gold_dir, f"{name}_100.png")
        Image.fromarray((img * 255).astype(np.uint8)).save(out)
        print(f"  wrote {out}")

    print("ALL TPU VALIDATION PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
