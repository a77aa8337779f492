"""Inverse rendering with the analytic gradient megakernel.

Recovers a perturbed wall albedo from a target render by gradient
descent — each step renders AND differentiates 50 spp at 800x800 in
under a second on one TPU v5e chip.

    python examples/inverse_rendering.py [--steps 30] [--res 800]

Off-TPU the kernels run in Pallas interpret mode automatically (slow —
use a stamp size; tests/test_examples.py runs exactly that).
"""

import argparse
import dataclasses
import time

import numpy as np

import pathtrace_tpu as pt
from pathtrace_tpu.ops.pallas.megakernel import (
    material_grads_pallas,
    pathtrace_batch_pallas,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--spp", type=int, default=50)
    ap.add_argument("--depth", type=int, default=0,
                    help="override trace depth (0 = scene value)")
    args = ap.parse_args(argv)

    import jax

    interpret = jax.default_backend() not in ("tpu", "axon")

    scene = pt.load_scene("scenes/cornell.txt")
    scene = dataclasses.replace(scene, resolution=(args.res, args.res))
    if args.depth:
        scene = dataclasses.replace(scene, trace_depth=args.depth)
    P = scene.pixel_count
    spp = args.spp

    target = np.asarray(
        pathtrace_batch_pallas(scene, 1, spp, interpret=interpret)[0]
    ) / spp

    m = scene.materials
    true_red = np.asarray(m.color)[2].copy()
    col = np.asarray(m.color).copy()
    col[2] = [0.5, 0.5, 0.5]  # forget the red wall
    cur = dataclasses.replace(
        scene, materials=dataclasses.replace(m, color=col)
    )
    err0 = np.abs(col[2] - true_red).max()

    # res-independent step: d(MSE)/d(albedo) carries a 1/P factor
    # through ct, so the effective step is lr_eff = lr * P at the
    # original 800x800 demo shape (2e-7 * 640k = 0.128).  Using the
    # constant keeps stamp-size runs (tests/test_examples.py) moving
    # at the same rate as the full-size demo.
    lr_eff = 0.128

    # keep the constant scene leaves device-resident across the loop
    # (BENCHMARKS.md "single-call dispatch")
    import jax

    cur = jax.device_put(cur)

    t0 = time.time()
    for step in range(args.steps):
        img = np.asarray(
            pathtrace_batch_pallas(cur, 1, spp, interpret=interpret)[0]
        ) / spp
        ct = ((img - target) * (2.0 / P)).astype(np.float32)  # dMSE/dimg
        _, g = material_grads_pallas(cur, ct, 1, spp,
                                     interpret=interpret)
        col = np.asarray(cur.materials.color).copy()
        col[2] = np.clip(
            col[2] - lr_eff * np.asarray(g["color"])[2], 0.02, 1.0
        )
        cur = dataclasses.replace(
            cur,
            materials=dataclasses.replace(cur.materials, color=col),
        )
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step:2d}: wall {col[2].round(3)} "
                  f"(true {true_red.round(3)})")
    err = np.abs(col[2] - true_red).max()
    print(f"done in {time.time() - t0:.1f}s; "
          f"max error {err:.4f} (started at {err0:.4f})")
    return err0, err


if __name__ == "__main__":
    main()
