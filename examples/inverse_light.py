"""Inverse rendering with the in-kernel reverse sweep: recover a
light's POSITION from a target render.

Geometry gradients need next-event estimation — pure BSDF sampling at
fixed RNG is piecewise-constant in transforms; NEE's cos·cos'/r² term
carries the continuous dependence (render/diff.py).  The whole
fwd+bwd step runs on the Pallas path: the forward megakernel renders,
then ``render_vjp_pallas`` transposes the trace inside the kernel and
chains to TRS parameters through the differentiable scene packers.

    python examples/inverse_light.py [--steps 40] [--res 200] [--spp 8]

Off-TPU the kernels run in Pallas interpret mode automatically (slow —
use a stamp size; tests/test_examples.py runs exactly that).
"""

import argparse
import dataclasses
import time

import numpy as np

import pathtrace_tpu as pt
from pathtrace_tpu.ops.pallas.megakernel import (
    pathtrace_batch_pallas,
    render_vjp_pallas,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--res", type=int, default=200)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=0,
                    help="override trace depth (0 = scene value)")
    args = ap.parse_args(argv)

    import jax

    interpret = jax.default_backend() not in ("tpu", "axon")

    scene = pt.load_scene("scenes/cornell.txt")
    # moderate resolution keeps the demo fast; NEE for geometry grads
    scene = dataclasses.replace(scene, resolution=(args.res, args.res))
    if args.depth:
        scene = dataclasses.replace(scene, trace_depth=args.depth)
    P = scene.pixel_count
    spp = args.spp

    light = 0  # the ceiling light (scenes/cornell.txt OBJECT 0)
    true_pos = np.asarray(scene.geoms.translation)[light].copy()

    target = np.asarray(
        pathtrace_batch_pallas(scene, 1, spp, nee=True,
                               interpret=interpret)[0]
    ) / spp

    tr = np.asarray(scene.geoms.translation).copy()
    tr[light] = tr[light] + np.asarray([1.5, 0.0, 1.0])  # lose the light
    cur = dataclasses.replace(
        scene, geoms=dataclasses.replace(scene.geoms, translation=tr)
    )
    err0 = np.abs(tr[light] - true_pos).max()

    # keep the constant scene leaves device-resident across the loop
    # (BENCHMARKS.md "single-call dispatch")
    import jax

    cur = jax.device_put(cur)

    lr = 150.0
    max_step = 0.3  # world units per iteration
    t0 = time.time()
    for step in range(args.steps):
        img = np.asarray(
            pathtrace_batch_pallas(cur, 1, spp, nee=True,
                                   interpret=interpret)[0]
        ) / spp
        # dMSE/d(per-sample radiance sum): chain through /spp and mean
        ct = ((img - target) * (2.0 / (P * 3 * spp))).astype(np.float32)
        _, g = render_vjp_pallas(cur, ct, 1, spp, nee=True,
                                 interpret=interpret)
        gl = np.asarray(g["translation"])[light]
        upd = lr * gl
        n = np.linalg.norm(upd)
        if n > max_step:
            upd = upd * (max_step / n)
        tr = np.asarray(cur.geoms.translation).copy()
        tr[light] = tr[light] - upd
        cur = dataclasses.replace(
            cur, geoms=dataclasses.replace(cur.geoms, translation=tr)
        )
        if step % 10 == 0 or step == args.steps - 1:
            print(
                f"step {step:2d}: light at {tr[light].round(3)} "
                f"(true {true_pos.round(3)})"
            )
    err = np.abs(tr[light] - true_pos).max()
    print(f"done in {time.time() - t0:.1f}s; max position error "
          f"{err:.3f} (started at {err0:.3f})")
    return err0, err


if __name__ == "__main__":
    main()
