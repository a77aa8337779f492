"""Inverse MESH rendering: recover perturbed triangle vertices from a
target render by gradient descent on ``tri_verts``.

New in round 3: mesh scenes differentiate at BVH speed — the traversal
runs detached, recording only the winning triangle per lane, and the
hit is recomputed differentiably from the winner row (bvh_grad
"gather" mode on the fused-plane XLA engine; megakernel.py).  The same
82k-triangle scene OOMs under the naive linear-fold autodiff
(BENCHMARKS.md "Mesh gradients").

    python examples/inverse_mesh.py [--steps 40] [--res 48]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pathtrace_tpu as pt
from pathtrace_tpu.render import diff


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--res", type=int, default=48)
    ap.add_argument("--spp", type=int, default=4)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    # the bump-mesh scene's grid plane faces the light: vertex height
    # changes shading continuously through NEE's cos terms, which is
    # where the detached estimator carries strong gradients (silhouette
    # motion — e.g. the icosahedron's outline — is its documented
    # blind spot, render/diff.py)
    scene = pt.load_scene("scenes/cornell_bumpmesh.txt")
    scene = dataclasses.replace(
        scene, resolution=(args.res, args.res), trace_depth=3
    )
    m = scene.materials
    scene = dataclasses.replace(scene, materials=dataclasses.replace(
        m, bumptex_strength=np.zeros_like(
            np.asarray(m.bumptex_strength))))
    tv_true = np.asarray(scene.mesh.tri_verts, np.float32)

    # target: the flat plane, rendered once
    from pathtrace_tpu.render.plane_engine import pathtrace_batch_planes

    target_acc, _ = pathtrace_batch_planes(scene, 1, args.spp, nee=True)
    target = np.asarray(target_acc) / args.spp

    # perturb the vertices out of plane (object-space y)
    rs = np.random.RandomState(7)
    tv0 = tv_true.copy()
    tv0[:, :, 1] += 0.05 * rs.randn(tv_true.shape[0], 3).astype(np.float32)
    tv = jnp.asarray(tv0)

    # device-resident base scene: the loop rebuilds the scene each
    # step with updated tri_verts; keeping the CONSTANT leaves on
    # device avoids re-uploading them every call (BENCHMARKS.md
    # "single-call dispatch")
    import jax

    scene = jax.device_put(scene)
    target = jax.device_put(target)

    t0 = time.time()
    loss0 = None
    for step in range(args.steps):
        sc = dataclasses.replace(
            scene, mesh=dataclasses.replace(scene.mesh, tri_verts=tv)
        )
        loss, g = diff.render_loss_and_grad(
            sc, target, 1, args.spp, nee=True, engine="planes"
        )
        if loss0 is None:
            loss0 = float(loss)
        gv = g["tri_verts"]
        # normalized step with decay: image-MSE gradients w.r.t.
        # vertices are tiny in absolute scale, so steepest-descent
        # with a fixed metric step converges far faster than raw GD
        gmax = jnp.max(jnp.abs(gv)) + 1e-12
        tv = tv - (0.02 * 0.95 ** step) * gv / gmax
        if step % 5 == 0 or step == args.steps - 1:
            rms = float(np.sqrt(
                ((np.asarray(tv) - tv_true) ** 2).mean()))
            print(f"step {step:3d}  loss {float(loss):.3e}  "
                  f"rms|v - v*| {rms:.4f}", flush=True)
    dt = time.time() - t0
    rms0 = float(np.sqrt(((tv0 - tv_true) ** 2).mean()))
    rms1 = float(np.sqrt(((np.asarray(tv) - tv_true) ** 2).mean()))
    sc = dataclasses.replace(
        scene, mesh=dataclasses.replace(scene.mesh, tri_verts=tv))
    loss1, _ = diff.render_loss_and_grad(
        sc, target, 1, args.spp, nee=True, engine="planes")
    print(f"\nloss {loss0:.3e} -> {float(loss1):.3e}; "
          f"rms vertex error {rms0:.4f} -> {rms1:.4f} "
          f"({args.steps} steps, {dt:.1f}s, "
          f"{dt / args.steps * 1e3:.0f} ms/step)")
    assert float(loss1) < 0.8 * loss0, "image loss did not decrease"
    return loss0, float(loss1)


if __name__ == "__main__":
    main()
