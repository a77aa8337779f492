"""AOT scheduling check for the sharded training step's collectives.

Compiles ``parallel.shard.sharded_grad_step``'s exact program for an
8-chip v5e slice WITHOUT hardware (jax.experimental.topologies AOT)
and inspects the optimized HLO: are the gradient all-reduces emitted
as async start/done pairs (overlapped) or synchronous?

Round-2 docs asserted overlap; this check (round 3) found **zero**
``all-reduce-start``/``done`` pairs — the psums are synchronous, and
correctly so: the gradient pytree is a few KB produced all at once at
the end of the backward sweep, so the collective is latency-bound
with no trailing compute to hide behind.  The corrected claim lives
in parallel/shard.py and docs/SCALING.md.

Run from the repo root:  python -c "import runpy; runpy.run_path('tools/aot_overlap.py', run_name='__main__')"
"""

from __future__ import annotations

import dataclasses as dc
import re


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh

    import pathtrace_tpu as pt
    from pathtrace_tpu.parallel import shard as ps
    from pathtrace_tpu.parallel.shard import P
    from pathtrace_tpu.render.diff import merge_params, split_params
    from pathtrace_tpu.render.integrator import trace_pixels

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x4"
    )
    mesh = Mesh(np.array(topo.devices).reshape(8), ("dev",))
    print(f"AOT topology: v5e 2x4, {mesh.devices.size} devices")

    scene = dc.replace(
        pt.load_scene("scenes/cornell.txt"),
        resolution=(64, 64), trace_depth=4,
    )
    n_iters = ndev = 8
    its = 1 + jnp.arange(n_iters, dtype=jnp.int32)
    params = split_params(scene)
    target = jnp.zeros((scene.pixel_count, 3), jnp.float32)

    # sharded_grad_step's body, verbatim (the function itself executes;
    # here we lower+compile against the detached topology instead)
    def body(params, target, its_local):
        def local_loss(params):
            sc = merge_params(scene, params)
            pix = jnp.arange(sc.pixel_count, dtype=jnp.int32)
            rad, _ = jax.vmap(
                lambda i: trace_pixels(sc, i, pix, "mask", True)
            )(its_local)
            img = jax.lax.psum(rad.sum(0), "dev") / float(n_iters)
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(local_loss)(params)
        g = jax.tree.map(
            lambda x: jax.lax.psum(x, "dev") / float(ndev), g
        )
        return loss, g

    f = ps.shard_map(body, mesh, in_specs=(P(), P(), P("dev")),
                     out_specs=(P(), P()))
    hlo = jax.jit(f).lower(params, target, its).compile().as_text()
    n_start = len(re.findall(r"all-reduce-start", hlo))
    n_done = len(re.findall(r"all-reduce-done", hlo))
    n_sync = len(re.findall(r"all-reduce\(", hlo))
    print(f"async all-reduce-start/done pairs: {n_start}/{n_done}")
    print(f"synchronous all-reduce ops: {n_sync}")
    print("conclusion:",
          "OVERLAPPED" if n_start else
          "SYNCHRONOUS (latency-bound KB-scale psums; nothing to hide"
          " behind — see parallel/shard.py)")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
