"""Cold-compile-time table for every shipped scene x engine x grad
mode (VERDICT r2 #8), measured WITHOUT the axon tunnel: Mosaic/XLA
compile via jax.experimental.topologies AOT against a v5e topology, so
the numbers are pure compiler cost (the remote-compile RPC layer the
interactive path pays is excluded — and was, it turns out, most of the
pain).  Persistent cache is disabled for the run so every entry is a
true cold compile.

Run from the repo root:
  python -c "import runpy; runpy.run_path('tools/compile_table.py', run_name='__main__')"
"""

from __future__ import annotations

import dataclasses as dc
import time


def main() -> int:
    import jax

    jax.config.update("jax_enable_compilation_cache", False)

    from jax.experimental import topologies

    import pathtrace_tpu as pt
    from pathtrace_tpu.ops.pallas import megakernel as mk
    from pathtrace_tpu.render import plane_engine as pe
    from pathtrace_tpu.render.diff import split_params

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x2"
    )
    dev = topo.devices[0]
    print("AOT target:", dev, "| persistent cache OFF")
    rows = []

    def timed(label, lower_fn):
        t0 = time.time()
        with jax.default_device(dev):
            lowered = lower_fn()
            t_lower = time.time() - t0
            t0 = time.time()
            lowered.compile()
        t_compile = time.time() - t0
        rows.append((label, t_lower, t_compile))
        print(f"{label:58s} lower {t_lower:6.1f}s  compile "
              f"{t_compile:6.1f}s", flush=True)

    def scene_at(name, res=(800, 800), depth=8, **kw):
        sc = pt.load_scene(f"scenes/{name}.txt")
        return dc.replace(sc, resolution=res, trace_depth=depth, **kw)

    # ---- forward megakernel, every shipped scene at its native shape
    for name in ("cornell", "sphere", "cornell_glass", "cornell_mesh",
                 "cornell_bigmesh", "cornell_checker", "cornell_tex",
                 "cornell_bumpmesh"):
        sc = scene_at(name)
        tg, tu, bg = mk._tex_statics(sc)
        if mk._xla_fallback(sc):
            print(f"{name}: over texture caps -> planes engine only")
            continue
        feats = mk._scene_features(sc)
        timed(f"fwd megakernel  {name} 800x800 d8",
              lambda sc=sc, feats=feats, tg=tg, tu=tu, bg=bg:
              mk._batch_jit.lower(sc, 1, 8, False, False, feats,
                                  False, False, tg, tu, bg))

    # ---- forward megakernel with NEE (the direct-lighting estimator)
    sc = scene_at("cornell")
    feats = mk._scene_features(sc)
    timed("fwd megakernel  cornell 800x800 d8 NEE",
          lambda sc=sc, feats=feats:
          mk._batch_jit.lower(sc, 1, 8, False, False, feats, True))

    # ---- split engine (cornell + sphere)
    for name, k in (("cornell", 3), ("sphere", 1)):
        sc = scene_at(name)
        feats = mk._scene_features(sc)
        timed(f"fwd split k={k}   {name} 800x800 d8",
              lambda sc=sc, feats=feats, k=k:
              mk._batch_split_jit.lower(sc, 1, 8, k, False, feats))

    # ---- planes engine (XLA) forward
    for name in ("cornell", "cornell_tex"):
        sc = scene_at(name, res=(400, 400))
        tg, tu, bg = pe._tex_statics_planes(sc)
        feats = mk._scene_features(sc)
        timed(f"fwd planes      {name} 400x400 d8",
              lambda sc=sc, feats=feats, tg=tg, tu=tu, bg=bg:
              pe._batch_jit_planes.lower(sc, 1, 8, feats, False,
                                         False, tg, tu, bg))

    # ---- in-kernel reverse sweep (grad mode)
    import jax.numpy as jnp

    for name, nee, res, d in (("cornell", True, (400, 400), 8),
                              ("cornell_glass", True, (400, 400), 8),
                              ("cornell_mesh", True, (128, 128), 5)):
        sc = scene_at(name, res=res, depth=d)
        feats = mk._scene_features(sc)
        params = split_params(sc)
        ct = jnp.ones((sc.pixel_count, 3), jnp.float32)
        nee_lights = tuple(
            (int(li), int(sc.geoms.type[li])) for li in sc.light_indices
        ) if nee else ()
        timed(f"vjp kernel      {name} {res[0]}x{res[1]} d{d} nee",
              lambda sc=sc, params=params, ct=ct, feats=feats,
                     nee=nee, nl=nee_lights:
              mk._render_vjp_jit.lower(sc, params, ct, 1, 1, False,
                                       feats, nee, nl))

    # ---- the round-2 "pathological" shape: 100x100 + glass + DoF
    sc = scene_at("cornell_glass", res=(100, 100))
    sc = dc.replace(sc, camera=dc.replace(
        sc.camera, aperture=jnp.float32(0.3),
        focal_dist=jnp.float32(9.0)))
    feats = mk._scene_features(sc)
    timed("fwd megakernel  glass+DoF 100x100 d8 (r2 'pathological')",
          lambda sc=sc, feats=feats:
          mk._batch_jit.lower(sc, 1, 8, False, False, feats))

    print("\n| target | lower s | compile s |")
    print("|---|---|---|")
    for label, tl, tc in rows:
        print(f"| {label} | {tl:.1f} | {tc:.1f} |")
    worst = max(rows, key=lambda r: r[1] + r[2])
    print(f"\nworst cold compile: {worst[0]} at "
          f"{worst[1] + worst[2]:.1f}s")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
