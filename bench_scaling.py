"""Multi-device scaling-efficiency benchmark (BASELINE.json north star:
">=80% rays/s scaling efficiency at >=2 hosts").

Runs the sample-sharded renderer on 1..N devices of the local mesh and
reports rays/s scaling efficiency.  On this single-chip dev box it
exercises the virtual CPU mesh (JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count); on a pod slice the same code
measures real ICI scaling.  Prints one JSON line per device count and
a final summary line.
"""

import json
import os
import sys
import time


def main():
    n_want = int(os.environ.get("PT_SCALE_DEVICES", "8"))
    if os.environ.get("JAX_PLATFORMS", "") != "tpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_want}"
            ).strip()

    import jax

    # Device discovery initializes the backend, after which the platform
    # cannot change — decide up front.  Default: the virtual CPU mesh
    # (the dev box has one TPU chip); set PT_SCALE_PLATFORM=tpu on a
    # real pod slice to measure ICI scaling.
    if os.environ.get("PT_SCALE_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import pathtrace_tpu as pt
    from pathtrace_tpu.parallel import shard as ps

    scene = pt.load_scene(
        os.environ.get(
            "PT_SCALE_SCENE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scenes", "cornell.txt"),
        )
    )
    import dataclasses

    res = int(os.environ.get("PT_SCALE_RES", "200"))
    scene = dataclasses.replace(scene, resolution=(res, res))

    devs = jax.devices()
    counts_per_iter = None
    results = {}
    spp_per_dev = int(os.environ.get("PT_SCALE_SPP", "8"))
    for n in [1, 2, len(devs)]:
        if n > len(devs) or n in results:
            continue
        mesh = ps.make_mesh(n)
        spp = spp_per_dev * n          # weak scaling: fixed work/device
        acc, counts = ps.render_sample_sharded(scene, 1, spp, mesh)
        np.asarray(acc)  # warm + sync
        t0 = time.time()
        acc, counts = ps.render_sample_sharded(scene, 101, spp, mesh)
        np.asarray(acc)
        dt = time.time() - t0
        if counts_per_iter is None:
            counts_per_iter = float(np.asarray(counts).sum()) / spp
        rays_s = counts_per_iter * spp / dt
        results[n] = rays_s
        print(json.dumps(dict(
            devices=n, spp=spp, wall_s=round(dt, 3),
            mrays_s=round(rays_s / 1e6, 2),
        )), flush=True)

    if os.environ.get("PT_SCALE_STREAMED", "0") == "1":
        # round-5 stretch (VERDICT r4 task 8): HBM-streamed mesh
        # traversal under shard_map.  On the CPU mesh this runs the
        # interpret-mode kernel on a small scene (the composition
        # check — bit-equality vs single-device is pinned in
        # tests/test_parallel.py::TestStreamedSharding); on a pod
        # slice set PT_SCALE_SCENE=scenes/cornell_hugemesh.txt and the
        # auto-stream decision engages at the real size.
        msc = pt.load_scene(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "scenes", "cornell_mesh.txt",
        ))
        msc = dataclasses.replace(msc, resolution=(32, 32),
                                  trace_depth=3)
        mesh = ps.make_mesh(len(devs))
        on_tpu = devs[0].platform == "tpu"
        acc, _ = ps.render_sample_sharded_pallas(
            msc, 1, len(devs), mesh, interpret=not on_tpu, stream=True
        )
        np.asarray(acc)
        t0 = time.time()
        acc, _ = ps.render_sample_sharded_pallas(
            msc, 101, len(devs), mesh, interpret=not on_tpu,
            stream=True,
        )
        s = float(np.asarray(acc).sum())
        print(json.dumps(dict(
            stage="streamed_mesh_shard_map", devices=len(devs),
            wall_s=round(time.time() - t0, 3), image_sum=round(s, 2),
        )), flush=True)

    base = results[1]
    n_max = max(results)
    eff = results[n_max] / (base * n_max)
    print(json.dumps(dict(
        metric=f"rays/s scaling efficiency at {n_max} devices "
               f"({jax.devices()[0].platform})",
        value=round(eff, 3),
        unit="fraction",
        vs_baseline=round(eff / 0.8, 3),  # target >=0.8
    )))
    return 0


if __name__ == "__main__":
    sys.exit(main())
