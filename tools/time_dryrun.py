"""Stage-by-stage timing of dryrun_multichip pieces (CPU mesh)."""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import dataclasses

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

import pathtrace_tpu as pt
from pathtrace_tpu.parallel import shard as ps

res = (int(sys.argv[1]), int(sys.argv[2]))
depth = int(sys.argv[3])
ndev = int(sys.argv[4]) if len(sys.argv) > 4 else 8
use_cache = len(sys.argv) > 5 and sys.argv[5] == "cache"
if use_cache:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

scene = pt.load_scene("scenes/cornell.txt")
scene = dataclasses.replace(scene, resolution=res, trace_depth=depth)
target = np.zeros((scene.pixel_count, 3), np.float32)
mesh = ps.make_mesh(ndev)

t0 = time.time()
loss_p, grads_p = ps.sharded_grad_step_pallas(
    scene, target, 1, ndev, mesh, interpret=True
)
float(loss_p)
print(f"sharded_grad_step_pallas res={res} depth={depth} ndev={ndev}: "
      f"{time.time()-t0:.1f}s  loss={float(loss_p):.6f}")
