"""Multi-PROCESS (multi-host) bring-up: two jax.distributed processes
on localhost, one global mesh, the sample-sharded renderer psumming
across processes.

The virtual 8-device CPU mesh in conftest.py exercises multi-DEVICE
sharding in one process; this is the missing multi-HOST axis (VERDICT
r2 #7): ``jax.distributed.initialize`` with a localhost coordinator,
2 processes x 2 local CPU devices = a 4-device global mesh, and the
same ``parallel.shard`` code paths running across the process
boundary — the exact bring-up docs/SCALING.md prescribes for pods
(DCN coordinator + per-host local devices).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from pathtrace_tpu.parallel import shard as ps
ps.initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2,
    process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert len(jax.local_devices()) == 2

import dataclasses as dc
import numpy as np
import pathtrace_tpu as pt

scene = dc.replace(
    pt.load_scene(os.path.join("@REPO@", "scenes", "cornell.txt")),
    resolution=(16, 16), trace_depth=2,
)
mesh = ps.make_mesh(4)
rad, counts = ps.render_sample_sharded(scene, 1, 4, mesh)
# rad is fully replicated (out_specs P()); every process holds it
loc = np.asarray(rad.addressable_data(0))
np.save(out, loc)
print(f"[proc {pid}] ok sum={loc.sum():.6f}", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("PT_TEST_TPU"), reason="CPU multiprocess rig"
)
def test_two_process_sample_sharded(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("@REPO@", REPO))
    outs = [str(tmp_path / f"rad{i}.npy") for i in range(2)]
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=REPO)
    env.pop("JAX_PLATFORM_NAME", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(script), str(i), str(port),
             outs[i]],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    # both processes hold the identical replicated global image, and it
    # matches a plain single-process render of the same 4 iterations
    r0, r1 = np.load(outs[0]), np.load(outs[1])
    np.testing.assert_array_equal(r0, r1)

    import dataclasses as dc

    import jax.numpy as jnp

    import pathtrace_tpu as pt

    scene = dc.replace(
        pt.load_scene("scenes/cornell.txt"),
        resolution=(16, 16), trace_depth=2,
    )
    ref, _ = pt.pathtrace_batch(scene, 1, 4)
    np.testing.assert_allclose(r0, np.asarray(ref), rtol=1e-5,
                               atol=1e-6)
