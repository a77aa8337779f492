"""Test harness config.

Forces the CPU backend with 8 virtual devices BEFORE jax is imported,
so sharding tests exercise a real multi-device mesh without a pod
(SURVEY.md §4: the standard way to test mesh code).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The ambient environment registers the axon TPU plugin via
# sitecustomize and pins the platform; env vars alone don't win.  Unit
# tests must run on the virtual CPU mesh for speed and multi-device
# coverage, so override the config directly.  Set PT_TEST_TPU=1 to run
# the suite against the real chip instead.
if not os.environ.get("PT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

# Persistent compilation cache: the grad/vjp tests are compile-dominated
# (~2 min XLA compile, ~0.04 s run); caching makes re-runs near-instant
# and keeps the suite usable as it grows.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import dataclasses  # noqa: E402

import pytest  # noqa: E402


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def cornell_scene():
    import pathtrace_tpu as pt

    return pt.load_scene(os.path.join(REPO, "scenes", "cornell.txt"))


@pytest.fixture(scope="session")
def sphere_scene():
    import pathtrace_tpu as pt

    return pt.load_scene(os.path.join(REPO, "scenes", "sphere.txt"))


@pytest.fixture(scope="session")
def cornell_small(cornell_scene):
    return dataclasses.replace(
        cornell_scene, resolution=(32, 32), trace_depth=4
    )


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    One pytest process accumulates every module's jit cache (the
    interpret-mode kernels compile to very large XLA:CPU executables);
    past ~60% of the suite the process has segfaulted inside the
    persistent-cache writer under that memory pressure.  Warm entries
    reload from .jax_cache, so the cross-module recompiles this forces
    are disk reads, not compiles.
    """
    yield
    import jax

    jax.clear_caches()
