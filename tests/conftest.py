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


# ---------------------------------------------------------------------------
# test tiers (VERDICT r3 item 7): `make test` runs the fast tier
# (-m "not slow", <5 min — parser/oracle/math/gradient regressions);
# `make test-full` runs everything.  The heavy modules — interpret-mode
# Pallas kernels, AOT v5e compiles, the 2-process distributed test,
# example smoke runs — are auto-marked slow here by module name so new
# tests in them inherit the tier without per-test bookkeeping.
SLOW_MODULES = {
    # measured per-module wall (round-4 quiet box, s):
    "test_parallel",       # 954 — shard_map interpret-kernel programs
    "test_planes",         # 429 — bvh_grad FD + fused-plane engine
    "test_vjp_kernel",     # 183 — interpret in-kernel reverse sweep
    "test_sss",            # 126 — interpret SSS kernel parity
    "test_textures",       # 120 — interpret textured kernels
    "test_examples",       # ~200 — example smoke runs (interpret)
    "test_grad_kernel",    # 86 — interpret analytic grad kernel
    "test_nee",            # 85 — interpret NEE kernels + FD grads
    "test_split",          # 63 — interpret split-engine spans
    "test_stream",         # 48 — interpret streamed-BVH parity (r4)
    "test_sorted",         # interpret sorted-engine exactness (r5)
    "test_mosaic_compile", # 40 — AOT v5e compiles (libtpu)
    "test_pallas",         # 38 — interpret megakernel parity
}
# fast tier (everything else): ~4.5 min measured — parser, oracle,
# intersect/bsdf/vecmath/rng closed-form tests, wavefront autodiff
# (test_diff), goldens, bvh build, distributed bring-up.


# cheap pure-function tests inside otherwise-slow modules that the
# fast tier should keep (direct oracles on primitives)
FAST_EXCEPTIONS = (
    "test_tex_fetch_exact",      # texture-fetch direct oracle
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        # exact test-name match (item.name includes parametrize ids;
        # strip them) so e.g. a future slow "test_tex_fetch_exact_big"
        # doesn't silently ride the fast tier via substring matching
        base_name = item.name.split("[")[0]
        if base_name in FAST_EXCEPTIONS:
            continue
        mod = item.nodeid.split("::")[0].rsplit("/", 1)[-1]
        if mod.removesuffix(".py") in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


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
