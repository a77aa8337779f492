"""Persistent XLA compilation cache.

The megakernel's compile times (tens of seconds to minutes per
(scene-features, resolution, batch) shape through a remote compile
helper) dwarf its run times, so every entry point that users launch
repeatedly — the CLI, the warmup tool, the benchmark — shares one
on-disk cache.  Without it each fresh process recompiles from scratch.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's compilation cache at a durable directory.

    Resolution order: explicit ``path`` arg, ``JAX_COMPILATION_CACHE_DIR``
    env var, then ``~/.jax_cache``.  Safe to call more than once.
    """
    path = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.jax_cache")
    )
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
