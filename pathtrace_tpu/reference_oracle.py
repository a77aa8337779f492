"""NumPy CPU oracle: the same integrator semantics, no JAX tracing.

Runs the identical op-level math (``ops/intersect``, ``ops/bsdf``,
``core/rng`` all take ``xp``) as a plain Python loop over bounces.  The
jitted TPU integrator must agree with this to float tolerance at fixed
RNG — the regression contract SURVEY.md §4 derives from the reference's
deterministic seeding (src/pathtrace.cu:41-45).  Independent *scalar*
re-derivations of the intersection/BSDF math live in tests/ to check
the shared ops themselves.
"""

from __future__ import annotations

import numpy as np

from .core import rng
from .core.rng import Draw
from .core.types import Scene
from .render import integrator as I


def oracle_iteration(scene: Scene, it: int, nee: bool = False,
                     rr: bool = False):
    """One iteration (1 spp) in NumPy. Returns (radiance (P,3),
    live_counts (depth,))."""
    xp = np
    width, height = scene.resolution
    n = width * height
    fwd, inv, inv_t = I.geom_transforms(scene.geoms, xp=xp)
    pixel_ids = np.arange(n, dtype=np.int32)
    it_arr = np.int32(it)
    origins, dirs = I.raygen(
        scene.camera, width, height, it_arr, pixel_ids, xp=xp
    )
    state = dict(
        origins=origins.astype(np.float32),
        dirs=dirs.astype(np.float32),
        throughput=np.ones((n, 3), dtype=np.float32),
        radiance=np.zeros((n, 3), dtype=np.float32),
        pixel=pixel_ids,
        live=np.ones((n,), dtype=bool),
    )
    if scene.geoms.velocity is not None:
        state["time"] = rng.uniform(it_arr, pixel_ids, 0, Draw.TIME, xp=np)
    if scene.materials.sss_sigma is not None:
        state["med_sigma"] = np.zeros((n,), dtype=np.float32)
        state["med_albedo"] = np.ones((n, 3), dtype=np.float32)
    if nee:
        state["emit_ok"] = np.ones((n,), dtype=bool)
    live_counts = []
    for depth in range(scene.trace_depth):
        live_counts.append(int(state["live"].sum()))
        state = I._bounce(
            scene, fwd, inv, inv_t, it_arr, np.int32(depth), state, xp=xp,
            nee=nee, rr=rr,
        )
    return state["radiance"], np.asarray(live_counts, dtype=np.int32)


def oracle_render(scene: Scene, n_iters: int):
    accum = np.zeros((scene.pixel_count, 3), dtype=np.float32)
    for it in range(1, n_iters + 1):
        rad, _ = oracle_iteration(scene, it)
        accum += rad
    return accum
