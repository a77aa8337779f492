"""Differentiable rendering — the capability the reference doesn't have.

Pixel gradients w.r.t. material parameters (albedo, emission, IOR,
specular exponent/color), geometry TRS transforms, and camera vectors,
through the full bounce loop (BASELINE.json north star).

Estimator: *detached sampling*.  All discrete events — lobe selection,
Fresnel reflect/refract choice, nearest-hit geometry selection,
termination — are functions of RNG draws and non-differentiable
comparisons; gradients flow through the continuous factors (throughput
tints, Schlick weights via the chosen branch, intersection positions
and normals as functions of TRS, emission values).  This is the
standard score-free path-gradient estimator: exact for color/emission
parameters, correct-in-expectation for continuous geometric parameters
away from visibility discontinuities (documented bias at silhouettes —
SURVEY.md §7.4).

Memory: each bounce is rematerialized in the backward pass
(``jax.checkpoint`` on the scan body via ``remat=True``), so the
backward sweep never stores the full per-bounce wavefront history.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..core.types import Scene
from .integrator import trace_pixels


def split_params(scene: Scene):
    """(differentiable params, static remainder closure).

    Params is a plain dict pytree of float leaves only — safe for
    ``jax.grad`` and optimizer libraries (optax) alike.
    """
    return dict(
        materials=scene.materials,
        translation=scene.geoms.translation,
        rotation=scene.geoms.rotation,
        scale=scene.geoms.scale,
        camera=scene.camera,
        tri_verts=scene.mesh.tri_verts,
    )


def merge_params(scene: Scene, params) -> Scene:
    return dataclasses.replace(
        scene,
        materials=params["materials"],
        geoms=dataclasses.replace(
            scene.geoms,
            translation=params["translation"],
            rotation=params["rotation"],
            scale=params["scale"],
        ),
        camera=params["camera"],
        mesh=dataclasses.replace(scene.mesh, tri_verts=params["tri_verts"]),
    )


def render_mean(scene: Scene, it0, n_iters: int, compaction="mask",
                remat=True, nee=False, engine: str = "wavefront"):
    """Mean image over ``n_iters`` fixed-RNG iterations, differentiable.

    ``nee=True`` uses the direct-lighting estimator — required for
    non-trivial geometry-transform gradients (see module docstring).

    ``engine="planes"`` runs the fused-plane XLA engine instead of the
    wavefront integrator: the megakernel's exact trace, far faster
    forward and backward through plain autodiff (the fast XLA gradient
    path for scenes the in-kernel reverse sweep rejects — image
    textures incl. texel gradients, meshes via the differentiable
    linear fold).  Same RNG streams, so losses/gradients agree with
    the wavefront up to f32 fusion-order noise.  NOTE: the planes
    branch derives static scene facts eagerly, so it needs a CONCRETE
    scene — :func:`render_loss_and_grad` hoists the statics before
    jit; do the same if you wrap this in your own jit."""
    if engine == "planes":
        from .plane_engine import pathtrace_batch_planes

        rad, _ = pathtrace_batch_planes(
            scene, it0, n_iters, nee=nee, bvh_grad=True,
        )
        return rad / float(n_iters)
    pix = jnp.arange(scene.pixel_count, dtype=jnp.int32)
    its = jnp.asarray(it0, jnp.int32) + jnp.arange(n_iters, dtype=jnp.int32)
    rad, _ = jax.vmap(
        lambda i: trace_pixels(scene, i, pix, compaction, remat, nee)
    )(its)
    return rad.sum(0) / float(n_iters)


@functools.partial(jax.jit, static_argnames=("n_iters", "compaction",
                                             "nee"))
def _loss_grad_wavefront(scene: Scene, target, it0, n_iters: int,
                         compaction: str = "mask", nee: bool = False):
    params = split_params(scene)

    def loss_fn(params):
        img = render_mean(
            merge_params(scene, params), it0, n_iters, compaction,
            nee=nee,
        )
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(loss_fn)(params)


@functools.partial(jax.jit, static_argnames=("n_iters", "nee",
                                             "features", "tex_geom",
                                             "tex_used", "btex_geom"))
def _loss_grad_planes(scene: Scene, target, it0, n_iters: int, nee,
                      features, tex_geom, tex_used, btex_geom):
    from .plane_engine import _batch_jit_planes

    params = split_params(scene)

    def loss_fn(params):
        # bvh_grad: BVH traversal detached to the winning triangle,
        # hit recomputed differentiably -> mesh gradients at traversal
        # speed (same estimator as the old use_bvh=False linear fold)
        rad, _ = _batch_jit_planes(
            merge_params(scene, params), it0, n_iters, features, nee,
            False, tex_geom, tex_used, btex_geom, bvh_grad=True,
        )
        img = rad / float(n_iters)
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(loss_fn)(params)


def render_loss_and_grad(scene: Scene, target, it0, n_iters: int,
                         compaction: str = "mask", nee: bool = False,
                         engine: str = "wavefront"):
    """L2 image loss + gradients w.r.t. the differentiable params.

    Returns (loss, grads-dict matching :func:`split_params`).

    ``engine="planes"`` differentiates the fused-plane XLA engine
    (plane_engine.py) instead of the wavefront — same estimator, same
    RNG streams, far faster; static scene facts (feature flags,
    texture charts) are derived here from the concrete scene and
    passed into jit as statics."""
    if engine == "planes":
        from ..ops.pallas.megakernel import _scene_features
        from .plane_engine import _tex_statics_planes

        tg, tu, bg = _tex_statics_planes(scene)
        return _loss_grad_planes(
            scene, target, it0, n_iters, nee, _scene_features(scene),
            tg, tu, bg,
        )
    return _loss_grad_wavefront(scene, target, it0, n_iters,
                                compaction, nee)


@functools.partial(
    jax.jit, static_argnames=("n_iters", "compaction")
)
def render_value_and_pixel_grad(scene: Scene, it0, n_iters: int,
                                pixel_weights=None,
                                compaction: str = "mask"):
    """Gradient of a weighted pixel sum — "pixel gradients w.r.t.
    parameters" in BASELINE.json's acceptance sense."""
    params = split_params(scene)

    def fn(params):
        img = render_mean(
            merge_params(scene, params), it0, n_iters, compaction
        )
        if pixel_weights is None:
            return img.sum()
        return (img * pixel_weights).sum()

    return jax.value_and_grad(fn)(params)
