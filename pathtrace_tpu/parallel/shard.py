"""Multi-device / multi-host rendering and differentiation.

The reference is hard-wired to one GPU (``cudaGLSetGLDevice(0)``,
src/preview.cpp:107).  Here scaling is a first-class axis (SURVEY.md
§2.3): a 1-D ``jax.sharding.Mesh`` over all devices, with two sharding
strategies —

* **sample-parallel** (default): the spp batch is sharded; every device
  renders the full image at different iteration indices and the
  accumulation buffer is ``psum``-reduced over ICI.  Scene/material
  parameters are replicated; scaling is embarrassingly parallel except
  for one (P,3) all-reduce per chunk.
* **pixel-parallel**: the pixel axis is sharded; each device owns a
  contiguous slab of rows and no collective is needed until gather.

Counter-based RNG keyed on (iter, *global* pixel id, depth) makes both
decompositions produce bit-identical images to the single-device render
— resharding never changes the picture (SURVEY.md §7.4 multi-host
determinism).

The gradient step all-reduces parameter grads with an explicit ``psum``
inside ``shard_map``.  AOT-checked scheduling fact (tools/aot_overlap.py,
v5e 2x4 optimized HLO): this psum compiles SYNCHRONOUS — correctly so.
The gradient pytree is a few KB (materials/TRS/camera, not NN weights),
all gradients complete together at the end of the single backward
sweep, and a latency-bound collective with no trailing independent
compute has nothing to hide behind; its cost is O(us) per step
(the honest form of the BASELINE.json "grad all-reduce overlapped
with backward sweep" requirement — see docs/SCALING.md).

Multi-host: call :func:`initialize_distributed` first; the same mesh
code then spans hosts (jax.distributed + ICI/DCN collectives).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..core.types import Scene
from ..render.integrator import trace_pixels

try:  # jax>=0.4.35
    from jax import shard_map as _shard_map_mod  # noqa: F401

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except (ImportError, AttributeError):  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _sm(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=check_rep,
        )


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` passthrough."""
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: Optional[int] = None, axis: str = "dev") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devs), (axis,))


# ---------------------------------------------------------------------------
# forward rendering
# ---------------------------------------------------------------------------

def render_sample_sharded(scene: Scene, it0: int, n_iters: int,
                          mesh: Mesh, compaction: str = "mask"):
    """spp sharded over the mesh; returns (accum (P,3), counts (n,depth)).

    ``n_iters`` must be a multiple of the mesh size.
    """
    ndev = mesh.devices.size
    if n_iters % ndev:
        raise ValueError(f"n_iters={n_iters} not divisible by {ndev} devices")
    its = it0 + jnp.arange(n_iters, dtype=jnp.int32)

    def body(scene, its_local):
        pix = jnp.arange(scene.pixel_count, dtype=jnp.int32)
        rad, counts = jax.vmap(
            lambda i: trace_pixels(scene, i, pix, compaction, False)
        )(its_local)
        return jax.lax.psum(rad.sum(0), "dev"), counts

    f = shard_map(
        body, mesh,
        in_specs=(P(), P("dev")),
        out_specs=(P(), P("dev")),
    )
    return jax.jit(f)(scene, its)


def render_pixel_sharded(scene: Scene, it0: int, n_iters: int,
                         mesh: Mesh, compaction: str = "mask"):
    """Pixel rows sharded over the mesh; no collectives in the loop."""
    ndev = mesh.devices.size
    if scene.pixel_count % ndev:
        raise ValueError(
            f"pixel count {scene.pixel_count} not divisible by {ndev}"
        )
    its = it0 + jnp.arange(n_iters, dtype=jnp.int32)
    pix = jnp.arange(scene.pixel_count, dtype=jnp.int32)

    def body(scene, its, pix_local):
        rad, counts = jax.vmap(
            lambda i: trace_pixels(scene, i, pix_local, compaction, False)
        )(its)
        # counts here are per-shard; sum over devices for global counts
        return rad.sum(0), jax.lax.psum(counts, "dev")

    f = shard_map(
        body, mesh,
        in_specs=(P(), P(), P("dev")),
        out_specs=(P("dev"), P()),
    )
    return jax.jit(f)(scene, its, pix)


def render_sample_sharded_pallas(scene: Scene, it0: int, n_iters: int,
                                 mesh: Mesh, interpret: bool = False,
                                 stream=None, tex_stream=None):
    """Sample-sharded rendering with the Pallas megakernel inside the
    mesh: each device runs its slice of the spp batch through the
    in-kernel spp loop, then one image psum over ICI.  The megakernel
    is a per-device program, so it composes with shard_map unchanged —
    the counter RNG keyed on (iter, pixel) makes the result identical
    to a single-device render of the same iterations.

    Requires a TPU mesh (the kernel has no compiled CPU path) unless
    ``interpret=True``, which runs the kernel in Pallas interpret mode —
    the way the CPU-mesh tests exercise this exact sharded program.
    ``n_iters`` must be a multiple of the mesh size.
    """
    from ..ops.pallas.megakernel import (
        _batch_jit, _scene_features, _tex_statics, _xla_fallback,
    )

    if _xla_fallback(scene):
        raise NotImplementedError(
            "render_sample_sharded_pallas: this scene's textures "
            "exceed the in-kernel ceiling; use the XLA engine "
            "(render_sample_sharded)"
        )
    ndev = mesh.devices.size
    if n_iters % ndev:
        raise ValueError(f"n_iters={n_iters} not divisible by {ndev}")
    per_dev = n_iters // ndev
    its0 = it0 + jnp.arange(ndev, dtype=jnp.int32) * per_dev
    features = _scene_features(scene)
    tex_geom, tex_used, btex_geom = _tex_statics(scene)

    def body(scene, it0_local):
        # stream/tex_stream: None = the kernel's auto shape-static
        # decision; forced by the CPU-mesh tests that pin streaming +
        # shard_map composition (round-5 stretch)
        rad, counts = _batch_jit(
            scene, it0_local[0], per_dev, interpret, False, features,
            tex_geom=tex_geom, tex_used=tex_used, btex_geom=btex_geom,
            stream=stream, tex_stream=tex_stream,
        )
        return jax.lax.psum(rad, "dev"), jax.lax.psum(counts, "dev")

    f = shard_map(
        body, mesh,
        in_specs=(P(), P("dev")),
        out_specs=(P(), P()),
    )
    return jax.jit(f)(scene, its0)


def render_pixel_sharded_pallas(scene: Scene, it0: int, n_iters: int,
                                mesh: Mesh, interpret: bool = False):
    """Pixel-sharded rendering with the Pallas megakernel: each device
    renders a contiguous slab of the image (its Pallas grid covers only
    its rows, offset by a traced pixel-0 scalar), so there are NO
    collectives in the render loop — only the final gather implied by
    the P('dev') output sharding.  The counter RNG keys on the GLOBAL
    pixel id, so the assembled image is bit-identical to a
    single-device render (the sp axis of SURVEY §2.3, now on the
    kernel engine; sample-parallel is render_sample_sharded_pallas).
    """
    from ..ops.pallas.megakernel import (
        _batch_jit, _scene_features, _tex_statics, _xla_fallback,
    )

    if _xla_fallback(scene):
        raise NotImplementedError(
            "render_pixel_sharded_pallas: this scene's textures "
            "exceed the in-kernel ceiling; use render_pixel_sharded"
        )
    ndev = mesh.devices.size
    P_total = scene.pixel_count
    if P_total % ndev:
        raise ValueError(
            f"pixel count {P_total} not divisible by {ndev} devices"
        )
    # slabs need not be tile-aligned: each device's last tile traces a
    # few rays past its slab (still valid global pixels) and the
    # [:local] slice drops them — ≤1 tile of waste per device
    local = P_total // ndev
    pix0 = jnp.arange(ndev, dtype=jnp.int32) * local
    features = _scene_features(scene)
    tex_geom, tex_used, btex_geom = _tex_statics(scene)

    def body(scene, pix0_local):
        rad, counts = _batch_jit(
            scene, it0, n_iters, interpret, False, features,
            tex_geom=tex_geom, tex_used=tex_used, btex_geom=btex_geom,
            pix0=pix0_local[0], local_pixels=local,
        )
        return rad, jax.lax.psum(counts, "dev")

    f = shard_map(
        body, mesh,
        in_specs=(P(), P("dev")),
        out_specs=(P("dev"), P()),
    )
    return jax.jit(f)(scene, pix0)


def render_sample_sharded_sorted(scene: Scene, it0: int, n_iters: int,
                                 mesh: Mesh, interpret: bool = False,
                                 nee: bool = False, stream=None,
                                 tex_stream=None):
    """Sample-sharded rendering on the SORTED engine (per-bounce ray
    re-sort between span kernels, megakernel.pathtrace_batch_sorted):
    each device runs its spp slice — sorting its own wavefront locally,
    no cross-device shuffle — then one image psum.  The carried pixel
    id keys the RNG, so the psum'd image is bit-identical to a
    single-device sorted render AND to the monolithic kernel.  The
    sharded answer for big mesh scenes, where the sort wins 1.3-1.6x
    (BENCHMARKS.md 'Sorted engine'); over-budget meshes stream their
    HBM tables inside the spans unchanged (``stream`` forces it, for
    the CPU-mesh composition tests)."""
    from ..ops.pallas.megakernel import (
        _batch_sorted_jit, _scene_features, _tex_statics,
        _xla_fallback,
    )

    if _xla_fallback(scene):
        raise NotImplementedError(
            "render_sample_sharded_sorted: this scene needs the XLA "
            "fallback; use render_sample_sharded_planes"
        )
    ndev = mesh.devices.size
    if n_iters % ndev:
        raise ValueError(f"n_iters={n_iters} not divisible by {ndev}")
    per_dev = n_iters // ndev
    its0 = it0 + jnp.arange(ndev, dtype=jnp.int32) * per_dev
    features = _scene_features(scene)
    tex_geom, tex_used, btex_geom = _tex_statics(scene)

    def body(scene, it0_local):
        rad, counts = _batch_sorted_jit(
            scene, it0_local[0], per_dev, interpret, features, nee,
            False, tex_geom, tex_used, btex_geom, stream=stream,
            tex_stream=tex_stream,
        )
        return jax.lax.psum(rad, "dev"), jax.lax.psum(counts, "dev")

    f = shard_map(
        body, mesh,
        in_specs=(P(), P("dev")),
        out_specs=(P(), P()),
    )
    return jax.jit(f)(scene, its0)


def render_sample_sharded_planes(scene: Scene, it0: int, n_iters: int,
                                 mesh: Mesh):
    """Sample-parallel rendering on the fused-plane XLA engine
    (render/plane_engine.py): the megakernel's exact trace, lowered by
    stock XLA, so it runs on ANY backend mesh — and has no in-kernel
    texture ceiling (the sharded answer for scenes that
    render_sample_sharded_pallas rejects).  Same psum reduction; the
    counter RNG keyed on (iter, pixel) keeps the image bit-identical
    to single-device."""
    from ..ops.pallas.megakernel import _scene_features
    from ..render.plane_engine import (
        _batch_jit_planes, _tex_statics_planes,
    )

    ndev = mesh.devices.size
    if n_iters % ndev:
        raise ValueError(f"n_iters={n_iters} not divisible by {ndev}")
    per_dev = n_iters // ndev
    its0 = it0 + jnp.arange(ndev, dtype=jnp.int32) * per_dev
    features = _scene_features(scene)
    tex_geom, tex_used, btex_geom = _tex_statics_planes(scene)

    def body(scene, it0_local):
        rad, counts = _batch_jit_planes(
            scene, it0_local[0], per_dev, features,
            tex_geom=tex_geom, tex_used=tex_used, btex_geom=btex_geom,
        )
        return jax.lax.psum(rad, "dev"), jax.lax.psum(counts, "dev")

    f = shard_map(
        body, mesh,
        in_specs=(P(), P("dev")),
        out_specs=(P(), P()),
    )
    return jax.jit(f)(scene, its0)


def render_pixel_sharded_planes(scene: Scene, it0: int, n_iters: int,
                                mesh: Mesh):
    """Pixel-sharded rendering on the fused-plane XLA engine: each
    device traces a contiguous pixel slab offset by a traced pixel-0
    scalar (global-pixel-keyed RNG -> bit-identical assembly), no
    collectives in the render loop."""
    from ..ops.pallas.megakernel import _scene_features
    from ..render.plane_engine import (
        _batch_jit_planes, _tex_statics_planes,
    )

    ndev = mesh.devices.size
    P_total = scene.pixel_count
    if P_total % ndev:
        raise ValueError(
            f"pixel count {P_total} not divisible by {ndev} devices"
        )
    local = P_total // ndev
    pix0 = jnp.arange(ndev, dtype=jnp.int32) * local
    features = _scene_features(scene)
    tex_geom, tex_used, btex_geom = _tex_statics_planes(scene)

    def body(scene, pix0_local):
        rad, counts = _batch_jit_planes(
            scene, it0, n_iters, features,
            tex_geom=tex_geom, tex_used=tex_used, btex_geom=btex_geom,
            pix0=pix0_local[0], local_pixels=local,
        )
        return rad, jax.lax.psum(counts, "dev")

    f = shard_map(
        body, mesh,
        in_specs=(P(), P("dev")),
        out_specs=(P("dev"), P()),
    )
    return jax.jit(f)(scene, pix0)


def make_sharded_renderer(scene: Scene, compaction: str = "mask",
                          mode: str = "samples", engine: str = "xla",
                          interpret: bool = False):
    """CLI hook: returns ``fn(it0, step) -> (accum, counts)``.

    Falls back from the pallas engine to the fused-plane XLA engine
    (like the unsharded CLI path) when the scene's textures exceed the
    in-kernel ceiling."""
    mesh = make_mesh()
    if engine in ("pallas", "planes") and compaction == "sort":
        print(
            "[pathtrace_tpu] WARNING: --compaction sort is a "
            "wavefront-engine mode; the tiled "
            f"{engine} engine masks dead lanes instead (same image, "
            "no densify pass) — rendering proceeds on "
            f"{engine} with masking",
            flush=True,
        )
    if engine == "pallas":
        from ..ops.pallas.megakernel import _xla_fallback

        if _xla_fallback(scene):
            print(
                "[pathtrace_tpu] scene textures exceed the in-kernel "
                "ceiling; sharded render falls back to the "
                "fused-plane engine",
                flush=True,
            )
            engine = "planes"

    def fn(it0, step):
        if engine == "pallas":
            return render_sample_sharded_pallas(
                scene, it0, step, mesh, interpret=interpret
            )
        if engine == "planes":
            if mode == "pixels":
                return render_pixel_sharded_planes(scene, it0, step,
                                                   mesh)
            return render_sample_sharded_planes(scene, it0, step, mesh)
        if mode == "pixels":
            return render_pixel_sharded(scene, it0, step, mesh, compaction)
        return render_sample_sharded(scene, it0, step, mesh, compaction)

    return fn


# ---------------------------------------------------------------------------
# differentiable step (the "training step" of this framework)
# ---------------------------------------------------------------------------

def sharded_grad_step(scene: Scene, target, it0: int, n_iters: int,
                      mesh: Mesh, compaction: str = "mask"):
    """One differentiable render step on the mesh.

    Renders ``n_iters`` sample-sharded iterations, computes
    ``loss = mean((render - target)^2)``, and returns
    ``(loss, grads)`` where ``grads`` is a Scene-shaped pytree of
    parameter gradients (materials, geometry TRS, camera), psum'd
    across devices — a synchronous, latency-bound, KB-scale collective
    (AOT-verified; see the in-body comment and the module docstring).
    """
    from ..render.diff import merge_params, split_params

    ndev = mesh.devices.size
    if n_iters % ndev:
        raise ValueError(f"n_iters={n_iters} not divisible by {ndev}")
    its = it0 + jnp.arange(n_iters, dtype=jnp.int32)
    params = split_params(scene)

    def body(params, target, its_local):
        def local_loss(params):
            sc = merge_params(scene, params)
            pix = jnp.arange(sc.pixel_count, dtype=jnp.int32)
            rad, _ = jax.vmap(
                lambda i: trace_pixels(sc, i, pix, compaction, True)
            )(its_local)
            img = jax.lax.psum(rad.sum(0), "dev") / float(n_iters)
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(local_loss)(params)
        # Backward bookkeeping in unchecked shard_map: the transpose of
        # the forward image-psum psums the (replicated) cotangent, so
        # each device's ``g`` is ndev x its own sample-shard's share.
        # psum/ndev turns that into the exact global gradient (verified
        # against the single-device gradient in tests/test_parallel.py).
        #
        # Scheduling fact (round-3 AOT check, v5e 2x4 optimized HLO —
        # tools/aot_overlap.py): this all-reduce compiles SYNCHRONOUS
        # (no all-reduce-start/done pair).  That is the right outcome,
        # not a missed optimization: the gradient pytree is a few KB
        # (materials/TRS/camera — a renderer, not a GB-parameter NN),
        # every gradient completes together at the end of the single
        # backward sweep, and a latency-bound collective with no
        # trailing independent compute has nothing to hide behind.
        # Round 2 claimed overlap here without evidence; the checked
        # claim is: one latency-bound psum per step, cost O(us),
        # negligible against the backward sweep.
        ndev_f = float(ndev)
        g = jax.tree.map(
            lambda x: jax.lax.psum(x, "dev") / ndev_f, g
        )
        return loss, g

    f = shard_map(
        body, mesh,
        in_specs=(P(), P(), P("dev")),
        out_specs=(P(), P()),
    )
    return jax.jit(f)(params, target, its)


def sharded_grad_step_planes(scene: Scene, target, it0: int,
                             n_iters: int, mesh: Mesh, nee: bool = True):
    """:func:`sharded_grad_step` on the fused-plane XLA engine with
    ``bvh_grad`` — the sharded gradient path that carries EVERY
    parameter group including ``tri_verts`` (the one exclusion of the
    in-kernel reverse sweep) and texel gradients.  Mesh scenes
    traverse the BVH detached and recompute the winner differentiably
    (plane_engine.pathtrace_batch_planes bvh_grad semantics); runs on
    any backend mesh.  Same psum structure as the other grad steps:
    one image psum, one KB-scale synchronous grad psum.
    """
    from ..ops.pallas.megakernel import _scene_features
    from ..render.diff import merge_params, split_params
    from ..render.plane_engine import (
        _batch_jit_planes, _tex_statics_planes,
    )

    ndev = mesh.devices.size
    if n_iters % ndev:
        raise ValueError(f"n_iters={n_iters} not divisible by {ndev}")
    per_dev = n_iters // ndev
    its0 = it0 + jnp.arange(ndev, dtype=jnp.int32) * per_dev
    features = _scene_features(scene)
    tex_geom, tex_used, btex_geom = _tex_statics_planes(scene)
    params = split_params(scene)

    def body(params, target, it0_local):
        def local_loss(params):
            sc = merge_params(scene, params)
            rad, _ = _batch_jit_planes(
                sc, it0_local[0], per_dev, features, nee, False,
                tex_geom, tex_used, btex_geom, bvh_grad=True,
            )
            img = jax.lax.psum(rad, "dev") / float(n_iters)
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(local_loss)(params)
        # transpose of the image psum makes each device's g ndev x its
        # sample-shard's share (see sharded_grad_step); psum/ndev is
        # the exact global gradient
        ndev_f = float(ndev)
        g = jax.tree.map(
            lambda x: jax.lax.psum(x, "dev") / ndev_f, g
        )
        return loss, g

    f = shard_map(
        body, mesh,
        in_specs=(P(), P(), P("dev")),
        out_specs=(P(), P()),
    )
    return jax.jit(f)(params, target, its0)


def sharded_grad_step_pallas(scene: Scene, target, it0: int,
                             n_iters: int, mesh: Mesh,
                             interpret: bool = False, nee: bool = True):
    """:func:`sharded_grad_step` with BOTH sweeps on the Pallas path.

    Per device: the forward megakernel renders the local spp slice
    (in-kernel spp loop), one image ``psum`` over ICI produces the
    global image and the MSE cotangent, then the fused
    :func:`~pathtrace_tpu.ops.pallas.megakernel._vjp_kernel` recomputes
    the local forward in VMEM and transposes it bounce-by-bounce; the
    parameter-gradient ``psum`` is the only other collective —
    synchronous and latency-bound at KB scale, like
    :func:`sharded_grad_step`'s (AOT-verified, tools/aot_overlap.py).
    Gradients are for ``mean((img - target)^2)`` w.r.t. the
    render.diff.split_params pytree — identical (up to f32
    reassociation) to :func:`sharded_grad_step` on the XLA engine,
    except that mesh scenes carry ``tri_verts=None`` (the carry-mode
    exclusion, marked rather than silently zero — see
    megakernel.render_vjp_pallas).

    Spec anchor: BASELINE.json north star (backward Pallas kernels on
    the sharded training step); reference loop src/pathtrace.cu:135-158.
    """
    from ..ops.pallas.megakernel import (
        _batch_jit, _render_vjp_jit, _scene_features,
    )
    from ..render.diff import merge_params, split_params

    has_tex = any(t >= 0 for t in scene.texture_ids) or any(
        t >= 0 for t in scene.bump_texture_ids
    )
    if has_tex:
        raise NotImplementedError(
            "sharded_grad_step_pallas: textured scenes use "
            "sharded_grad_step (XLA autodiff)"
        )
    if scene.mesh.count and not scene.mesh.bvh_meta:
        raise NotImplementedError(
            "sharded_grad_step_pallas: mesh scenes need the BVH "
            "(render_vjp_pallas 'carry'-mode traversal)"
        )
    ndev = mesh.devices.size
    if n_iters % ndev:
        raise ValueError(f"n_iters={n_iters} not divisible by {ndev}")
    per_dev = n_iters // ndev
    its0 = it0 + jnp.arange(ndev, dtype=jnp.int32) * per_dev
    features = _scene_features(scene)
    params = split_params(scene)
    nee_lights = tuple(
        (int(li), int(scene.geoms.type[li]))
        for li in scene.light_indices
    ) if nee else ()
    n_px = scene.pixel_count

    def body(params, target, it0_local):
        sc = merge_params(scene, params)
        rad, _ = _batch_jit(
            sc, it0_local[0], per_dev, interpret, False, features,
            nee=nee,
        )
        img = jax.lax.psum(rad, "dev") / float(n_iters)
        loss = jnp.mean((img - target) ** 2)
        # d loss / d (local per-sample radiance sum): same ct on every
        # device — each device's sweep covers its own spp slice, so the
        # grad psum below is the exact global gradient
        ct = 2.0 * (img - target) / float(n_px * 3 * n_iters)
        _, g = _render_vjp_jit(
            scene, params, ct, it0_local[0], per_dev, interpret,
            features, nee, nee_lights,
        )
        g = jax.tree.map(lambda x: jax.lax.psum(x, "dev"), g)
        return loss, g

    f = shard_map(
        body, mesh,
        in_specs=(P(), P(), P("dev")),
        out_specs=(P(), P()),
    )
    return jax.jit(f)(params, target, its0)
