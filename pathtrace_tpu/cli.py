"""Headless CLI — the role of the reference's app driver (src/main.cpp).

``python -m pathtrace_tpu.cli scene.txt`` mirrors
``cis565_path_tracer scene.txt`` (src/main.cpp:21-47): parse the scene,
run ITERATIONS progressive-refinement iterations, save
``<FILE>.<start time>.<N>samp.png``.  On top of the reference:

* flag overrides for every render setting (SURVEY.md §5 config plan);
* per-chunk structured logging (iter, ms/iter, Mrays/s, per-bounce
  live counts — the README.md:284-293 analysis as first-class output);
* periodic preview PNG dump (the headless replacement for the GL
  preview window, SURVEY.md §2 preview row);
* checkpoint every K iterations + exact resume (counter-based RNG
  makes the continued render bit-identical);
* multi-device rendering via --shard over the local device mesh.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pathtrace_tpu",
        description="TPU-native differentiable path tracer",
    )
    p.add_argument("scene", help="scene file (reference text format)")
    p.add_argument("--spp", type=int, default=None,
                   help="override ITERATIONS (samples per pixel)")
    p.add_argument("--depth", type=int, default=None,
                   help="override DEPTH (max bounces)")
    p.add_argument("--res", type=int, nargs=2, default=None,
                   metavar=("W", "H"), help="override RES")
    p.add_argument("--out", default=None,
                   help="output path (default: reference naming convention)")
    p.add_argument("--hdr", action="store_true",
                   help="also write a Radiance .hdr")
    p.add_argument("--compaction", choices=["mask", "sort"], default="mask")
    p.add_argument("--engine",
                   choices=["pallas", "sorted", "planes", "xla"],
                   default="pallas",
                   help="pallas = VMEM megakernel (fastest; primitives "
                        "and meshes); sorted = per-bounce ray re-sort "
                        "between span kernels (lane-granular stream "
                        "compaction + coherence; wins on mesh scenes, "
                        "bit-identical output); planes = fused-plane "
                        "XLA engine (same trace, any backend, no VMEM "
                        "texture caps); xla = jnp wavefront (readable "
                        "reference; sort-compaction)")
    p.add_argument("--split-depth", type=int, default=0,
                   help="pallas engine: split the trace at this bounce "
                        "and re-densify live rays between the two "
                        "kernel spans (stream compaction, TPU-style; "
                        "bit-identical output).  0 = monolithic "
                        "kernel")
    p.add_argument("--nee", action="store_true",
                   help="next-event estimation / direct lighting")
    p.add_argument("--rr", action="store_true",
                   help="russian-roulette early termination from "
                        "bounce 3 (xla engine; unbiased)")
    p.add_argument("--chunk", type=int, default=8,
                   help="iterations fused per device dispatch")
    p.add_argument("--preview-every", type=int, default=0, metavar="K",
                   help="dump a preview PNG every K iterations")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint file for save/resume")
    p.add_argument("--checkpoint-every", type=int, default=0, metavar="K")
    p.add_argument("--resume", action="store_true",
                   help="resume from --checkpoint if it exists")
    p.add_argument("--shard", action="store_true",
                   help="shard samples across all local devices")
    p.add_argument("--stats", action="store_true",
                   help="emit per-chunk JSON stats lines")
    p.add_argument("--interactive", default=None, metavar="CTRL",
                   help="poll CTRL file for key events between chunks "
                        "(written by tools.watch --ctrl): arrows orbit, "
                        "wasd/rf translate, space saves, esc quits; any "
                        "camera key RESTARTS accumulation, the "
                        "reference's camchanged -> iteration=0 contract "
                        "(src/main.cpp:72-94,115-137)")
    p.add_argument("--interpret", action="store_true",
                   help="run the pallas engine in interpret mode (works "
                        "on any backend incl. CPU; slow — for demos and "
                        "debugging without a TPU)")
    p.add_argument("--seed", type=int, default=0,
                   help="iteration-stream offset (0 matches the reference)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import pathtrace_tpu as pt
    from pathtrace_tpu.io import image_io
    from pathtrace_tpu.utils import checkpoint as ckpt
    from pathtrace_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    scene = pt.load_scene(args.scene)
    if args.res:
        scene = dataclasses.replace(scene, resolution=tuple(args.res))
    if args.depth:
        scene = dataclasses.replace(scene, trace_depth=args.depth)
    n_iters = args.spp if args.spp is not None else scene.iterations
    width, height = scene.resolution

    print(
        f"[pathtrace_tpu] {args.scene}: {width}x{height}, "
        f"{n_iters} spp, depth {scene.trace_depth}, "
        f"compaction={args.compaction}",
        flush=True,
    )

    start_time = image_io.timestamp()
    accum = np.zeros((scene.pixel_count, 3), np.float32)
    done = 0
    if args.resume and args.checkpoint and os.path.exists(args.checkpoint):
        accum, done = ckpt.load(args.checkpoint, scene)
        print(f"[pathtrace_tpu] resumed at iteration {done}", flush=True)

    def make_render_fn(scene):
        compaction = args.compaction
        if args.engine in ("pallas", "sorted", "planes") \
                and compaction == "sort":
            # One behavior everywhere (round-3 advisor): the tiled
            # engines have no densify pass (every VMEM lane computes
            # every bounce under a live mask — the measured
            # architectural argument in BENCHMARKS.md "compaction on
            # TPU"), so warn and keep the fast engine with masking —
            # the same image, and the same choice make_sharded_renderer
            # makes.  Sort-compaction lives on `--engine xla` (the jnp
            # wavefront), the only engine where densification exists.
            print(
                "[pathtrace_tpu] WARNING: --compaction sort is a "
                f"wavefront-engine mode; the tiled {args.engine} "
                "engine masks dead lanes instead (same image, no "
                "densify pass) — rendering proceeds on "
                f"{args.engine} with masking.  Use --engine xla to "
                "run the sort-densify wavefront.",
                flush=True,
            )
            compaction = "mask"
        if args.shard:
            from pathtrace_tpu.parallel.shard import make_sharded_renderer

            import jax

            return make_sharded_renderer(
                scene, compaction, engine=args.engine,
                interpret=(
                    args.interpret
                    and jax.default_backend() not in ("tpu", "axon")
                ),
            )
        if args.engine == "planes" and compaction == "mask":
            from pathtrace_tpu.render.plane_engine import (
                pathtrace_batch_planes,
            )

            return lambda it0, step: pathtrace_batch_planes(
                scene, it0, step, nee=args.nee, rr=args.rr,
            )
        if args.engine in ("pallas", "sorted") and compaction == "mask":
            import jax

            on_tpu = jax.default_backend() in ("tpu", "axon")
            if on_tpu or args.interpret:
                from pathtrace_tpu.ops.pallas.megakernel import (
                    pathtrace_batch_pallas, pathtrace_batch_sorted,
                    pathtrace_batch_split,
                )

                if args.engine == "sorted":
                    return lambda it0, step: pathtrace_batch_sorted(
                        scene, it0, step, nee=args.nee, rr=args.rr,
                        interpret=not on_tpu,
                    )
                if args.split_depth > 0:
                    return lambda it0, step: pathtrace_batch_split(
                        scene, it0, step, split=args.split_depth,
                        nee=args.nee, rr=args.rr,
                        interpret=not on_tpu,
                    )
                return lambda it0, step: pathtrace_batch_pallas(
                    scene, it0, step, nee=args.nee, rr=args.rr,
                    interpret=not on_tpu,
                )
            print(
                "[pathtrace_tpu] pallas engine needs a TPU backend "
                "(or --interpret); falling back to the fused-plane "
                "XLA engine",
                flush=True,
            )
            from pathtrace_tpu.render.plane_engine import (
                pathtrace_batch_planes,
            )

            return lambda it0, step: pathtrace_batch_planes(
                scene, it0, step, nee=args.nee, rr=args.rr,
            )
        return None

    # Device-resident scene: without this, EVERY chunk call re-uploads
    # the scene's host numpy arrays (textures, mesh tables) through
    # the jit boundary — measured 3.6 s -> 1.2 s per 1-spp call on a
    # 2048² textured scene over the axon tunnel (BENCHMARKS.md
    # "single-call dispatch").  jax.device_put once; all subsequent
    # calls see resident jax.Arrays and skip the transfer.  Static
    # scene facts (shapes, feature flags) derive from metadata, so
    # engine selection below is unaffected.
    import jax as _jax

    scene = _jax.device_put(scene)

    render_fn = make_render_fn(scene)

    session = None
    if args.interactive:
        from pathtrace_tpu.render.interact import InteractiveSession

        session = InteractiveSession(args.interactive)

    def save_final(accum, samples):
        img = image_io.to_display(accum, width, height, samples)
        out = args.out or image_io.render_filename(
            scene.image_name, start_time, samples
        )
        image_io.save_png(out, img)
        print(f"[pathtrace_tpu] saved {out}", flush=True)
        if args.hdr:
            hdr_out = os.path.splitext(out)[0] + ".hdr"
            image_io.save_hdr(hdr_out, img)
            print(f"[pathtrace_tpu] saved {hdr_out}", flush=True)
        return out

    import jax
    import jax.numpy as jnp

    _add = jax.jit(jnp.add)
    rays_total = 0
    steady_rays = 0
    steady_time = 0.0
    first_chunk = True
    t_start = time.time()
    while done < n_iters:
        if session is not None:
            new_cam, changed, save_req, quit_req = session.poll(
                scene.camera
            )
            if changed:
                # the reference's contract (src/main.cpp:74,91-94):
                # camera change -> iteration 0 -> accumulation restarts
                scene = _jax.device_put(
                    dataclasses.replace(scene, camera=new_cam)
                )
                render_fn = make_render_fn(scene)
                accum = np.zeros((scene.pixel_count, 3), np.float32)
                done = 0
                rays_total = steady_rays = 0
                steady_time = 0.0
                first_chunk = True
                print(
                    "[pathtrace_tpu] camera changed -> accumulation "
                    "restarted",
                    flush=True,
                )
            if save_req and done:
                save_final(np.asarray(accum), done)
            if quit_req:
                break
        step = min(args.chunk, n_iters - done)
        t0 = time.time()
        if render_fn is not None:
            rad, counts = render_fn(args.seed + done + 1, step)
        else:
            rad, counts = pt.pathtrace_batch(
                scene, args.seed + done + 1, step,
                compaction=args.compaction, remat=False, nee=args.nee,
                rr=args.rr,
            )
        # Accumulate on device: transferring the full radiance buffer
        # to host every chunk costs more than the render itself on a
        # tunneled/PCIe link.  The (tiny) counts transfer below still
        # forces the step to complete, keeping dt honest.
        accum = _add(accum, rad)
        counts = np.asarray(counts)
        dt = time.time() - t0
        done += step
        segs = int(counts.sum())
        rays_total += segs
        if first_chunk:
            first_chunk = False  # compile-dominated; exclude from avg
        else:
            steady_rays += segs
            steady_time += dt
        if args.stats:
            print(
                json.dumps(
                    dict(
                        iter=done,
                        ms_per_iter=round(dt / step * 1e3, 2),
                        mrays_per_s=round(segs / dt / 1e6, 2),
                        live_per_bounce=counts.reshape(
                            -1, counts.shape[-1]
                        ).mean(axis=0).astype(int).tolist(),
                    )
                ),
                flush=True,
            )
        else:
            print(
                f"[pathtrace_tpu] iter {done}/{n_iters} "
                f"({dt / step * 1e3:.1f} ms/iter, "
                f"{segs / dt / 1e6:.1f} Mrays/s)",
                flush=True,
            )
        if args.preview_every and done % args.preview_every < step:
            img = image_io.to_display(
                np.asarray(accum), width, height, done
            )
            image_io.save_png(f"/tmp/{scene.image_name}.preview.png", img)
        if (
            args.checkpoint
            and args.checkpoint_every
            and done % args.checkpoint_every < step
        ):
            ckpt.save(args.checkpoint, np.asarray(accum), done, scene)

    wall = time.time() - t_start
    steady = (
        f", {steady_rays / steady_time / 1e6:.1f} Mrays/s steady-state"
        if steady_time > 0 else ""
    )
    print(
        f"[pathtrace_tpu] {done} iterations in {wall:.1f}s "
        f"({rays_total / max(wall, 1e-9) / 1e6:.1f} Mrays/s avg"
        f"{steady})",
        flush=True,
    )
    accum = np.asarray(accum)
    if args.checkpoint and done:
        ckpt.save(args.checkpoint, accum, done, scene)
    if done:
        save_final(accum, done)
    return 0


if __name__ == "__main__":
    sys.exit(main())
