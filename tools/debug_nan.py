"""Root-cause probe: which tex_fetch call sites receive NaN cotangents,
at which lanes / indices, in the planes-engine texel gradient."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import dataclasses as dc

import jax
import jax.experimental
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

import pathtrace_tpu as pt
from pathtrace_tpu.ops.pallas import megakernel as mk
from pathtrace_tpu.render import plane_engine as pe

FETCH_ID = [0]


def make_probed_fetch():
    def tex_fetch(tab, flat_idx):
        fid = FETCH_ID[0]
        FETCH_ID[0] += 1

        @jax.custom_vjp
        def probed(tab, flat_idx):
            return jnp.take_along_axis(tab, flat_idx, axis=0)

        def fwd(tab, flat_idx):
            return probed(tab, flat_idx), (tab.shape, flat_idx)

        def bwd(res, ct):
            tab_shape, flat_idx = res

            def report(idx, c):
                c = np.asarray(c)
                bad = ~np.isfinite(c)
                if bad.any():
                    rows, cols = np.nonzero(bad)
                    print(f"[fetch {fid}] nonfinite ct: {bad.sum()} lanes; "
                          f"rows={rows[:6]} cols={cols[:6]} "
                          f"idx={np.asarray(idx)[rows[:6], cols[:6]]} "
                          f"ct={c[rows[:6], cols[:6]]}", flush=True)
                return np.int32(0)

            jax.experimental.io_callback(
                report, jax.ShapeDtypeStruct((), jnp.int32),
                flat_idx, ct, ordered=False,
            )
            cols = jax.lax.broadcasted_iota(
                jnp.int32, flat_idx.shape, len(flat_idx.shape) - 1
            )
            ct_tab = jnp.zeros(tab_shape, ct.dtype).at[
                flat_idx, cols
            ].add(ct)
            return ct_tab, None

        probed.defvjp(fwd, bwd)
        return probed(tab, flat_idx)

    return tex_fetch


sc = pt.load_scene("scenes/cornell_tex.txt")
sc = dc.replace(sc, resolution=(24, 24), trace_depth=3)
ti = sc.texture_ids[5]


def swap(tex):
    texs = tuple(tex if i == ti else t for i, t in enumerate(sc.textures))
    return dc.replace(sc, textures=texs)


def loss_planes(tex):
    scene = swap(tex)
    tg, tu, bg = pe._tex_statics_planes(scene)
    cam, mats, gmat, tri, nodes = mk._pack_scene(scene, tg)
    lights, nee_lights = mk._pack_lights(scene)
    texs = mk._pack_textures(scene, tu)
    width, height = scene.resolution
    n_pixels = width * height
    row = jax.lax.broadcasted_iota(jnp.int32, (mk.SUB, mk.LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (mk.SUB, mk.LANES), 1)
    pixel = row * mk.LANES + lane  # one tile covers 24x24=576 pixels
    valid = pixel < n_pixels
    pix_u = mk._u32(pixel)
    fx = (pixel % width).astype(jnp.float32)
    fy = (pixel // width).astype(jnp.float32)
    trace_one = mk._make_tracer(
        cam, mats, gmat, tri, lights,
        geom_types=tuple(scene.geoms.type), width=width, height=height,
        depth=int(scene.trace_depth), n_tris=0,
        features=mk._scene_features(scene), nee_lights=nee_lights,
        pix_u=pix_u, fx=fx, fy=fy, valid=valid, nodes=None,
        bvh_meta=(), rr_mode=False, tex_geom=tg, btex_geom=bg,
        texr=texs[0], texg=texs[1], texb=texs[2],
        tex_fetch=make_probed_fetch(),
    )
    it_u = mk._u32(jnp.full((mk.SUB, mk.LANES), 1, jnp.int32))
    st, counts = trace_one(it_u, jnp.zeros((8, mk.LANES), jnp.int32))
    rad = jnp.stack(
        [st["rr"].reshape(-1), st["rg"].reshape(-1),
         st["rb"].reshape(-1)], axis=-1,
    )[:n_pixels]
    return jnp.mean(rad)


t0 = jnp.asarray(sc.textures[ti])
print("n fetch sites:", FETCH_ID[0])
g = jax.grad(loss_planes)(t0)
g = np.asarray(g)
print("grad nan count:", int(np.isnan(g).sum()),
      "at", np.argwhere(np.isnan(g))[:5])
