"""Wavefront path-tracing integrator — TPU-native core.

This is the component the reference leaves as the specified TODO in
``pathtrace()`` (``src/pathtrace.cu:135-162``): raygen → per-depth
{intersect, shade/scatter, terminate, compact} → accumulate.  Here the
whole iteration is one jitted function:

* the per-depth loop is ``lax.scan`` over bounce index, carrying a
  fixed-shape ray struct-of-arrays (origins, dirs, throughput, radiance,
  pixel ids, live mask) — XLA traces one bounce and reuses it;
* "stream compaction" under static shapes is a *mode*:
  ``mask`` keeps dead lanes predicated off (VPU lanes don't pay SIMT
  divergence), ``sort`` densifies live rays to the front each bounce via
  a stable argsort on the dead flag — the XLA-friendly recast of the
  GPU Gems 3 ch.39 scan-compact the reference requires (README.md:83-86),
  and the layout the Pallas tile-skip kernel exploits;
* RNG draws are pure functions of (iter, pixel, depth, draw)
  (:mod:`pathtrace_tpu.core.rng`), mirroring the seeding discipline of
  ``makeSeededRandomEngine`` (src/pathtrace.cu:41-45) — so results are
  independent of lane order, compaction mode, sharding, and chunking;
* per-bounce live-ray counts are returned as first-class metrics (the
  analysis the reference mandates at README.md:284-293).

Accumulation convention matches the reference: each iteration adds one
sample per pixel into a running float image; display/save divide by the
iteration count (src/pathtrace.cu:98-117, src/main.cpp:49-70).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import rng
from ..core import vecmath as vm
from ..core.constants import PI, TRANSMISSION_PUSH
from ..core.rng import Draw
from ..core.types import Scene, SPHERE, CUBE, MESH
from ..ops.bsdf import sample_bsdf
from ..ops.intersect import intersect_scene


def camera_basis(camera, width, height, xp=jnp):
    """(view, right, up, tan_fovx, tan_fovy).

    fovx is derived from fovy and the aspect ratio exactly as
    src/scene.cpp:133-136 (tan(fovx) = tan(fovy) * w / h).
    """
    view = vm.normalize(camera.view, xp=xp)
    right = vm.normalize(vm.cross(view, camera.up, xp=xp), xp=xp)
    up = vm.normalize(vm.cross(right, view, xp=xp), xp=xp)
    tan_y = xp.tan(camera.fovy_deg * (PI / 180.0))
    tan_x = tan_y * (width / height)
    return view, right, up, tan_x, tan_y


def raygen(camera, width, height, it, pixel_ids, xp=jnp):
    """Camera rays with per-pixel AA jitter and thin-lens depth-of-field.

    AA: the sample point is (x+u, y+v), u,v ~ U[0,1) over the pixel
    footprint (README.md:77-79).  DoF: jitter the origin on a disk of
    radius ``aperture`` and re-aim at the focal plane (README.md:100-101);
    aperture == 0 reduces exactly to the pinhole ray.
    """
    view, right, up, tan_x, tan_y = camera_basis(camera, width, height, xp=xp)
    x = (pixel_ids % width).astype("float32")
    y = (pixel_ids // width).astype("float32")
    u = rng.uniform(it, pixel_ids, 0, Draw.AA_X, xp=xp)
    v = rng.uniform(it, pixel_ids, 0, Draw.AA_Y, xp=xp)
    sx = 2.0 * (x + u) / width - 1.0
    sy = 2.0 * (y + v) / height - 1.0
    d = vm.normalize(
        view[None]
        - right[None] * (tan_x * sx)[:, None]
        - up[None] * (tan_y * sy)[:, None],
        xp=xp,
    )
    o = xp.broadcast_to(camera.position[None], d.shape)

    # thin-lens DoF (PBRT 6.2.3 style), identity when aperture == 0
    u1 = rng.uniform(it, pixel_ids, 0, Draw.DOF_U, xp=xp)
    u2 = rng.uniform(it, pixel_ids, 0, Draw.DOF_V, xp=xp)
    r_lens = camera.aperture * xp.sqrt(u1)
    theta = u2 * (2.0 * PI)
    offset = (
        right[None] * (r_lens * xp.cos(theta))[:, None]
        + up[None] * (r_lens * xp.sin(theta))[:, None]
    )
    cos_v = vm.dot(d, xp.broadcast_to(view[None], d.shape), xp=xp)
    ft = camera.focal_dist / xp.maximum(cos_v[..., 0], 1e-6)
    p_focus = o + d * ft[:, None]
    use_dof = camera.aperture > 0.0
    o_dof = o + offset
    d_dof = vm.normalize(p_focus - o_dof, xp=xp)
    o = xp.where(use_dof, o_dof, o)
    d = xp.where(use_dof, d_dof, d)
    return o, d


def geom_transforms(geoms, xp=jnp):
    """In-graph TRS → (forward, inverse, inverse-transpose) stacks,
    (G,4,4) each — the precompute of src/scene.cpp:82-85, kept inside the
    graph so geometry gradients flow."""
    fwd = vm.trs_matrix(geoms.translation, geoms.rotation, geoms.scale, xp=xp)
    inv = vm.trs_inverse(geoms.translation, geoms.rotation, geoms.scale, xp=xp)
    inv_t = xp.swapaxes(inv, -1, -2)
    return fwd, inv, inv_t


def _take_rows(table, idx, xp=jnp):
    """``table[idx]`` for a small (static-row-count) table.

    On TPU a per-ray gather serializes (~1 element/cycle); for the G/M
    tables here (a handful of rows) a where-fold over rows is pure VPU
    work and XLA fuses it into the consumer.  This single change takes
    the wavefront engine from ~1,140 ms/iter to the tens of ms on
    cornell 800x800 (BENCHMARKS.md): the gathers were the documented
    "XLA path is slow" sin, not the scan structure.  The transpose of a
    where-fold is a where-fold (no scatter in the backward pass).
    Falls back to fancy-indexing off-graph (numpy oracle) or for big
    tables.
    """
    table = xp.asarray(table)
    n = table.shape[0]
    if xp is not jnp or n > 64:
        return table[idx]
    m_shape = idx.shape + (1,) * (table.ndim - 1)
    out = xp.broadcast_to(
        table[0], idx.shape + table.shape[1:]
    ).astype(table.dtype)
    for r in range(1, n):
        m = (idx == r).reshape(m_shape)
        out = xp.where(m, table[r], out)
    return out


def _gather_material(materials, mid, xp=jnp):
    # xp.asarray: the table may be a closed-over numpy constant while
    # ``mid`` is traced (e.g. differentiating w.r.t. a param subset)
    g = lambda a: _take_rows(a, mid, xp=xp)
    out = dict(
        color=g(materials.color),
        spec_color=g(materials.spec_color),
        spec_exponent=g(materials.spec_exponent),
        has_reflective=g(materials.has_reflective),
        has_refractive=g(materials.has_refractive),
        ior=g(materials.ior),
        emittance=g(materials.emittance),
    )
    if materials.sss_sigma is not None:
        out["sss_sigma"] = g(materials.sss_sigma)
        out["sss_albedo"] = g(materials.sss_albedo)
    return out


def _bounce(scene: Scene, fwd, inv, inv_t, it, depth, state, xp=jnp,
            nee: bool = False, rr: bool = False):
    """One wavefront bounce: intersect → terminate/accumulate → scatter.

    ``state`` is the carried dict; works under jnp (scan body) and numpy
    (oracle loop) alike.  With ``nee=True``, each diffuse surface also
    samples every scene light directly (next-event estimation,
    README.md:107-108) and BSDF-sampled emission is cancelled on the
    following bounce for diffuse-sampled rays (no double counting).
    """
    o, d = state["origins"], state["dirs"]
    vel = scene.geoms.velocity
    want_uv = any(t >= 0 for t in scene.texture_ids) or any(
        t >= 0 for t in scene.bump_texture_ids
    )
    tri_tang = None
    if scene.mesh.count and any(t >= 0 for t in scene.bump_texture_ids):
        # mesh bump mapping (README.md:104 on the mesh extra): carry
        # each winner triangle's UV-chart gradients through the fold
        # so _bumptex_normal can chain dh/du, dh/dv on meshes too
        from ..ops.intersect import triangle_uv_gradients

        uv_t = scene.mesh.tri_uv
        if uv_t is None:
            uv_t = xp.broadcast_to(
                xp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
                           dtype=xp.float32)[None],
                (scene.mesh.count, 3, 2),
            )
        g_u, g_v = triangle_uv_gradients(
            scene.mesh.tri_verts, uv_t, xp=xp
        )
        tri_tang = xp.concatenate([g_u, g_v], axis=-1)
    isect = intersect_scene(
        o, d, scene.geoms.type, fwd, inv, inv_t,
        tri_verts=scene.mesh.tri_verts if scene.mesh.count else None,
        tri_geom=scene.mesh.tri_geom if scene.mesh.count else None,
        velocity=vel, time=state.get("time"),
        tri_uv=scene.mesh.tri_uv if scene.mesh.count else None,
        want_uv=want_uv, tri_tang=tri_tang, xp=xp,
    )
    mid = _take_rows(scene.geoms.material_id, isect["geom_idx"], xp=xp)
    mat = _gather_material(scene.materials, mid, xp=xp)
    if any(t >= 0 for t in scene.texture_ids):
        mat["color"] = _texture_albedo(
            scene, isect["uv"], mid, mat["color"], xp=xp
        )
    needs_obj_point = (
        scene.materials.checker_scale is not None
        or scene.materials.bump_strength is not None
        or any(t >= 0 for t in scene.bump_texture_ids)
    )
    if needs_obj_point:
        q = _object_point(
            inv, isect, vel, state.get("time"), xp=xp
        )
    if scene.materials.checker_scale is not None:
        mat["color"] = _checker_albedo(
            scene, q, mid, mat["color"], xp=xp
        )
    if scene.materials.bump_strength is not None:
        isect["normal"] = _bump_normal(
            scene, inv_t, q, isect, mid, xp=xp
        )
    if any(t >= 0 for t in scene.bump_texture_ids):
        isect["normal"] = _bumptex_normal(
            scene, inv_t, q, isect, mid, xp=xp
        )

    live = state["live"]
    hit = isect["hit"]
    emissive = mat["emittance"] > 0.0

    # terminate on emissive hit: add throughput * emission to the pixel
    # (spec src/pathtrace.cu:142-151); misses add nothing (black).
    # Under NEE, only rays whose previous bounce was non-diffuse (or the
    # camera) may collect BSDF-sampled emission.
    add = state["throughput"] * mat["color"] * mat["emittance"][:, None]
    lit = live & hit & emissive
    if nee:
        lit = lit & state["emit_ok"]
    radiance = state["radiance"] + xp.where(lit[:, None], add, 0.0)

    # scatter continuing rays (scatterRay spec, src/interactions.h:44-80)
    pix = state["pixel"]
    dep = depth + 1  # depth slot 0 is raygen
    u = dict(
        lobe=rng.uniform(it, pix, dep, Draw.LOBE, xp=xp),
        diff_u1=rng.uniform(it, pix, dep, Draw.DIFF_U1, xp=xp),
        diff_u2=rng.uniform(it, pix, dep, Draw.DIFF_U2, xp=xp),
        fresnel=rng.uniform(it, pix, dep, Draw.FRESNEL, xp=xp),
        spec_u1=rng.uniform(it, pix, dep, Draw.SPEC_U1, xp=xp),
        spec_u2=rng.uniform(it, pix, dep, Draw.SPEC_U2, xp=xp),
    )
    new_dir, thr_mult, took_diffuse, took_refract = sample_bsdf(
        d, isect["normal"], isect["outside"], mat, u, xp=xp
    )
    cont = live & hit & ~emissive

    sss = scene.materials.sss_sigma is not None
    if sss:
        # subsurface scattering: rays inside an SSS medium random-walk
        # (exponential free paths, isotropic phase, albedo attenuation)
        # until a sampled step reaches the exit surface, where the
        # regular Fresnel interface takes over (README.md:112 extra)
        in_med = state["med_sigma"] > 0.0
        u_step = rng.uniform(it, pix, dep, Draw.SSS_STEP, xp=xp)
        step = -xp.log(xp.maximum(1.0 - u_step, 1e-7)) / xp.maximum(
            state["med_sigma"], 1e-8
        )
        scatter_inside = in_med & live & hit & (step < isect["dist"])

    if nee:
        radiance = radiance + _nee_direct(
            scene, fwd, inv, inv_t, it, pix, dep, isect, mat,
            state["throughput"],
            cont & ~scatter_inside if sss else cont,
            time=state.get("time"), xp=xp,
        )

    new_thr = state["throughput"] * thr_mult
    # Transmission fix: the reference's getPointOnRay backs the hit
    # point 1e-4 BEFORE the surface (src/intersections.h:26-28), which
    # is correct for reflected/diffuse continuations but traps
    # *refracted* rays — they re-intersect the same interface at ~0
    # distance and re-refract in place forever.  Push transmitted rays
    # past the interface along their new direction by a scale-aware
    # epsilon (5e-4 x the geom's max |scale| covers the object-space
    # backoff with margin while staying below thin-wall thickness).
    push = (
        TRANSMISSION_PUSH
        * xp.max(xp.abs(xp.asarray(scene.geoms.scale)), axis=-1)[
            isect["geom_idx"]
        ]
    )
    next_origin = xp.where(
        took_refract[:, None],
        isect["point"] + push[:, None] * new_dir,
        isect["point"],
    )
    next_dir = new_dir
    if sss:
        zi = 1.0 - 2.0 * rng.uniform(it, pix, dep, Draw.SSS_U, xp=xp)
        ri = xp.sqrt(xp.maximum(1.0 - zi * zi, 0.0))
        phi = rng.uniform(it, pix, dep, Draw.SSS_V, xp=xp) * (2.0 * PI)
        d_iso = xp.stack(
            [ri * xp.cos(phi), ri * xp.sin(phi), zi], axis=-1
        )
        si3 = scatter_inside[:, None]
        next_origin = xp.where(si3, o + step[:, None] * d, next_origin)
        next_dir = xp.where(si3, d_iso, next_dir)
        new_thr = xp.where(
            si3, state["throughput"] * state["med_albedo"], new_thr
        )
    if rr:
        # Russian roulette from bounce 3 on: kill with prob 1-p where
        # p tracks the surviving throughput, boost survivors by 1/p —
        # unbiased early termination (optional; the reference's spec
        # terminates only on light/miss/depth)
        p_srv = xp.clip(
            xp.max(new_thr, axis=-1), 0.05, 1.0
        )
        apply_rr = depth >= 3
        u_rr = rng.uniform(it, pix, dep, Draw.RR, xp=xp)
        survive = ~apply_rr | (u_rr < p_srv)
        cont = cont & survive
        boost = xp.where(apply_rr & survive, 1.0 / p_srv, 1.0)
        new_thr = new_thr * boost[:, None]

    c3 = cont[:, None]
    out = dict(
        origins=xp.where(c3, next_origin, o),
        dirs=xp.where(c3, next_dir, d),
        throughput=xp.where(c3, new_thr, state["throughput"]),
        radiance=radiance,
        pixel=pix,
        live=cont,
    )
    if sss:
        at_surface = cont & ~scatter_inside
        entering = (
            at_surface & took_refract & (mat["sss_sigma"] > 0.0)
            & isect["outside"]
        )
        exiting = at_surface & took_refract & in_med & ~isect["outside"]
        out["med_sigma"] = xp.where(
            entering, mat["sss_sigma"],
            xp.where(exiting, 0.0, state["med_sigma"]),
        )
        out["med_albedo"] = xp.where(
            entering[:, None], mat["sss_albedo"],
            xp.where(exiting[:, None], 1.0, state["med_albedo"]),
        )
    if "time" in state:
        out["time"] = state["time"]  # shutter time rides with the ray
    if nee:
        emit_ok = ~took_diffuse
        if sss:
            # interior scattering events sample no NEE, so the next
            # BSDF-found emission must count
            emit_ok = emit_ok | scatter_inside
        out["emit_ok"] = emit_ok
    return out


def _object_point(inv, isect, vel, time, xp=jnp):
    """Hit point in the hit geom's object space (motion-compensated) —
    the shared basis for procedural texturing and bump mapping."""
    gi = isect["geom_idx"]
    inv_g = _take_rows(inv, gi, xp=xp)             # (N,4,4)
    pw = isect["point"]
    if vel is not None and time is not None:
        pw = pw - time[:, None] * _take_rows(vel, gi, xp=xp)
    return vm.mat3_vec(inv_g[:, :3, :3], pw, xp=xp) + inv_g[:, :3, 3]


def _bump_normal(scene, inv_t, q, isect, mid, xp=jnp):
    """Procedural bump mapping (BUMP material extension, the
    README.md:104 extra): perturb the shading normal by the analytic
    gradient of a sinusoidal height field in object space,
    n' = normalize(n - k * tangential(grad h))."""
    bs = _take_rows(scene.materials.bump_scale, mid, xp=xp)
    bk = _take_rows(scene.materials.bump_strength, mid, xp=xp)
    w = bs * (2.0 * PI)
    # h(q) = prod sin(w q_i + 0.5); the 0.5 phase keeps the field
    # non-degenerate on cube faces (object coords exactly +-0.5)
    ph = xp.float32(0.5)
    sx, cx = xp.sin(w * q[:, 0] + ph), xp.cos(w * q[:, 0] + ph)
    sy, cy = xp.sin(w * q[:, 1] + ph), xp.cos(w * q[:, 1] + ph)
    sz, cz = xp.sin(w * q[:, 2] + ph), xp.cos(w * q[:, 2] + ph)
    g_obj = xp.stack(
        [w * cx * sy * sz, w * sx * cy * sz, w * sx * sy * cz], axis=-1
    )
    # gradients transform like normals (inverse-transpose)
    gi = isect["geom_idx"]
    it_g = _take_rows(inv_t, gi, xp=xp)
    g_w = vm.mat3_vec(it_g[:, :3, :3], g_obj, xp=xp)
    n = isect["normal"]
    g_t = g_w - vm.dot(g_w, n, xp=xp) * n          # tangential part
    n2 = vm.normalize(n - bk[:, None] * g_t, xp=xp, eps=1e-20)
    return xp.where((bk > 0)[:, None], n2, n)


def _checker_albedo(scene, q, mid, color, xp=jnp):
    """Procedural object-space checker (CHECKER material extension, the
    texture-mapping extra README.md:103): alternate the albedo on a 3D
    checkerboard in the hit geom's object space — it sticks to the
    object under instancing and motion."""
    cs = _take_rows(scene.materials.checker_scale, mid, xp=xp)
    # lattice phase offset (1/64, exactly representable): cube faces sit
    # at object coords of exactly +-0.5, which otherwise lands cell
    # boundaries exactly on surfaces and makes parity rounding-dependent
    ph = xp.float32(0.015625)
    cells = (
        xp.floor(q[:, 0] * cs - ph) + xp.floor(q[:, 1] * cs - ph)
        + xp.floor(q[:, 2] * cs - ph)
    )
    odd = xp.mod(cells, 2.0) >= 1.0
    use2 = (cs > 0) & odd
    c2 = _take_rows(scene.materials.checker_color, mid, xp=xp)
    return xp.where(use2[:, None], c2, color)


def _texture_albedo(scene, uv, mid, color, xp=jnp):
    """Image texture mapping (TEXTURE extension; PBRT 10.4, the
    README.md:103 extra): multiply the material RGB by the bilinear
    texture sample at the hit UV.  Which texture a material samples is
    static scene structure (Scene.texture_ids), so the loop unrolls
    over the texture table and masks by material."""
    from ..scene.textures import sample_texture

    out = color
    for t in sorted({t for t in scene.texture_ids if t >= 0}):
        users = [m for m, tt in enumerate(scene.texture_ids) if tt == t]
        use = xp.zeros(mid.shape, dtype=bool)
        for m in users:
            use = use | (mid == m)
        smp = sample_texture(scene.textures[t], uv[:, 0], uv[:, 1],
                             xp=xp)
        out = xp.where(use[:, None], out * smp, out)
    return out


def _bumptex_normal(scene, inv_t, q, isect, mid, xp=jnp):
    """Image bump mapping (BUMPTEX extension; PBRT 9.3, the
    README.md:104 extra): perturb the shading normal by the world-space
    gradient of the height texture h(u,v) (luminance), chained through
    the object-space gradients of the UV parameterization —
    sphere:  grad u = (-z, 0, x) / (2pi (x^2+z^2)),
             grad v = (0, 2/sqrt(1-4y^2), 0) / pi;
    cube face (dominant-normal axis): grad u / grad v are the unit
    object axes the face maps from (ops/intersect._one_box);
    mesh triangle: the winner's per-face affine chart gradients
    (ops/intersect.triangle_uv_gradients), carried through the
    nearest-hit fold as ``isect['tang']``.
    dh/du, dh/dv come from one-texel central differences of the
    bilinear sampler.
    """
    from ..scene.textures import sample_texture

    uv = isect["uv"]
    bt = [int(t) for t in scene.bump_texture_ids]
    k_arr = _take_rows(scene.materials.bumptex_strength, mid, xp=xp)

    # dh/du, dh/dv per ray (masked over the static material->tex map)
    hu = xp.zeros(mid.shape, dtype=q.dtype)
    hv = xp.zeros(mid.shape, dtype=q.dtype)
    for t in sorted({t for t in bt if t >= 0}):
        tex = scene.textures[t]
        th, tw = tex.shape[0], tex.shape[1]
        eu, ev = 1.0 / tw, 1.0 / th

        def lum(du, dv, tex=tex):
            s = sample_texture(tex, uv[:, 0] + du, uv[:, 1] + dv, xp=xp)
            return (s[:, 0] + s[:, 1] + s[:, 2]) * (1.0 / 3.0)

        hu_t = (lum(eu, 0.0) - lum(-eu, 0.0)) / (2.0 * eu)
        hv_t = (lum(0.0, ev) - lum(0.0, -ev)) / (2.0 * ev)
        use = xp.zeros(mid.shape, dtype=bool)
        for m, tt in enumerate(bt):
            if tt == t:
                use = use | (mid == m)
        hu = xp.where(use, hu_t, hu)
        hv = xp.where(use, hv_t, hv)

    # object-space gradient of h via the per-geom-type UV charts
    gi = isect["geom_idx"]
    qx, qy, qz = q[:, 0], q[:, 1], q[:, 2]
    g_obj = xp.zeros_like(q)
    for g, gtype in enumerate(scene.geoms.type):
        if gtype == SPHERE:
            r2 = xp.maximum(qx * qx + qz * qz, 1e-12)
            gu = xp.stack(
                [-qz / (2.0 * PI * r2),
                 xp.zeros_like(qx),
                 qx / (2.0 * PI * r2)], axis=-1,
            )
            den = xp.sqrt(xp.maximum(1.0 - 4.0 * qy * qy, 1e-12))
            gv = xp.stack(
                [xp.zeros_like(qx), 2.0 / (PI * den),
                 xp.zeros_like(qx)], axis=-1,
            )
        elif gtype == CUBE:
            ax = xp.argmax(xp.abs(q), axis=-1)  # dominant face axis
            ex = xp.eye(3, dtype=q.dtype)
            gu = xp.where((ax == 0)[:, None], ex[2], ex[0])
            gv = xp.where((ax == 1)[:, None], ex[2], ex[1])
        elif "tang" in isect:
            # MESH: per-winner-triangle chart gradients from the fold
            gu = isect["tang"][:, :3]
            gv = isect["tang"][:, 3:]
        else:
            continue  # mesh winners without tang data: bump inert
        g_g = hu[:, None] * gu + hv[:, None] * gv
        g_obj = xp.where((gi == g)[:, None], g_g, g_obj)

    it_g = _take_rows(inv_t, gi, xp=xp)
    g_w = vm.mat3_vec(it_g[:, :3, :3], g_obj, xp=xp)
    n = isect["normal"]
    g_t = g_w - vm.dot(g_w, n, xp=xp) * n
    n2 = vm.normalize(n - k_arr[:, None] * g_t, xp=xp, eps=1e-20)
    return xp.where((k_arr > 0)[:, None], n2, n)


def _nee_direct(scene, fwd, inv, inv_t, it, pix, dep, isect, mat,
                throughput, eligible, time=None, xp=jnp):
    """Direct-light (NEE) radiance for the diffuse component at each
    live non-emissive hit.  Loops over the static light set, one area
    sample + one shadow ray per light (pathtrace_tpu.ops.lights)."""
    from ..ops import lights as L

    total = xp.zeros_like(throughput)
    # the diffuse lobe exists on non-glass materials only; its BRDF is
    # albedo/pi regardless of the specular sampling probability (lobes
    # are summed, src/interactions.h:51-62)
    has_diffuse = eligible & ~(mat["has_refractive"] > 0.0)
    for k, li in enumerate(scene.light_indices):
        base = Draw.NEE_BASE + 3 * k
        u_sel = rng.uniform(it, pix, dep, base + 0, xp=xp)
        u1 = rng.uniform(it, pix, dep, base + 1, xp=xp)
        u2 = rng.uniform(it, pix, dep, base + 2, xp=xp)
        if scene.geoms.type[li] == SPHERE:
            lp, ln, area = L.sample_sphere_light(
                fwd[li], inv_t[li], u1, u2, xp=xp
            )
        else:
            lp, ln, area = L.sample_cube_light(
                fwd[li], u_sel, u1, u2, xp=xp
            )
        if scene.geoms.velocity is not None and time is not None:
            # moving light: shift the sampled point to the ray's time
            lp = lp + time[:, None] * scene.geoms.velocity[li][None]
        l_mid = xp.asarray(scene.geoms.material_id)[li]  # may be traced
        emission = (
            xp.asarray(scene.materials.color)[l_mid]
            * xp.asarray(scene.materials.emittance)[l_mid]
        )[None]

        # shadow ray from the (already backed-off) hit point
        wl = lp - isect["point"]
        dist_l = xp.sqrt(xp.maximum(xp.sum(wl * wl, axis=-1), 1e-12))
        sdir = wl / dist_l[:, None]
        shadow = intersect_scene(
            isect["point"], sdir, scene.geoms.type, fwd, inv, inv_t,
            tri_verts=scene.mesh.tri_verts if scene.mesh.count else None,
            tri_geom=scene.mesh.tri_geom if scene.mesh.count else None,
            velocity=scene.geoms.velocity, time=time,
            xp=xp,
        )
        # visible iff the nearest hit is this (convex) light at ~the
        # sampled distance
        tol = xp.maximum(1e-3, 5e-3 * dist_l)
        visible = (
            shadow["hit"]
            & (shadow["geom_idx"] == li)
            & (xp.abs(shadow["dist"] - dist_l) < tol)
        )
        contrib = L.nee_contribution(
            isect["point"], isect["normal"], mat["color"], throughput,
            lp, ln, area, emission, ~visible, xp=xp,
        )
        total = total + xp.where(has_diffuse[:, None], contrib, 0.0)
    return total


def _densify(state, xp=jnp):
    """Stable-partition live rays to the front (compaction='sort').

    Uses the work-efficient scan primitive (ops/scan.py: MXU
    triangular-matmul prefix sum + gather apply — the TPU recast of
    GPU Gems 3 ch.39 flag-scan-scatter).  The permutation is
    bit-identical to a stable argsort on the dead flag
    (tests/test_scan.py::test_matches_argsort_order), and RNG keyed on
    pixel id makes it semantically invisible.  The numpy oracle keeps
    the argsort formulation (off-graph).
    """
    if xp is not jnp:
        dead = (~state["live"]).astype(xp.int32)
        perm = xp.argsort(dead, kind="stable")
        return {k: v[perm] for k, v in state.items()}
    from ..ops.scan import compact

    dense, _ = compact(
        state["live"], state,
        interpret=jax.default_backend() == "cpu",
    )
    return dense


def trace_pixels(scene: Scene, it, pixel_ids, compaction: str = "mask",
                 remat: bool = True, nee: bool = False, rr: bool = False):
    """Trace one 1-spp sample for an arbitrary set of pixel ids.

    The building block for sharding: because every random draw is keyed
    on the *global* pixel id, tracing a subset of pixels on one device
    of a mesh produces exactly the rows the full-image trace would.
    Not jitted itself — called inside :func:`pathtrace_iteration` and
    inside `shard_map` bodies (pathtrace_tpu.parallel).
    """
    width, height = scene.resolution
    n = pixel_ids.shape[0]
    fwd, inv, inv_t = geom_transforms(scene.geoms)
    it = jnp.asarray(it, dtype=jnp.int32)
    origins, dirs = raygen(scene.camera, width, height, it, pixel_ids)

    state = dict(
        origins=origins,
        dirs=dirs,
        throughput=jnp.ones((n, 3), dtype=jnp.float32),
        radiance=jnp.zeros((n, 3), dtype=jnp.float32),
        pixel=pixel_ids,
        live=jnp.ones((n,), dtype=bool),
    )
    if scene.geoms.velocity is not None:
        # motion blur: one shutter-time per camera sample
        state["time"] = rng.uniform(it, pixel_ids, 0, Draw.TIME)
    if scene.materials.sss_sigma is not None:
        state["med_sigma"] = jnp.zeros((n,), dtype=jnp.float32)
        state["med_albedo"] = jnp.ones((n, 3), dtype=jnp.float32)
    if nee:
        state["emit_ok"] = jnp.ones((n,), dtype=bool)

    def body(carry, depth):
        live_in = jnp.sum(carry["live"].astype(jnp.int32))
        nxt = _bounce(scene, fwd, inv, inv_t, it, depth, carry, nee=nee,
                      rr=rr)
        if compaction == "sort":
            nxt = _densify(nxt)
        return nxt, live_in

    if remat:
        body = jax.checkpoint(body)
    state, live_counts = jax.lax.scan(
        body, state, jnp.arange(scene.trace_depth, dtype=jnp.int32)
    )
    # paths still alive after max depth contribute black
    # (spec src/pathtrace.cu:157-158) — already true: radiance untouched.

    # un-permute radiance back to input row order (no-op for 'mask')
    radiance = state["radiance"]
    if compaction == "sort":
        row_of_pixel = jnp.argsort(state["pixel"], stable=True)
        # rows were a permutation of the input pixel_ids; restore by
        # inverting the carried permutation
        order = jnp.argsort(
            jnp.argsort(pixel_ids, stable=True), stable=True
        )
        radiance = radiance[row_of_pixel][order]
    return radiance, live_counts


@functools.partial(
    jax.jit, static_argnames=("compaction", "remat", "nee", "rr")
)
def pathtrace_iteration(scene: Scene, it, compaction: str = "mask",
                        remat: bool = True, nee: bool = False,
                        rr: bool = False):
    """One progressive-refinement iteration (1 sample/pixel), jitted.

    Args:
      scene: the :class:`Scene` pytree (differentiable leaves inside).
      it: iteration number, 1-based like the reference's ``++iteration``
        (src/main.cpp:103).
      compaction: 'mask' | 'sort' (see module docstring).
      remat: rematerialize each bounce in the backward pass
        (``jax.checkpoint``) instead of storing all per-bounce wavefront
        intermediates — the memory strategy for differentiating depth-D
        loops over megapixel wavefronts.

    Returns:
      radiance: (P, 3) this iteration's per-pixel radiance sample
        (add it to the accumulation buffer).
      live_counts: (depth,) int32 — live rays entering each bounce, the
        reference's mandated per-bounce instrumentation (README.md:284-293).
    """
    pixel_ids = jnp.arange(scene.pixel_count, dtype=jnp.int32)
    return trace_pixels(scene, it, pixel_ids, compaction, remat, nee, rr)


@functools.partial(
    jax.jit, static_argnames=("n_iters", "compaction", "remat", "nee",
                              "rr")
)
def pathtrace_batch(scene: Scene, it0, n_iters: int,
                    compaction: str = "mask", remat: bool = True,
                    nee: bool = False, rr: bool = False):
    """Sum of ``n_iters`` consecutive iterations starting at ``it0``.

    vmapped over the iteration index — the sample axis is the TPU's
    batch axis, and (with sharding) the axis the device mesh splits.
    Returns (accumulated radiance (P,3), live_counts (n_iters, depth)).
    """
    its = jnp.asarray(it0, dtype=jnp.int32) + jnp.arange(
        n_iters, dtype=jnp.int32
    )
    rad, counts = jax.vmap(
        lambda i: pathtrace_iteration(scene, i, compaction, remat, nee, rr)
    )(its)
    return jnp.sum(rad, axis=0), counts


def render(scene: Scene, n_iters: int | None = None, chunk: int = 8,
           compaction: str = "mask", callback=None, nee: bool = False):
    """Run-to-completion progressive render (the role of the reference's
    runCuda loop, src/main.cpp:72-112), chunking iterations for TPU
    efficiency.

    Returns the *accumulated* image (P, 3); divide by ``n_iters`` for
    display (src/pathtrace.cu:58-60).
    """
    n_iters = n_iters if n_iters is not None else scene.iterations
    # device-resident scene across chunks: avoids re-uploading the
    # scene's host arrays every call (BENCHMARKS.md "single-call
    # dispatch"; no-op if the caller already device_put the scene)
    scene = jax.device_put(scene)
    accum = jnp.zeros((scene.pixel_count, 3), dtype=jnp.float32)
    done = 0
    while done < n_iters:
        step = min(chunk, n_iters - done)
        rad, counts = pathtrace_batch(
            scene, done + 1, step, compaction=compaction, remat=False,
            nee=nee,
        )
        accum = accum + rad
        done += step
        if callback is not None:
            callback(done, accum, counts)
    return accum
