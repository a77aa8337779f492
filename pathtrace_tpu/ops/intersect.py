"""Batched ray–primitive intersection (the role of ``src/intersections.h``).

Semantics replicate the reference *exactly* so fixed-RNG images match:

* unit primitives + instance transforms: cube is [-0.5,0.5]^3, sphere has
  radius 0.5 (``src/intersections.h:39-41,94``);
* object-space ray direction is re-normalized after the inverse
  transform (``:51,106``), so object-space t values are object-space
  distances;
* the hit point backs off the surface by 1e-4 *in object space* along
  the normalized object ray (``getPointOnRay``, ``:26-28,84,134``);
* the returned metric is the **world-space distance** from the ray
  origin to the (backed-off) world hit point, not a ray parameter
  (``:86,142``) — this is what nearest-hit selection compares;
* inside hits flip the reported normal toward the incoming ray
  (sphere ``:138-140``; the box's tmax-face normal already faces the
  interior ``:77-83``), and ``outside=False`` is reported;
* quirk preserved: the box transforms its normal by the *forward*
  transform (``:85``) while the sphere uses the inverse-transpose
  (``:137``);
* division by zero-direction components relies on IEEE inf (``:59``).

Everything is elementwise over an (N, G) ray×geom broadcast — pure VPU
work under XLA; the Pallas megakernel in ``ops/pallas`` tiles the same
math through VMEM.  All functions take ``xp`` (jnp or numpy) so the CPU
oracle and interpret-mode tests share one semantic.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.constants import NO_HIT, PI, RAY_OFFSET
from ..core import vecmath as vm
from ..core import types as T


def _rows_apply(m3, v, xp=jnp):
    """m3 (G,3,3) applied to v (N,3) -> (N,G,3), explicit f32 mul-adds.

    Deliberately NOT einsum: XLA lowers dot-general at default (bf16)
    precision, which is ruinous for thin-walled instance transforms
    (a 0.01-scaled cornell wall amplifies object-space error 100x).
    K=3 contractions gain nothing from the MXU; the VPU does these at
    full f32, bit-comparable with the NumPy oracle.
    """
    vx, vy, vz = v[:, None, 0], v[:, None, 1], v[:, None, 2]
    return xp.stack(
        [
            m3[None, :, i, 0] * vx + m3[None, :, i, 1] * vy
            + m3[None, :, i, 2] * vz
            for i in range(3)
        ],
        axis=-1,
    )


def _pair_apply(m3, v, xp=jnp):
    """m3 (G,3,3) applied to v (N,G,3) -> (N,G,3), explicit f32 mul-adds."""
    return xp.stack(
        [
            m3[None, :, i, 0] * v[..., 0] + m3[None, :, i, 1] * v[..., 1]
            + m3[None, :, i, 2] * v[..., 2]
            for i in range(3)
        ],
        axis=-1,
    )


def _transform_rays(inv, origins, dirs, xp=jnp):
    """Rays → object space of each geom. origins/dirs (N,3), inv (G,4,4).
    Returns (N,G,3) object origins and *normalized* object directions."""
    ro = _rows_apply(inv[:, :3, :3], origins, xp=xp) + inv[:, :3, 3][None]
    rd = vm.normalize(_rows_apply(inv[:, :3, :3], dirs, xp=xp), xp=xp)
    return ro, rd


def intersect_boxes(origins, dirs, fwd, inv, xp=jnp):
    """Slab test vs unit cubes. Returns (dist, point, normal, outside),
    shapes (N,G), (N,G,3), (N,G,3), (N,G). dist==NO_HIT on miss."""
    ro, rd = _transform_rays(inv, origins, dirs, xp=xp)  # (N,G,3)

    t1 = (-0.5 - ro) / rd
    t2 = (0.5 - ro) / rd
    ta = xp.minimum(t1, t2)
    tb = xp.maximum(t1, t2)
    axis_sign = xp.where(t2 < t1, 1.0, -1.0)  # per-axis candidate normal sign

    # tmin = max over axes of ta where ta > 0 (src/intersections.h:66-69)
    ta_m = xp.where(ta > 0, ta, -1e38)
    tmin = xp.max(ta_m, axis=-1)
    near_axis = xp.argmax(ta_m, axis=-1)
    # tmax = min over axes of tb (src/intersections.h:70-73)
    tmax = xp.min(tb, axis=-1)
    far_axis = xp.argmin(tb, axis=-1)

    eye = xp.eye(3, dtype=ro.dtype)
    near_n = eye[near_axis] * xp.take_along_axis(
        axis_sign, near_axis[..., None], axis=-1
    )
    far_n = eye[far_axis] * xp.take_along_axis(
        axis_sign, far_axis[..., None], axis=-1
    )

    hit = (tmax >= tmin) & (tmax > 0)
    inside = tmin <= 0
    t_use = xp.where(inside, tmax, tmin)
    n_obj = xp.where(inside[..., None], far_n, near_n)
    outside = hit & ~inside

    p_obj = ro + (t_use[..., None] - RAY_OFFSET) * rd
    point = _pair_apply(fwd[:, :3, :3], p_obj, xp=xp) + fwd[:, :3, 3][None]
    # Quirk preserved: normal via the *forward* transform (src/intersections.h:85)
    normal = vm.normalize(_pair_apply(fwd[:, :3, :3], n_obj, xp=xp), xp=xp)
    dist = vm.norm(origins[:, None, :] - point, xp=xp)[..., 0]
    dist = xp.where(hit, dist, NO_HIT)
    return dist, point, normal, outside


def intersect_spheres(origins, dirs, fwd, inv, inv_t, xp=jnp):
    """Quadratic test vs unit spheres (radius 0.5). Same returns as boxes."""
    ro, rd = _transform_rays(inv, origins, dirs, xp=xp)

    v_dot_d = xp.sum(ro * rd, axis=-1)
    radicand = v_dot_d * v_dot_d - (xp.sum(ro * ro, axis=-1) - 0.25)
    has_root = radicand >= 0
    sq = xp.sqrt(xp.where(has_root, radicand, 1.0))
    t1 = -v_dot_d + sq
    t2 = -v_dot_d - sq

    both_neg = (t1 < 0) & (t2 < 0)
    both_pos = (t1 > 0) & (t2 > 0)
    t_use = xp.where(both_pos, xp.minimum(t1, t2), xp.maximum(t1, t2))
    outside_raw = both_pos
    hit = has_root & ~both_neg

    p_obj = ro + (t_use[..., None] - RAY_OFFSET) * rd
    point = _pair_apply(fwd[:, :3, :3], p_obj, xp=xp) + fwd[:, :3, 3][None]
    normal = vm.normalize(
        _pair_apply(inv_t[:, :3, :3], p_obj, xp=xp), xp=xp, eps=1e-20
    )
    normal = xp.where(outside_raw[..., None], normal, -normal)
    dist = vm.norm(origins[:, None, :] - point, xp=xp)[..., 0]
    dist = xp.where(hit, dist, NO_HIT)
    return dist, point, normal, hit & outside_raw


def intersect_triangles(origins, dirs, tri_verts, tri_geom, fwd, inv, inv_t,
                        xp=jnp):
    """Möller–Trumbore vs object-space triangles instanced by ``tri_geom``.

    origins/dirs (N,3); tri_verts (T,3,3); tri_geom (T,) indexes the geom
    transform stacks.  Returns (dist, point, normal, outside) with shapes
    (N,T), (N,T,3), (N,T,3), (N,T).  Follows the same object-space
    normalize + back-off + world-distance conventions as the primitive
    tests so nearest-hit selection is consistent.
    """
    inv_g = inv[tri_geom]      # (T,4,4)
    fwd_g = fwd[tri_geom]
    inv_t_g = inv_t[tri_geom]

    ro = _rows_apply(inv_g[:, :3, :3], origins, xp=xp) + inv_g[:, :3, 3][None]
    rd = vm.normalize(_rows_apply(inv_g[:, :3, :3], dirs, xp=xp), xp=xp)

    v0, v1, v2 = tri_verts[:, 0], tri_verts[:, 1], tri_verts[:, 2]  # (T,3)
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = vm.cross(rd, xp.broadcast_to(e2[None], rd.shape), xp=xp)
    det = xp.sum(pvec * e1[None], axis=-1)
    det_safe = xp.where(xp.abs(det) > 1e-12, det, 1.0)
    inv_det = 1.0 / det_safe
    tvec = ro - v0[None]
    u = xp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = vm.cross(tvec, xp.broadcast_to(e1[None], tvec.shape), xp=xp)
    v = xp.sum(rd * qvec, axis=-1) * inv_det
    t = xp.sum(e2[None] * qvec, axis=-1) * inv_det

    hit = (
        (xp.abs(det) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > 0.0)
    )

    p_obj = ro + (t[..., None] - RAY_OFFSET) * rd
    point = _pair_apply(fwd_g[:, :3, :3], p_obj, xp=xp) + fwd_g[:, :3, 3][None]
    n_obj = vm.normalize(
        xp.broadcast_to(vm.cross(e1, e2, xp=xp)[None], rd.shape), xp=xp, eps=1e-20
    )
    outside_raw = xp.sum(rd * n_obj, axis=-1) < 0.0
    n_obj = xp.where(outside_raw[..., None], n_obj, -n_obj)
    normal = vm.normalize(
        _pair_apply(inv_t_g[:, :3, :3], n_obj, xp=xp), xp=xp, eps=1e-20
    )
    dist = vm.norm(origins[:, None, :] - point, xp=xp)[..., 0]
    dist = xp.where(hit, dist, NO_HIT)
    return dist, point, normal, hit & outside_raw


def intersect_scene(origins, dirs, geom_type, fwd, inv, inv_t,
                    tri_verts=None, tri_geom=None, velocity=None,
                    time=None, tri_uv=None, want_uv=False,
                    tri_tang=None, xp=jnp):
    """Nearest hit over all geoms (and mesh triangles if present).

    Returns a dict with per-ray fields: ``dist`` (N,), ``hit`` (N,) bool,
    ``point``/``normal`` (N,3), ``geom_idx`` (N,) int32, ``outside`` (N,)
    bool.  Misses keep dist==NO_HIT and geom_idx==0.

    This is the per-depth hot loop (spec'd at src/pathtrace.cu:193-196):
    O(rays × geoms) with no BVH, evaluated branchlessly.  Structured as a
    *running-min over geoms* (unrolled: G is small and static) rather
    than a materialized (N, G) broadcast — keeps live temporaries at
    O(N·3) so megaray wavefronts never blow HBM, and XLA fuses each
    geom's test into the carry update.  Strict ``<`` preserves the
    reference's first-geom-wins tie rule (argmin order).
    """
    n = origins.shape[0]
    best = dict(
        dist=xp.full((n,), NO_HIT, dtype=origins.dtype),
        point=xp.zeros_like(origins),
        normal=xp.zeros_like(origins),
        outside=xp.zeros((n,), dtype=bool),
        geom_idx=xp.zeros((n,), dtype=xp.int32),
    )
    if want_uv:
        best["uv"] = xp.zeros((n, 2), dtype=origins.dtype)
    want_tang = tri_tang is not None
    if want_tang:
        # per-ray winner UV tangent data (grad_u, grad_v), mesh bump
        # mapping — zeros on primitive winners (their charts are
        # analytic, integrator._bumptex_normal)
        best["tang"] = xp.zeros((n, 6), dtype=origins.dtype)

    def fold(best, d, p, nr, o, gidx, uv=None, tang=None):
        better = d < best["dist"]
        b3 = better[:, None]
        out = dict(
            dist=xp.where(better, d, best["dist"]),
            point=xp.where(b3, p, best["point"]),
            normal=xp.where(b3, nr, best["normal"]),
            outside=xp.where(better, o, best["outside"]),
            geom_idx=xp.where(better, gidx, best["geom_idx"]),
        )
        if want_uv:
            out["uv"] = xp.where(
                better[:, None],
                uv if uv is not None else xp.zeros((n, 2), origins.dtype),
                best["uv"],
            )
        if want_tang:
            out["tang"] = xp.where(
                better[:, None],
                tang if tang is not None
                else xp.zeros((n, 6), origins.dtype),
                best["tang"],
            )
        return out

    types = [int(t) for t in geom_type]  # static scene structure

    for g in range(len(types)):
        # Static types mean only the matching primitive test is emitted.
        # Single-geom kernels keep every temp at (N,3) — a (N,1,3)
        # sliced form pads 42x under TPU (8,128) tiling and OOMs
        # megaray wavefronts.
        if types[g] == T.MESH:
            continue  # mesh placeholder geoms hit via their triangles
        # motion blur: a geom translating by velocity*t is intersected
        # by shifting the ray origin back in time, then shifting the
        # hit point forward (exact for translation motion; the MOTION
        # scene extension, reference README.md:109-110)
        o_g = origins
        if velocity is not None:
            o_g = origins - time[:, None] * velocity[g][None]
        if types[g] == T.SPHERE:
            res = _one_sphere(
                o_g, dirs, fwd[g], inv[g], inv_t[g], xp=xp,
                want_uv=want_uv,
            )
        else:
            res = _one_box(o_g, dirs, fwd[g], inv[g], xp=xp,
                           want_uv=want_uv)
        d, p, nr, o = res[:4]
        uv = res[4] if want_uv else None
        if velocity is not None:
            p = p + time[:, None] * velocity[g][None]
        best = fold(best, d, p, nr, o,
                    xp.full((n,), g, dtype=xp.int32), uv)

    if tri_verts is not None and tri_verts.shape[0] > 0:
        best = _fold_triangles(
            best, fold, origins, dirs, tri_verts, tri_geom, fwd, inv,
            inv_t, velocity=velocity, time=time, tri_uv=tri_uv,
            want_uv=want_uv, tri_tang=tri_tang, xp=xp,
        )

    best["hit"] = best["dist"] < NO_HIT
    return best


def _mat3_rows(m4, v, xp=jnp, translate=False):
    """(4,4) linear part applied to (N,3), explicit mul-adds."""
    m = m4[:3, :3]
    out = xp.stack(
        [
            m[i, 0] * v[:, 0] + m[i, 1] * v[:, 1] + m[i, 2] * v[:, 2]
            + (m4[i, 3] if translate else 0.0)
            for i in range(3)
        ],
        axis=-1,
    )
    return out


def _one_box(origins, dirs, fwd_g, inv_g, xp=jnp, want_uv=False):
    """Slab test vs one unit cube; all temps (N,3)/(N,).  Same
    semantics as intersect_boxes (src/intersections.h:47-89).

    ``want_uv`` appends a (N,2) face-planar UV (texture-mapping extra,
    README.md:103): the hit face is the dominant axis of the object
    normal; the other two object coords (+0.5) are (u,v) —
    x-faces -> (z,y), y-faces -> (x,z), z-faces -> (x,y)."""
    ro = _mat3_rows(inv_g, origins, xp=xp, translate=True)
    rd = vm.normalize(_mat3_rows(inv_g, dirs, xp=xp), xp=xp)

    t1 = (-0.5 - ro) / rd
    t2 = (0.5 - ro) / rd
    ta = xp.minimum(t1, t2)
    tb = xp.maximum(t1, t2)
    axis_sign = xp.where(t2 < t1, 1.0, -1.0)

    ta_m = xp.where(ta > 0, ta, -1e38)
    tmin = xp.max(ta_m, axis=-1)
    near_axis = xp.argmax(ta_m, axis=-1)
    tmax = xp.min(tb, axis=-1)
    far_axis = xp.argmin(tb, axis=-1)

    eye = xp.eye(3, dtype=ro.dtype)
    near_n = eye[near_axis] * xp.take_along_axis(
        axis_sign, near_axis[:, None], axis=-1
    )
    far_n = eye[far_axis] * xp.take_along_axis(
        axis_sign, far_axis[:, None], axis=-1
    )

    hit = (tmax >= tmin) & (tmax > 0)
    inside = tmin <= 0
    t_use = xp.where(inside, tmax, tmin)
    n_obj = xp.where(inside[:, None], far_n, near_n)
    outside = hit & ~inside

    p_obj = ro + (t_use[:, None] - RAY_OFFSET) * rd
    point = _mat3_rows(fwd_g, p_obj, xp=xp, translate=True)
    # quirk preserved: box normal via the FORWARD transform (:85)
    normal = vm.normalize(_mat3_rows(fwd_g, n_obj, xp=xp), xp=xp)
    dist = vm.norm(origins - point, xp=xp)[..., 0]
    out = (xp.where(hit, dist, NO_HIT), point, normal, outside)
    if want_uv:
        axis = xp.where(inside, far_axis, near_axis)
        px, py, pz = p_obj[:, 0], p_obj[:, 1], p_obj[:, 2]
        u = xp.where(axis == 0, pz, px) + 0.5
        v = xp.where(axis == 1, pz, py) + 0.5
        out = out + (xp.stack([u, v], axis=-1),)
    return out


def _one_sphere(origins, dirs, fwd_g, inv_g, inv_t_g, xp=jnp,
                want_uv=False):
    """Quadratic test vs one unit sphere; all temps (N,3)/(N,).
    Same semantics as intersect_spheres (src/intersections.h:101-143).

    ``want_uv`` appends a (N,2) spherical UV on the radius-0.5 unit
    sphere: u = 0.5 + atan2(z,x)/2pi, v = 0.5 + asin(2y)/pi."""
    ro = _mat3_rows(inv_g, origins, xp=xp, translate=True)
    rd = vm.normalize(_mat3_rows(inv_g, dirs, xp=xp), xp=xp)

    v_dot_d = xp.sum(ro * rd, axis=-1)
    radicand = v_dot_d * v_dot_d - (xp.sum(ro * ro, axis=-1) - 0.25)
    has_root = radicand >= 0
    sq = xp.sqrt(xp.where(has_root, radicand, 1.0))
    t1 = -v_dot_d + sq
    t2 = -v_dot_d - sq

    both_neg = (t1 < 0) & (t2 < 0)
    both_pos = (t1 > 0) & (t2 > 0)
    t_use = xp.where(both_pos, xp.minimum(t1, t2), xp.maximum(t1, t2))
    outside_raw = both_pos
    hit = has_root & ~both_neg

    p_obj = ro + (t_use[:, None] - RAY_OFFSET) * rd
    point = _mat3_rows(fwd_g, p_obj, xp=xp, translate=True)
    normal = vm.normalize(
        _mat3_rows(inv_t_g, p_obj, xp=xp), xp=xp, eps=1e-20
    )
    normal = xp.where(outside_raw[:, None], normal, -normal)
    dist = vm.norm(origins - point, xp=xp)[..., 0]
    out = (xp.where(hit, dist, NO_HIT), point, normal,
           hit & outside_raw)
    if want_uv:
        u = 0.5 + xp.arctan2(p_obj[:, 2], p_obj[:, 0]) / (2.0 * PI)
        v = 0.5 + xp.arcsin(
            xp.clip(2.0 * p_obj[:, 1], -1.0, 1.0)
        ) / PI
        out = out + (xp.stack([u, v], axis=-1),)
    return out


def _fold_triangles(best, fold, origins, dirs, tri_verts, tri_geom,
                    fwd, inv, inv_t, velocity=None, time=None,
                    tri_uv=None, want_uv=False, tri_tang=None, xp=jnp):
    """Fold mesh triangles into the running-min via a `lax.scan` over
    the triangle axis (python loop under numpy).

    One traced body instance and O(N) temporaries — the (N, T)
    broadcast form compiles pathologically on TPU (minutes at 100k+
    rays) and materializes T× the wavefront; the scan costs one body
    per triangle at runtime, which the Pallas mesh kernel will replace
    for large T.
    """
    fwd_g = fwd[tri_geom]       # (T,4,4)
    inv_g = inv[tri_geom]
    inv_t_g = inv_t[tri_geom]
    gidx = xp.asarray(tri_geom, dtype=xp.int32)
    vel_g = velocity[tri_geom] if velocity is not None else None
    if want_uv and tri_uv is None:
        # no vt data: raw barycentric (u,v) as the parameterization
        tri_uv = xp.broadcast_to(
            xp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
                       dtype=origins.dtype)[None],
            (tri_verts.shape[0], 3, 2),
        )

    def body(best, tri):
        tri = list(tri)
        v, fg, ig, itg, gi = tri[:5]
        rest = tri[5:]
        vel = rest.pop(0) if velocity is not None else None
        uv3 = rest.pop(0) if want_uv else None
        tang6 = rest.pop(0) if tri_tang is not None else None
        o_t = origins
        if velocity is not None:
            o_t = origins - time[:, None] * vel[None]
        res = _intersect_one_triangle(
            o_t, dirs, v, fg, ig, itg, xp=xp, uv3=uv3
        )
        d, p, nr, o = res[:4]
        uv = res[4] if want_uv else None
        if velocity is not None:
            p = p + time[:, None] * vel[None]
        n = origins.shape[0]
        tang = (xp.broadcast_to(tang6[None], (n, 6))
                if tang6 is not None else None)
        return fold(best, d, p, nr, o,
                    xp.full((n,), gi, dtype=xp.int32), uv, tang), None

    xs = (tri_verts, fwd_g, inv_g, inv_t_g, gidx)
    if velocity is not None:
        xs = xs + (vel_g,)
    if want_uv:
        xs = xs + (tri_uv,)
    if tri_tang is not None:
        xs = xs + (tri_tang,)
    if xp is jnp:
        import jax

        best, _ = jax.lax.scan(lambda b, t: body(b, t), best, xs)
    else:
        for t in range(tri_verts.shape[0]):
            best, _ = body(best, tuple(a[t] for a in xs))
    return best


def _intersect_one_triangle(origins, dirs, tri, fwd_g, inv_g, inv_t_g,
                            xp=jnp, uv3=None):
    """Möller–Trumbore for one triangle vs (N,) rays; same conventions
    as intersect_triangles (object-space normalize, 1e-4 back-off,
    world distance, ray-facing normal).  ``uv3`` (3,2) per-corner
    texture coords appends a barycentric-interpolated (N,2) UV."""
    i3 = inv_g[:3, :3]
    ro = xp.stack(
        [
            i3[i, 0] * origins[:, 0] + i3[i, 1] * origins[:, 1]
            + i3[i, 2] * origins[:, 2] + inv_g[i, 3]
            for i in range(3)
        ],
        axis=-1,
    )
    rd = xp.stack(
        [
            i3[i, 0] * dirs[:, 0] + i3[i, 1] * dirs[:, 1]
            + i3[i, 2] * dirs[:, 2]
            for i in range(3)
        ],
        axis=-1,
    )
    rd = vm.normalize(rd, xp=xp)

    v0, v1, v2 = tri[0], tri[1], tri[2]  # (3,)
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = vm.cross(rd, xp.broadcast_to(e2[None], rd.shape), xp=xp)
    det = xp.sum(pvec * e1[None], axis=-1)
    det_safe = xp.where(xp.abs(det) > 1e-12, det, 1.0)
    inv_det = 1.0 / det_safe
    tvec = ro - v0[None]
    u = xp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = vm.cross(tvec, xp.broadcast_to(e1[None], tvec.shape), xp=xp)
    v = xp.sum(rd * qvec, axis=-1) * inv_det
    t = xp.sum(e2[None] * qvec, axis=-1) * inv_det
    hit = (
        (xp.abs(det) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    )

    p_obj = ro + (t[:, None] - RAY_OFFSET) * rd
    f3 = fwd_g[:3, :3]
    point = xp.stack(
        [
            f3[i, 0] * p_obj[:, 0] + f3[i, 1] * p_obj[:, 1]
            + f3[i, 2] * p_obj[:, 2] + fwd_g[i, 3]
            for i in range(3)
        ],
        axis=-1,
    )
    n_obj = vm.normalize(vm.cross(e1, e2, xp=xp), xp=xp, eps=1e-20)
    n_obj_b = xp.broadcast_to(n_obj[None], rd.shape)
    outside_raw = xp.sum(rd * n_obj_b, axis=-1) < 0.0
    n_obj_b = xp.where(outside_raw[:, None], n_obj_b, -n_obj_b)
    t3 = inv_t_g[:3, :3]
    normal = vm.normalize(
        xp.stack(
            [
                t3[i, 0] * n_obj_b[:, 0] + t3[i, 1] * n_obj_b[:, 1]
                + t3[i, 2] * n_obj_b[:, 2]
                for i in range(3)
            ],
            axis=-1,
        ),
        xp=xp, eps=1e-20,
    )
    dist = vm.norm(origins - point, xp=xp)[..., 0]
    dist = xp.where(hit, dist, NO_HIT)
    out = (dist, point, normal, outside_raw & hit)
    if uv3 is not None:
        w = 1.0 - u - v
        uv = xp.stack(
            [w * uv3[0, 0] + u * uv3[1, 0] + v * uv3[2, 0],
             w * uv3[0, 1] + u * uv3[1, 1] + v * uv3[2, 1]],
            axis=-1,
        )
        out = out + (uv,)
    return out


def triangle_uv_gradients(tri_verts, tri_uv, xp=jnp):
    """Per-triangle object-space gradients of the UV chart:
    (grad_u (T,3), grad_v (T,3)).

    On a triangle, (u, v) are affine in position, so their spatial
    gradients are constant per face: ``g_u`` is the in-plane vector
    with ``g_u . e1 = du1``, ``g_u . e2 = du2`` (the dual basis of the
    edge span, solved via the 2x2 Gram system).  These are the
    triangle analogue of the analytic sphere/cube chart gradients in
    render.integrator._bumptex_normal — they chain dh/du, dh/dv into
    an object-space height gradient for mesh bump mapping (the
    reference's bump-mapping extra, README.md:104, PBRT 9.3, on its
    arbitrary-mesh extra, README.md:113-117).

    Degenerate parameterizations (zero-area face or zero UV area)
    return zero gradients — bump is inert there, never NaN.
    """
    tv = xp.asarray(tri_verts, dtype=xp.float32)
    uv = xp.asarray(tri_uv, dtype=xp.float32)
    e1 = tv[:, 1] - tv[:, 0]          # (T,3)
    e2 = tv[:, 2] - tv[:, 0]
    du1 = uv[:, 1, 0] - uv[:, 0, 0]   # (T,)
    du2 = uv[:, 2, 0] - uv[:, 0, 0]
    dv1 = uv[:, 1, 1] - uv[:, 0, 1]
    dv2 = uv[:, 2, 1] - uv[:, 0, 1]
    g11 = xp.sum(e1 * e1, axis=-1)
    g12 = xp.sum(e1 * e2, axis=-1)
    g22 = xp.sum(e2 * e2, axis=-1)
    det = g11 * g22 - g12 * g12
    ok = xp.abs(det) > 1e-20
    inv_det = xp.where(ok, 1.0 / xp.where(ok, det, 1.0), 0.0)
    a_u = (g22 * du1 - g12 * du2) * inv_det
    b_u = (g11 * du2 - g12 * du1) * inv_det
    a_v = (g22 * dv1 - g12 * dv2) * inv_det
    b_v = (g11 * dv2 - g12 * dv1) * inv_det
    g_u = a_u[:, None] * e1 + b_u[:, None] * e2
    g_v = a_v[:, None] * e1 + b_v[:, None] * e2
    return g_u, g_v
