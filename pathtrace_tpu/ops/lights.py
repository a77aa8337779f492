"""Area-light sampling for next-event estimation (direct lighting).

The reference lists direct lighting as a required-extra feature
("taking a final ray directly to a random point on an emissive object",
README.md:107-108).  Here it is a full NEE integrator mode — and the
component that makes *geometry* gradients meaningful: pure BSDF-sampled
radiance at fixed RNG is piecewise-constant in transforms, while the
NEE geometric term cosθ_s·cosθ_l·A/r² depends continuously on the
light/receiver transforms.

Sampling measure: uniform by surface area on the light primitive.

* Cube lights: a face is chosen with probability ∝ its world-space
  area; each face of the unit cube maps to a parallelogram under the
  instance transform, so its area |Mb × Mc| and geometric normal are
  exact for any (even skewed) transform.
* Sphere lights: uniform direction on the unit sphere mapped through
  the transform, weighted by the exact per-sample area Jacobian
  pi |det M| |M^{-T} w| — unbiased for ANY transform, anisotropic and
  skewed included (see :func:`sample_sphere_light`).

All functions are xp-generic (jnp / numpy) like the rest of ops/.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import types as T
from ..core import vecmath as vm
from ..core.constants import PI, TWO_PI


def _col(m, j, xp):
    """j-th column of the linear part of (4,4) transform."""
    return xp.stack([m[0, j], m[1, j], m[2, j]])


def cube_light_tables(fwd_g, xp=jnp):
    """Per-face (origin, edge_b, edge_c, outward normal, area) for the 6
    faces of a transformed unit cube.  fwd_g: (4,4).  Returns dict of
    stacked (6, 3)/(6,) arrays."""
    cols = [_col(fwd_g, j, xp) for j in range(3)]
    trans = xp.stack([fwd_g[0, 3], fwd_g[1, 3], fwd_g[2, 3]])
    origins, e_bs, e_cs, normals, areas = [], [], [], [], []
    for axis in range(3):
        b, c = (axis + 1) % 3, (axis + 2) % 3
        cross = vm.cross(cols[b], cols[c], xp=xp)
        area = vm.norm(cross, xp=xp)[..., 0]
        for sign in (1.0, -1.0):
            center = trans + cols[axis] * (0.5 * sign)
            # orient the plane normal cross(Mb,Mc) outward: along
            # sign * (world direction of +axis)
            orient = xp.sum(cross * cols[axis])
            n = cross * (xp.where(orient >= 0, 1.0, -1.0) * sign)
            n = n / xp.maximum(vm.norm(n, xp=xp)[..., 0], 1e-20)
            origins.append(center)
            e_bs.append(cols[b])
            e_cs.append(cols[c])
            normals.append(n)
            areas.append(area)
    return dict(
        origin=xp.stack(origins),   # (6,3) face centers
        e_b=xp.stack(e_bs),         # (6,3)
        e_c=xp.stack(e_cs),         # (6,3)
        normal=xp.stack(normals),   # (6,3)
        area=xp.stack(areas),       # (6,)
    )


def sample_cube_light(fwd_g, u_sel, u, v, xp=jnp):
    """Uniform-by-area point on a transformed unit cube's surface.

    u_sel/u/v: (N,) draws.  Returns (point (N,3), normal (N,3),
    total_area ()).
    """
    tab = cube_light_tables(fwd_g, xp=xp)
    areas = tab["area"]                      # (6,)
    total = xp.sum(areas)
    cdf = xp.cumsum(areas) / xp.maximum(total, 1e-20)

    s = u - 0.5
    t = v - 0.5
    point = xp.zeros((u.shape[0], 3), dtype=u.dtype)
    normal = xp.zeros((u.shape[0], 3), dtype=u.dtype)
    prev = xp.zeros_like(cdf[0])
    for f in range(6):
        hi = cdf[f]
        m = ((u_sel >= prev) & (u_sel < hi)) if f < 5 else (u_sel >= prev)
        p_f = (
            tab["origin"][f][None]
            + s[:, None] * tab["e_b"][f][None]
            + t[:, None] * tab["e_c"][f][None]
        )
        point = xp.where(m[:, None], p_f, point)
        normal = xp.where(
            m[:, None], xp.broadcast_to(tab["normal"][f][None], point.shape),
            normal,
        )
        prev = hi
    return point, normal, total


def sphere_det3(fwd_g, xp=jnp):
    """|det| of the linear 3x3 part of a (4,4) transform."""
    c0, c1, c2 = (_col(fwd_g, j, xp) for j in range(3))
    det = xp.sum(c0 * vm.cross(c1, c2, xp=xp))
    return xp.abs(det)


def sample_sphere_light(fwd_g, inv_t_g, u, v, xp=jnp):
    """Point on a transformed sphere (r=0.5) from a uniform unit-sphere
    direction, with the EXACT per-sample inverse-pdf weight.

    The map w in S^2 -> p = M(w/2) + t has world-space area element
    dA = |det M| * |M^{-T} w| * (1/4) dOmega, so sampling w uniformly
    gives pdf(p) = 1 / (pi |det M| |M^{-T} w|) per unit world area.
    Returns (point (N,3), normal (N,3), weight (N,)) where
    ``weight = 1/pdf = pi |det M| |M^{-T} w|`` — exact for ANY linear
    transform (anisotropic/skewed included); for uniform scale s it
    reduces to the sphere area pi s^2 = 4 pi (s/2)^2.
    """
    z = 1.0 - 2.0 * u
    r = xp.sqrt(xp.maximum(1.0 - z * z, 0.0))
    phi = v * TWO_PI
    w = xp.stack([r * xp.cos(phi), r * xp.sin(phi), z], axis=-1)  # (N,3)
    p_obj = 0.5 * w
    point = vm.transform_point(fwd_g, p_obj, xp=xp)
    n_raw = vm.transform_dir(inv_t_g, w, xp=xp)        # M^{-T} w
    n_len = vm.norm(n_raw, xp=xp)[..., 0]
    normal = n_raw / xp.maximum(n_len, 1e-20)[:, None]
    weight = PI * sphere_det3(fwd_g, xp=xp) * n_len    # (N,)
    return point, normal, weight


def nee_contribution(point, normal, albedo, throughput, light_point,
                     light_normal, light_area, light_emission,
                     occluded, xp=jnp):
    """Direct-light contribution of one sampled light point.

    f_d = albedo/pi (the diffuse lobe only — specular/refractive
    continuations keep their BSDF-sampled emission instead), geometric
    term cosθ_s·cosθ_l/r², pdf = 1/area.
    Shapes: rays (N,3)/(N,); light_emission (3,) or (N,3).
    """
    wl = light_point - point
    r2 = xp.sum(wl * wl, axis=-1)
    r2_safe = xp.maximum(r2, 1e-8)
    wl_n = wl / xp.sqrt(r2_safe)[:, None]
    cos_s = xp.maximum(xp.sum(normal * wl_n, axis=-1), 0.0)
    cos_l = xp.maximum(xp.sum(light_normal * (-wl_n), axis=-1), 0.0)
    g = cos_s * cos_l / r2_safe
    f_d = albedo * (1.0 / PI)
    contrib = (
        throughput * f_d * light_emission
        * (g * light_area)[:, None]
    )
    return xp.where(occluded[:, None], 0.0, contrib)
