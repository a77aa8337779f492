"""Branchless BSDF sampling (the role of ``src/interactions.h``).

Implements the scatterRay spec (``src/interactions.h:44-67`` plus
README.md:79-101,171-185): probabilistically choose a lobe and divide
the chosen branch's contribution by its probability.  Lobe policy:

* ``has_refractive > 0`` — Fresnel glass: choose reflection with the
  Schlick probability R (README.md:96-99) and refraction (glm::refract
  Snell's law) with probability 1-R; choosing with probability equal to
  the Fresnel weight makes the estimator unbiased without a divide.
  Total internal reflection falls back to mirror reflection.
  Reflection tints by SPECRGB, refraction by RGB.
* else ``has_reflective > 0`` — specular with probability
  p = has_reflective (throughput ×= SPECRGB / p), diffuse otherwise
  (throughput ×= RGB / (1-p)).  REFL 1 is the reference's perfect
  mirror via glm::reflect (README.md:81).  If SPECEX > 0 the specular
  direction is an imperfect power-cosine sample around the mirror
  direction (GPU Gems 3 ch. 20 eq. 7-9, README.md:171-185).
* else — cosine-weighted diffuse, exactly the reference's
  ``calculateRandomDirectionInHemisphere`` math (sqrt(u1) altitude,
  Peter-Kutz tangent frame, ``src/interactions.h:11-42``).

All lobes are evaluated for every ray and ``where``-selected — on the
VPU this costs a bounded 3× of elementwise work and removes all
divergence.  Discrete lobe choices depend only on RNG draws and
detached comparisons, so gradients flow through the *continuous*
factors (albedo, Fresnel weight, IOR via the refracted direction)
exactly as detached-sampling estimators prescribe.

Every function takes ``xp`` so the NumPy oracle shares the semantic.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.constants import PI, SQRT_OF_ONE_THIRD, TWO_PI
from ..core import vecmath as vm


def _kutz_frame(normal, xp=jnp):
    """Tangent frame via the Peter-Kutz axis trick
    (src/interactions.h:24-37)."""
    ax = xp.abs(normal[..., 0:1])
    ay = xp.abs(normal[..., 1:2])
    e = xp.eye(3, dtype=normal.dtype)
    not_normal = xp.where(
        ax < SQRT_OF_ONE_THIRD,
        e[0],
        xp.where(ay < SQRT_OF_ONE_THIRD, e[1], e[2]),
    )
    p1 = vm.normalize(vm.cross(normal, not_normal, xp=xp), xp=xp, eps=1e-20)
    p2 = vm.normalize(vm.cross(normal, p1, xp=xp), xp=xp, eps=1e-20)
    return p1, p2


def cosine_hemisphere(normal, u1, u2, xp=jnp):
    """Cosine-weighted hemisphere direction about ``normal``
    (src/interactions.h:11-42).  u1/u2 shape (N,), normal (N,3)."""
    up = xp.sqrt(u1)[..., None]          # cos(theta)
    over = xp.sqrt(xp.maximum(1.0 - up * up, 0.0))  # sin(theta)
    around = (u2 * TWO_PI)[..., None]
    p1, p2 = _kutz_frame(normal, xp=xp)
    return up * normal + xp.cos(around) * over * p1 + xp.sin(around) * over * p2


def power_cosine_about(axis, exponent, u1, u2, xp=jnp):
    """Power-cosine direction about ``axis`` (GPU Gems 3 ch.20 eq. 7-9):
    theta = acos(u1^(1/(n+1))), phi = 2*pi*u2."""
    n1 = 1.0 / (exponent + 1.0)
    cos_t = xp.power(xp.maximum(u1, 1e-12), n1)[..., None]
    sin_t = xp.sqrt(xp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = (u2 * TWO_PI)[..., None]
    p1, p2 = _kutz_frame(axis, xp=xp)
    return cos_t * axis + xp.cos(phi) * sin_t * p1 + xp.sin(phi) * sin_t * p2


def schlick_reflectance(cos_i, ior, xp=jnp):
    """Schlick's approximation R(cos_i) with R0 = ((1-ior)/(1+ior))^2."""
    r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
    m = xp.maximum(1.0 - cos_i, 0.0)
    return r0 + (1.0 - r0) * m * m * m * m * m


def sample_bsdf(wi, normal, outside, mat, u, xp=jnp):
    """Scatter one bounce for all rays at once.

    Args:
      wi: (N,3) incoming (normalized) ray directions, pointing *at* the
        surface.
      normal: (N,3) surface normals, already flipped to face the
        incoming ray (the intersection library's contract).
      outside: (N,) bool — ray arrived from outside the object.
      mat: dict of per-ray material fields gathered from the material
        table: color, spec_color (N,3); spec_exponent, has_reflective,
        has_refractive, ior (N,).
      u: dict of U[0,1) draws: lobe, diff_u1, diff_u2, fresnel, spec_u1,
        spec_u2 — fixed slots of the (iter,pixel,depth) stream.

    Returns (new_dir (N,3), throughput_multiplier (N,3),
    took_diffuse (N,) bool — True where the diffuse lobe was sampled
    (NEE uses it to cancel double-counted BSDF-sampled emission),
    took_refract (N,) bool — True where the ray passed through the
    refractive interface (subsurface scattering tracks medium
    boundaries with it)).
    """
    color = mat["color"]
    spec_color = mat["spec_color"]

    # --- diffuse lobe -----------------------------------------------------
    d_diff = cosine_hemisphere(normal, u["diff_u1"], u["diff_u2"], xp=xp)

    # --- specular lobe (perfect or imperfect) -----------------------------
    d_mirror = vm.reflect(wi, normal, xp=xp)
    d_imperfect = power_cosine_about(
        d_mirror, mat["spec_exponent"], u["spec_u1"], u["spec_u2"], xp=xp
    )
    use_imperfect = (mat["spec_exponent"] > 0.0)[..., None]
    d_spec = xp.where(use_imperfect, d_imperfect, d_mirror)

    # --- refractive lobe (Schlick-weighted reflect/refract) ---------------
    cos_i = xp.clip(-vm.dot(normal, wi, xp=xp)[..., 0], 0.0, 1.0)
    refl_prob = schlick_reflectance(cos_i, mat["ior"], xp=xp)
    eta = xp.where(outside, 1.0 / xp.maximum(mat["ior"], 1e-6), mat["ior"])
    d_refr = vm.refract(wi, normal, eta[..., None], xp=xp)
    tir = xp.sum(d_refr * d_refr, axis=-1) < 1e-12
    choose_reflect = (u["fresnel"] < refl_prob) | tir
    d_fresnel = xp.where(choose_reflect[..., None], d_mirror, d_refr)
    t_fresnel = xp.where(choose_reflect[..., None], spec_color, color)

    # --- specular/diffuse probability split -------------------------------
    p_spec = xp.clip(mat["has_reflective"], 0.0, 1.0)
    take_spec = u["lobe"] < p_spec
    p_safe = xp.where(take_spec, p_spec, 1.0 - p_spec)
    p_safe = xp.maximum(p_safe, 1e-8)[..., None]
    d_sd = xp.where(take_spec[..., None], d_spec, d_diff)
    t_sd = xp.where(take_spec[..., None], spec_color, color) / p_safe

    # --- select by material class ----------------------------------------
    is_glass = (mat["has_refractive"] > 0.0)[..., None]
    new_dir = xp.where(is_glass, d_fresnel, d_sd)
    thr = xp.where(is_glass, t_fresnel, t_sd)
    took_diffuse = ~take_spec & ~is_glass[..., 0]
    took_refract = is_glass[..., 0] & ~choose_reflect
    return new_dir, thr, took_diffuse, took_refract
