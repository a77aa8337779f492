"""Vector / matrix helpers (the role GLM plays in the reference).

Conventions match the reference exactly:

* 4x4 transforms act on column vectors: ``p' = M @ [p, 1]``.
* Instance transform is ``T @ Rx @ Ry @ Rz @ S`` with rotation angles in
  degrees (``src/utilities.cpp:65-72``).
* Normals transform by the inverse-transpose (``src/scene.cpp:85``,
  ``src/intersections.h:137``).

All functions take an ``xp`` array-namespace argument (``jax.numpy`` or
``numpy``) so the NumPy oracle shares this exact code path.  Vectors are
arrays whose *last* axis has size 3; everything broadcasts.
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import PI


def dot(a, b, xp=jnp):
    return xp.sum(a * b, axis=-1, keepdims=True)


def norm(v, xp=jnp):
    return xp.sqrt(xp.sum(v * v, axis=-1, keepdims=True))


def normalize(v, xp=jnp, eps=0.0):
    n = norm(v, xp=xp)
    if eps:
        n = xp.maximum(n, eps)
    return v / n


def cross(a, b, xp=jnp):
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return xp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def reflect(i, n, xp=jnp):
    """GLM-convention reflection: i - 2*dot(n,i)*n (i points toward surface)."""
    return i - 2.0 * dot(n, i, xp=xp) * n


def refract(i, n, eta, xp=jnp):
    """GLM-convention refraction of incident ``i`` about normal ``n``.

    Returns the refracted direction, or the zero vector on total internal
    reflection (same contract as ``glm::refract``).  ``eta`` broadcasts
    against the leading axes of ``i``/``n`` (shape (..., 1)).
    """
    cosi = dot(n, i, xp=xp)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    # where-guard so the VJP of sqrt never sees k<0 (NaN-safe backward on
    # the TIR lanes that branchless evaluation still computes); forward is
    # bit-identical to glm::refract (k>=0 uses the true k).
    valid = k >= 0.0
    k_safe = xp.where(valid, k, 1.0)
    refr = eta * i - (eta * cosi + xp.sqrt(k_safe)) * n
    return xp.where(valid, refr, xp.zeros_like(refr))


def luminance(rgb, xp=jnp):
    return 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]


# ---------------------------------------------------------------------------
# 4x4 transforms (column-vector convention)
#
# IMPORTANT: all contractions here are written as explicit elementwise
# mul-adds, NEVER einsum/matmul.  XLA lowers dot-general at default
# precision (bf16 passes on the MXU), which injects ~1e-3 relative error
# into instance transforms — catastrophic for thin-walled geometry (a
# 0.01-scaled cornell wall amplifies object-space error 100x).  K=3
# contractions gain nothing from the MXU anyway; explicit VPU mul-adds
# are full f32 and bit-comparable with the NumPy oracle.
# ---------------------------------------------------------------------------

def mat3_vec(m, v, xp=jnp):
    """(...,3,3) @ (...,3) -> (...,3), explicit f32 mul-adds."""
    return xp.stack(
        [
            m[..., i, 0] * v[..., 0]
            + m[..., i, 1] * v[..., 1]
            + m[..., i, 2] * v[..., 2]
            for i in range(3)
        ],
        axis=-1,
    )


def mat3_mat(a, b, xp=jnp):
    """(...,3,3) @ (...,3,3) -> (...,3,3), explicit f32 mul-adds."""
    rows = []
    for i in range(3):
        rows.append(
            xp.stack(
                [
                    a[..., i, 0] * b[..., 0, j]
                    + a[..., i, 1] * b[..., 1, j]
                    + a[..., i, 2] * b[..., 2, j]
                    for j in range(3)
                ],
                axis=-1,
            )
        )
    return xp.stack(rows, axis=-2)


def transform_point(m, p, xp=jnp):
    """Apply 4x4 ``m`` (shape (...,4,4)) to points ``p`` (shape (...,3))."""
    return mat3_vec(m[..., :3, :3], p, xp=xp) + m[..., :3, 3]


def transform_dir(m, d, xp=jnp):
    """Apply the linear part of ``m`` to directions (w=0)."""
    return mat3_vec(m[..., :3, :3], d, xp=xp)


def _rot_axis(c, s, axis, xp=jnp):
    z = xp.zeros_like(c)
    o = xp.ones_like(c)
    if axis == 0:
        rows = [[o, z, z], [z, c, -s], [z, s, c]]
    elif axis == 1:
        rows = [[c, z, s], [z, o, z], [-s, z, c]]
    else:
        rows = [[c, -s, z], [s, c, z], [z, z, o]]
    return xp.stack([xp.stack(r, axis=-1) for r in rows], axis=-2)


def trs_matrix(translation, rotation_deg, scale, xp=jnp):
    """``T @ Rx @ Ry @ Rz @ S`` with degrees, matching
    ``utilityCore::buildTransformationMatrix`` (src/utilities.cpp:65-72).

    Inputs have shape (..., 3); output (..., 4, 4).  Fully differentiable
    w.r.t. all three inputs (geometry-gradient path).
    """
    rad = rotation_deg * (PI / 180.0)
    c, s = xp.cos(rad), xp.sin(rad)
    r = _rot_axis(c[..., 0], s[..., 0], 0, xp=xp)
    r = mat3_mat(r, _rot_axis(c[..., 1], s[..., 1], 1, xp=xp), xp=xp)
    r = mat3_mat(r, _rot_axis(c[..., 2], s[..., 2], 2, xp=xp), xp=xp)
    rs = r * scale[..., None, :]  # R @ diag(scale)
    m = xp.concatenate([rs, translation[..., :, None]], axis=-1)  # (...,3,4)
    bottom = xp.broadcast_to(
        xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=m.dtype), m.shape[:-2] + (1, 4)
    )
    return xp.concatenate([m, bottom], axis=-2)


def trs_inverse(translation, rotation_deg, scale, xp=jnp, eps=1e-12):
    """Analytic inverse of :func:`trs_matrix`: ``S^-1 @ Rz^T Ry^T Rx^T @ T^-1``."""
    rad = rotation_deg * (PI / 180.0)
    c, s = xp.cos(rad), xp.sin(rad)
    r = _rot_axis(c[..., 0], s[..., 0], 0, xp=xp)
    r = mat3_mat(r, _rot_axis(c[..., 1], s[..., 1], 1, xp=xp), xp=xp)
    r = mat3_mat(r, _rot_axis(c[..., 2], s[..., 2], 2, xp=xp), xp=xp)
    rt = xp.swapaxes(r, -1, -2)
    eps_arr = xp.asarray(eps, dtype=scale.dtype)  # keep float32 under numpy
    inv_s = 1.0 / (scale + xp.where(scale >= 0, eps_arr, -eps_arr))
    lin = rt * inv_s[..., :, None]  # diag(1/s) @ R^T
    trans = -mat3_vec(lin, translation, xp=xp)
    m = xp.concatenate([lin, trans[..., :, None]], axis=-1)
    bottom = xp.broadcast_to(
        xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=m.dtype), m.shape[:-2] + (1, 4)
    )
    return xp.concatenate([m, bottom], axis=-2)
