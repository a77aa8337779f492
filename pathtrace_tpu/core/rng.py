"""Counter-based RNG for the path tracer.

The reference seeds a ``thrust::default_random_engine`` per
``(iter, pixel_index, depth)`` via an avalanche hash
(``src/pathtrace.cu:41-45`` with ``utilhash`` from
``src/intersections.h:11-19``).  We keep that *seeding discipline* —
every random draw is a pure function of ``(iter, pixel, depth, draw)``
— but use a counter-based hash (pcg4d-style mixing) instead of a
stateful engine.  This is the TPU-native choice:

* stateless → vectorizes over millions of rays with no carried state,
* counter-based → bit-exact reproducibility regardless of sharding,
  compaction order, or chunking (the key for multi-host determinism),
* identical uint32 arithmetic in ``jax.numpy`` and ``numpy`` → the CPU
  oracle in ``tests/oracle.py`` matches the TPU renderer bit-for-bit.

All functions work with either ``jax.numpy`` or ``numpy`` passed as
``xp`` (both wrap uint32 arithmetic mod 2**32).
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = "uint32"


def _mix4(a, b, c, d, xp=jnp):
    """pcg4d-style 4-lane avalanche mix. Inputs/outputs uint32 arrays."""
    u = xp.uint32
    a = (a * u(1664525) + u(1013904223)).astype(_U32)
    b = (b * u(1664525) + u(1013904223)).astype(_U32)
    c = (c * u(1664525) + u(1013904223)).astype(_U32)
    d = (d * u(1664525) + u(1013904223)).astype(_U32)
    a = (a + b * d).astype(_U32)
    b = (b + c * a).astype(_U32)
    c = (c + a * b).astype(_U32)
    d = (d + b * c).astype(_U32)
    a = a ^ (a >> u(16))
    b = b ^ (b >> u(16))
    c = c ^ (c >> u(16))
    d = d ^ (d >> u(16))
    a = (a + b * d).astype(_U32)
    b = (b + c * a).astype(_U32)
    c = (c + a * b).astype(_U32)
    d = (d + b * c).astype(_U32)
    return a, b, c, d


def hash_u32(it, pixel, depth, draw, xp=jnp):
    """uint32 hash of the 4-tuple counter. Broadcasting applies."""
    it = xp.asarray(it, dtype=_U32)
    pixel = xp.asarray(pixel, dtype=_U32)
    depth = xp.asarray(depth, dtype=_U32)
    draw = xp.asarray(draw, dtype=_U32)
    a, b, c, d = _mix4(it, pixel, depth, draw, xp=xp)
    return a ^ d


def uniform(it, pixel, depth, draw, xp=jnp):
    """U[0,1) float32, a pure function of the (iter,pixel,depth,draw) counter.

    Uses the top 24 bits so the result is exactly representable in
    float32 and never equals 1.0.  The cast routes through int32 (the
    24-bit value fits exactly) because Mosaic has no uint32->f32 vector
    cast — this single function is the RNG for the jnp integrator, the
    NumPy oracle, AND the Pallas megakernel (no duplicated stream).
    """
    bits = hash_u32(it, pixel, depth, draw, xp=xp)
    top24 = (bits >> xp.uint32(8)).astype("int32")
    return top24.astype("float32") * xp.float32(1.0 / 16777216.0)


# Fixed draw-slot layout per (iter, pixel, depth) stream.  Depth slot 0
# is camera-ray generation; bounce d uses depth slot d+1.  Keeping the
# layout fixed (rather than sequential stateful draws) is what makes
# compaction/resharding order-independent.
class Draw:
    AA_X = 0          # antialias jitter in x (raygen)
    AA_Y = 1          # antialias jitter in y (raygen)
    DOF_U = 2         # depth-of-field aperture sample u (raygen)
    DOF_V = 3         # depth-of-field aperture sample v (raygen)
    TIME = 4          # shutter-time jitter (raygen; motion blur)
    LOBE = 0          # BSDF lobe selection (bounce)
    DIFF_U1 = 1       # cosine-weighted hemisphere u1
    DIFF_U2 = 2       # cosine-weighted hemisphere u2
    FRESNEL = 3       # Schlick reflect-vs-refract choice
    SPEC_U1 = 4       # imperfect-specular u1
    SPEC_U2 = 5       # imperfect-specular u2
    RR = 6            # russian roulette (optional)
    SSS_STEP = 8      # medium free-path sample (subsurface scattering)
    SSS_U = 9         # isotropic phase function u
    SSS_V = 10        # isotropic phase function v
    # NEE (direct lighting): light k uses draws NEE_BASE+3k .. +3k+2
    NEE_BASE = 16     # +0: face/strata select, +1: u, +2: v
