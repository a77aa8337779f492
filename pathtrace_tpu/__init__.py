"""pathtrace_tpu — a TPU-native differentiable wavefront path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
CIS565 CUDA path tracer (reference at /root/reference): scene-file
parsing, camera raygen with AA jitter and depth-of-field, sphere / box /
triangle-mesh intersection, diffuse / mirror / Fresnel-glass BSDF
sampling, per-bounce wavefront integration with stream compaction, PNG /
HDR output — plus what the reference doesn't have: end-to-end
differentiability, multi-chip/multi-host sharding, checkpoint/resume,
and deterministic counter-based RNG.
"""

from .core import types
from .core.types import Scene, Materials, Geoms, Camera, TriMesh
from .scene.parser import load_scene, parse_scene
from .render.integrator import (
    pathtrace_iteration,
    pathtrace_batch,
    render,
)

__version__ = "0.1.0"
