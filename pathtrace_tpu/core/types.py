"""Scene data model as JAX pytrees (struct-of-arrays).

The reference keeps an array-of-structs host model
(``src/sceneStructs.h:13-55``: Ray/Geom/Material/Camera/RenderState).
On TPU the idiomatic layout is struct-of-arrays: every field is a
stacked array over the geometry/material axis, so intersection and
shading are batched elementwise ops on the VPU.

``Materials`` and the TRS fields of ``Geoms`` (plus camera vectors) are
the *differentiable parameter pytree* — gradients of a pixel loss flow
into them through the bounce loop.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

import jax
import numpy as np


# Geometry type codes (src/sceneStructs.h:8-11 has SPHERE, CUBE; MESH is
# the reserved extension at README.md:236-237).
SPHERE = 0
CUBE = 1
MESH = 2


def _pytree(cls=None, *, meta=()):
    """Register a dataclass as a JAX pytree with ``meta`` static fields."""

    def wrap(c):
        c = dataclass(c)
        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in meta]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta)
        )
        return c

    return wrap(cls) if cls is not None else wrap


@_pytree
class Materials:
    """SoA material table; mirrors ``Material`` (src/sceneStructs.h:29-39).

    Every leaf has leading axis M (number of materials).
    """

    color: Any          # (M, 3) diffuse albedo (RGB)
    spec_exponent: Any  # (M,)   SPECEX
    spec_color: Any     # (M, 3) SPECRGB
    has_reflective: Any  # (M,)  REFL (used as the specular-lobe probability)
    has_refractive: Any  # (M,)  REFR
    ior: Any            # (M,)   REFRIOR
    emittance: Any      # (M,)   EMITTANCE; light iff > 0 (README.md:219)
    # CHECKER extension (procedural object-space texture; 0 = off)
    checker_scale: Any = None   # (M,)
    checker_color: Any = None   # (M, 3) the second checker albedo
    # BUMP extension (procedural sinusoidal bump map; 0 = off)
    bump_scale: Any = None      # (M,) spatial frequency (cells/unit)
    bump_strength: Any = None   # (M,) normal perturbation amplitude
    # SSS extension (participating medium behind a refractive
    # interface; random-walk subsurface scattering; 0 = off)
    sss_sigma: Any = None       # (M,) scattering coefficient (1/units)
    sss_albedo: Any = None      # (M, 3) single-scattering albedo
    # image bump-map extension (BUMPTEX): height-gradient normal
    # perturbation strength per material (texture index is static
    # structure — Scene.bump_texture_ids)
    bumptex_strength: Any = None  # (M,)

    @property
    def count(self):
        return self.color.shape[0]


@_pytree(meta=("type",))
class Geoms:
    """SoA geometry instances; mirrors ``Geom`` (src/sceneStructs.h:18-27).

    ``type`` is *static metadata* (a tuple of ints): primitive kinds are
    scene structure, and keeping them static lets the tracer emit only
    the matching intersection test per geom instead of both.  Transforms
    are *derived in-graph* from TRS via
    :func:`pathtrace_tpu.core.vecmath.trs_matrix` so geometry gradients
    flow (the reference precomputes them host-side, src/scene.cpp:82-85).
    """

    type: tuple       # (G,) tuple of SPHERE / CUBE / MESH ints — static
    material_id: Any  # (G,) int32
    translation: Any  # (G, 3)
    rotation: Any     # (G, 3) degrees (Euler XYZ, applied T@Rx@Ry@Rz@S)
    scale: Any        # (G, 3)
    velocity: Any = None  # (G, 3) world units per shutter interval
                          # (MOTION extension -> motion blur); None/zeros = static

    @property
    def count(self):
        return len(self.type)


@_pytree(meta=("bvh_meta",))
class TriMesh:
    """Triangle soup for MESH geoms, object space.

    ``tri_verts[t]`` are the three vertices of triangle ``t``;
    ``tri_geom[t]`` indexes into :class:`Geoms` for the instance
    transform and material (the role ``glm::intersectRayTriangle`` plays
    per README.md:116).  ``tri_verts.shape[0] == 0`` means no mesh.

    The ``bvh_*`` fields are the per-geom acceleration structure built
    at scene load by :mod:`pathtrace_tpu.scene.bvh` (the reference's
    "arbitrary mesh" goal, README.md:113-117, needs sub-linear
    intersection).  ``bvh_meta`` — per-geom (g, node_off, n_nodes,
    tri_off, n_tris) offsets — is *static* scene structure: the
    megakernel unrolls one traversal per mesh geom from it.
    """

    tri_verts: Any  # (T, 3, 3)
    tri_geom: Any   # (T,) int32
    tri_uv: Any = None  # (T, 3, 2) per-corner texture coords (OBJ vt);
                        # None = no UVs (barycentric fallback)
    bvh_nodes: Any = None   # (N, bvh.NODE_COLS) f32 skip-link node table
    bvh_order: Any = None   # (T,) int32: reordered row -> original tri
    bvh_meta: tuple = ()    # static per-geom offsets (see scene/bvh.py)

    @property
    def count(self):
        return self.tri_verts.shape[0]


@_pytree
class Camera:
    """Mirrors ``Camera`` (src/sceneStructs.h:41-47) + DoF extension.

    ``resolution`` is static metadata (shapes derive from it); the
    vectors/fov are leaves so camera gradients are possible.
    """

    position: Any   # (3,) EYE
    view: Any       # (3,) VIEW
    up: Any         # (3,) UP
    fovy_deg: Any   # ()   FOVY (vertical half-angle in degrees)
    aperture: Any   # ()   lens radius; 0 disables depth-of-field
    focal_dist: Any  # ()  focal-plane distance for DoF


@_pytree(
    meta=("resolution", "trace_depth", "iterations", "image_name",
          "light_indices", "texture_ids", "bump_texture_ids")
)
class Scene:
    """Full scene: parameter pytree + static render settings.

    Static fields come from the CAMERA block (RES / ITERATIONS / DEPTH /
    FILE, src/scene.cpp:103-114) and fix array shapes / loop bounds.
    ``light_indices`` (geoms whose material is emissive, README.md:219)
    is static structure: the NEE mode loops over it at trace time, and
    it stays fixed while differentiating emittance values.
    """

    materials: Materials
    geoms: Geoms
    mesh: TriMesh
    camera: Camera
    resolution: tuple   # (width, height)
    trace_depth: int
    iterations: int
    image_name: str
    light_indices: tuple = ()
    # image textures (TEXTURE/BUMPTEX extension, PBRT 10.4/9.3 per
    # README.md:103-106): ``textures`` is a tuple of (H,W,3) f32 arrays
    # (data leaves — texture texels are differentiable);  which texture
    # a material samples is scene *structure*, so the per-material
    # index tuples (-1 = none, length M) are static metadata.
    textures: Any = ()
    texture_ids: tuple = ()       # albedo map per material
    bump_texture_ids: tuple = ()  # height map per material

    @property
    def width(self):
        return self.resolution[0]

    @property
    def height(self):
        return self.resolution[1]

    @property
    def pixel_count(self):
        return self.resolution[0] * self.resolution[1]


def empty_mesh(dtype=np.float32) -> TriMesh:
    return TriMesh(
        tri_verts=np.zeros((0, 3, 3), dtype=dtype),
        tri_geom=np.zeros((0,), dtype=np.int32),
    )
