"""Scene-file parser: the reference's exact text grammar, SoA output.

Format compatibility: the line-oriented token format of
``src/scene.cpp`` + README.md:203-246 — ``MATERIAL n`` followed by
exactly 7 property lines (``RGB SPECEX SPECRGB REFL REFR REFRIOR
EMITTANCE``, src/scene.cpp:157-178; note the code spells it SPECEX, not
the README's SPECX), ``CAMERA`` with 5 fixed lines (RES FOVY ITERATIONS
DEPTH FILE, src/scene.cpp:99-115) then a free block (EYE VIEW UP) until
a blank line, and ``OBJECT n`` with a type line, ``material m``, then
TRANS/ROTAT/SCALE until a blank line (src/scene.cpp:35-90).  Sequential
ID validation matches src/scene.cpp:37-39,149-151.  The shipped
``scenes/*.txt`` parse unchanged.

Extensions (all backwards compatible):

* object type ``mesh <path.obj>`` — the reserved keyword at
  README.md:236-237, resolved relative to the scene file;
* camera keys ``APERTURE r`` / ``FOCAL d`` in the free block enabling
  physically-based depth-of-field (README.md:100-101);
* object key ``MOTION vx vy vz`` — translation over the shutter
  interval, enabling motion blur by time-jittered samples (the
  README.md:109-110 extra; the reference reserved a ``frame`` argument
  for exactly this, src/main.cpp:102-103);
* material line 8 (optional) ``CHECKER scale r g b`` — procedural
  object-space checker texture alternating the albedo with (r,g,b)
  (the texture-mapping extra, README.md:103; the reference's 7-line
  material reader would skip this line harmlessly); likewise
  ``BUMP scale strength`` (bump mapping) and
  ``SSS sigma ar ag ab`` (random-walk subsurface scattering inside a
  refractive material, the README.md:112 extra).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..core import types as T
from ..core.constants import PI
from .obj import load_obj


class SceneParseError(ValueError):
    pass


def _safe_lines(text: str) -> List[str]:
    # CR/LF/CRLF-safe, like utilityCore::safeGetline (src/utilities.cpp:82-112)
    return text.replace("\r\n", "\n").replace("\r", "\n").split("\n")


def load_scene(path: str, native: Optional[bool] = None) -> T.Scene:
    """Load a scene file.  Uses the C++ parser when its shared library is
    available (pathtrace_tpu/native — identical output, asserted in
    tests/test_native.py); ``native=False`` or PT_NO_NATIVE=1 forces the
    Python path."""
    if native is not False:
        try:
            from ..native import lib as N

            if N.available():
                return N.parse_scene_native(path=path)
        except ImportError:
            pass
    with open(path, "r") as f:
        text = f.read()
    return parse_scene(text, base_dir=os.path.dirname(os.path.abspath(path)))


def parse_scene(text: str, base_dir: str = ".") -> T.Scene:
    lines = _safe_lines(text)
    pos = 0

    materials: List[dict] = []
    geoms: List[dict] = []
    camera: Optional[dict] = None
    mesh_tris: List[np.ndarray] = []
    mesh_uvs: List[np.ndarray] = []
    mesh_geom_ids: List[np.ndarray] = []
    any_mesh_uv = False

    def next_line():
        nonlocal pos
        if pos >= len(lines):
            return None
        line = lines[pos]
        pos += 1
        return line

    while True:
        line = next_line()
        if line is None:
            break
        toks = line.split()
        if not toks:
            continue
        if toks[0] == "MATERIAL":
            mat_id = int(toks[1])
            if mat_id != len(materials):
                raise SceneParseError(
                    f"MATERIAL ID {mat_id} does not match expected "
                    f"{len(materials)} (sequential IDs required)"
                )
            m = dict(
                color=(0.0, 0.0, 0.0), spec_exponent=0.0,
                spec_color=(0.0, 0.0, 0.0), has_reflective=0.0,
                has_refractive=0.0, ior=0.0, emittance=0.0,
                checker_scale=0.0, checker_color=(0.0, 0.0, 0.0),
                bump_scale=0.0, bump_strength=0.0,
                sss_sigma=0.0, sss_albedo=(0.0, 0.0, 0.0),
            )
            for _ in range(7):  # exactly 7 property lines (src/scene.cpp:157)
                t = (next_line() or "").split()
                if not t:
                    continue
                key = t[0]
                if key == "RGB":
                    m["color"] = (float(t[1]), float(t[2]), float(t[3]))
                elif key == "SPECEX":
                    m["spec_exponent"] = float(t[1])
                elif key == "SPECRGB":
                    m["spec_color"] = (float(t[1]), float(t[2]), float(t[3]))
                elif key == "REFL":
                    m["has_reflective"] = float(t[1])
                elif key == "REFR":
                    m["has_refractive"] = float(t[1])
                elif key == "REFRIOR":
                    m["ior"] = float(t[1])
                elif key == "EMITTANCE":
                    m["emittance"] = float(t[1])
            # optional extension lines after the 7 fixed ones:
            #   CHECKER scale r g b   (procedural texture)
            #   BUMP scale strength   (procedural bump map)
            # (malformed lines are skipped, like any unknown token —
            # matching the native parser and the reference's tolerance)
            while pos < len(lines):
                peek = lines[pos].split()
                if peek and peek[0] == "CHECKER" and len(peek) >= 5:
                    pos += 1
                    m["checker_scale"] = float(peek[1])
                    m["checker_color"] = (
                        float(peek[2]), float(peek[3]), float(peek[4])
                    )
                elif peek and peek[0] == "BUMP" and len(peek) >= 3:
                    pos += 1
                    m["bump_scale"] = float(peek[1])
                    m["bump_strength"] = float(peek[2])
                elif peek and peek[0] == "SSS" and len(peek) >= 5:
                    pos += 1
                    m["sss_sigma"] = float(peek[1])
                    m["sss_albedo"] = (
                        float(peek[2]), float(peek[3]), float(peek[4])
                    )
                elif peek and peek[0] in ("TEXTURE", "BUMPTEX"):
                    # image texture lines: consumed here so the block
                    # reader stays aligned; semantics live in the
                    # shared post-pass (scene/textures.attach_textures,
                    # used identically by the native-parser wrapper)
                    pos += 1
                else:
                    break
            materials.append(m)
        elif toks[0] == "OBJECT":
            obj_id = int(toks[1])
            if obj_id != len(geoms):
                raise SceneParseError(
                    f"OBJECT ID {obj_id} does not match expected "
                    f"{len(geoms)} (sequential IDs required)"
                )
            type_line = (next_line() or "").split()
            gtype, mesh_path = None, None
            if type_line:
                if type_line[0] == "sphere":
                    gtype = T.SPHERE
                elif type_line[0] == "cube":
                    gtype = T.CUBE
                elif type_line[0] == "mesh":
                    gtype = T.MESH
                    if len(type_line) < 2:
                        raise SceneParseError("mesh object requires an OBJ path")
                    mesh_path = type_line[1]
            if gtype is None:
                raise SceneParseError(f"unknown object type: {type_line}")
            mat_line = (next_line() or "").split()
            material_id = int(mat_line[1])
            g = dict(
                type=gtype, material_id=material_id,
                translation=(0.0, 0.0, 0.0), rotation=(0.0, 0.0, 0.0),
                scale=(1.0, 1.0, 1.0), velocity=(0.0, 0.0, 0.0),
            )
            while True:
                t_line = next_line()
                if t_line is None or not t_line.split():
                    break
                t = t_line.split()
                if t[0] == "TRANS":
                    g["translation"] = (float(t[1]), float(t[2]), float(t[3]))
                elif t[0] == "ROTAT":
                    g["rotation"] = (float(t[1]), float(t[2]), float(t[3]))
                elif t[0] == "SCALE":
                    g["scale"] = (float(t[1]), float(t[2]), float(t[3]))
                elif t[0] == "MOTION":
                    g["velocity"] = (
                        float(t[1]), float(t[2]), float(t[3])
                    )
            if gtype == T.MESH:
                p = mesh_path
                if not os.path.isabs(p):
                    p = os.path.join(base_dir, p)
                tris, uvs = load_obj(p)
                mesh_tris.append(tris)
                if uvs is not None:
                    any_mesh_uv = True
                    mesh_uvs.append(uvs)
                else:
                    mesh_uvs.append(
                        np.zeros((tris.shape[0], 3, 2), dtype=np.float32)
                    )
                mesh_geom_ids.append(
                    np.full((tris.shape[0],), len(geoms), dtype=np.int32)
                )
            geoms.append(g)
        elif toks[0] == "CAMERA":
            cam = dict(
                resolution=(800, 800), fovy=45.0, iterations=10, depth=8,
                file="render", eye=(0.0, 0.0, 0.0), view=(0.0, 0.0, -1.0),
                up=(0.0, 1.0, 0.0), aperture=0.0, focal=1.0,
            )
            for _ in range(5):  # RES FOVY ITERATIONS DEPTH FILE
                t = (next_line() or "").split()
                if not t:
                    continue
                if t[0] == "RES":
                    cam["resolution"] = (int(t[1]), int(t[2]))
                elif t[0] == "FOVY":
                    cam["fovy"] = float(t[1])
                elif t[0] == "ITERATIONS":
                    cam["iterations"] = int(t[1])
                elif t[0] == "DEPTH":
                    cam["depth"] = int(t[1])
                elif t[0] == "FILE":
                    cam["file"] = t[1]
            while True:
                t_line = next_line()
                if t_line is None or not t_line.split():
                    break
                t = t_line.split()
                if t[0] == "EYE":
                    cam["eye"] = (float(t[1]), float(t[2]), float(t[3]))
                elif t[0] == "VIEW":
                    cam["view"] = (float(t[1]), float(t[2]), float(t[3]))
                elif t[0] == "UP":
                    cam["up"] = (float(t[1]), float(t[2]), float(t[3]))
                elif t[0] == "APERTURE":
                    cam["aperture"] = float(t[1])
                elif t[0] == "FOCAL":
                    cam["focal"] = float(t[1])
            camera = cam

    if camera is None:
        raise SceneParseError("scene file has no CAMERA block")
    if not materials:
        raise SceneParseError("scene file has no materials")
    if not geoms:
        raise SceneParseError("scene file has no objects")
    for g in geoms:
        if not (0 <= g["material_id"] < len(materials)):
            raise SceneParseError(
                f"object references material {g['material_id']} "
                f"but only {len(materials)} materials are defined"
            )

    f32 = np.float32
    mats = T.Materials(
        color=np.asarray([m["color"] for m in materials], dtype=f32),
        spec_exponent=np.asarray([m["spec_exponent"] for m in materials], dtype=f32),
        spec_color=np.asarray([m["spec_color"] for m in materials], dtype=f32),
        has_reflective=np.asarray([m["has_reflective"] for m in materials], dtype=f32),
        has_refractive=np.asarray([m["has_refractive"] for m in materials], dtype=f32),
        ior=np.asarray([m["ior"] for m in materials], dtype=f32),
        emittance=np.asarray([m["emittance"] for m in materials], dtype=f32),
        checker_scale=(
            np.asarray([m["checker_scale"] for m in materials], dtype=f32)
            if any(m["checker_scale"] for m in materials) else None
        ),
        checker_color=(
            np.asarray([m["checker_color"] for m in materials], dtype=f32)
            if any(m["checker_scale"] for m in materials) else None
        ),
        bump_scale=(
            np.asarray([m["bump_scale"] for m in materials], dtype=f32)
            if any(m["bump_strength"] for m in materials) else None
        ),
        bump_strength=(
            np.asarray([m["bump_strength"] for m in materials], dtype=f32)
            if any(m["bump_strength"] for m in materials) else None
        ),
        sss_sigma=(
            np.asarray([m["sss_sigma"] for m in materials], dtype=f32)
            if any(m["sss_sigma"] for m in materials) else None
        ),
        sss_albedo=(
            np.asarray([m["sss_albedo"] for m in materials], dtype=f32)
            if any(m["sss_sigma"] for m in materials) else None
        ),
    )
    gs = T.Geoms(
        type=tuple(int(g["type"]) for g in geoms),  # static metadata
        material_id=np.asarray([g["material_id"] for g in geoms], dtype=np.int32),
        translation=np.asarray([g["translation"] for g in geoms], dtype=f32),
        rotation=np.asarray([g["rotation"] for g in geoms], dtype=f32),
        scale=np.asarray([g["scale"] for g in geoms], dtype=f32),
        velocity=(
            np.asarray([g["velocity"] for g in geoms], dtype=f32)
            if any(any(v) for v in (g["velocity"] for g in geoms))
            else None  # static scene: no motion-blur cost anywhere
        ),
    )
    if mesh_tris:
        from .bvh import with_bvh

        mesh = with_bvh(
            T.TriMesh(
                tri_verts=np.concatenate(mesh_tris, axis=0).astype(f32),
                tri_geom=np.concatenate(mesh_geom_ids, axis=0),
                tri_uv=(
                    np.concatenate(mesh_uvs, axis=0).astype(f32)
                    if any_mesh_uv else None
                ),
            ),
            len(geoms),
        )
    else:
        mesh = T.empty_mesh()

    cam_t = T.Camera(
        position=np.asarray(camera["eye"], dtype=f32),
        view=np.asarray(camera["view"], dtype=f32),
        up=np.asarray(camera["up"], dtype=f32),
        fovy_deg=np.asarray(camera["fovy"], dtype=f32),
        aperture=np.asarray(camera["aperture"], dtype=f32),
        focal_dist=np.asarray(camera["focal"], dtype=f32),
    )
    light_indices = tuple(
        i for i, g in enumerate(geoms)
        if materials[g["material_id"]]["emittance"] > 0
    )
    from .textures import attach_textures

    scene = T.Scene(
        materials=mats, geoms=gs, mesh=mesh, camera=cam_t,
        resolution=tuple(camera["resolution"]),
        trace_depth=int(camera["depth"]),
        iterations=int(camera["iterations"]),
        image_name=camera["file"],
        light_indices=light_indices,
    )
    return attach_textures(scene, text, base_dir=base_dir)


def derived_fov(scene: T.Scene):
    """(fovx_deg, fovy_deg) with fovx derived from aspect, matching
    src/scene.cpp:133-136."""
    import math

    fovy = float(scene.camera.fovy_deg)
    yscaled = math.tan(fovy * (PI / 180.0))
    xscaled = (yscaled * scene.width) / scene.height
    fovx = math.atan(xscaled) * 180.0 / PI
    return fovx, fovy
