"""ctypes bindings for the native runtime (scene parser, OBJ loader,
image writers).

The shared library builds on demand (``make`` in this directory); every
entry point has a pure-Python fallback, so the framework works without
a toolchain.  ``PT_NO_NATIVE=1`` disables native paths entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpathtrace_native.so")
_lib = None
_tried = False


class NativeError(RuntimeError):
    pass


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_DIR, check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it if needed; None if
    unavailable (no toolchain / PT_NO_NATIVE)."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried or os.environ.get("PT_NO_NATIVE"):
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    c = ctypes
    lib.pt_parse_scene_file.restype = c.c_void_p
    lib.pt_parse_scene_file.argtypes = [c.c_char_p]
    lib.pt_parse_scene_text.restype = c.c_void_p
    lib.pt_parse_scene_text.argtypes = [c.c_char_p]
    lib.pt_scene_error.restype = c.c_char_p
    lib.pt_scene_error.argtypes = [c.c_void_p]
    lib.pt_scene_counts.argtypes = [
        c.c_void_p, c.POINTER(c.c_int32), c.POINTER(c.c_int32)
    ]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.pt_scene_fill_materials.argtypes = [c.c_void_p] + [f32p] * 13
    lib.pt_scene_fill_geoms.argtypes = [c.c_void_p, i32p, i32p] + [f32p] * 4
    lib.pt_scene_fill_camera.argtypes = [
        c.c_void_p, i32p, f32p, i32p, i32p, f32p, f32p, f32p, f32p, f32p
    ]
    lib.pt_scene_mesh_path.restype = c.c_char_p
    lib.pt_scene_mesh_path.argtypes = [c.c_void_p, c.c_int32]
    lib.pt_scene_image_name.restype = c.c_char_p
    lib.pt_scene_image_name.argtypes = [c.c_void_p]
    lib.pt_scene_free.argtypes = [c.c_void_p]

    lib.pt_load_obj.restype = c.c_void_p
    lib.pt_load_obj.argtypes = [c.c_char_p]
    lib.pt_obj_error.restype = c.c_char_p
    lib.pt_obj_error.argtypes = [c.c_void_p]
    lib.pt_obj_tri_count.restype = c.c_int64
    lib.pt_obj_tri_count.argtypes = [c.c_void_p]
    lib.pt_obj_fill.argtypes = [c.c_void_p, f32p]
    lib.pt_obj_free.argtypes = [c.c_void_p]

    lib.pt_write_png.restype = c.c_int
    lib.pt_write_png.argtypes = [c.c_char_p, c.c_int32, c.c_int32, u8p]
    lib.pt_write_hdr.restype = c.c_int
    lib.pt_write_hdr.argtypes = [c.c_char_p, c.c_int32, c.c_int32, f32p]

    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def load_obj_native(path: str) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise NativeError("native library unavailable")
    h = lib.pt_load_obj(path.encode())
    try:
        err = lib.pt_obj_error(h)
        if err:
            raise NativeError(err.decode())
        t = int(lib.pt_obj_tri_count(h))
        out = np.zeros((t, 3, 3), np.float32)
        if t:
            lib.pt_obj_fill(h, out.reshape(-1))
        return out
    finally:
        lib.pt_obj_free(h)


def parse_scene_native(path: Optional[str] = None,
                       text: Optional[str] = None, base_dir: str = "."):
    """Parse via the C++ parser, returning the same Scene pytree as
    pathtrace_tpu.scene.parser (tests assert identity)."""
    from ..core import types as T
    from ..scene.parser import SceneParseError

    lib = get_lib()
    if lib is None:
        raise NativeError("native library unavailable")
    if path is not None:
        h = lib.pt_parse_scene_file(os.fspath(path).encode())
        base_dir = os.path.dirname(os.path.abspath(path))
        with open(path, "r") as f:
            text = f.read()
    else:
        h = lib.pt_parse_scene_text(text.encode())
    try:
        err = lib.pt_scene_error(h)
        if err:
            msg = err.decode()
            if "cannot open" in msg:
                raise FileNotFoundError(msg)
            raise SceneParseError(msg)
        import ctypes as c

        n_m = c.c_int32()
        n_g = c.c_int32()
        lib.pt_scene_counts(h, c.byref(n_m), c.byref(n_g))
        m, g = n_m.value, n_g.value

        color = np.zeros((m, 3), np.float32)
        spec_ex = np.zeros((m,), np.float32)
        spec_c = np.zeros((m, 3), np.float32)
        refl = np.zeros((m,), np.float32)
        refr = np.zeros((m,), np.float32)
        ior = np.zeros((m,), np.float32)
        emit = np.zeros((m,), np.float32)
        chk_s = np.zeros((m,), np.float32)
        chk_c = np.zeros((m, 3), np.float32)
        bmp_s = np.zeros((m,), np.float32)
        bmp_k = np.zeros((m,), np.float32)
        sss_s = np.zeros((m,), np.float32)
        sss_a = np.zeros((m, 3), np.float32)
        lib.pt_scene_fill_materials(
            h, color.reshape(-1), spec_ex, spec_c.reshape(-1), refl, refr,
            ior, emit, chk_s, chk_c.reshape(-1), bmp_s, bmp_k,
            sss_s, sss_a.reshape(-1),
        )

        gtype = np.zeros((g,), np.int32)
        gmat = np.zeros((g,), np.int32)
        gtr = np.zeros((g, 3), np.float32)
        gro = np.zeros((g, 3), np.float32)
        gsc = np.zeros((g, 3), np.float32)
        gvel = np.zeros((g, 3), np.float32)
        lib.pt_scene_fill_geoms(
            h, gtype, gmat, gtr.reshape(-1), gro.reshape(-1),
            gsc.reshape(-1), gvel.reshape(-1),
        )

        res = np.zeros((2,), np.int32)
        fovy = np.zeros((1,), np.float32)
        iters = np.zeros((1,), np.int32)
        depth = np.zeros((1,), np.int32)
        eye = np.zeros((3,), np.float32)
        view = np.zeros((3,), np.float32)
        up = np.zeros((3,), np.float32)
        aperture = np.zeros((1,), np.float32)
        focal = np.zeros((1,), np.float32)
        lib.pt_scene_fill_camera(
            h, res, fovy, iters, depth, eye, view, up, aperture, focal
        )
        image_name = lib.pt_scene_image_name(h).decode()

        mesh_tris, mesh_uvs, mesh_geom_ids = [], [], []
        any_uv = False
        for gi in range(g):
            if gtype[gi] == T.MESH:
                p = lib.pt_scene_mesh_path(h, gi)
                p = p.decode() if p else ""
                if not os.path.isabs(p):
                    p = os.path.join(base_dir, p)
                tris = load_obj_native(p)
                # vt coords come from the Python loader (the native one
                # emits vertices only); geometry stays native-parsed
                from ..scene.obj import load_obj as load_obj_py

                _, uvs = load_obj_py(p)
                if uvs is not None:
                    any_uv = True
                    mesh_uvs.append(uvs)
                else:
                    mesh_uvs.append(
                        np.zeros((tris.shape[0], 3, 2), np.float32)
                    )
                mesh_tris.append(tris)
                mesh_geom_ids.append(
                    np.full((tris.shape[0],), gi, np.int32)
                )
        if mesh_tris:
            from ..scene.bvh import with_bvh

            mesh = with_bvh(
                T.TriMesh(
                    tri_verts=np.concatenate(mesh_tris, 0),
                    tri_geom=np.concatenate(mesh_geom_ids, 0),
                    tri_uv=(
                        np.concatenate(mesh_uvs, 0) if any_uv else None
                    ),
                ),
                g,
            )
        else:
            mesh = T.empty_mesh()

        light_indices = tuple(
            int(i) for i in range(g) if emit[gmat[i]] > 0
        )
        scene = T.Scene(
            materials=T.Materials(
                color=color, spec_exponent=spec_ex, spec_color=spec_c,
                has_reflective=refl, has_refractive=refr, ior=ior,
                emittance=emit,
                checker_scale=chk_s if np.any(chk_s) else None,
                checker_color=chk_c if np.any(chk_s) else None,
                bump_scale=bmp_s if np.any(bmp_k) else None,
                bump_strength=bmp_k if np.any(bmp_k) else None,
                sss_sigma=sss_s if np.any(sss_s) else None,
                sss_albedo=sss_a if np.any(sss_s) else None,
            ),
            geoms=T.Geoms(
                type=tuple(int(t) for t in gtype), material_id=gmat,
                translation=gtr, rotation=gro, scale=gsc,
                velocity=gvel if np.any(gvel) else None,
            ),
            mesh=mesh,
            camera=T.Camera(
                position=eye, view=view, up=up,
                fovy_deg=np.float32(fovy[0]),
                aperture=np.float32(aperture[0]),
                focal_dist=np.float32(focal[0]),
            ),
            resolution=(int(res[0]), int(res[1])),
            trace_depth=int(depth[0]),
            iterations=int(iters[0]),
            image_name=image_name,
            light_indices=light_indices,
        )
        # TEXTURE/BUMPTEX semantics come from the same shared post-pass
        # as the Python parser (scene/textures.attach_textures) — the
        # C++ parser only skips those lines for block alignment
        from ..scene.textures import attach_textures

        return attach_textures(scene, text, base_dir=base_dir)
    finally:
        lib.pt_scene_free(h)


def write_png_native(path: str, rgb_u8: np.ndarray) -> None:
    lib = get_lib()
    if lib is None:
        raise NativeError("native library unavailable")
    rgb_u8 = np.ascontiguousarray(rgb_u8, dtype=np.uint8)
    h, w, _ = rgb_u8.shape
    rc = lib.pt_write_png(path.encode(), w, h, rgb_u8.reshape(-1))
    if rc != 0:
        raise NativeError(f"pt_write_png failed with code {rc}")


def write_hdr_native(path: str, img_f32: np.ndarray) -> None:
    lib = get_lib()
    if lib is None:
        raise NativeError("native library unavailable")
    img_f32 = np.ascontiguousarray(img_f32, dtype=np.float32)
    h, w, _ = img_f32.shape
    rc = lib.pt_write_hdr(path.encode(), w, h, img_f32.reshape(-1))
    if rc != 0:
        raise NativeError(f"pt_write_hdr failed with code {rc}")
