"""Native C++ runtime vs the Python implementations (bit-identical)."""

import os

import numpy as np
import pytest

from pathtrace_tpu.native import lib as N

pytestmark = pytest.mark.skipif(
    not N.available(), reason="native library unavailable (no toolchain)"
)


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tree_equal(a, b):
    import jax

    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert str(ta) == str(tb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestSceneParser:
    def test_cornell_identical_to_python(self, cornell_scene):
        sc = N.parse_scene_native(
            path=os.path.join(REPO, "scenes", "cornell.txt")
        )
        assert sc.resolution == cornell_scene.resolution
        assert sc.trace_depth == cornell_scene.trace_depth
        assert sc.iterations == cornell_scene.iterations
        assert sc.image_name == cornell_scene.image_name
        assert sc.geoms.type == cornell_scene.geoms.type
        assert sc.light_indices == cornell_scene.light_indices
        _tree_equal(sc, cornell_scene)

    def test_sphere_identical_to_python(self, sphere_scene):
        sc = N.parse_scene_native(
            path=os.path.join(REPO, "scenes", "sphere.txt")
        )
        _tree_equal(sc, sphere_scene)

    def test_errors_match_python_semantics(self):
        from pathtrace_tpu.scene.parser import SceneParseError

        bad = open(os.path.join(REPO, "scenes", "cornell.txt")).read()
        with pytest.raises(SceneParseError, match="OBJECT ID"):
            N.parse_scene_native(
                text=bad.replace("OBJECT 3", "OBJECT 9", 1)
            )
        with pytest.raises(FileNotFoundError):
            N.parse_scene_native(path="/nonexistent/scene.txt")

    def test_mesh_scene(self, tmp_path):
        obj = tmp_path / "tri.obj"
        obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        txt = (
            open(os.path.join(REPO, "scenes", "sphere.txt")).read()
            + f"\nOBJECT 1\nmesh {obj.name}\nmaterial 0\n"
            "TRANS 0 0 0\nROTAT 0 0 0\nSCALE 1 1 1\n"
        )
        sc = N.parse_scene_native(text=txt, base_dir=str(tmp_path))
        assert sc.mesh.count == 1
        import pathtrace_tpu as pt

        py = pt.parse_scene(txt, base_dir=str(tmp_path))
        _tree_equal(sc, py)


class TestObjLoader:
    def test_matches_python_loader(self, tmp_path):
        from pathtrace_tpu.scene.obj import load_obj

        obj = tmp_path / "m.obj"
        obj.write_text(
            "# comment\nv 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
            "f 1 2 3 4\nf -4/1 -3/2 -2/3\n"
        )
        a = N.load_obj_native(str(obj))
        b, b_uv = load_obj(str(obj))
        np.testing.assert_array_equal(a, b)
        # vt refs with no vt block in the file -> no UV table
        assert b_uv is None

    def test_missing_file(self):
        with pytest.raises(N.NativeError, match="cannot open"):
            N.load_obj_native("/nonexistent.obj")


class TestImageWriters:
    def test_png_roundtrip(self, tmp_path):
        from PIL import Image

        rgb = np.random.RandomState(0).randint(
            0, 256, (33, 47, 3), np.uint8
        )
        p = str(tmp_path / "n.png")
        N.write_png_native(p, rgb)
        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back, rgb)

    def test_hdr_matches_python_writer(self, tmp_path):
        from pathtrace_tpu.io import image_io

        img = np.abs(
            np.random.RandomState(1).randn(9, 13, 3)
        ).astype(np.float32)
        img[0, 0] = [7.5, 0.2, 0.01]
        pn = str(tmp_path / "n.hdr")
        pp = str(tmp_path / "p.hdr")
        N.write_hdr_native(pn, img)
        image_io.save_hdr(pp, img)
        a = open(pn, "rb").read()
        b = open(pp, "rb").read()
        # same header; pixel payloads equal up to +-1 mantissa rounding
        ha, _, pa = a.partition(b"\n\n")
        hb, _, pb = b.partition(b"\n\n")
        assert ha == hb
        da, db = pa.split(b"\n", 1)[1], pb.split(b"\n", 1)[1]
        va = np.frombuffer(da, np.uint8).astype(np.int16)
        vb = np.frombuffer(db, np.uint8).astype(np.int16)
        assert va.shape == vb.shape
        assert np.abs(va - vb).max() <= 1