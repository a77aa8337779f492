"""Scene parser vs the reference grammar (src/scene.cpp, README.md:203-246)."""

import os
import textwrap

import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.core import types as T
from pathtrace_tpu.core import vecmath as vm
from pathtrace_tpu.scene.parser import SceneParseError, derived_fov


class TestCornellFixture:
    def test_materials(self, cornell_scene):
        m = cornell_scene.materials
        assert m.count == 5
        np.testing.assert_allclose(m.emittance, [5, 0, 0, 0, 0])
        np.testing.assert_allclose(m.color[2], [0.85, 0.35, 0.35])  # red
        np.testing.assert_allclose(m.color[3], [0.35, 0.85, 0.35])  # green
        np.testing.assert_allclose(m.has_reflective, [0, 0, 0, 0, 1])
        np.testing.assert_allclose(m.spec_color[4], [0.98, 0.98, 0.98])

    def test_camera_block(self, cornell_scene):
        s = cornell_scene
        assert s.resolution == (800, 800)
        assert s.iterations == 5000
        assert s.trace_depth == 8
        assert s.image_name == "cornell"
        np.testing.assert_allclose(s.camera.position, [0, 5, 10.5])
        np.testing.assert_allclose(s.camera.view, [0, 0, -1])
        np.testing.assert_allclose(s.camera.up, [0, 1, 0])
        assert float(s.camera.fovy_deg) == 45.0

    def test_fovx_derivation(self, cornell_scene):
        # square image: fovx == fovy (src/scene.cpp:133-136)
        fovx, fovy = derived_fov(cornell_scene)
        assert abs(fovx - fovy) < 1e-5

    def test_geoms(self, cornell_scene):
        g = cornell_scene.geoms
        assert g.count == 7
        assert g.type == (T.CUBE,) * 6 + (T.SPHERE,)
        np.testing.assert_array_equal(g.material_id, [0, 1, 1, 1, 2, 3, 4])
        np.testing.assert_allclose(g.translation[6], [-1, 4, -1])
        np.testing.assert_allclose(g.scale[0], [3, 0.3, 3])
        np.testing.assert_allclose(g.rotation[2], [0, 0, 90])

    def test_transform_precompute_matches_reference_composition(
        self, cornell_scene
    ):
        # ceiling: TRANS (0,10,0) ROTAT (0,0,90) SCALE (.01,10,10)
        g = cornell_scene.geoms
        m = vm.trs_matrix(
            g.translation[2], g.rotation[2], g.scale[2], xp=np
        )
        # Rz(90) @ diag(.01,10,10): x' = -y*10 ... column 1 = (-10,0,0)
        np.testing.assert_allclose(
            m[:3, :3],
            [[0, -10, 0], [0.01, 0, 0], [0, 0, 10]],
            atol=1e-5,
        )
        np.testing.assert_allclose(m[:3, 3], [0, 10, 0])


class TestSphereFixture:
    def test_parse(self, sphere_scene):
        assert sphere_scene.geoms.count == 1
        assert sphere_scene.geoms.type == (T.SPHERE,)
        assert float(sphere_scene.materials.emittance[0]) == 5.0
        assert sphere_scene.image_name == "sphere"


class TestGrammar:
    BASE = textwrap.dedent(
        """\
        // comment line
        MATERIAL 0
        RGB         1 1 1
        SPECEX      0
        SPECRGB     0 0 0
        REFL        0
        REFR        0
        REFRIOR     0
        EMITTANCE   5

        CAMERA
        RES         100 50
        FOVY        45
        ITERATIONS  10
        DEPTH       4
        FILE        out
        EYE         0 0 5
        VIEW        0 0 -1
        UP          0 1 0

        OBJECT 0
        sphere
        material 0
        TRANS       0 0 0
        ROTAT       0 0 0
        SCALE       1 1 1
        """
    )

    def test_minimal_scene(self):
        s = pt.parse_scene(self.BASE)
        assert s.resolution == (100, 50)
        assert s.geoms.count == 1

    def test_crlf_line_endings(self):
        s = pt.parse_scene(self.BASE.replace("\n", "\r\n"))
        assert s.geoms.count == 1

    def test_non_sequential_material_id_rejected(self):
        with pytest.raises(SceneParseError, match="MATERIAL ID"):
            pt.parse_scene(self.BASE.replace("MATERIAL 0", "MATERIAL 1"))

    def test_non_sequential_object_id_rejected(self):
        with pytest.raises(SceneParseError, match="OBJECT ID"):
            pt.parse_scene(self.BASE.replace("OBJECT 0", "OBJECT 2"))

    def test_unknown_object_type_rejected(self):
        with pytest.raises(SceneParseError, match="unknown object type"):
            pt.parse_scene(self.BASE.replace("sphere\n", "teapot\n"))

    def test_dangling_material_reference_rejected(self):
        with pytest.raises(SceneParseError, match="references material"):
            pt.parse_scene(self.BASE.replace("material 0", "material 3"))

    def test_missing_camera_rejected(self):
        txt = self.BASE.replace("CAMERA", "XCAMERA")
        with pytest.raises(SceneParseError):
            pt.parse_scene(txt)

    def test_dof_extension(self):
        txt = self.BASE.replace("UP          0 1 0",
                                "UP          0 1 0\nAPERTURE    0.3\nFOCAL       7.5")
        s = pt.parse_scene(txt)
        assert float(s.camera.aperture) == pytest.approx(0.3)
        assert float(s.camera.focal_dist) == pytest.approx(7.5)

    def test_default_no_dof(self):
        s = pt.parse_scene(self.BASE)
        assert float(s.camera.aperture) == 0.0


class TestMeshExtension:
    def test_obj_mesh_loaded(self, tmp_path):
        obj = tmp_path / "tri.obj"
        obj.write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2 4 3\n"
        )
        txt = TestGrammar.BASE + textwrap.dedent(
            f"""
            OBJECT 1
            mesh {obj.name}
            material 0
            TRANS       0 0 -2
            ROTAT       0 0 0
            SCALE       1 1 1
            """
        )
        s = pt.parse_scene(txt, base_dir=str(tmp_path))
        assert s.geoms.count == 2
        assert s.geoms.type[1] == T.MESH
        assert s.mesh.count == 2
        np.testing.assert_array_equal(s.mesh.tri_geom, [1, 1])

    def test_obj_quad_fan_triangulation(self, tmp_path):
        obj = tmp_path / "quad.obj"
        obj.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        from pathtrace_tpu.scene.obj import load_obj

        tris, _uv = load_obj(str(obj))
        assert tris.shape == (2, 3, 3)

    def test_obj_negative_and_slash_indices(self, tmp_path):
        obj = tmp_path / "n.obj"
        obj.write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3/1/1 -2/2/2 -1/3/3\n"
        )
        from pathtrace_tpu.scene.obj import load_obj

        tris, _uv = load_obj(str(obj))
        assert tris.shape == (1, 3, 3)
        np.testing.assert_allclose(tris[0, 1], [1, 0, 0])
