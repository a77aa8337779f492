"""Image texture mapping + UVs (TEXTURE/BUMPTEX extension).

Reference spec: PBRT 10.4 texture maps and PBRT 9.3 bump maps from the
extras list (/root/reference/README.md:103-106).  Covers: the bilinear
sampler against closed forms, UV chart conventions per primitive,
parser/attach plumbing (both parsers), jnp-vs-oracle parity on the
textured cornell scene, and texture-texel differentiability.
"""

import dataclasses as dc
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.scene.textures import (
    load_texture, sample_texture, scan_texture_lines,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tex_scene():
    return pt.load_scene(
        os.path.join(REPO, "scenes", "cornell_tex.txt"), native=False
    )


class TestSampler:
    def test_texel_centers_exact(self):
        tex = np.arange(4 * 4 * 3, dtype=np.float32).reshape(4, 4, 3)
        # u,v at texel centers must return the texel exactly
        for y in range(4):
            for x in range(4):
                u = (x + 0.5) / 4.0
                v = (y + 0.5) / 4.0
                out = sample_texture(tex, np.float32(u), np.float32(v),
                                     xp=np)
                np.testing.assert_allclose(out, tex[y, x], rtol=1e-6)

    def test_bilinear_midpoint(self):
        tex = np.zeros((2, 2, 3), np.float32)
        tex[0, 0] = 1.0
        # midpoint of 4 texels averages them
        out = sample_texture(tex, np.float32(0.5), np.float32(0.5),
                             xp=np)
        np.testing.assert_allclose(out, 0.25, rtol=1e-6)

    def test_wrap_repeat(self):
        tex = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
        u = np.float32(0.3)
        v = np.float32(0.7)
        a = sample_texture(tex, u, v, xp=np)
        b = sample_texture(tex, u + 1.0, v - 2.0, xp=np)
        np.testing.assert_allclose(a, b, rtol=1e-5)

    def test_jnp_matches_numpy(self):
        tex = np.random.RandomState(1).rand(16, 16, 3).astype(np.float32)
        u = np.random.RandomState(2).rand(64).astype(np.float32) * 2 - 0.5
        v = np.random.RandomState(3).rand(64).astype(np.float32) * 2 - 0.5
        a = sample_texture(tex, u, v, xp=np)
        b = np.asarray(jax.jit(
            lambda uu, vv: sample_texture(tex, uu, vv, xp=jnp)
        )(u, v))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


class TestUVCharts:
    def test_sphere_uv_closed_form(self):
        from pathtrace_tpu.ops.intersect import _one_sphere

        eye = np.eye(4, dtype=np.float32)
        # ray hitting the unit sphere from +x: object hit (0.5,0,0)
        # -> u = 0.5 + atan2(0, 0.5)/2pi = 0.5, v = 0.5
        o = np.array([[2.0, 0.0, 0.0]], np.float32)
        d = np.array([[-1.0, 0.0, 0.0]], np.float32)
        *_, uv = _one_sphere(o, d, eye, eye, eye, xp=np, want_uv=True)
        np.testing.assert_allclose(uv[0], [0.5, 0.5], atol=1e-4)
        # from +y (pole): v -> 1
        o = np.array([[0.0, 2.0, 0.0]], np.float32)
        d = np.array([[0.0, -1.0, 0.0]], np.float32)
        *_, uv = _one_sphere(o, d, eye, eye, eye, xp=np, want_uv=True)
        assert uv[0, 1] > 0.99

    def test_box_uv_faces(self):
        from pathtrace_tpu.ops.intersect import _one_box

        eye = np.eye(4, dtype=np.float32)
        # +z face hit at object (0.1, -0.2, 0.5): u=x+.5, v=y+.5
        o = np.array([[0.1, -0.2, 2.0]], np.float32)
        d = np.array([[0.0, 0.0, -1.0]], np.float32)
        *_, uv = _one_box(o, d, eye, eye, xp=np, want_uv=True)
        np.testing.assert_allclose(uv[0], [0.6, 0.3], atol=1e-3)
        # +x face: u=z+.5, v=y+.5
        o = np.array([[2.0, 0.25, -0.1]], np.float32)
        d = np.array([[-1.0, 0.0, 0.0]], np.float32)
        *_, uv = _one_box(o, d, eye, eye, xp=np, want_uv=True)
        np.testing.assert_allclose(uv[0], [0.4, 0.75], atol=1e-3)

    def test_triangle_vt_interpolation(self):
        from pathtrace_tpu.ops.intersect import _intersect_one_triangle

        eye = np.eye(4, dtype=np.float32)
        tri = np.array(
            [[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float32
        )
        uv3 = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
        # hit at (0.5, 1.0, 0): barycentric u=0.25 (v1), v=0.5 (v2)
        o = np.array([[0.5, 1.0, 1.0]], np.float32)
        d = np.array([[0.0, 0.0, -1.0]], np.float32)
        *_, uv = _intersect_one_triangle(
            o, d, tri, eye, eye, eye, xp=np, uv3=uv3
        )
        np.testing.assert_allclose(uv[0], [0.25, 0.5], atol=1e-4)


class TestParsing:
    def test_scan_lines(self):
        text = (
            "MATERIAL 0\nRGB 1 1 1\n\nMATERIAL 1\nRGB 1 1 1\n"
            "TEXTURE a.png\nBUMPTEX b.png 0.7\n\nOBJECT 0\ncube\n"
            "material 0\nTEXTURE not_in_material.png\n"
        )
        info = scan_texture_lines(text)
        assert info[0] == (None, None, 0.0)
        assert info[1] == ("a.png", "b.png", 0.7)
        assert len(info) == 2

    def test_scene_attach(self, tex_scene):
        assert len(tex_scene.textures) == 2
        assert tex_scene.texture_ids == (-1, -1, -1, -1, -1, 0, -1)
        assert tex_scene.bump_texture_ids == (-1, -1, -1, -1, -1, -1, 1)
        assert tex_scene.textures[0].shape == (32, 32, 3)
        s = np.asarray(tex_scene.materials.bumptex_strength)
        assert s[6] == pytest.approx(0.6)

    def test_load_texture_full_size_and_safety_clamp(self, tmp_path):
        from PIL import Image

        # normal maps load at full resolution (the old 128 clamp
        # silently downsampled everything — VERDICT r2 missing #4);
        # only the 2048 safety clamp shrinks
        p = tmp_path / "big.png"
        Image.fromarray(np.zeros((300, 200, 3), np.uint8)).save(p)
        t = load_texture(str(p))
        assert t.shape[:2] == (300, 200)
        p2 = tmp_path / "huge.png"
        Image.fromarray(np.zeros((60, 4096, 3), np.uint8)).save(p2)
        t2 = load_texture(str(p2))
        assert max(t2.shape[:2]) == 2048

    def test_native_parser_identical(self, tex_scene):
        from pathtrace_tpu.native import lib as N

        if not N.available():
            pytest.skip("native library unavailable")
        sc = N.parse_scene_native(
            path=os.path.join(REPO, "scenes", "cornell_tex.txt")
        )
        la, ta = jax.tree.flatten(sc)
        lb, tb = jax.tree.flatten(tex_scene)
        assert str(ta) == str(tb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_obj_vt_parsing(self, tmp_path):
        from pathtrace_tpu.scene.obj import load_obj

        p = tmp_path / "quad.obj"
        p.write_text(
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
            "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
            "f 1/1 2/2 3/3 4/4\n"
        )
        tv, tu = load_obj(str(p))
        assert tv.shape == (2, 3, 3)
        assert tu.shape == (2, 3, 2)
        np.testing.assert_allclose(tu[0], [[0, 0], [1, 0], [1, 1]])


class TestRenderParity:
    def test_jnp_matches_oracle(self, tex_scene):
        from pathtrace_tpu.reference_oracle import oracle_iteration
        from pathtrace_tpu.render.integrator import trace_pixels

        small = dc.replace(
            tex_scene, resolution=(24, 24), trace_depth=4
        )
        pix = jnp.arange(small.pixel_count, dtype=jnp.int32)
        r, _ = jax.jit(
            lambda: trace_pixels(small, 1, pix, remat=False)
        )()
        ro, _ = oracle_iteration(small, 1)
        d = np.abs(np.asarray(r) - ro)
        assert (d.max(-1) > 1e-3).mean() < 0.005

    def test_texture_changes_image(self, tex_scene):
        """The textured sphere must actually show the texture (vs a
        plain white sphere)."""
        from pathtrace_tpu.render.integrator import trace_pixels

        # nee=True so any textured hit contributes directly — at tiny
        # res + depth 3, fixed-RNG BSDF paths through the textured
        # objects can miss the light entirely (diff would be 0)
        small = dc.replace(
            tex_scene, resolution=(24, 24), trace_depth=3
        )
        plain = dc.replace(small, textures=(
            np.ones_like(small.textures[0]),
            small.textures[1],
        ))
        pix = jnp.arange(small.pixel_count, dtype=jnp.int32)
        r1, _ = jax.jit(
            lambda: trace_pixels(small, 1, pix, remat=False, nee=True)
        )()
        r2, _ = jax.jit(
            lambda: trace_pixels(plain, 1, pix, remat=False, nee=True)
        )()
        assert float(jnp.abs(r1 - r2).max()) > 0.05

    def test_texel_gradients(self, tex_scene):
        from pathtrace_tpu.render.integrator import trace_pixels

        small = dc.replace(
            tex_scene, resolution=(16, 16), trace_depth=3
        )
        pix = jnp.arange(small.pixel_count, dtype=jnp.int32)

        def loss(tex0):
            sc = dc.replace(
                small, textures=(tex0,) + small.textures[1:]
            )
            r, _ = trace_pixels(sc, 1, pix, remat=False, nee=True)
            return jnp.sum(r)

        g = jax.jit(jax.grad(loss))(jnp.asarray(small.textures[0]))
        assert float(jnp.abs(g).max()) > 0

    def test_bumptex_perturbs_normals(self, tex_scene):
        """Image bump must change the render vs zero strength."""
        from pathtrace_tpu.render.integrator import trace_pixels

        small = dc.replace(
            tex_scene, resolution=(24, 24), trace_depth=3
        )
        flat = dc.replace(
            small,
            materials=dc.replace(
                small.materials,
                bumptex_strength=np.zeros_like(
                    np.asarray(small.materials.bumptex_strength)
                ),
            ),
        )
        pix = jnp.arange(small.pixel_count, dtype=jnp.int32)
        r1, _ = jax.jit(
            lambda: trace_pixels(small, 1, pix, remat=False, nee=True)
        )()
        r2, _ = jax.jit(
            lambda: trace_pixels(flat, 1, pix, remat=False, nee=True)
        )()
        assert float(jnp.abs(r1 - r2).max()) > 1e-3


class TestPallasInKernel:
    """Albedo textures run INSIDE the megakernel (KTEX_MAX_SIDE /
    KTEX_MAX_TEXELS budgets): u8-packed word tables + the row-sweep
    lane-gather (megakernel._tex_fetch_multi), one bilinear sample per
    bounce after the intersection fold.  Engine parity on every
    textured primitive class; fallback conditions still hold."""

    def test_tex_fetch_exact(self):
        """_tex_fetch/_tex_fetch_multi return EXACTLY flat[idx] for
        random indices across the whole table — the direct-oracle
        check on the fetch primitive itself.  This is the test that
        catches wrong-row gathers: a round-4 probe of a two-level
        (sublane, lane) in-vreg gather COMPILED for v5e but gathered
        chunk[r[s, l'[s,l]], l'[s,l]] instead of chunk[r[s,l], l'[s,l]]
        — plausible images, wrong texels, invisible to threshold
        parity tests on scenes where few rays hit textured geoms."""
        import dataclasses as _dc

        import jax.numpy as jnp

        from pathtrace_tpu.ops.pallas.megakernel import (
            _pack_textures, _tex_fetch, _tex_fetch_multi,
        )

        rs = np.random.RandomState(3)
        texes = [
            (rs.randint(0, 256, size=(40, 56, 3)) / 255.0).astype(
                np.float32
            ),
            (rs.randint(0, 256, size=(16, 16, 3)) / 255.0).astype(
                np.float32
            ),
        ]
        scene = _dc.replace(
            pt.load_scene("scenes/cornell.txt"),
            textures=tuple(texes),
        )
        texs = _pack_textures(scene, (0, 1), packed=True)
        for c in range(3):
            flat = np.concatenate([t[:, :, c].reshape(-1)
                                   for t in texes])
            idx = rs.randint(0, flat.shape[0], size=(32, 128)).astype(
                np.int32
            )
            got = np.asarray(_tex_fetch(jnp.asarray(texs[c]),
                                        jnp.asarray(idx)))
            np.testing.assert_array_equal(got, flat[idx])
            g4 = _tex_fetch_multi(
                jnp.asarray(texs[c]),
                tuple(jnp.asarray(np.roll(idx, k)) for k in range(4)),
            )
            for k in range(4):
                np.testing.assert_array_equal(
                    np.asarray(g4[k]), flat[np.roll(idx, k)]
                )

    SCENE = """\
MATERIAL 0
RGB         1 1 1
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   5

MATERIAL 1
RGB         .9 .9 .9
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   0
TEXTURE     t32.png

CAMERA
RES         40 40
FOVY        45
ITERATIONS  4
DEPTH       4
FILE        ktex
EYE         0 1 8
VIEW        0 0 -1
UP          0 1 0

OBJECT 0
cube
material 0
TRANS       0 6 0
ROTAT       0 0 0
SCALE       4 .3 4

OBJECT 1
cube
material 1
TRANS       -2 0 0
ROTAT       0 25 0
SCALE       2.2 2.2 2.2

OBJECT 2
sphere
material 1
TRANS       2 0 1
ROTAT       0 0 0
SCALE       2 2 2
"""

    @pytest.fixture(scope="class")
    def ktex_dir(self, tmp_path_factory):
        from PIL import Image

        td = tmp_path_factory.mktemp("ktex")
        rs = np.random.RandomState(3)
        Image.fromarray(
            (rs.rand(32, 32, 3) * 255).astype(np.uint8)
        ).save(str(td / "t32.png"))
        (td / "quad.obj").write_text(
            "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
            "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
            "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n"
        )
        return str(td)

    def test_primitives_parity(self, ktex_dir):
        """Textured cube + sphere: kernel (interpret) vs XLA engine.
        The sphere UV chart uses the kernel's polynomial atan2/asin
        (Mosaic has no transcendental lowering) — error ~1e-7 rad, so
        only boundary-texel tie flips may differ."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            _tex_in_kernel, _xla_fallback, pathtrace_iteration_pallas,
        )

        scene = pt.parse_scene(self.SCENE, base_dir=ktex_dir)
        assert _tex_in_kernel(scene) and not _xla_fallback(scene)
        rp, _ = pathtrace_iteration_pallas(scene, 1, interpret=True)
        rj, _ = pt.pathtrace_iteration(scene, 1)
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(-1)
        assert (d > 2e-3).mean() < 0.005
        # the texture is actually sampled (disable -> image changes)
        flat = dc.replace(scene, texture_ids=(-1, -1))
        rp2, _ = pathtrace_iteration_pallas(flat, 1, interpret=True)
        assert not np.array_equal(np.asarray(rp), np.asarray(rp2))

    def test_mesh_vt_parity(self, ktex_dir):
        """Textured mesh through BOTH triangle paths (BVH leaf and the
        legacy fori_loop fold): vt interpolation is pure arithmetic, so
        parity is exact up to f32 tie flips."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_iteration_pallas,
        )

        text = self.SCENE + (
            "\nOBJECT 3\nmesh quad.obj\nmaterial 1\n"
            "TRANS       0 0 2\nROTAT       0 15 0\nSCALE       1.5 1.5 1.5\n"
        )
        scene = pt.parse_scene(text, base_dir=ktex_dir)
        assert scene.mesh.tri_uv is not None and scene.mesh.bvh_meta
        rj, _ = pt.pathtrace_iteration(scene, 1)
        rp, _ = pathtrace_iteration_pallas(scene, 1, interpret=True)
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(-1)
        assert (d > 2e-3).mean() < 0.005
        legacy = dc.replace(
            scene,
            mesh=dc.replace(scene.mesh, bvh_nodes=None, bvh_order=None,
                            bvh_meta=()),
        )
        rp2, _ = pathtrace_iteration_pallas(legacy, 1, interpret=True)
        d2 = np.abs(np.asarray(rp2) - np.asarray(rj)).max(-1)
        assert (d2 > 2e-3).mean() < 0.005

    def test_bumptex_in_kernel(self, tex_scene):
        """cornell_tex.txt (albedo TEXTURE + BUMPTEX) runs fully
        in-kernel as of round 2 — engine parity, and the bump strength
        actually perturbs the kernel's image.  material_grads_pallas
        still rejects textures."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            _tex_in_kernel, _xla_fallback, material_grads_pallas,
            pathtrace_iteration_pallas,
        )

        assert _tex_in_kernel(tex_scene) and not _xla_fallback(tex_scene)
        small = dc.replace(tex_scene, resolution=(48, 48), trace_depth=4)
        rp, _ = pathtrace_iteration_pallas(small, 1, interpret=True)
        rj, _ = pt.pathtrace_iteration(small, 1)
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(-1)
        assert (d > 2e-3).mean() < 0.005
        flat = dc.replace(
            small,
            materials=dc.replace(
                small.materials,
                bumptex_strength=np.zeros_like(
                    np.asarray(small.materials.bumptex_strength)
                ),
            ),
        )
        rp2, _ = pathtrace_iteration_pallas(flat, 1, interpret=True)
        assert not np.array_equal(np.asarray(rp), np.asarray(rp2))
        with pytest.raises(NotImplementedError, match="texture"):
            material_grads_pallas(
                small, np.ones((small.pixel_count, 3), np.float32), 1, 1
            )

    def test_oversize_fallback_exact(self, ktex_dir):
        """Scenes the in-kernel tables cannot represent fall back to
        the XLA engine bit-for-bit.  Round 5: sizes up to the loader
        clamp all stream in-kernel now, so the single-map fallback
        route is an off-u8-grid float texture (the packed-word tables
        are exact only on the u8 grid)."""
        from PIL import Image

        from pathtrace_tpu.ops.pallas.megakernel import (
            _tex_in_kernel, _xla_fallback, pathtrace_iteration_pallas,
        )

        rs = np.random.RandomState(13)
        Image.fromarray(
            (rs.rand(64, 64, 3) * 255).astype(np.uint8)
        ).save(os.path.join(ktex_dir, "big2.png"))
        text = self.SCENE.replace("t32.png", "big2.png")
        scene = pt.parse_scene(text, base_dir=ktex_dir)
        # nudge off the u8 grid: quantized tables cannot represent it
        scene = dc.replace(scene, textures=tuple(
            t * np.float32(0.5) for t in scene.textures
        ))
        assert _xla_fallback(scene) and not _tex_in_kernel(scene)
        small = dc.replace(scene, resolution=(16, 16), trace_depth=2)
        rp, _ = pathtrace_iteration_pallas(small, 1)
        rj, _ = pt.pathtrace_iteration(small, 1)
        np.testing.assert_array_equal(np.asarray(rp), np.asarray(rj))

    def test_atan2_asin_polynomials(self):
        """The kernel's transcendental stand-ins vs numpy, full range."""
        from pathtrace_tpu.ops.pallas.megakernel import _asin, _atan2

        rs = np.random.RandomState(0)
        y = (rs.rand(32, 128) * 4 - 2).astype(np.float32)
        x = (rs.rand(32, 128) * 4 - 2).astype(np.float32)
        got = np.asarray(jax.jit(_atan2)(y, x))
        np.testing.assert_allclose(got, np.arctan2(y, x), atol=5e-7)
        t = (rs.rand(32, 128) * 2 - 1).astype(np.float32)
        got = np.asarray(jax.jit(_asin)(t))
        np.testing.assert_allclose(got, np.arcsin(t), atol=1e-5)

    def test_tiny_texture_pad(self, ktex_dir):
        """A texture with fewer texels than the tile sublane count
        (4x4 = 16 < SUB=32) must not break the gather's table/index
        shapes (review finding: negative pad)."""
        from PIL import Image

        from pathtrace_tpu.ops.pallas.megakernel import (
            _tex_in_kernel, pathtrace_iteration_pallas,
        )

        rs = np.random.RandomState(9)
        Image.fromarray(
            (rs.rand(4, 4, 3) * 255).astype(np.uint8)
        ).save(os.path.join(ktex_dir, "t4.png"))
        text = self.SCENE.replace("t32.png", "t4.png")
        scene = pt.parse_scene(text, base_dir=ktex_dir)
        assert _tex_in_kernel(scene)
        rp, _ = pathtrace_iteration_pallas(scene, 1, interpret=True)
        rj, _ = pt.pathtrace_iteration(scene, 1)
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(-1)
        assert (d > 2e-3).mean() < 0.005

    def test_checker_plus_texture_composition(self, ktex_dir):
        """CHECKER + TEXTURE on one material: the integrator applies
        the texture first and checker REPLACES on odd cells
        (integrator._bounce order) — the kernel must match (review
        finding: it multiplied the texel into checker cells)."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            _tex_in_kernel, pathtrace_iteration_pallas,
        )

        text = self.SCENE.replace(
            "EMITTANCE   0\nTEXTURE     t32.png",
            "EMITTANCE   0\nCHECKER     1.5 .1 .1 .6\n"
            "TEXTURE     t32.png",
        )
        scene = pt.parse_scene(text, base_dir=ktex_dir)
        assert _tex_in_kernel(scene)
        assert scene.materials.checker_scale is not None
        rp, _ = pathtrace_iteration_pallas(scene, 1, interpret=True)
        rj, _ = pt.pathtrace_iteration(scene, 1)
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(-1)
        assert (d > 2e-3).mean() < 0.005

    def test_eligibility_caps(self, ktex_dir, tmp_path):
        """Unreferenced textures neither disqualify nor pack.  Round
        5: any loader-accepted SIZE streams in-kernel, so the
        disqualifier exercised here is an off-u8-grid float texture —
        unreferenced it must not matter, referenced it must route the
        scene to the XLA engine."""
        from PIL import Image

        from pathtrace_tpu.ops.pallas.megakernel import (
            _tex_in_kernel, _tex_used, _xla_fallback,
        )

        rs = np.random.RandomState(11)
        Image.fromarray(
            (rs.rand(64, 64, 3) * 255).astype(np.uint8)
        ).save(os.path.join(ktex_dir, "big.png"))
        # an unreferenced material with a disqualifying (off-grid)
        # texture: scene still runs in-kernel (per-material scan)
        text = self.SCENE + (
            "\nMATERIAL 2\nRGB 1 1 1\nSPECEX 0\nSPECRGB 0 0 0\n"
            "REFL 0\nREFR 0\nREFRIOR 0\nEMITTANCE 0\n"
            "TEXTURE big.png\n"
        )
        scene = pt.parse_scene(text, base_dir=ktex_dir)
        used = _tex_used(scene)
        assert len(used) == 1
        off = tuple(
            t if i in used else t * np.float32(0.5)
            for i, t in enumerate(scene.textures)
        )
        scene = dc.replace(scene, textures=off)
        assert _tex_in_kernel(scene) and not _xla_fallback(scene)
        # the same off-grid texture REFERENCED -> fallback
        text2 = self.SCENE.replace("t32.png", "big.png")
        scene2 = pt.parse_scene(text2, base_dir=ktex_dir)
        scene2 = dc.replace(scene2, textures=tuple(
            t * np.float32(0.5) for t in scene2.textures
        ))
        assert not _tex_in_kernel(scene2) and _xla_fallback(scene2)

    def test_oversize_bumptex_falls_back(self, ktex_dir):
        """A BUMPTEX map the in-kernel tables cannot represent routes
        the scene to the XLA engine (regression guard for _tex_used's
        bump-id inclusion in the eligibility check).  Round 5: any
        loader-accepted SIZE streams in-kernel (a 320^2 map no longer
        falls back — TestStreamTex), so the bump-map disqualifier is
        an off-u8-grid float height map."""
        from PIL import Image

        from pathtrace_tpu.ops.pallas.megakernel import (
            _tex_in_kernel, _xla_fallback,
        )

        rs = np.random.RandomState(17)
        Image.fromarray(
            (rs.rand(64, 64, 3) * 255).astype(np.uint8)
        ).save(os.path.join(ktex_dir, "bigbump.png"))
        text = self.SCENE.replace(
            "EMITTANCE   0\nTEXTURE     t32.png",
            "EMITTANCE   0\nBUMPTEX     bigbump.png 0.5",
        )
        scene = pt.parse_scene(text, base_dir=ktex_dir)
        scene = dc.replace(scene, textures=tuple(
            t * np.float32(0.5) for t in scene.textures
        ))
        assert _xla_fallback(scene) and not _tex_in_kernel(scene)

    def test_128_texture_in_kernel(self, ktex_dir):
        """u8-packed chunked tables raise the in-kernel ceiling to
        128x128 / 16,384 texels (VERDICT r2 missing #4; the binding
        limit is tpu.dynamic_gather's single-vreg source — _tex_fetch)
        — and stay bit-identical to the planes engine's f32 gather
        because loader texels are u8/255."""
        from PIL import Image

        from pathtrace_tpu.ops.pallas.megakernel import (
            _tex_in_kernel, _xla_fallback, pathtrace_iteration_pallas,
        )
        from pathtrace_tpu.render.plane_engine import (
            pathtrace_iteration_planes,
        )

        rs = np.random.RandomState(23)
        Image.fromarray(
            (rs.rand(128, 128, 3) * 255).astype(np.uint8)
        ).save(os.path.join(ktex_dir, "t128.png"))
        text = self.SCENE.replace("t32.png", "t128.png")
        scene = pt.parse_scene(text, base_dir=ktex_dir)
        assert _tex_in_kernel(scene) and not _xla_fallback(scene)
        small = dc.replace(scene, resolution=(16, 16), trace_depth=2)
        rk, _ = pathtrace_iteration_pallas(small, 1, interpret=True)
        rp, _ = pathtrace_iteration_planes(small, 1)
        np.testing.assert_array_equal(np.asarray(rk), np.asarray(rp))

    def test_256_texture_in_kernel(self, ktex_dir):
        """Round 4: the in-kernel mechanism is the linear word-row
        sweep (one masked row select per 128-texel word row, amortized
        across the four bilinear taps); a two-level sublane-then-lane
        vreg gather was probed and REJECTED — it gathers the wrong row
        on TPU (see _tex_fetch_multi's docstring).  The 256x256 /
        65,536-texel ceiling is the measured compile-time bound of the
        unrolled sweep, not a gather redesign (VERDICT r3 item 1;
        BENCHMARKS.md "Texture crossover").  Bit-parity vs planes."""
        from PIL import Image

        from pathtrace_tpu.ops.pallas.megakernel import (
            _tex_in_kernel, _xla_fallback, pathtrace_iteration_pallas,
        )
        from pathtrace_tpu.render.plane_engine import (
            pathtrace_iteration_planes,
        )

        rs = np.random.RandomState(29)
        Image.fromarray(
            (rs.rand(256, 256, 3) * 255).astype(np.uint8)
        ).save(os.path.join(ktex_dir, "t256.png"))
        text = self.SCENE.replace("t32.png", "t256.png")
        scene = pt.parse_scene(text, base_dir=ktex_dir)
        assert _tex_in_kernel(scene) and not _xla_fallback(scene)
        small = dc.replace(scene, resolution=(16, 16), trace_depth=2)
        rk, _ = pathtrace_iteration_pallas(small, 1, interpret=True)
        rp, _ = pathtrace_iteration_planes(small, 1)
        np.testing.assert_array_equal(np.asarray(rk), np.asarray(rp))

    def test_non_u8_grid_texture_falls_back(self, ktex_dir):
        """A hand-built f32 texture off the u8 grid cannot be packed
        exactly -> the scene routes to the planes engine instead of
        being silently quantized."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            _tex_in_kernel, _xla_fallback,
        )

        scene = pt.parse_scene(self.SCENE, base_dir=ktex_dir)
        assert _tex_in_kernel(scene)
        texs = tuple(
            np.asarray(t) + np.float32(1e-4) for t in scene.textures
        )
        off_grid = dc.replace(scene, textures=texs)
        assert not _tex_in_kernel(off_grid) and _xla_fallback(off_grid)

    def test_unreferenced_textures_stay_in_kernel(self, ktex_dir):
        """A scene whose ONLY declared textures sit on unreferenced
        materials runs the kernel untextured (no fallback, no tables)."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            _tex_statics, _xla_fallback, pathtrace_iteration_pallas,
        )

        text = self.SCENE.replace("TEXTURE     t32.png\n", "") + (
            "\nMATERIAL 2\nRGB 1 1 1\nSPECEX 0\nSPECRGB 0 0 0\n"
            "REFL 0\nREFR 0\nREFRIOR 0\nEMITTANCE 0\n"
            "TEXTURE t32.png\n"
        )
        scene = pt.parse_scene(text, base_dir=ktex_dir)
        assert any(t >= 0 for t in scene.texture_ids)  # declared...
        assert not _xla_fallback(scene)                # ...but unused
        assert _tex_statics(scene) == ((), (), ())
        rp, _ = pathtrace_iteration_pallas(scene, 1, interpret=True)
        rj, _ = pt.pathtrace_iteration(scene, 1)
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(-1)
        assert (d > 1e-3).mean() < 0.005

    def _mesh_bump_scene(self, ktex_dir, strength="0.6"):
        from PIL import Image

        bump = os.path.join(ktex_dir, "meshbump.png")
        if not os.path.exists(bump):
            rs = np.random.RandomState(19)
            # smooth low-frequency height field: visible normal tilt,
            # no texel-boundary tie-flip noise between engines
            h = rs.rand(8, 8)
            h = np.kron(h, np.ones((4, 4)))  # 32x32
            Image.fromarray(
                np.repeat((h * 255).astype(np.uint8)[..., None], 3, -1)
            ).save(bump)
        text = self.SCENE.replace(
            "OBJECT 2\nsphere\nmaterial 1",
            "OBJECT 2\nmesh quad.obj\nmaterial 2",
        ).replace(
            "EMITTANCE   0\nTEXTURE     t32.png", "EMITTANCE   0"
        ) + (
            "\nMATERIAL 2\nRGB 1 1 1\nSPECEX 0\nSPECRGB 0 0 0\n"
            "REFL 0\nREFR 0\nREFRIOR 0\nEMITTANCE 0\n"
            f"BUMPTEX meshbump.png {strength}\n"
        )
        return pt.parse_scene(text, base_dir=ktex_dir)

    def test_mesh_bumptex_active_and_engine_parity(self, ktex_dir):
        """BUMPTEX on a mesh perturbs shading normals via per-triangle
        UV tangent frames (ops/intersect.triangle_uv_gradients —
        VERDICT r2 #3; reference bump-mapping extra README.md:104 on
        its mesh extra README.md:113-117): the render must visibly
        differ from the flat mesh, identically on all three engines."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            _tex_statics, _xla_fallback, pathtrace_iteration_pallas,
        )
        from pathtrace_tpu.render.plane_engine import (
            pathtrace_iteration_planes,
        )

        scene = self._mesh_bump_scene(ktex_dir)
        assert not _xla_fallback(scene)       # 32x32 fits in-kernel
        tg, tu, bg = _tex_statics(scene)
        assert any(t[0] >= 0 for t in bg)     # mesh bump chart packed
        rj, _ = pt.pathtrace_iteration(scene, 1)
        rp, _ = pathtrace_iteration_pallas(scene, 1, interpret=True)
        rpl, _ = pathtrace_iteration_planes(scene, 1)
        assert np.array_equal(np.asarray(rp), np.asarray(rpl))
        d = np.abs(np.asarray(rp) - np.asarray(rj)).max(-1)
        assert (d > 2e-3).mean() < 0.005
        # visibly bumped: flat (k=0) render differs where the mesh is
        flat = self._mesh_bump_scene(ktex_dir, strength="0")
        rf, _ = pt.pathtrace_iteration(flat, 1)
        assert np.abs(np.asarray(rj) - np.asarray(rf)).max() > 0.02

    def test_atan2_edge_cases(self):
        """Quadrant/axis edges of the polynomial atan2 (UV charts hit
        x=0 and y=0 exactly on sphere seams/poles)."""
        from pathtrace_tpu.ops.pallas.megakernel import _atan2

        pts = np.array(
            [[1, 0], [-1, 0], [0, 1], [0, -1],
             [1, 1], [-1, 1], [-1, -1], [1, -1],
             [1e-20, 1], [1, 1e-20], [0, 0]],
            np.float32,
        )
        y = np.zeros((32, 128), np.float32)
        x = np.zeros((32, 128), np.float32)
        y.reshape(-1)[: len(pts)] = pts[:, 1]
        x.reshape(-1)[: len(pts)] = pts[:, 0]
        got = np.asarray(jax.jit(_atan2)(y, x)).reshape(-1)[: len(pts)]
        want = np.arctan2(pts[:, 1], pts[:, 0])
        # (0,0): ours returns 0 via the pi-flip chain -> pi... just
        # require the defined points to match; (0,0) is never hit by
        # the charts (it's the sphere axis where u is undefined)
        np.testing.assert_allclose(got[:-1], want[:-1], atol=1e-6)


class TestStreamTex:
    """Round 5: HBM-streamed texture tables (KTEX_STREAM_TEXELS design).

    Past the resident caps (256^2 / 65,536 texels) the u8-packed word
    tables stay in HBM and the kernel's fetch switches to the need-
    driven slab-serving while_loop (megakernel._make_tracer fetch3) —
    the mesh-streaming DMA pattern applied to textures, per the
    round-4 verdict's task 2.  These tests force ``tex_stream`` both
    ways on small maps (bit parity with the proven resident sweep)
    and run the auto-streamed sizes against the planes engine."""

    @pytest.fixture(scope="class")
    def ktex_dir(self, tmp_path_factory):
        from PIL import Image

        td = tmp_path_factory.mktemp("stream_tex")
        rs = np.random.RandomState(3)
        Image.fromarray(
            (rs.rand(32, 32, 3) * 255).astype(np.uint8)
        ).save(str(td / "t32.png"))
        Image.fromarray(
            (rs.rand(320, 320, 3) * 255).astype(np.uint8)
        ).save(str(td / "t320.png"))
        return str(td)

    def _scene(self, ktex_dir, tex):
        text = TestPallasInKernel.SCENE.replace("t32.png", tex)
        scene = pt.parse_scene(text, base_dir=ktex_dir)
        return dc.replace(scene, resolution=(16, 16), trace_depth=3)

    def test_forced_stream_matches_resident(self, ktex_dir):
        """Small map, stream forced on: bit-identical to the resident
        row sweep across two accumulated iterations."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_batch_pallas,
        )

        sc = self._scene(ktex_dir, "t32.png")
        a, ca = pathtrace_batch_pallas(sc, 1, 2, interpret=True,
                                       tex_stream=False)
        b, cb = pathtrace_batch_pallas(sc, 1, 2, interpret=True,
                                       tex_stream=True)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert np.array_equal(np.asarray(ca), np.asarray(cb))
        assert float(np.asarray(a).sum()) > 0

    def test_auto_stream_over_resident_cap(self, ktex_dir):
        """A 320^2 map (102,400 texels > 65,536) is now in-kernel (no
        planes fallback), auto-streams, and matches the planes engine
        bit-for-bit."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            KTEX_RESIDENT_ROWS, _tex_in_kernel, _xla_fallback,
            pathtrace_iteration_pallas,
        )
        from pathtrace_tpu.render.plane_engine import (
            pathtrace_iteration_planes,
        )

        sc = self._scene(ktex_dir, "t320.png")
        assert _tex_in_kernel(sc) and not _xla_fallback(sc)
        # the packed table really is over the resident row budget
        assert -(-(320 * 320) // (4 * 128)) > KTEX_RESIDENT_ROWS
        rk, _ = pathtrace_iteration_pallas(sc, 1, interpret=True)
        rp, _ = pathtrace_iteration_planes(sc, 1)
        assert np.array_equal(np.asarray(rk), np.asarray(rp))
        assert float(np.asarray(rk).sum()) > 0

    def test_streamed_bumptex_matches_planes(self, ktex_dir):
        """BUMPTEX height taps (the 8 extra central-difference taps)
        through the streamed fetch: parity vs the planes engine."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            _xla_fallback, pathtrace_iteration_pallas,
        )
        from pathtrace_tpu.render.plane_engine import (
            pathtrace_iteration_planes,
        )

        text = TestPallasInKernel.SCENE.replace(
            "EMITTANCE   0\nTEXTURE     t32.png",
            "EMITTANCE   0\nTEXTURE     t32.png\n"
            "BUMPTEX     t320.png 0.6",
        )
        scene = pt.parse_scene(text, base_dir=ktex_dir)
        scene = dc.replace(scene, resolution=(16, 16), trace_depth=3)
        assert not _xla_fallback(scene)
        rk, _ = pathtrace_iteration_pallas(scene, 1, interpret=True)
        rp, _ = pathtrace_iteration_planes(scene, 1)
        assert np.array_equal(np.asarray(rk), np.asarray(rp))

    def test_split_engine_routes_streamed_tex_to_monolithic(
            self, ktex_dir):
        """The split engine keeps VMEM tables; over-resident textures
        must route to the monolithic kernel, same image."""
        from pathtrace_tpu.ops.pallas.megakernel import (
            pathtrace_batch_pallas, pathtrace_batch_split,
        )

        sc = self._scene(ktex_dir, "t320.png")
        a, _ = pathtrace_batch_split(sc, 1, 1, split=1, interpret=True)
        b, _ = pathtrace_batch_pallas(sc, 1, 1, interpret=True)
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_rowskip_stream_matches_resident(tmp_path):
    """Slab-server row-skip (TEX_ROWSKIP_MIN_ROWS, round-5 follow-up):
    serving only slab rows a tap lands in must be bit-identical —
    threshold dropped so a small map exercises the lax.cond path."""
    from PIL import Image

    from pathtrace_tpu.ops.pallas import megakernel as mk

    rs = np.random.RandomState(5)
    Image.fromarray(
        (rs.rand(32, 32, 3) * 255).astype(np.uint8)
    ).save(str(tmp_path / "t32.png"))
    text = TestPallasInKernel.SCENE.replace("t32.png", "t32.png")
    sc = pt.parse_scene(text, base_dir=str(tmp_path))
    sc = dc.replace(sc, resolution=(16, 16), trace_depth=3)
    a, _ = mk.pathtrace_batch_pallas(sc, 1, 2, interpret=True,
                                     tex_stream=False)
    mk._batch_jit.clear_cache()
    try:
        mk.TEX_STREAM_ROWSKIP = True
        mk.TEX_ROWSKIP_MIN_ROWS = 0
        b, _ = mk.pathtrace_batch_pallas(sc, 1, 2, interpret=True,
                                         tex_stream=True)
    finally:
        mk.TEX_STREAM_ROWSKIP = False
        mk.TEX_ROWSKIP_MIN_ROWS = 4096
        mk._batch_jit.clear_cache()
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert float(np.asarray(a).sum()) > 0
