"""Full in-kernel reverse sweep vs XLA autodiff.

``render_vjp_pallas`` transposes the VMEM trace inside the megakernel
(``jax.vjp`` through ``_make_tracer(mode='vjp')``) and chains table
cotangents to scene parameters through the differentiable packers.  It
must reproduce ``jax.grad`` of the jnp integrator for EVERY parameter
group — materials (incl. IOR/spec exponent), geometry TRS, camera —
once interpret-vs-jit tie-flipped pixels are masked from the cotangent
on both sides (the standard forward-parity caveat).

NEE mode is the meaningful geometry case: pure BSDF sampling at fixed
RNG is piecewise-constant in geometry (grads correctly zero a.e.);
NEE's cos·cos'/r² term carries the continuous dependence
(render/diff.py module docstring; ops/lights.py).
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.ops.pallas.megakernel import render_vjp_pallas
from pathtrace_tpu.render.diff import merge_params, split_params
from pathtrace_tpu.render.integrator import trace_pixels


def _masked_ct(scene, nee, n_spp=1, seed=0):
    P = scene.pixel_count
    pix = jnp.arange(P, dtype=jnp.int32)

    def fwd():
        tot = jnp.zeros((P, 3), jnp.float32)
        for it in range(1, n_spp + 1):
            r, _ = trace_pixels(scene, it, pix, remat=False, nee=nee)
            tot = tot + r
        return tot

    rj = np.asarray(jax.jit(fwd)())
    rk, _ = render_vjp_pallas(
        scene, np.ones((P, 3), np.float32), 1, n_spp,
        interpret=True, nee=nee,
    )
    agree = np.abs(np.asarray(rk) - rj).max(-1) < 1e-4
    assert agree.mean() > 0.95
    return np.where(
        agree[:, None], np.random.RandomState(seed).rand(P, 3), 0
    ).astype(np.float32)


def _ref_grads(scene, ct, nee, n_spp=1):
    P = scene.pixel_count
    pix = jnp.arange(P, dtype=jnp.int32)

    def loss(params):
        sc = merge_params(scene, params)
        tot = jnp.zeros((P, 3), jnp.float32)
        for it in range(1, n_spp + 1):
            r, _ = trace_pixels(sc, it, pix, remat=False, nee=nee)
            tot = tot + r
        return jnp.sum(jnp.asarray(ct) * tot)

    return jax.jit(jax.grad(loss))(split_params(scene))


def _assert_close(a, b, rtol=2e-4, atol=3e-4):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=rtol, atol=atol
    )


class TestReverseSweep:
    # Compact 4-geom cornell-like rig.  The unrolled fwd+bwd interpret
    # graph scales with geoms x depth, and interpret-mode pallas uses
    # callbacks, so these compiles are NOT persistently cacheable —
    # every suite run pays them.  The full 8-geom cornell versions of
    # these tests compiled for 30-50 min each run; this rig covers the
    # same gradient structure (emissive light, two diffuse walls at
    # different orientations, one reflective sphere) in minutes.
    RIG = """\
MATERIAL 0
RGB         1 .95 .85
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   5

MATERIAL 1
RGB         .85 .4 .35
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   0

MATERIAL 2
RGB         .5 .6 .9
SPECEX      0
SPECRGB     .9 .9 .9
REFL        .4
REFR        0
REFRIOR     0
EMITTANCE   0

CAMERA
RES         16 16
FOVY        45
ITERATIONS  8
DEPTH       3
FILE        vjprig
EYE         0 2 9
VIEW        0 -.1 -1
UP          0 1 0

OBJECT 0
cube
material 0
TRANS       0 7 0
ROTAT       0 0 0
SCALE       4 .3 4

OBJECT 1
cube
material 1
TRANS       0 -1 0
ROTAT       0 10 0
SCALE       10 .3 10

OBJECT 2
cube
material 1
TRANS       -4 2 -1
ROTAT       0 0 -12
SCALE       .3 8 8

OBJECT 3
sphere
material 2
TRANS       1.5 1 0
ROTAT       0 0 0
SCALE       2.5 2.5 2.5
"""

    def _rig(self, depth=3):
        return dc.replace(pt.parse_scene(self.RIG), trace_depth=depth)

    def test_materials(self):
        # depth 2 suffices: camera ray -> diffuse/spec vertex -> light
        # exercises every material factor; the interpret compile is
        # uncacheable (callback executables), so cheaper = every run
        scene = self._rig(depth=2)
        ct = _masked_ct(scene, nee=False)
        _, g = render_vjp_pallas(scene, ct, 1, 1, interpret=True)
        gref = _ref_grads(scene, ct, nee=False)
        _assert_close(g["materials"].color, gref["materials"].color)
        _assert_close(
            g["materials"].emittance, gref["materials"].emittance
        )
        _assert_close(
            g["materials"].has_reflective,
            gref["materials"].has_reflective,
        )

    def test_geometry_camera_nee(self):
        """The headline case: nonzero TRS + camera + light grads via
        the NEE geometric term, matching autodiff."""
        # depth 2: one diffuse vertex with NEE already carries the
        # continuous cos·cos'/r² dependence on every TRS/camera param
        scene = self._rig(depth=2)
        ct = _masked_ct(scene, nee=True)
        _, g = render_vjp_pallas(scene, ct, 1, 1, interpret=True,
                                 nee=True)
        gref = _ref_grads(scene, ct, nee=True)
        # geometry gradients are actually nonzero in this regime
        assert np.abs(np.asarray(gref["translation"])).max() > 0.1
        _assert_close(g["translation"], gref["translation"])
        _assert_close(g["rotation"], gref["rotation"])
        _assert_close(g["scale"], gref["scale"], rtol=3e-4, atol=5e-4)
        _assert_close(
            g["camera"].position, gref["camera"].position
        )
        _assert_close(g["camera"].view, gref["camera"].view)
        _assert_close(g["materials"].color, gref["materials"].color)
        _assert_close(
            g["materials"].emittance, gref["materials"].emittance
        )

    GLASS_SCENE = """\
MATERIAL 0
RGB         1 .9 .8
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   5

MATERIAL 1
RGB         .98 .98 .98
SPECEX      0
SPECRGB     .98 .98 .98
REFL        0
REFR        1
REFRIOR     1.5
EMITTANCE   0

CAMERA
RES         16 16
FOVY        45
ITERATIONS  8
DEPTH       3
FILE        vjpglass
EYE         0 0 8
VIEW        0 0 -1
UP          0 1 0

OBJECT 0
cube
material 0
TRANS       0 0 -6
ROTAT       0 0 0
SCALE       6 6 .3

OBJECT 1
sphere
material 1
TRANS       0 0 0
ROTAT       0 0 0
SCALE       3 3 3
"""

    def test_glass_scene_grads(self):
        """Glass through the reverse sweep.  IOR grads are a.e. zero by
        design (detached lobe choice + 1/p cancellation —
        tests/test_diff.py::test_ior_grad_finite documents the same for
        the XLA engine); what must match is that the sweep reproduces
        autodiff exactly, zeros included.

        The scene is a minimal 2-geom glass rig (emissive backdrop +
        glass sphere, depth 3: enter / exit / hit light).  The unrolled
        fwd+bwd interpret graph scales with geoms x depth — the 8-geom
        cornell_glass at depth 4 compiled for >40 min on XLA-CPU."""
        scene = dc.replace(
            pt.parse_scene(self.GLASS_SCENE), trace_depth=3
        )
        ct = _masked_ct(scene, nee=False)
        _, g = render_vjp_pallas(scene, ct, 1, 1, interpret=True)
        gref = _ref_grads(scene, ct, nee=False)
        _assert_close(g["materials"].ior, gref["materials"].ior,
                      rtol=1e-3, atol=1e-3)
        _assert_close(g["materials"].color, gref["materials"].color,
                      rtol=1e-3, atol=1e-3)
        _assert_close(g["materials"].spec_color,
                      gref["materials"].spec_color,
                      rtol=1e-3, atol=1e-3)

    def test_multi_spp(self):
        scene = dc.replace(self._rig(depth=2), resolution=(12, 12))
        ct = _masked_ct(scene, nee=True, n_spp=2)
        _, g = render_vjp_pallas(scene, ct, 1, 2, interpret=True,
                                 nee=True)
        gref = _ref_grads(scene, ct, nee=True, n_spp=2)
        _assert_close(g["translation"], gref["translation"])
        _assert_close(g["materials"].color, gref["materials"].color)

    MESH_RIG = """\
MATERIAL 0
RGB         1 .95 .85
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   5

MATERIAL 1
RGB         .85 .4 .35
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   0

CAMERA
RES         12 12
FOVY        45
ITERATIONS  8
DEPTH       2
FILE        vjpmesh
EYE         0 2 9
VIEW        0 -.1 -1
UP          0 1 0

OBJECT 0
cube
material 0
TRANS       0 7 0
ROTAT       0 0 0
SCALE       4 .3 4

OBJECT 1
cube
material 1
TRANS       0 -1 0
ROTAT       0 10 0
SCALE       10 .3 10

OBJECT 2
mesh scenes/icosahedron.obj
material 1
TRANS       0 1.5 0
ROTAT       0 20 0
SCALE       2.5 2.5 2.5
"""

    def test_mesh_scene_grads(self):
        """Mesh scenes run the in-kernel sweep via the detached-winner
        BVH 'carry' traversal (VERDICT r2 #2): the while_loop stays
        primal-only, the winner recompute is differentiable, and
        TRS/camera/material grads match the wavefront autodiff.
        tri_verts grads are the documented exclusion (None here, not
        a silent zero an optimizer could consume — round-3 advisor;
        the planes engine carries them — tests/test_planes.TestBvhGrad)."""
        scene = pt.parse_scene(self.MESH_RIG)
        assert scene.mesh.count and scene.mesh.bvh_meta
        ct = _masked_ct(scene, nee=True)
        _, g = render_vjp_pallas(scene, ct, 1, 1, interpret=True,
                                 nee=True)
        gref = _ref_grads(scene, ct, nee=True)
        _assert_close(g["translation"], gref["translation"])
        _assert_close(g["rotation"], gref["rotation"])
        _assert_close(g["scale"], gref["scale"])
        _assert_close(g["materials"].color, gref["materials"].color)
        _assert_close(g["camera"].view, gref["camera"].view)
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
        assert g["tri_verts"] is None

    def test_mesh_without_bvh_rejected(self):
        scene = pt.load_scene("scenes/cornell_mesh.txt")
        scene = dc.replace(scene, mesh=dc.replace(
            scene.mesh, bvh_nodes=None, bvh_order=None, bvh_meta=()))
        with pytest.raises(NotImplementedError):
            render_vjp_pallas(
                scene, np.ones((scene.pixel_count, 3), np.float32),
                1, 1,
            )
