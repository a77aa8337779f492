"""Intersection library vs independently-derived closed-form cases.

These re-derive the reference's contracts (src/intersections.h) by hand
— unit primitives, world-space distance to the 1e-4 backed-off point,
inside-hit normal flips — rather than reusing the library's own math.
"""

import numpy as np
import pytest

from pathtrace_tpu.core import vecmath as vm
from pathtrace_tpu.core.constants import NO_HIT, RAY_OFFSET
from pathtrace_tpu.ops import intersect as X


def _mats(t=(0, 0, 0), r=(0, 0, 0), s=(1, 1, 1)):
    t = np.asarray([t], np.float32)
    r = np.asarray([r], np.float32)
    s = np.asarray([s], np.float32)
    fwd = vm.trs_matrix(t, r, s, xp=np)
    inv = vm.trs_inverse(t, r, s, xp=np)
    return fwd, inv, np.swapaxes(inv, -1, -2)


def _ray(o, d):
    o = np.asarray([o], np.float32)
    d = np.asarray([d], np.float32)
    return o, d / np.linalg.norm(d)


class TestSphere:
    def test_frontal_hit_distance(self):
        fwd, inv, invt = _mats()
        o, d = _ray((0, 0, 2), (0, 0, -1))
        dist, p, n, outside = X.intersect_spheres(o, d, fwd, inv, invt, xp=np)
        # unit sphere r=0.5: hit at z=0.5 backed off by 1e-4 -> dist 1.5-1e-4
        assert abs(dist[0, 0] - (1.5 - RAY_OFFSET)) < 1e-5
        np.testing.assert_allclose(p[0, 0], [0, 0, 0.5 + RAY_OFFSET], atol=1e-5)
        np.testing.assert_allclose(n[0, 0], [0, 0, 1], atol=1e-4)
        assert outside[0, 0]

    def test_inside_hit_flips_normal(self):
        fwd, inv, invt = _mats()
        o, d = _ray((0, 0, 0), (0, 0, -1))
        dist, p, n, outside = X.intersect_spheres(o, d, fwd, inv, invt, xp=np)
        assert abs(dist[0, 0] - (0.5 - RAY_OFFSET)) < 1e-5
        # hit at z=-0.5; outward normal (0,0,-1) flipped to (0,0,1)
        np.testing.assert_allclose(n[0, 0], [0, 0, 1], atol=1e-4)
        assert not outside[0, 0]

    def test_miss(self):
        fwd, inv, invt = _mats()
        o, d = _ray((2, 0, 2), (0, 0, -1))
        dist, *_ = X.intersect_spheres(o, d, fwd, inv, invt, xp=np)
        assert dist[0, 0] == NO_HIT

    def test_behind_origin_misses(self):
        fwd, inv, invt = _mats()
        o, d = _ray((0, 0, 2), (0, 0, 1))  # pointing away
        dist, *_ = X.intersect_spheres(o, d, fwd, inv, invt, xp=np)
        assert dist[0, 0] == NO_HIT

    def test_scaled_sphere_world_distance(self):
        # scale 3 -> radius 1.5, translated like cornell's mirror ball
        fwd, inv, invt = _mats(t=(-1, 4, -1), s=(3, 3, 3))
        o, d = _ray((-1, 4, 10), (0, 0, -1))
        dist, p, n, outside = X.intersect_spheres(o, d, fwd, inv, invt, xp=np)
        # world hit at z = -1 + 1.5 = 0.5, ray origin z=10 -> dist ~ 9.5
        assert abs(dist[0, 0] - 9.5) < 1e-3
        np.testing.assert_allclose(n[0, 0], [0, 0, 1], atol=1e-4)

    def test_nonuniform_scale_normal_uses_inv_transpose(self):
        fwd, inv, invt = _mats(s=(2, 1, 1))  # ellipsoid
        o, d = _ray((2, 0.3, 0), (-1, 0, 0))
        dist, p, n, outside = X.intersect_spheres(o, d, fwd, inv, invt, xp=np)
        # analytic ellipsoid normal at p: grad(x^2/a^2+y^2/b^2+z^2/c^2)
        a, b, c = 1.0, 0.5, 0.5  # world semi-axes
        g = np.array([
            p[0, 0, 0] / a**2, p[0, 0, 1] / b**2, p[0, 0, 2] / c**2
        ])
        g /= np.linalg.norm(g)
        np.testing.assert_allclose(n[0, 0], g, atol=1e-3)


class TestBox:
    def test_frontal_hit(self):
        fwd, inv, invt = _mats()
        o, d = _ray((0, 0, 2), (0, 0, -1))
        dist, p, n, outside = X.intersect_boxes(o, d, fwd, inv, xp=np)
        assert abs(dist[0, 0] - (1.5 - RAY_OFFSET)) < 1e-5
        np.testing.assert_allclose(n[0, 0], [0, 0, 1], atol=1e-6)
        assert outside[0, 0]

    def test_inside_hit_uses_far_face(self):
        fwd, inv, invt = _mats()
        o, d = _ray((0, 0, 0), (1, 0, 0))
        dist, p, n, outside = X.intersect_boxes(o, d, fwd, inv, xp=np)
        assert abs(dist[0, 0] - (0.5 - RAY_OFFSET)) < 1e-5
        assert not outside[0, 0]
        # reference's far-face normal points against the ray (interior side)
        np.testing.assert_allclose(n[0, 0], [-1, 0, 0], atol=1e-6)

    def test_edge_face_selection(self):
        fwd, inv, invt = _mats()
        # oblique ray hitting the +x face
        o, d = _ray((2, 0.2, 0.1), (-1, 0, 0))
        dist, p, n, outside = X.intersect_boxes(o, d, fwd, inv, xp=np)
        np.testing.assert_allclose(n[0, 0], [1, 0, 0], atol=1e-6)
        assert abs(p[0, 0, 0] - 0.5) < 1e-3

    def test_axis_parallel_ray_relies_on_ieee_inf(self):
        fwd, inv, invt = _mats()
        # direction has exact zeros -> divisions give inf, must still hit
        o, d = _ray((0.2, 0.1, 5), (0, 0, -1))
        dist, p, n, outside = X.intersect_boxes(o, d, fwd, inv, xp=np)
        assert dist[0, 0] < NO_HIT
        np.testing.assert_allclose(n[0, 0], [0, 0, 1], atol=1e-6)

    def test_miss(self):
        fwd, inv, invt = _mats()
        o, d = _ray((2, 2, 2), (0, 0, -1))
        dist, *_ = X.intersect_boxes(o, d, fwd, inv, xp=np)
        assert dist[0, 0] == NO_HIT

    def test_thin_wall_world_distance(self):
        # cornell right wall: cube at (5,5,0) scaled (.01,10,10)
        fwd, inv, invt = _mats(t=(5, 5, 0), s=(0.01, 10, 10))
        o, d = _ray((0, 5, 0), (1, 0, 0))
        dist, p, n, outside = X.intersect_boxes(o, d, fwd, inv, xp=np)
        assert abs(dist[0, 0] - 4.995) < 1e-3
        np.testing.assert_allclose(n[0, 0], [-1, 0, 0], atol=1e-5)

    def test_rotated_box(self):
        fwd, inv, invt = _mats(r=(0, 0, 45))
        o, d = _ray((0, 2, 0), (0, -1, 0))
        dist, p, n, outside = X.intersect_boxes(o, d, fwd, inv, xp=np)
        # corner-up square: top corner at y = sqrt(2)/2
        exp = 2 - np.sqrt(2) / 2
        assert abs(dist[0, 0] - exp) < 1e-3


class TestTriangle:
    def _tri(self):
        return np.asarray(
            [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32
        ), np.zeros((1,), np.int32)

    def test_hit_inside(self):
        fwd, inv, invt = _mats()
        tv, tg = self._tri()
        o, d = _ray((0.2, 0.2, 1), (0, 0, -1))
        dist, p, n, outside = X.intersect_triangles(
            o, d, tv, tg, fwd, inv, invt, xp=np
        )
        assert abs(dist[0, 0] - (1 - RAY_OFFSET)) < 1e-5
        np.testing.assert_allclose(n[0, 0], [0, 0, 1], atol=1e-6)
        assert outside[0, 0]

    def test_miss_outside_barycentric(self):
        fwd, inv, invt = _mats()
        tv, tg = self._tri()
        o, d = _ray((0.9, 0.9, 1), (0, 0, -1))
        dist, *_ = X.intersect_triangles(o, d, tv, tg, fwd, inv, invt, xp=np)
        assert dist[0, 0] == NO_HIT

    def test_backface_flips_normal(self):
        fwd, inv, invt = _mats()
        tv, tg = self._tri()
        o, d = _ray((0.2, 0.2, -1), (0, 0, 1))
        dist, p, n, outside = X.intersect_triangles(
            o, d, tv, tg, fwd, inv, invt, xp=np
        )
        assert dist[0, 0] < NO_HIT
        np.testing.assert_allclose(n[0, 0], [0, 0, -1], atol=1e-6)
        assert not outside[0, 0]

    def test_transformed_triangle(self):
        fwd, inv, invt = _mats(t=(0, 0, -2), s=(2, 2, 1))
        tv, tg = self._tri()
        o, d = _ray((0.5, 0.5, 1), (0, 0, -1))
        dist, p, n, outside = X.intersect_triangles(
            o, d, tv, tg, fwd, inv, invt, xp=np
        )
        assert abs(dist[0, 0] - 3.0) < 1e-3


class TestSceneNearest:
    def test_nearest_and_tie_rule(self, cornell_scene):
        from pathtrace_tpu.render.integrator import geom_transforms

        fwd, inv, invt = geom_transforms(cornell_scene.geoms, xp=np)
        # straight into the back wall, offset right to miss the ball
        o, d = _ray((3, 5, 10.5), (0, 0, -1))
        res = X.intersect_scene(
            o, d, cornell_scene.geoms.type, fwd, inv, invt, xp=np
        )
        assert res["hit"][0]
        assert res["geom_idx"][0] == 3  # back wall
        assert abs(res["dist"][0] - (10.5 + 4.995)) < 1e-2  # wall at z=-4.995

    def test_mirror_sphere_closest(self, cornell_scene):
        from pathtrace_tpu.render.integrator import geom_transforms

        fwd, inv, invt = geom_transforms(cornell_scene.geoms, xp=np)
        o, d = _ray((-1, 4, 10.5), (0, 0, -1))
        res = X.intersect_scene(
            o, d, cornell_scene.geoms.type, fwd, inv, invt, xp=np
        )
        assert res["geom_idx"][0] == 6  # the sphere, not the back wall
        assert abs(res["dist"][0] - (10.5 - 0.5)) < 1e-2

    def test_miss_reports_no_hit(self, cornell_scene):
        from pathtrace_tpu.render.integrator import geom_transforms

        fwd, inv, invt = geom_transforms(cornell_scene.geoms, xp=np)
        o, d = _ray((0, 5, 10.5), (0, 0, 1))  # away from the box
        res = X.intersect_scene(
            o, d, cornell_scene.geoms.type, fwd, inv, invt, xp=np
        )
        assert not res["hit"][0]
