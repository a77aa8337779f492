"""Integrator: jitted JAX vs NumPy oracle, compaction modes, determinism."""

import dataclasses

import numpy as np
import pytest

import pathtrace_tpu as pt
from pathtrace_tpu.reference_oracle import oracle_iteration
from pathtrace_tpu.render import integrator as I


class TestOracleAgreement:
    def test_cornell_matches_oracle(self, cornell_small):
        rad_j, counts_j = pt.pathtrace_iteration(cornell_small, 1)
        rad_n, counts_n = oracle_iteration(cornell_small, 1)
        rad_j = np.asarray(rad_j)
        # discrete f32 tie flips near geometry edges are expected; the
        # contract is: tiny fraction of diverging samples, tracking
        # live-ray counts (SURVEY.md §7.4 exactness targets).
        diff = np.abs(rad_j - rad_n).max(axis=-1)
        assert (diff > 1e-3).mean() < 0.005
        np.testing.assert_allclose(
            np.asarray(counts_j), counts_n, rtol=0.02
        )

    def test_sphere_scene_matches_oracle(self, sphere_scene):
        small = dataclasses.replace(
            sphere_scene, resolution=(32, 32), trace_depth=4
        )
        rad_j, _ = pt.pathtrace_iteration(small, 1)
        rad_n, _ = oracle_iteration(small, 1)
        diff = np.abs(np.asarray(rad_j) - rad_n).max(axis=-1)
        assert (diff > 1e-3).mean() < 0.005


class TestCompaction:
    def test_sort_equals_mask_bitwise(self, cornell_small):
        a, ca = pt.pathtrace_iteration(cornell_small, 3, "mask")
        b, cb = pt.pathtrace_iteration(cornell_small, 3, "sort")
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert np.array_equal(np.asarray(ca), np.asarray(cb))

    def test_live_counts_monotone_nonincreasing(self, cornell_small):
        _, counts = pt.pathtrace_iteration(cornell_small, 1)
        counts = np.asarray(counts)
        assert counts[0] == 32 * 32
        assert (np.diff(counts) <= 0).all()

    def test_open_scene_loses_rays_faster_than_closed(self, cornell_small):
        """The reference's mandated analysis (README.md:284-293): an open
        scene (cornell, no front wall) terminates rays faster than a
        closed box."""
        _, counts_open = pt.pathtrace_iteration(cornell_small, 1)
        # close the box: add a front wall behind the camera
        g = cornell_small.geoms
        import numpy as _np

        tr = _np.concatenate([g.translation, [[0, 5, 10.6]]]).astype(
            _np.float32
        )
        ro = _np.concatenate([g.rotation, [[0, 90, 0]]]).astype(_np.float32)
        sc = _np.concatenate([g.scale, [[0.01, 10, 10]]]).astype(_np.float32)
        mid = _np.concatenate([g.material_id, [1]]).astype(_np.int32)
        closed = dataclasses.replace(
            cornell_small,
            geoms=dataclasses.replace(
                g, type=g.type + (1,), material_id=mid,
                translation=tr, rotation=ro, scale=sc,
            ),
        )
        _, counts_closed = pt.pathtrace_iteration(closed, 1)
        assert (
            np.asarray(counts_closed)[1:].sum()
            > np.asarray(counts_open)[1:].sum()
        )


class TestDeterminism:
    def test_same_iteration_reproducible(self, cornell_small):
        a, _ = pt.pathtrace_iteration(cornell_small, 7)
        b, _ = pt.pathtrace_iteration(cornell_small, 7)
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_different_iterations_differ(self, cornell_small):
        a, _ = pt.pathtrace_iteration(cornell_small, 1)
        b, _ = pt.pathtrace_iteration(cornell_small, 2)
        assert not np.array_equal(np.asarray(a), np.asarray(b))

    def test_batch_equals_sequential(self, cornell_small):
        seq = np.zeros((cornell_small.pixel_count, 3), np.float32)
        for it in (1, 2, 3):
            r, _ = pt.pathtrace_iteration(cornell_small, it)
            seq = seq + np.asarray(r)
        bat, _ = pt.pathtrace_batch(cornell_small, 1, 3)
        np.testing.assert_allclose(np.asarray(bat), seq, atol=1e-5)


class TestPhysics:
    def test_emissive_direct_hit_value(self, sphere_scene):
        """Rays that hit the light directly contribute color*emittance=5."""
        small = dataclasses.replace(
            sphere_scene, resolution=(64, 64), trace_depth=2
        )
        rad, _ = pt.pathtrace_iteration(small, 1)
        rad = np.asarray(rad)
        hit_vals = rad[rad.max(axis=-1) > 0]
        np.testing.assert_allclose(hit_vals, 5.0, atol=1e-5)

    def test_aa_jitter_varies_edges_only(self, sphere_scene):
        """AA jitter: edge pixels flip between iterations, interior not."""
        small = dataclasses.replace(
            sphere_scene, resolution=(64, 64), trace_depth=2
        )
        a = np.asarray(pt.pathtrace_iteration(small, 1)[0])
        b = np.asarray(pt.pathtrace_iteration(small, 2)[0])
        changed = (a != b).any(axis=-1).mean()
        assert 0 < changed < 0.1  # only the silhouette ring changes

    def test_mirror_sees_light(self, cornell_small):
        """With depth>=2 the mirror ball reflects the scene; radiance
        from pixels over the ball must be nonzero somewhere."""
        rad, _ = pt.pathtrace_batch(cornell_small, 1, 16)
        img = np.asarray(rad).reshape(32, 32, 3)
        # ball is centered slightly left of center, mid-height
        region = img[12:22, 8:18]
        assert region.max() > 0

    def test_dof_changes_image(self, cornell_small):
        cam = dataclasses.replace(
            cornell_small.camera,
            aperture=np.float32(0.5),
            focal_dist=np.float32(10.0),
        )
        dof = dataclasses.replace(cornell_small, camera=cam)
        a = np.asarray(pt.pathtrace_iteration(cornell_small, 1)[0])
        b = np.asarray(pt.pathtrace_iteration(dof, 1)[0])
        assert not np.array_equal(a, b)

    def test_render_accumulation_mean_stable(self, cornell_small):
        accum = pt.render(cornell_small, n_iters=8, chunk=4)
        img8 = np.asarray(accum) / 8
        accum2 = pt.render(cornell_small, n_iters=16, chunk=4)
        img16 = np.asarray(accum2) / 16
        # same scene converges to the same mean brightness
        assert abs(img8.mean() - img16.mean()) < 0.05


class TestRussianRoulette:
    def test_rr_unbiased_and_saves_segments(self, cornell_small):
        import numpy as np

        a = np.zeros((cornell_small.pixel_count, 3), np.float32)
        b = np.zeros_like(a)
        ca = cb = 0
        deep = __import__("dataclasses").replace(cornell_small, trace_depth=8)
        for it in range(1, 49):
            ra, counts_a = pt.pathtrace_iteration(deep, it)
            rb, counts_b = pt.pathtrace_iteration(deep, it, rr=True)
            a += np.asarray(ra)
            b += np.asarray(rb)
            ca += int(np.asarray(counts_a).sum())
            cb += int(np.asarray(counts_b).sum())
        # unbiased within Monte-Carlo noise; strictly fewer segments
        assert abs(a.mean() - b.mean()) / a.mean() < 0.03
        assert cb < ca * 0.95
