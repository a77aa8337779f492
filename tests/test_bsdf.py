"""BSDF sampling vs closed-form / statistical oracles."""

import numpy as np

from pathtrace_tpu.ops import bsdf


def _mat(n, **kw):
    m = dict(
        color=np.full((n, 3), 0.8, np.float32),
        spec_color=np.full((n, 3), 0.9, np.float32),
        spec_exponent=np.zeros((n,), np.float32),
        has_reflective=np.zeros((n,), np.float32),
        has_refractive=np.zeros((n,), np.float32),
        ior=np.zeros((n,), np.float32),
    )
    for k, v in kw.items():
        if np.ndim(v) == 0:
            m[k] = np.full_like(m[k], v)
        else:
            m[k] = v
    return m


def _draws(n, seed=0):
    rs = np.random.RandomState(seed)
    return {
        k: rs.rand(n).astype(np.float32)
        for k in ["lobe", "diff_u1", "diff_u2", "fresnel", "spec_u1", "spec_u2"]
    }


def test_cosine_hemisphere_distribution():
    n = 200000
    rs = np.random.RandomState(1)
    normal = np.tile(np.asarray([[0, 0, 1]], np.float32), (n, 1))
    d = bsdf.cosine_hemisphere(
        normal, rs.rand(n).astype(np.float32), rs.rand(n).astype(np.float32),
        xp=np,
    )
    cos_t = d[:, 2]
    assert (cos_t >= -1e-6).all()                  # upper hemisphere
    assert abs(np.linalg.norm(d, axis=1).mean() - 1) < 1e-4
    # cosine-weighted: E[cos] = 2/3, E[cos^2] = 1/2
    assert abs(cos_t.mean() - 2 / 3) < 3e-3
    assert abs((cos_t**2).mean() - 0.5) < 3e-3
    # azimuthal symmetry
    assert abs(d[:, 0].mean()) < 3e-3 and abs(d[:, 1].mean()) < 3e-3


def test_diffuse_throughput_is_albedo():
    n = 64
    normal = np.tile(np.asarray([[0, 0, 1]], np.float32), (n, 1))
    wi = np.tile(np.asarray([[0, 0, -1]], np.float32), (n, 1))
    out_dir, thr, *_flags = bsdf.sample_bsdf(
        wi, normal, np.ones(n, bool), _mat(n), _draws(n), xp=np
    )
    np.testing.assert_allclose(thr, 0.8, atol=1e-6)
    assert (np.sum(out_dir * normal, axis=1) >= -1e-6).all()


def test_perfect_mirror():
    n = 8
    normal = np.tile(np.asarray([[0, 0, 1]], np.float32), (n, 1))
    wi = np.tile(
        np.asarray([[np.sqrt(0.5), 0, -np.sqrt(0.5)]], np.float32), (n, 1)
    )
    out_dir, thr, *_flags = bsdf.sample_bsdf(
        wi, normal, np.ones(n, bool), _mat(n, has_reflective=1.0),
        _draws(n), xp=np,
    )
    expected = np.asarray([np.sqrt(0.5), 0, np.sqrt(0.5)], np.float32)
    np.testing.assert_allclose(out_dir, np.broadcast_to(expected, out_dir.shape), atol=1e-6)
    # REFL 1 -> probability 1 -> no division inflation
    np.testing.assert_allclose(thr, 0.9, atol=1e-6)


def test_half_reflective_divides_by_probability():
    n = 100000
    normal = np.tile(np.asarray([[0, 0, 1]], np.float32), (n, 1))
    wi = np.tile(np.asarray([[0, 0, -1]], np.float32), (n, 1))
    out_dir, thr, *_flags = bsdf.sample_bsdf(
        wi, normal, np.ones(n, bool), _mat(n, has_reflective=0.5),
        _draws(n, seed=3), xp=np,
    )
    spec = thr[:, 0] > 1.7  # 0.9/0.5=1.8 vs 0.8/0.5=1.6
    np.testing.assert_allclose(thr[spec][:, 0], 1.8, atol=1e-5)
    np.testing.assert_allclose(thr[~spec][:, 0], 1.6, atol=1e-5)
    assert abs(spec.mean() - 0.5) < 0.01
    # unbiased estimator of lobe SUM (the spec's "straight-up add the
    # diffuse and specular components"): E[thr] = spec + diffuse
    assert abs(thr[:, 0].mean() - (0.9 + 0.8)) < 0.01


def test_imperfect_specular_concentrates_with_exponent():
    n = 50000
    normal = np.tile(np.asarray([[0, 0, 1]], np.float32), (n, 1))
    wi = np.tile(np.asarray([[0, 0, -1]], np.float32), (n, 1))
    mirror = np.asarray([0, 0, 1.0], np.float32)
    spreads = []
    for ex in [8.0, 128.0]:
        out_dir, _, *_flags = bsdf.sample_bsdf(
            wi, normal, np.ones(n, bool),
            _mat(n, has_reflective=1.0, spec_exponent=ex),
            _draws(n, seed=4), xp=np,
        )
        cos_dev = out_dir @ mirror
        spreads.append(1 - cos_dev.mean())
        # GPU Gems 3 ch.20: E[cos(theta)] for pdf (n+1)/2pi cos^n is
        # (n+1)/(n+2)
        assert abs(cos_dev.mean() - (ex + 1) / (ex + 2)) < 5e-3
    assert spreads[1] < spreads[0]  # higher exponent -> tighter lobe


def test_fresnel_glass_reflect_refract_split():
    n = 200000
    normal = np.tile(np.asarray([[0, 0, 1]], np.float32), (n, 1))
    # 45-degree incidence on ior=1.5 glass from outside
    wi = np.tile(
        np.asarray([[np.sqrt(0.5), 0, -np.sqrt(0.5)]], np.float32), (n, 1)
    )
    out_dir, thr, *_flags = bsdf.sample_bsdf(
        wi, normal, np.ones(n, bool),
        _mat(n, has_refractive=1.0, ior=1.5), _draws(n, seed=5), xp=np,
    )
    reflected = out_dir[:, 2] > 0
    # Schlick at 45deg, ior 1.5: R0=0.04, R ~ 0.04+(0.96)(1-cos45)^5
    cos_i = np.sqrt(0.5)
    r_schlick = 0.04 + 0.96 * (1 - cos_i) ** 5
    assert abs(reflected.mean() - r_schlick) < 0.01
    # refracted obeys Snell: sin_t = sin_i/1.5
    sin_t = np.sqrt(0.5) / 1.5
    refr = out_dir[~reflected]
    np.testing.assert_allclose(refr[:, 0], sin_t, atol=1e-5)
    # tints: reflect->spec_color, refract->color
    np.testing.assert_allclose(thr[reflected][:, 0], 0.9, atol=1e-6)
    np.testing.assert_allclose(thr[~reflected][:, 0], 0.8, atol=1e-6)


def test_total_internal_reflection_falls_back_to_mirror():
    n = 64
    normal = np.tile(np.asarray([[0, 0, 1]], np.float32), (n, 1))
    # inside glass (outside=False), grazing 80 degrees > critical (41.8)
    th = np.radians(80.0)
    wi = np.tile(
        np.asarray([[np.sin(th), 0, -np.cos(th)]], np.float32), (n, 1)
    )
    out_dir, thr, *_flags = bsdf.sample_bsdf(
        wi, normal, np.zeros(n, bool),
        _mat(n, has_refractive=1.0, ior=1.5), _draws(n, seed=6), xp=np,
    )
    expected = np.asarray([np.sin(th), 0, np.cos(th)], np.float32)
    np.testing.assert_allclose(out_dir, np.broadcast_to(expected, out_dir.shape), atol=1e-5)


def test_schlick_reflectance_limits():
    r_normal = bsdf.schlick_reflectance(
        np.asarray([1.0], np.float32), np.asarray([1.5], np.float32), xp=np
    )
    np.testing.assert_allclose(r_normal, 0.04, atol=1e-6)
    r_grazing = bsdf.schlick_reflectance(
        np.asarray([0.0], np.float32), np.asarray([1.5], np.float32), xp=np
    )
    np.testing.assert_allclose(r_grazing, 1.0, atol=1e-6)
