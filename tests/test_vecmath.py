"""vecmath vs independent scalar/NumPy oracles (GLM semantics)."""

import numpy as np
import pytest

from pathtrace_tpu.core import vecmath as vm


def _ref_trs(t, r_deg, s):
    """Independent oracle: T @ Rx @ Ry @ Rz @ S built with numpy only,
    mirroring utilityCore::buildTransformationMatrix semantics
    (glm column-vector, right-handed, degrees)."""
    rx, ry, rz = np.radians(np.asarray(r_deg, np.float64))
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    M = np.eye(4)
    M[:3, :3] = Rx @ Ry @ Rz @ np.diag(s)
    M[:3, 3] = t
    return M


CASES = [
    ((0, 0, 0), (0, 0, 0), (1, 1, 1)),
    ((1, 2, 3), (0, 0, 0), (2, 3, 4)),
    ((0, 10, 0), (0, 0, 90), (0.01, 10, 10)),   # cornell ceiling
    ((-1, 4, -1), (30, 45, 60), (3, 3, 3)),
    ((5, -2, 1), (180, -90, 270), (1, 0.5, 2)),
]


@pytest.mark.parametrize("t,r,s", CASES)
def test_trs_matrix_matches_oracle(t, r, s):
    m = vm.trs_matrix(
        np.asarray(t, np.float32), np.asarray(r, np.float32),
        np.asarray(s, np.float32), xp=np,
    )
    ref = _ref_trs(t, r, s)
    np.testing.assert_allclose(m, ref, atol=1e-5)


@pytest.mark.parametrize("t,r,s", CASES)
def test_trs_inverse_is_inverse(t, r, s):
    m = vm.trs_matrix(
        np.asarray(t, np.float32), np.asarray(r, np.float32),
        np.asarray(s, np.float32), xp=np,
    )
    mi = vm.trs_inverse(
        np.asarray(t, np.float32), np.asarray(r, np.float32),
        np.asarray(s, np.float32), xp=np,
    )
    ident = m.astype(np.float64) @ mi.astype(np.float64)
    # looser for the 0.01-thin wall (condition number ~1e3)
    np.testing.assert_allclose(ident, np.eye(4), atol=1e-3)


def test_reflect_glm_convention():
    i = np.asarray([[1.0, -1.0, 0.0]], np.float32)
    i /= np.linalg.norm(i)
    n = np.asarray([[0.0, 1.0, 0.0]], np.float32)
    r = vm.reflect(i, n, xp=np)
    expected = i - 2 * (i @ n.T) * n  # glm::reflect
    np.testing.assert_allclose(r, expected, atol=1e-6)
    np.testing.assert_allclose(r, [[0.70710678, 0.70710678, 0.0]], atol=1e-6)


def test_refract_snell():
    # air->glass at 45 degrees, eta = 1/1.5
    theta_i = np.radians(45.0)
    i = np.asarray([[np.sin(theta_i), -np.cos(theta_i), 0]], np.float32)
    n = np.asarray([[0.0, 1.0, 0.0]], np.float32)
    r = vm.refract(i, n, np.float32(1 / 1.5), xp=np)
    sin_t = np.sin(theta_i) / 1.5
    assert abs(r[0, 0] - sin_t) < 1e-6          # Snell's law
    assert abs(np.linalg.norm(r[0]) - 1.0) < 1e-6


def test_refract_total_internal_reflection():
    # glass->air beyond critical angle: glm returns zero vector
    theta_i = np.radians(60.0)
    i = np.asarray([[np.sin(theta_i), -np.cos(theta_i), 0]], np.float32)
    n = np.asarray([[0.0, 1.0, 0.0]], np.float32)
    r = vm.refract(i, n, np.float32(1.5), xp=np)
    np.testing.assert_allclose(r, 0.0)


def test_mat3_helpers_match_numpy_matmul():
    rs = np.random.RandomState(0)
    a = rs.randn(5, 3, 3).astype(np.float32)
    b = rs.randn(5, 3, 3).astype(np.float32)
    v = rs.randn(5, 3).astype(np.float32)
    np.testing.assert_allclose(
        vm.mat3_mat(a, b, xp=np), a @ b, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        vm.mat3_vec(a, v, xp=np),
        np.einsum("nij,nj->ni", a, v),
        rtol=1e-5, atol=1e-6,
    )


def test_cross_and_normalize():
    a = np.asarray([[1.0, 0, 0]], np.float32)
    b = np.asarray([[0, 1.0, 0]], np.float32)
    np.testing.assert_allclose(vm.cross(a, b, xp=np), [[0, 0, 1]])
    v = np.asarray([[3.0, 4.0, 0.0]], np.float32)
    np.testing.assert_allclose(
        vm.normalize(v, xp=np), [[0.6, 0.8, 0.0]], atol=1e-6
    )
