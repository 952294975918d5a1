"""Tests: orthographic planar pose + radial distortion homography.

Mirrors `pose/orthographic_four_point_test.cc` and
`pose/six_point_radial_distortion_homography_test.cc`.
"""

import numpy as np
import jax.numpy as jnp

from pytheiasfm_tpu.ops import orthographic as ortho
from pytheiasfm_tpu.ops import radial_homography as rh


def _rot(rng, scale=0.8):
    aa = rng.normal(size=3)
    aa = aa / np.linalg.norm(aa) * rng.uniform(0.2, scale)
    th = np.linalg.norm(aa)
    K = np.array([[0, -aa[2], aa[1]], [aa[2], 0, -aa[0]], [-aa[1], aa[0], 0]]) / th
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def test_planar_orthographic_pose():
    rng = np.random.default_rng(31)
    R_gt = _rot(rng)
    m_gt = 350.0
    t2_gt = np.array([12.0, -7.0])
    X = np.concatenate([rng.uniform(-1, 1, (6, 2)), np.zeros((6, 1))], axis=1)
    pix = m_gt * (R_gt[:2] @ X.T).T + t2_gt

    R, t, m, valid = ortho.planar_uncalibrated_orthographic_pose(
        jnp.asarray(pix), jnp.asarray(X)
    )
    R, t, m, valid = map(np.asarray, (R, t, m, valid))
    assert abs(m - m_gt) / m_gt < 1e-6
    errs = []
    for k in range(2):
        if not valid[k]:
            continue
        # Reproject: m * (R[:2] X) + m*t[:2] should equal pixels.
        reproj = m * (R[k][:2] @ X.T).T + m * t[k][:2]
        errs.append(np.abs(reproj - pix).max())
    assert errs and min(errs) < 1e-6


def test_six_point_radial_homography():
    rng = np.random.default_rng(32)
    # GT homography: rotation-induced (plane at infinity) + mild projective.
    H_gt = _rot(rng, 0.4) + rng.normal(size=(3, 3)) * 0.05
    l1_gt, l2_gt = -0.8, -1.5
    # Undistorted normalized source points.
    u1 = rng.uniform(-0.4, 0.4, (6, 2))
    u1h = np.concatenate([u1, np.ones((6, 1))], 1)
    u2h = (H_gt @ u1h.T).T
    u2 = u2h[:, :2] / u2h[:, 2:3]

    def distort(u, l):
        # Closed-form inverse of u = d/(1+l|d|^2) along the ray direction:
        # alpha = (1 - sqrt(1-4 l rho^2)) / (2 l rho).
        rho = np.linalg.norm(u, axis=1, keepdims=True)
        alpha = (1 - np.sqrt(1 - 4 * l * rho**2)) / (2 * l * rho)
        return u / rho * alpha

    p1 = distort(u1, l1_gt)
    p2 = distort(u2, l2_gt)

    H, l1, l2, valid = rh.six_point_radial_distortion_homography(
        jnp.asarray(p1), jnp.asarray(p2), lmin=-5.0, lmax=0.0
    )
    H, l1, l2, valid = map(np.asarray, (H, l1, l2, valid))
    ok = False
    for k in range(l1.shape[0]):
        if not valid[k]:
            continue
        if abs(l1[k] - l1_gt) < 0.05 and abs(l2[k] - l2_gt) < 0.05:
            ok = True
    assert ok, (l1, l2, valid)


def test_radial_distort_undistort_roundtrip():
    rng = np.random.default_rng(33)
    f, l = 450.0, -0.9
    pts3 = np.concatenate(
        [rng.uniform(-0.5, 0.5, (10, 2)), np.ones((10, 1))], axis=1
    )
    pix = rh.radial_distort_point(jnp.asarray(pts3), f, l)
    rays = rh.radial_undistort_point(pix, f, l)
    rays = np.asarray(rays)
    # Rays should be parallel to original points.
    dirs = rays / rays[:, 2:3]
    assert np.abs(dirs - pts3).max() < 1e-8
