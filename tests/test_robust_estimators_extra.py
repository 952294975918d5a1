"""RANSAC-wrapped estimator tests for the round-2 additions.

Pattern mirrors the reference's estimator gtests
(`sfm/estimators/*_test.cc`): synthesize GT model -> project inliers + add
gross outliers -> RANSAC -> assert model recovery and inlier classification.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytheiasfm_tpu.ops import rotation as rotops
from pytheiasfm_tpu.ransac import engine
from pytheiasfm_tpu.ransac.estimators import (
    estimate_calibrated_absolute_pose_typed,
    estimate_dominant_plane_from_points,
    estimate_radial_dist_uncalibrated_absolute_pose,
    estimate_radial_distortion_homography,
    estimate_rigid_transformation_2d_3d,
    estimate_similarity_transformation_2d_3d,
    estimate_uncalibrated_absolute_pose,
)


def _params(thresh, iters=256):
    return engine.RansacParameters(
        error_thresh=thresh, max_iterations=iters, min_iterations=iters
    )


def _random_rotation(rng, scale=0.5):
    aa = rng.normal(size=3) * scale
    return np.asarray(rotops.angle_axis_to_rotation_matrix(jnp.asarray(aa)))


def _pose_scene(rng, N=64, n_out=12, focal=1000.0, k1=0.0):
    """GT camera + 3D points; returns pixel features (pp-centred), world
    points, and the GT (R, c, f)."""
    R = _random_rotation(rng)
    c = rng.normal(size=3) * 2.0
    X = rng.uniform(-4, 4, size=(N, 3)) + np.array([0, 0, 12.0])
    X = (R.T @ (X.T)).T + c  # put points in front of the camera
    p_cam = (R @ (X - c).T).T
    uv = focal * p_cam[:, :2] / p_cam[:, 2:3]
    if k1:
        # Division-model distortion in pixel units.
        r2 = np.sum(uv**2, axis=-1, keepdims=True)
        uv = uv / (1.0 + k1 * r2)
    uv[:n_out] += rng.uniform(80, 200, size=(n_out, 2)) * rng.choice(
        [-1, 1], size=(n_out, 2)
    )
    return uv, X, R, c


def test_estimate_uncalibrated_absolute_pose(rng):
    focal = 900.0
    uv, X, R, c = _pose_scene(rng, focal=focal)
    key = jax.random.PRNGKey(0)
    model, summary = estimate_uncalibrated_absolute_pose(
        key, jnp.asarray(uv), jnp.asarray(X), _params(4.0**2)
    )
    assert int(summary.num_inliers) >= 64 - 12 - 4
    assert float(model.focal_length) == pytest.approx(focal, rel=0.05)
    np.testing.assert_allclose(np.asarray(model.position), c, atol=0.1)
    # Rotation within a few degrees.
    dR = np.asarray(model.rotation) @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 3.0, ang


def test_estimate_radial_dist_uncalibrated_absolute_pose(rng):
    focal, k1 = 1000.0, -2e-8
    uv, X, R, c = _pose_scene(rng, focal=focal, k1=k1, n_out=8)
    key = jax.random.PRNGKey(1)
    model, summary = estimate_radial_dist_uncalibrated_absolute_pose(
        key, jnp.asarray(uv), jnp.asarray(X), _params(4.0**2),
        min_focal_length=500.0, max_focal_length=2000.0,
    )
    assert int(summary.num_inliers) >= 64 - 8 - 8
    assert float(model.focal_length) == pytest.approx(focal, rel=0.1)


def test_estimate_similarity_transformation_2d_3d(rng):
    # Generalized camera: rays from 3 pinhole cameras; GT similarity maps
    # world points into the rig frame.
    R_gt = _random_rotation(rng, 0.4)
    t_gt = rng.normal(size=3)
    s_gt = 1.7
    N = 48
    X = rng.uniform(-3, 3, size=(N, 3))
    Xr = s_gt * (R_gt @ X.T).T + t_gt  # points in rig frame
    origins = rng.normal(size=(N, 3)) * 0.3
    dirs = Xr - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # Outliers: corrupt ray directions.
    dirs[:8] = rng.normal(size=(8, 3))
    dirs[:8] /= np.linalg.norm(dirs[:8], axis=-1, keepdims=True)
    key = jax.random.PRNGKey(2)
    model, summary = estimate_similarity_transformation_2d_3d(
        key, jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(X),
        _params(np.sin(np.radians(0.5)) ** 2, iters=192),
    )
    assert int(summary.num_inliers) >= N - 8 - 6
    assert float(model.scale) == pytest.approx(s_gt, rel=0.02)
    np.testing.assert_allclose(np.asarray(model.translation), t_gt, atol=0.05)


def test_estimate_rigid_transformation_2d_3d(rng):
    R_gt = _random_rotation(rng, 0.4)
    t_gt = rng.normal(size=3)
    N = 48
    X = rng.uniform(-3, 3, size=(N, 3))
    Xr = (R_gt @ X.T).T + t_gt
    origins = rng.normal(size=(N, 3)) * 0.3
    dirs = Xr - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs[:8] = rng.normal(size=(8, 3))
    dirs[:8] /= np.linalg.norm(dirs[:8], axis=-1, keepdims=True)
    key = jax.random.PRNGKey(3)
    model, summary = estimate_rigid_transformation_2d_3d(
        key, jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(X),
        _params(np.sin(np.radians(0.5)) ** 2, iters=192),
    )
    assert int(summary.num_inliers) >= N - 8 - 6
    np.testing.assert_allclose(np.asarray(model.translation), t_gt, atol=0.05)
    dR = np.asarray(model.rotation) @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0, ang


def test_estimate_dominant_plane(rng):
    n = np.array([0.2, -0.3, 0.93])
    n /= np.linalg.norm(n)
    p0 = np.array([1.0, 2.0, 3.0])
    N = 100
    basis = np.linalg.svd(n[None])[2][1:]
    pts = p0 + rng.uniform(-5, 5, size=(N, 2)) @ basis
    pts += rng.normal(size=(N, 3)) * 0.01  # in-plane noise
    pts[:25] += n * rng.uniform(1, 4, size=(25, 1))  # off-plane outliers
    key = jax.random.PRNGKey(4)
    model, summary = estimate_dominant_plane_from_points(
        key, jnp.asarray(pts), _params(0.05**2)
    )
    assert int(summary.num_inliers) >= 70
    got_n = np.asarray(model.unit_normal)
    assert abs(np.dot(got_n, n)) > 0.999


def test_estimate_radial_distortion_homography(rng):
    # Plane-induced homography between two radially-distorted views.
    H_gt = np.eye(3) + rng.normal(size=(3, 3)) * 0.1
    l1, l2 = -0.2, -0.4
    N = 64
    x1 = rng.uniform(-0.6, 0.6, size=(N, 2))

    def lift(p, l):
        r2 = np.sum(p**2, axis=-1, keepdims=True)
        return np.concatenate([p, 1.0 + l * r2], axis=-1)

    u1 = lift(x1, l1)
    u2 = (H_gt @ u1.T).T
    # Project back through the right camera's division model: find the
    # distorted point x2 with lift(x2, l2) ~ u2.
    xy = u2[:, :2]
    w = u2[:, 2:3]
    # Solve 1 + l2 r^2 = w/s and x2 = xy/s where r = |x2|: quadratic in s.
    a = np.sum(xy**2, axis=-1, keepdims=True) * l2
    # s*w = s^2 + l2*|xy|^2 -> s^2 - w s + a = 0.
    s = (w + np.sqrt(np.maximum(w**2 - 4 * a, 1e-12))) / 2.0
    x2 = xy / s
    x2[:10] += rng.uniform(0.2, 0.5, size=(10, 2)) * rng.choice(
        [-1, 1], size=(10, 2)
    )
    key = jax.random.PRNGKey(5)
    model, summary = estimate_radial_distortion_homography(
        key, jnp.asarray(x1), jnp.asarray(x2), _params(0.01**2, iters=384)
    )
    assert int(summary.num_inliers) >= N - 10 - 10
    assert float(model.l1) == pytest.approx(l1, abs=0.1)


@pytest.mark.parametrize("pnp_type", [0, 1, 2])
def test_calibrated_absolute_pose_pnp_types(rng, pnp_type):
    """PnPType {KNEIP, SQPNP, DLS} all recover the pose
    (estimate_calibrated_absolute_pose.cc:89-110)."""
    uv, X, R, c = _pose_scene(rng, focal=1.0, n_out=10)  # normalized feats
    key = jax.random.PRNGKey(6)
    model, summary = estimate_calibrated_absolute_pose_typed(
        key, jnp.asarray(uv), jnp.asarray(X),
        _params((4.0 / 1000.0) ** 2), pnp_type=pnp_type,
    )
    assert int(summary.num_inliers) >= 64 - 10 - 6
    np.testing.assert_allclose(np.asarray(model.position), c, atol=0.05)
