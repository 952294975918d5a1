"""Triangulation tests — mirror sfm/triangulation/triangulation_test.cc:
project known 3D points through known cameras, triangulate, compare."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytheiasfm_tpu.models import camera as cam
from pytheiasfm_tpu.ops import rotation as rot
from pytheiasfm_tpu.ops import triangulation as tri


def make_scene(rng, n_views=2, n_points=16):
    """Random cameras looking at points near the origin."""
    aa = 0.2 * rng.normal(size=(n_views, 3))
    pos = rng.normal(size=(n_views, 3)) * 2.0
    pos[:, 2] -= 8.0  # cameras behind the origin looking forward
    ext = cam.make_extrinsics(jnp.asarray(pos), jnp.asarray(aa))
    poses = cam.compose_projection_matrix(ext)
    points = rng.uniform(-1, 1, size=(n_points, 3))
    # Normalized image observations.
    obs = []
    for v in range(n_views):
        R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa[v])))
        p_cam = (points - pos[v]) @ R.T
        obs.append(p_cam[:, :2] / p_cam[:, 2:3])
    return np.asarray(poses), points, np.stack(obs, axis=0)


def _dehomogenize(x4):
    x4 = np.asarray(x4)
    return x4[..., :3] / x4[..., 3:4]


def test_triangulate_dlt_noiseless(rng):
    poses, points, obs = make_scene(rng)
    est = tri.triangulate_dlt(
        jnp.asarray(poses[0]), jnp.asarray(poses[1]), jnp.asarray(obs[0]), jnp.asarray(obs[1])
    )
    np.testing.assert_allclose(_dehomogenize(est), points, atol=1e-8)


def test_triangulate_optimal_with_noise(rng):
    poses, points, obs = make_scene(rng, n_points=32)
    noisy = obs + 5e-4 * rng.normal(size=obs.shape)
    est = tri.triangulate(
        jnp.asarray(poses[0]), jnp.asarray(poses[1]), jnp.asarray(noisy[0]), jnp.asarray(noisy[1])
    )
    err = np.linalg.norm(_dehomogenize(est) - points, axis=-1)
    assert np.median(err) < 0.05
    # Optimal correction should beat or match plain DLT on average.
    est_dlt = tri.triangulate_dlt(
        jnp.asarray(poses[0]), jnp.asarray(poses[1]), jnp.asarray(noisy[0]), jnp.asarray(noisy[1])
    )
    err_dlt = np.linalg.norm(_dehomogenize(est_dlt) - points, axis=-1)
    assert np.mean(err) <= np.mean(err_dlt) * 1.5


def test_triangulate_midpoint(rng):
    poses, points, obs = make_scene(rng, n_views=4)
    aa = np.zeros((4, 3))
    origins = []
    dirs = []
    for v in range(4):
        R = poses[v][:, :3]
        c = -R.T @ poses[v][:, 3]
        origins.append(np.tile(c, (len(points), 1)))
        d = points - c
        dirs.append(d / np.linalg.norm(d, axis=-1, keepdims=True))
    origins = np.stack(origins, axis=1)  # [P, V, 3]
    dirs = np.stack(dirs, axis=1)
    est, ok = tri.triangulate_midpoint(jnp.asarray(origins), jnp.asarray(dirs))
    assert np.all(np.asarray(ok))
    np.testing.assert_allclose(_dehomogenize(est), points, atol=1e-6)


def test_triangulate_midpoint_masked(rng):
    poses, points, obs = make_scene(rng, n_views=4)
    origins, dirs = [], []
    for v in range(4):
        R = poses[v][:, :3]
        c = -R.T @ poses[v][:, 3]
        origins.append(np.tile(c, (len(points), 1)))
        d = points - c
        # Corrupt the rays that will be masked out.
        if v == 3:
            d = rng.normal(size=d.shape)
        dirs.append(d / np.linalg.norm(d, axis=-1, keepdims=True))
    origins = np.stack(origins, axis=1)
    dirs = np.stack(dirs, axis=1)
    mask = np.ones((len(points), 4), dtype=bool)
    mask[:, 3] = False
    est, ok = tri.triangulate_midpoint(
        jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(mask)
    )
    np.testing.assert_allclose(_dehomogenize(est), points, atol=1e-6)


@pytest.mark.parametrize("method", [tri.triangulate_nview, tri.triangulate_nview_svd])
def test_triangulate_nview(rng, method):
    poses, points, obs = make_scene(rng, n_views=5)
    poses_b = jnp.asarray(np.tile(poses[None], (len(points), 1, 1, 1)))
    obs_b = jnp.asarray(np.transpose(obs, (1, 0, 2)))  # [P, V, 2]
    est = method(poses_b, obs_b)
    np.testing.assert_allclose(_dehomogenize(est), points, atol=1e-6)


@pytest.mark.parametrize("method", [tri.triangulate_nview, tri.triangulate_nview_svd])
def test_triangulate_nview_masked(rng, method):
    poses, points, obs = make_scene(rng, n_views=5)
    obs = obs.copy()
    obs[4] = rng.normal(size=obs[4].shape)  # garbage in the masked view
    poses_b = jnp.asarray(np.tile(poses[None], (len(points), 1, 1, 1)))
    obs_b = jnp.asarray(np.transpose(obs, (1, 0, 2)))
    mask = np.ones((len(points), 5), dtype=bool)
    mask[:, 4] = False
    est = method(poses_b, obs_b, jnp.asarray(mask))
    np.testing.assert_allclose(_dehomogenize(est), points, atol=1e-6)


def test_cheirality(rng):
    # Camera 1 at origin; camera 2 translated. Points in front of both.
    aa2 = jnp.asarray(0.1 * rng.normal(size=3))
    R2 = rot.angle_axis_to_rotation_matrix(aa2)
    c2 = np.asarray([1.0, 0.2, -0.1])
    points = rng.uniform(-1, 1, size=(20, 3)) + np.asarray([0, 0, 6.0])
    p1 = points[:, :2] / points[:, 2:3]
    p_cam2 = (points - c2) @ np.asarray(R2).T
    p2 = p_cam2[:, :2] / p_cam2[:, 2:3]
    in_front = tri.is_triangulated_point_in_front_of_cameras(
        jnp.asarray(p1), jnp.asarray(p2), jnp.broadcast_to(R2, (20, 3, 3)), jnp.asarray(c2)
    )
    assert np.all(np.asarray(in_front))
    # Points behind camera 1 must fail.
    behind = points.copy()
    behind[:, 2] *= -1
    b1 = behind[:, :2] / behind[:, 2:3]
    b_cam2 = (behind - c2) @ np.asarray(R2).T
    b2 = b_cam2[:, :2] / b_cam2[:, 2:3]
    res = tri.is_triangulated_point_in_front_of_cameras(
        jnp.asarray(b1), jnp.asarray(b2), jnp.broadcast_to(R2, (20, 3, 3)), jnp.asarray(c2)
    )
    assert not np.any(np.asarray(res))


def test_sufficient_triangulation_angle():
    d1 = jnp.asarray([0.0, 0.0, 1.0])
    d2 = jnp.asarray([np.sin(np.deg2rad(5.0)), 0.0, np.cos(np.deg2rad(5.0))])
    rays = jnp.stack([d1, d2])[None]
    assert bool(tri.sufficient_triangulation_angle(rays, 4.0)[0])
    assert not bool(tri.sufficient_triangulation_angle(rays, 6.0)[0])
