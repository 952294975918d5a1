"""Known-axis (partial rotation) solver tests.

Mirrors the reference's gtest specs
(`pose/two_point_pose_partial_rotation_test.cc`,
`three_point_relative_pose_partial_rotation_test.cc`,
`four_point_relative_pose_partial_rotation_test.cc`,
`sim_transform_partial_rotation_test.cc`): synthesize a ground-truth pose
about a known axis, project, solve, and require one returned solution to
match GT.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pytheiasfm_tpu.ops import partial_rotation as pr


def _axis_rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


@pytest.mark.parametrize("angle", [0.3, -0.9, 1.7])
def test_two_point_pose_partial_rotation(angle):
    RNG = np.random.default_rng(11)
    axis = np.array([0.2, 1.0, -0.3])
    axis /= np.linalg.norm(axis)
    R_gt = _axis_rot(axis, angle)
    t_gt = np.array([0.4, -0.2, 0.6])
    pts = RNG.uniform(-2, 2, (2, 3)) + np.array([0, 0, 6.0])
    rays = (R_gt @ pts.T).T + t_gt  # camera-frame directions

    R, t, valid = pr.two_point_pose_partial_rotation(
        jnp.asarray(axis), jnp.asarray(pts), jnp.asarray(rays)
    )
    R, t, valid = np.asarray(R), np.asarray(t), np.asarray(valid)
    errs = [
        np.linalg.norm(R[k] - R_gt) + np.linalg.norm(t[k] - t_gt)
        for k in range(R.shape[0])
        if valid[k]
    ]
    assert errs and min(errs) < 1e-6


@pytest.mark.parametrize("angle", [0.5, -1.2])
def test_three_point_relative_pose_partial_rotation(angle):
    RNG = np.random.default_rng(12)
    axis = np.array([0.0, 1.0, 0.0])
    R_gt = _axis_rot(axis, angle)
    t_gt = np.array([1.0, 0.3, -0.5])
    t_gt /= np.linalg.norm(t_gt)
    pts = RNG.uniform(-2, 2, (3, 3)) + np.array([0, 0, 8.0])
    rays1 = pts
    rays2 = (R_gt @ pts.T).T + t_gt

    R, t, valid = pr.three_point_relative_pose_partial_rotation(
        jnp.asarray(axis), jnp.asarray(rays1), jnp.asarray(rays2)
    )
    R, t, valid = np.asarray(R), np.asarray(t), np.asarray(valid)
    errs = []
    for k in range(R.shape[0]):
        if not valid[k]:
            continue
        tk = t[k] / np.linalg.norm(t[k])
        terr = min(np.linalg.norm(tk - t_gt), np.linalg.norm(tk + t_gt))
        errs.append(np.linalg.norm(R[k] - R_gt) + terr)
    assert errs and min(errs) < 1e-6


def test_four_point_relative_pose_partial_rotation():
    RNG = np.random.default_rng(13)
    axis = np.array([0.3, 0.2, 1.0])
    axis /= np.linalg.norm(axis)
    R_gt = _axis_rot(axis, 0.7)
    t_gt = np.array([0.8, -0.4, 0.2])
    pts = RNG.uniform(-2, 2, (4, 3)) + np.array([0, 0, 10.0])
    o1 = RNG.uniform(-0.2, 0.2, (4, 3))
    o2 = RNG.uniform(-0.2, 0.2, (4, 3))
    d1 = pts - o1
    # Frame-2 ray: X2 = R X1 + t observed from origin o2.
    d2 = (R_gt @ pts.T).T + t_gt - o2

    R, t, valid = pr.four_point_relative_pose_partial_rotation(
        jnp.asarray(axis),
        jnp.asarray(d1),
        jnp.asarray(o1),
        jnp.asarray(d2),
        jnp.asarray(o2),
    )
    R, t, valid = np.asarray(R), np.asarray(t), np.asarray(valid)
    errs = [
        np.linalg.norm(R[k] - R_gt) + np.linalg.norm(t[k] - t_gt)
        for k in range(R.shape[0])
        if valid[k]
    ]
    assert errs and min(errs) < 1e-5


def test_sim_transform_partial_rotation():
    RNG = np.random.default_rng(14)
    axis = np.array([1.0, 0.1, -0.2])
    axis /= np.linalg.norm(axis)
    R_gt = _axis_rot(axis, -0.6)
    t_gt = np.array([0.5, 0.9, -0.3])
    s_gt = 1.7
    pts = RNG.uniform(-2, 2, (5, 3)) + np.array([0, 0, 9.0])
    o1 = RNG.uniform(-0.2, 0.2, (5, 3))
    o2 = RNG.uniform(-0.2, 0.2, (5, 3))
    d1 = pts - o1
    d2 = s_gt * (R_gt @ pts.T).T + t_gt - o2

    R, t, s, valid = pr.sim_transform_partial_rotation(
        jnp.asarray(axis),
        jnp.asarray(d1),
        jnp.asarray(o1),
        jnp.asarray(d2),
        jnp.asarray(o2),
    )
    R, t, s, valid = np.asarray(R), np.asarray(t), np.asarray(s), np.asarray(valid)
    errs = [
        np.linalg.norm(R[k] - R_gt) + np.linalg.norm(t[k] - t_gt) + abs(s[k] - s_gt)
        for k in range(R.shape[0])
        if valid[k]
    ]
    assert errs and min(errs) < 1e-5


def test_batched_two_point_pose():
    RNG = np.random.default_rng(15)
    axis = np.array([0.0, 0.0, 1.0])
    B = 4
    pts = RNG.uniform(-2, 2, (B, 2, 3)) + np.array([0, 0, 6.0])
    angles = RNG.uniform(-1.5, 1.5, B)
    ts = RNG.uniform(-1, 1, (B, 3))
    rays = np.stack(
        [(_axis_rot(axis, angles[b]) @ pts[b].T).T + ts[b] for b in range(B)]
    )
    R, t, valid = pr.two_point_pose_partial_rotation(
        jnp.asarray(axis), jnp.asarray(pts), jnp.asarray(rays)
    )
    R, t, valid = np.asarray(R), np.asarray(t), np.asarray(valid)
    for b in range(B):
        R_gt = _axis_rot(axis, angles[b])
        errs = [
            np.linalg.norm(R[b, k] - R_gt) + np.linalg.norm(t[b, k] - ts[b])
            for k in range(R.shape[1])
            if valid[b, k]
        ]
        assert errs and min(errs) < 1e-6
