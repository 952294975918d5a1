"""Tests for unknown-focal / radial-distortion absolute pose solvers.

Mirrors the reference gtests (`pose/four_point_focal_length_test.cc`,
`five_point_focal_length_radial_distortion_test.cc`,
`four_point_focal_length_radial_distortion_test.cc`): project known 3D
points through a known camera (optionally with division-model distortion),
solve, and require a candidate matching GT focal/pose.
"""

import numpy as np
import jax.numpy as jnp

from pytheiasfm_tpu.ops import focal_radial as fr


def _rot(rng):
    aa = rng.normal(size=3) * 0.4
    th = np.linalg.norm(aa)
    K = np.array(
        [[0, -aa[2], aa[1]], [aa[2], 0, -aa[0]], [-aa[1], aa[0], 0]]
    ) / max(th, 1e-12)
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _make_scene(rng, n, f, k1=0.0):
    R = _rot(rng)
    t = np.array([0.3, -0.2, 2.0]) + rng.normal(size=3) * 0.1
    pts = rng.uniform(-1.5, 1.5, (n, 3)) + np.array([0, 0, 5.0])
    pw = (np.linalg.inv(R) @ (pts - t).T).T  # world points s.t. cam coords=pts
    u = pts[:, :2] / pts[:, 2:3]
    if k1 != 0.0:
        # Invert division-model undistortion: find d with d/(1+k1|d|^2)=u.
        d = u.copy()
        for _ in range(50):
            d = u * (1 + k1 * np.sum(d * d, axis=1, keepdims=True))
    else:
        d = u
    pix = f * d
    return R, t, pw, pix


def test_four_point_pose_and_focal_length():
    rng = np.random.default_rng(3)
    f_gt = 800.0
    R_gt, t_gt, pw, pix = _make_scene(rng, 4, f_gt)
    P, f, valid = fr.four_point_pose_and_focal_length(
        jnp.asarray(pix), jnp.asarray(pw)
    )
    P, f, valid = np.asarray(P), np.asarray(f), np.asarray(valid)
    ok = False
    for k in range(4):
        if not valid[k]:
            continue
        if abs(f[k] - f_gt) / f_gt < 1e-2:
            Rk = P[k][:, :3] / np.array([f[k], f[k], 1.0])[:, None]
            if np.linalg.norm(Rk - R_gt) < 1e-2:
                ok = True
    assert ok


def test_five_point_focal_length_radial_distortion():
    rng = np.random.default_rng(4)
    f_gt, k_gt = 600.0, -0.2
    R_gt, t_gt, pw, pix = _make_scene(rng, 5, f_gt, k_gt)
    P, f, ks, valid = fr.five_point_focal_length_radial_distortion(
        jnp.asarray(pix), jnp.asarray(pw), 1
    )
    f, ks, valid = np.asarray(f), np.asarray(ks), np.asarray(valid)
    ok = any(
        valid[k]
        and abs(f[k] - f_gt) / f_gt < 2e-2
        and abs(ks[k, 0] - k_gt) < 5e-2
        for k in range(4)
    )
    assert ok


def test_four_point_pose_focal_length_radial_distortion():
    rng = np.random.default_rng(5)
    f_gt, k_gt = 1000.0, -0.1
    R_gt, t_gt, pw, pix = _make_scene(rng, 4, f_gt, k_gt)
    R, t, k1, f, valid = fr.four_point_pose_focal_length_radial_distortion(
        jnp.asarray(pix),
        jnp.asarray(pw),
        min_focal_length=100.0,
        max_focal_length=5000.0,
        min_distortion=-1.0,
        max_distortion=0.0,
    )
    R, t, k1, f, valid = map(np.asarray, (R, t, k1, f, valid))
    ok = any(
        valid[k]
        and abs(f[k] - f_gt) / f_gt < 2e-2
        and np.linalg.norm(R[k] - R_gt) < 2e-2
        for k in range(4)
    )
    assert ok


def test_p4pf_batched():
    rng = np.random.default_rng(6)
    B = 3
    fs = [500.0, 900.0, 1400.0]
    pws, pixs = [], []
    Rs = []
    for b in range(B):
        R_gt, t_gt, pw, pix = _make_scene(rng, 4, fs[b])
        pws.append(pw)
        pixs.append(pix)
        Rs.append(R_gt)
    P, f, valid = fr.four_point_pose_and_focal_length(
        jnp.asarray(np.stack(pixs)), jnp.asarray(np.stack(pws))
    )
    f, valid = np.asarray(f), np.asarray(valid)
    for b in range(B):
        assert any(
            valid[b, k] and abs(f[b, k] - fs[b]) / fs[b] < 1e-2 for k in range(4)
        )
