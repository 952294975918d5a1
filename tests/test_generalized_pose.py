"""Tests for UPnP / MLPnP / gDLS similarity transform.

Mirrors reference gtests (`pose/upnp_test.cc`, `pose/mlpnp_test.cc`,
`pose/gdls_similarity_transform_test.cc`): synthesize rays from a GT pose
(central and non-central), solve, compare.
"""

import numpy as np
import jax.numpy as jnp

from pytheiasfm_tpu.ops import generalized_pose as gp


def _rot(rng, scale=1.2):
    aa = rng.normal(size=3)
    aa = aa / np.linalg.norm(aa) * rng.uniform(0.1, scale)
    th = np.linalg.norm(aa)
    K = np.array([[0, -aa[2], aa[1]], [aa[2], 0, -aa[0]], [-aa[1], aa[0], 0]]) / th
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def test_upnp_central():
    rng = np.random.default_rng(21)
    R_gt = _rot(rng)
    t_gt = np.array([0.5, -0.3, 1.0])
    X = rng.uniform(-2, 2, (8, 3)) + np.array([0, 0, 6.0])
    Xc = (R_gt @ X.T).T + t_gt
    d = Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
    o = np.zeros_like(d)
    R, t, cost = gp.upnp(jnp.asarray(o), jnp.asarray(d), jnp.asarray(X))
    assert np.linalg.norm(np.asarray(R) - R_gt) < 1e-5
    assert np.linalg.norm(np.asarray(t) - t_gt) < 1e-5


def test_upnp_noncentral():
    rng = np.random.default_rng(22)
    R_gt = _rot(rng)
    t_gt = np.array([-0.4, 0.2, 0.8])
    X = rng.uniform(-2, 2, (6, 3)) + np.array([0, 0, 5.0])
    o = rng.uniform(-0.5, 0.5, (6, 3))
    Xc = (R_gt @ X.T).T + t_gt
    d = Xc - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    R, t, cost = gp.upnp(jnp.asarray(o), jnp.asarray(d), jnp.asarray(X))
    assert np.linalg.norm(np.asarray(R) - R_gt) < 1e-5
    assert np.linalg.norm(np.asarray(t) - t_gt) < 1e-5


def test_mlpnp_identity_covariance():
    rng = np.random.default_rng(23)
    R_gt = _rot(rng)
    t_gt = np.array([0.2, 0.4, 1.5])
    X = rng.uniform(-2, 2, (10, 3)) + np.array([0, 0, 7.0])
    Xc = (R_gt @ X.T).T + t_gt
    feats = Xc[:, :2] / Xc[:, 2:3]
    covs = np.broadcast_to(np.eye(3), (10, 3, 3)).copy()
    R, t, cost = gp.mlpnp(jnp.asarray(feats), jnp.asarray(covs), jnp.asarray(X))
    assert np.linalg.norm(np.asarray(R) - R_gt) < 1e-5
    assert np.linalg.norm(np.asarray(t) - t_gt) < 1e-5


def test_mlpnp_weighted_is_consistent():
    # With anisotropic covariances and small noise the ML estimate should
    # still land near GT (noiseless check with random SPD covariances).
    rng = np.random.default_rng(24)
    R_gt = _rot(rng)
    t_gt = np.array([-0.1, 0.3, 2.0])
    X = rng.uniform(-2, 2, (12, 3)) + np.array([0, 0, 6.0])
    Xc = (R_gt @ X.T).T + t_gt
    feats = Xc[:, :2] / Xc[:, 2:3]
    A = rng.normal(size=(12, 3, 3)) * 0.3
    covs = np.einsum("nij,nkj->nik", A, A) + np.eye(3) * 0.5
    R, t, cost = gp.mlpnp(jnp.asarray(feats), jnp.asarray(covs), jnp.asarray(X))
    assert np.linalg.norm(np.asarray(R) - R_gt) < 1e-4
    assert np.linalg.norm(np.asarray(t) - t_gt) < 1e-4


def test_gdls_similarity_transform():
    rng = np.random.default_rng(25)
    R_gt = _rot(rng)
    t_gt = np.array([0.7, -0.2, 0.5])
    s_gt = 2.3
    X = rng.uniform(-2, 2, (8, 3)) + np.array([0, 0, 5.0])
    o = rng.uniform(-0.4, 0.4, (8, 3))
    Xc = s_gt * (R_gt @ X.T).T + t_gt
    d = Xc - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    R, t, s, cost = gp.gdls_similarity_transform(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(X)
    )
    assert np.linalg.norm(np.asarray(R) - R_gt) < 1e-5
    assert np.linalg.norm(np.asarray(t) - t_gt) < 1e-4
    assert abs(float(s) - s_gt) < 1e-4


def test_upnp_batched():
    rng = np.random.default_rng(26)
    B = 4
    Rs, ts, Xs, os_, ds = [], [], [], [], []
    for _ in range(B):
        R_gt = _rot(rng)
        t_gt = rng.uniform(-1, 1, 3)
        X = rng.uniform(-2, 2, (6, 3)) + np.array([0, 0, 6.0])
        o = rng.uniform(-0.3, 0.3, (6, 3))
        Xc = (R_gt @ X.T).T + t_gt
        d = Xc - o
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        Rs.append(R_gt), ts.append(t_gt), Xs.append(X), os_.append(o), ds.append(d)
    R, t, cost = gp.upnp(
        jnp.asarray(np.stack(os_)), jnp.asarray(np.stack(ds)), jnp.asarray(np.stack(Xs))
    )
    R, t = np.asarray(R), np.asarray(t)
    for b in range(B):
        assert np.linalg.norm(R[b] - Rs[b]) < 1e-4
        assert np.linalg.norm(t[b] - ts[b]) < 1e-4
