"""Two-view BA / F / H refinement tests.

Mirrors `bundle_adjustment/bundle_adjust_two_views_test.cc` and the
F/H optimization gtests: perturb GT, refine, require recovery.
"""

import numpy as np
import jax.numpy as jnp

from pytheiasfm_tpu.ba import two_view as tv


def _rot(rng, scale=0.5):
    aa = rng.normal(size=3)
    aa = aa / np.linalg.norm(aa) * rng.uniform(0.1, scale)
    th = np.linalg.norm(aa)
    K = np.array([[0, -aa[2], aa[1]], [aa[2], 0, -aa[0]], [-aa[1], aa[0], 0]]) / th
    return aa, np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _two_view_scene(rng, N=40):
    aa_gt, R_gt = _rot(rng)
    pos_gt = np.array([1.0, 0.2, -0.1])
    X = rng.uniform(-2, 2, (N, 3)) + np.array([0, 0, 6.0])
    p1 = X[:, :2] / X[:, 2:3]
    Xc = (R_gt @ (X - pos_gt).T).T
    p2 = Xc[:, :2] / Xc[:, 2:3]
    return aa_gt, pos_gt, X, p1, p2


def test_bundle_adjust_two_views():
    rng = np.random.default_rng(61)
    aa_gt, pos_gt, X, p1, p2 = _two_view_scene(rng)
    aa0 = aa_gt + rng.normal(size=3) * 0.02
    pos0 = pos_gt + rng.normal(size=3) * 0.02
    aa, pos, X3, cost = tv.bundle_adjust_two_views(
        jnp.asarray(aa0), jnp.asarray(pos0), jnp.asarray(p1), jnp.asarray(p2)
    )
    # Two-view scale is unobservable (baseline norm is held at its input
    # value, like the reference) — compare up to scale.
    pos = np.asarray(pos)
    scale = np.linalg.norm(pos_gt) / np.linalg.norm(pos)
    assert np.linalg.norm(np.asarray(aa) - aa_gt) < 1e-5
    assert np.linalg.norm(pos * scale - pos_gt) < 1e-4
    assert np.abs(np.asarray(X3) * scale - X).max() < 1e-3


def test_bundle_adjust_two_views_angular():
    rng = np.random.default_rng(62)
    aa_gt, pos_gt, X, p1, p2 = _two_view_scene(rng)
    t_gt = pos_gt / np.linalg.norm(pos_gt)
    aa0 = aa_gt + rng.normal(size=3) * 0.03
    pos0 = t_gt + rng.normal(size=3) * 0.03
    aa, pos, cost = tv.bundle_adjust_two_views_angular(
        jnp.asarray(aa0), jnp.asarray(pos0), jnp.asarray(p1), jnp.asarray(p2)
    )
    assert np.linalg.norm(np.asarray(aa) - aa_gt) < 1e-4
    terr = min(
        np.linalg.norm(np.asarray(pos) - t_gt), np.linalg.norm(np.asarray(pos) + t_gt)
    )
    assert terr < 1e-3


def test_optimize_fundamental_matrix():
    rng = np.random.default_rng(63)
    aa_gt, R_gt = _rot(rng)
    pos_gt = np.array([0.8, -0.1, 0.3])
    f1, f2 = 700.0, 650.0
    K1 = np.diag([f1, f1, 1.0])
    K2 = np.diag([f2, f2, 1.0])
    t = -R_gt @ pos_gt
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R_gt
    F_gt = np.linalg.inv(K2).T @ E @ np.linalg.inv(K1)
    F_gt /= np.linalg.norm(F_gt)
    X = rng.uniform(-2, 2, (50, 3)) + np.array([0, 0, 6.0])
    p1 = f1 * X[:, :2] / X[:, 2:3]
    Xc = (R_gt @ (X - pos_gt).T).T
    p2 = f2 * Xc[:, :2] / Xc[:, 2:3]
    # Perturb F then refine.
    F0 = F_gt + rng.normal(size=(3, 3)) * 0.02 * np.abs(F_gt).max()
    F, cost = tv.optimize_fundamental_matrix(
        jnp.asarray(F0), jnp.asarray(p1), jnp.asarray(p2)
    )
    F = np.asarray(F)
    if np.sum(F * F_gt) < 0:
        F = -F
    # Sampson distance of refined F should be tiny.
    x1 = np.concatenate([p1, np.ones((50, 1))], 1)
    x2 = np.concatenate([p2, np.ones((50, 1))], 1)
    Fx1 = x1 @ F.T
    Ftx2 = x2 @ F
    num = np.sum(x2 * Fx1, 1)
    den = np.sqrt((Fx1[:, :2] ** 2).sum(1) + (Ftx2[:, :2] ** 2).sum(1))
    assert np.abs(num / den).max() < 1e-4


def test_optimize_homography():
    rng = np.random.default_rng(64)
    H_gt = np.eye(3) + rng.normal(size=(3, 3)) * 0.1
    H_gt /= H_gt[2, 2]
    p1 = rng.uniform(-1, 1, (30, 2))
    x1 = np.concatenate([p1, np.ones((30, 1))], 1)
    x2 = x1 @ H_gt.T
    p2 = x2[:, :2] / x2[:, 2:3]
    H0 = H_gt + rng.normal(size=(3, 3)) * 0.01
    H, cost = tv.optimize_homography(jnp.asarray(H0), jnp.asarray(p1), jnp.asarray(p2))
    H = np.asarray(H)
    assert np.abs(H - H_gt).max() < 1e-6


def test_two_view_ba_batched():
    rng = np.random.default_rng(65)
    B = 5
    aas, poss, p1s, p2s = [], [], [], []
    gts = []
    for _ in range(B):
        aa_gt, pos_gt, X, p1, p2 = _two_view_scene(rng, N=30)
        gts.append((aa_gt, pos_gt))
        aas.append(aa_gt + rng.normal(size=3) * 0.02)
        poss.append(pos_gt + rng.normal(size=3) * 0.02)
        p1s.append(p1)
        p2s.append(p2)
    aa, pos, X3, cost = tv.bundle_adjust_two_views(
        jnp.asarray(np.stack(aas)),
        jnp.asarray(np.stack(poss)),
        jnp.asarray(np.stack(p1s)),
        jnp.asarray(np.stack(p2s)),
    )
    aa, pos = np.asarray(aa), np.asarray(pos)
    for b in range(B):
        scale = np.linalg.norm(gts[b][1]) / np.linalg.norm(pos[b])
        assert np.linalg.norm(aa[b] - gts[b][0]) < 1e-4
        assert np.linalg.norm(pos[b] * scale - gts[b][1]) < 1e-3
