"""Tests: SDP rotation averaging (Lagrange dual / hybrid) and
LiGT / BATA position estimators.

Mirrors `global_pose_estimation/lagrange_dual_rotation_estimator_test.cc`,
`hybrid_rotation_estimator_test.cc`, `LiGT_position_estimator_test.cc`,
`bata_position_estimator_test.cc`: synthetic GT + noise ladders.
"""

import numpy as np
import jax.numpy as jnp

from pytheiasfm_tpu.global_pose import rotation_estimator as re_
from pytheiasfm_tpu.global_pose import position_estimator as pe
from pytheiasfm_tpu.ops import rotation as rotops


def _rand_aa(rng, n, scale=1.0):
    aa = rng.normal(size=(n, 3))
    return aa / np.linalg.norm(aa, axis=1, keepdims=True) * rng.uniform(
        0, scale, (n, 1)
    )


def _aa_to_R(aa):
    return np.asarray(rotops.angle_axis_to_rotation_matrix(jnp.asarray(aa)))


def _make_rotation_graph(rng, V, extra_edges=2, noise_deg=0.0):
    gt = _rand_aa(rng, V, 1.5)
    R = _aa_to_R(gt)
    ei, ej = [], []
    for j in range(1, V):
        ei.append(rng.integers(0, j))
        ej.append(j)
    for _ in range(extra_edges * V):
        a, b = rng.integers(0, V, 2)
        if a != b:
            ei.append(min(a, b))
            ej.append(max(a, b))
    ei, ej = np.asarray(ei, np.int32), np.asarray(ej, np.int32)
    rel = np.einsum("eij,ekj->eik", R[ej], R[ei])  # R_j R_iᵀ
    rel_aa = np.array(
        rotops.rotation_matrix_to_angle_axis(jnp.asarray(rel))
    )
    if noise_deg > 0:
        rel_aa += _rand_aa(rng, len(ei), np.radians(noise_deg))
    return gt, ei, ej, rel_aa


def _max_rotation_error_deg(gt_aa, est_aa):
    aligned = np.asarray(
        rotops.align_orientations(jnp.asarray(gt_aa), jnp.asarray(est_aa))
    )
    R_g = _aa_to_R(gt_aa)
    R_e = _aa_to_R(aligned)
    errs = []
    for a, b in zip(R_g, R_e):
        c = (np.trace(a @ b.T) - 1) / 2
        errs.append(np.degrees(np.arccos(np.clip(c, -1, 1))))
    return max(errs)


def test_lagrange_dual_rotation_noiseless():
    rng = np.random.default_rng(41)
    gt, ei, ej, rel_aa = _make_rotation_graph(rng, 12)
    aa, lam = re_.lagrange_dual_rotation_averaging(
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(rel_aa), 12
    )
    assert _max_rotation_error_deg(gt, np.asarray(aa)) < 0.1


def test_lagrange_dual_rotation_noisy():
    rng = np.random.default_rng(42)
    gt, ei, ej, rel_aa = _make_rotation_graph(rng, 20, extra_edges=4, noise_deg=2.0)
    aa, lam = re_.lagrange_dual_rotation_averaging(
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(rel_aa), 20
    )
    assert _max_rotation_error_deg(gt, np.asarray(aa)) < 5.0


def test_hybrid_rotation():
    rng = np.random.default_rng(43)
    gt, ei, ej, rel_aa = _make_rotation_graph(rng, 16, extra_edges=3, noise_deg=1.0)
    free = np.ones(16, bool)
    aa = re_.hybrid_rotation_averaging(
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(rel_aa), jnp.asarray(free), 16
    )
    assert _max_rotation_error_deg(gt, np.asarray(aa)) < 3.0


def test_l1_rotation_global():
    rng = np.random.default_rng(44)
    gt, ei, ej, rel_aa = _make_rotation_graph(rng, 10, extra_edges=3)
    init = gt + _rand_aa(rng, 10, 0.1)
    init[0] = gt[0]
    free = np.ones(10, bool)
    free[0] = False
    aa = re_.l1_rotation_global(
        jnp.asarray(init), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(rel_aa), jnp.asarray(free), 10,
    )
    assert _max_rotation_error_deg(gt, np.asarray(aa)) < 0.5


def _sim3_position_error(gt, est):
    """Best similarity-aligned max position error (gauge-free compare)."""
    g = gt - gt.mean(0)
    e = est - est.mean(0)
    # scale + rotation via Umeyama
    H = e.T @ g
    U, s, Vt = np.linalg.svd(H)
    D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R = U @ D @ Vt
    scale = np.trace(np.diag(s) @ D) / (e * e).sum()
    e_al = scale * (e @ R)
    return np.abs(e_al - g).max() / max(np.abs(g).max(), 1e-9)


def test_ligt_positions():
    rng = np.random.default_rng(45)
    V, T = 8, 60
    centers = rng.uniform(-2, 2, (V, 3))
    aa = _rand_aa(rng, V, 0.4)
    R = _aa_to_R(aa)
    pts = rng.uniform(-3, 3, (T, 3)) + np.array([0, 0, 10.0])
    obs_view, obs_track, bearings = [], [], []
    for t in range(T):
        views = rng.choice(V, size=4, replace=False)
        for v in views:
            b = R[v] @ (pts[t] - centers[v])
            bearings.append(b / np.linalg.norm(b))
            obs_view.append(v)
            obs_track.append(t)
    c = pe.ligt_positions(
        jnp.asarray(np.asarray(obs_view, np.int32)),
        jnp.asarray(np.asarray(obs_track, np.int32)),
        jnp.asarray(np.asarray(bearings)),
        jnp.asarray(aa),
        V,
        T,
    )
    assert _sim3_position_error(centers, np.asarray(c)) < 1e-3


def test_bata_positions():
    rng = np.random.default_rng(46)
    V = 12
    centers = rng.uniform(-3, 3, (V, 3))
    ei, ej = [], []
    for j in range(1, V):
        ei.append(rng.integers(0, j)); ej.append(j)
    for _ in range(3 * V):
        a, b = rng.integers(0, V, 2)
        if a != b:
            ei.append(min(a, b)); ej.append(max(a, b))
    ei, ej = np.asarray(ei, np.int32), np.asarray(ej, np.int32)
    t = centers[ej] - centers[ei]
    t = t / np.linalg.norm(t, axis=1, keepdims=True)
    free = np.ones(V, bool)
    c = pe.bata_positions(
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(t), jnp.asarray(free), V
    )
    assert _sim3_position_error(centers, np.asarray(c)) < 1e-2
