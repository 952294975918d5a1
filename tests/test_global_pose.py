"""Global rotation + position averaging tests.

Mirrors the reference's test strategy
(`global_pose_estimation/robust_rotation_estimator_test.cc`,
`least_unsquared_deviation_position_estimator_test.cc`): synthesize ground
truth, add calibrated noise, run the solver, assert tolerance; scale ladders
from a handful of views to ~100.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pytheiasfm_tpu import global_pose as gp
from pytheiasfm_tpu.global_pose.rotation_estimator import (
    RobustRotationEstimatorOptions,
)
from pytheiasfm_tpu.ops import rotation as rotops
from pytheiasfm_tpu.sfm.view_graph import TwoViewInfo, ViewGraph

import jax


def _rotmat(aa):
    return np.asarray(rotops.angle_axis_to_rotation_matrix(jnp.asarray(aa)))


def _aa(R):
    return np.asarray(rotops.rotation_matrix_to_angle_axis(jnp.asarray(R)))


def make_scene(num_views, num_edges, rot_noise_deg, pos_noise, rng,
               outlier_fraction=0.0):
    """Random poses + noisy pairwise measurements over a connected graph."""
    gt_aa = rng.normal(size=(num_views, 3)) * 0.5
    gt_pos = rng.uniform(-10, 10, size=(num_views, 3))
    graph = ViewGraph()
    edges = set()
    # Spanning chain first (connectivity), then random extra edges.
    for i in range(num_views - 1):
        edges.add((i, i + 1))
    while len(edges) < num_edges:
        a, b = rng.integers(0, num_views, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    n_outliers = int(outlier_fraction * len(edges))
    outlier_set = set(
        rng.choice(len(edges), size=n_outliers, replace=False).tolist()
    ) if n_outliers else set()
    for k, (i, j) in enumerate(edges):
        Ri, Rj = _rotmat(gt_aa[i]), _rotmat(gt_aa[j])
        R_rel = Rj @ Ri.T
        if k in outlier_set:
            R_rel = _rotmat(rng.normal(size=3))
            t_cam = rng.normal(size=3)
        else:
            noise = _rotmat(rng.normal(size=3) * np.radians(rot_noise_deg))
            R_rel = noise @ R_rel
            d_world = gt_pos[j] - gt_pos[i]
            t_cam = Ri @ d_world + rng.normal(size=3) * pos_noise
        t_cam = t_cam / np.linalg.norm(t_cam)
        graph.add_edge(
            int(i), int(j),
            TwoViewInfo(
                rotation_2=_aa(R_rel), position_2=t_cam,
                num_verified_matches=int(rng.integers(30, 200)),
            ),
        )
    return gt_aa, gt_pos, graph


def rotation_error_deg(gt_aa, est: dict):
    """Max angular error after single-rotation gauge alignment."""
    ids = sorted(est.keys())
    est_arr = np.stack([est[v] for v in ids])
    aligned = np.asarray(
        rotops.align_orientations(jnp.asarray(gt_aa[ids]), jnp.asarray(est_arr))
    )
    errs = []
    for k, v in enumerate(ids):
        dR = _rotmat(aligned[k]) @ _rotmat(gt_aa[v]).T
        errs.append(np.degrees(np.linalg.norm(_aa(dR))))
    return max(errs)


def position_error(gt_pos, est: dict):
    """Mean position error after similarity (gauge) alignment."""
    ids = sorted(est.keys())
    E = np.stack([est[v] for v in ids])
    G = gt_pos[ids]
    # Umeyama-style: center, scale, rotate.
    Ec, Gc = E - E.mean(0), G - G.mean(0)
    U, S, Vt = np.linalg.svd(Ec.T @ Gc)
    D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R = U @ D @ Vt
    s = (S * np.diag(D)).sum() / max((Ec**2).sum(), 1e-12)
    aligned = s * Ec @ R + G.mean(0)
    return np.linalg.norm(aligned - G, axis=-1).mean()


class TestMSTInit:
    def test_exact_recovery_no_noise(self, rng):
        gt_aa, _, graph = make_scene(8, 14, 0.0, 0.0, rng)
        est = gp.orientations_from_maximum_spanning_tree(graph)
        assert rotation_error_deg(gt_aa, est) < 1e-6


class TestRobustRotationAveraging:
    def test_small_no_noise(self, rng):
        gt_aa, _, graph = make_scene(4, 6, 0.0, 0.0, rng)
        est = gp.estimate_rotations(graph)
        assert rotation_error_deg(gt_aa, est) < 1e-4

    def test_medium_with_noise(self, rng):
        gt_aa, _, graph = make_scene(30, 100, 1.0, 0.01, rng)
        est = gp.estimate_rotations(graph)
        assert rotation_error_deg(gt_aa, est) < 3.0

    def test_large_with_noise_and_outliers(self, rng):
        gt_aa, _, graph = make_scene(100, 500, 1.0, 0.01, rng,
                                     outlier_fraction=0.1)
        est = gp.estimate_rotations(graph)
        assert rotation_error_deg(gt_aa, est) < 5.0

    def test_fixed_views_respected(self, rng):
        gt_aa, _, graph = make_scene(10, 25, 0.5, 0.01, rng)
        init = gp.orientations_from_maximum_spanning_tree(graph)
        est = gp.estimate_rotations(
            graph, initial_orientations=init, fixed_views={0, 1}
        )
        np.testing.assert_allclose(est[0], init[0], atol=1e-12)
        np.testing.assert_allclose(est[1], init[1], atol=1e-12)


class TestLinearNonlinearRotation:
    def test_linear(self, rng):
        gt_aa, _, graph = make_scene(20, 60, 0.3, 0.01, rng)
        est = gp.estimate_rotations(
            graph,
            estimator_type=gp.GlobalRotationEstimatorType.LINEAR,
        )
        assert rotation_error_deg(gt_aa, est) < 2.0

    def test_nonlinear(self, rng):
        gt_aa, _, graph = make_scene(20, 60, 0.5, 0.01, rng)
        est = gp.estimate_rotations(
            graph,
            estimator_type=gp.GlobalRotationEstimatorType.NONLINEAR,
        )
        assert rotation_error_deg(gt_aa, est) < 2.0


class TestPositionEstimation:
    @pytest.mark.parametrize("etype", [
        gp.GlobalPositionEstimatorType.LEAST_UNSQUARED_DEVIATION,
        gp.GlobalPositionEstimatorType.NONLINEAR,
    ])
    def test_no_noise(self, rng, etype):
        gt_aa, gt_pos, graph = make_scene(12, 40, 0.0, 0.0, rng)
        orient = {i: gt_aa[i] for i in range(12)}
        est = gp.estimate_positions(graph, orient, estimator_type=etype)
        scale = np.linalg.norm(gt_pos - gt_pos.mean(0), axis=-1).mean()
        assert position_error(gt_pos, est) < 0.05 * scale

    def test_lud_with_noise_outliers(self, rng):
        gt_aa, gt_pos, graph = make_scene(40, 200, 0.0, 0.05, rng,
                                          outlier_fraction=0.1)
        orient = {i: gt_aa[i] for i in range(40)}
        est = gp.estimate_positions(graph, orient)
        scale = np.linalg.norm(gt_pos - gt_pos.mean(0), axis=-1).mean()
        assert position_error(gt_pos, est) < 0.12 * scale

    def test_linear(self, rng):
        gt_aa, gt_pos, graph = make_scene(15, 60, 0.0, 0.0, rng)
        orient = {i: gt_aa[i] for i in range(15)}
        est = gp.estimate_positions(
            graph, orient,
            estimator_type=gp.GlobalPositionEstimatorType.LINEAR_TRIPLET,
        )
        scale = np.linalg.norm(gt_pos - gt_pos.mean(0), axis=-1).mean()
        assert position_error(gt_pos, est) < 0.1 * scale


class TestFilters:
    def test_orientation_filter_removes_outliers(self, rng):
        gt_aa, _, graph = make_scene(20, 80, 0.1, 0.01, rng,
                                     outlier_fraction=0.15)
        orient = {i: gt_aa[i] for i in range(20)}
        before = graph.num_edges()
        removed = gp.filter_view_pairs_from_orientation(graph, orient, 5.0)
        # All outlier edges should go; inliers (0.1 deg noise) must stay.
        assert int(0.10 * before) <= removed <= int(0.20 * before)
        v1, v2, rel_rot, _, _ = graph.edge_arrays()
        for k in range(len(v1)):
            Ri = _rotmat(gt_aa[v1[k]])
            Rj = _rotmat(gt_aa[v2[k]])
            dR = _rotmat(rel_rot[k]) @ (Rj @ Ri.T).T
            assert np.degrees(np.linalg.norm(_aa(dR))) < 5.0

    def test_cycle_filter(self, rng):
        gt_aa, _, graph = make_scene(12, 50, 0.1, 0.01, rng,
                                     outlier_fraction=0.1)
        before = graph.num_edges()
        removed = gp.filter_view_graph_cycles_by_rotation(graph, 3.0)
        assert 0 < removed < before

    def test_1dsfm_filter(self, rng):
        gt_aa, gt_pos, graph = make_scene(25, 120, 0.0, 0.01, rng)
        orient = {i: gt_aa[i] for i in range(25)}
        # Corrupt 10 edges with reversed translations.
        keys = list(graph.edges.keys())[:10]
        for (a, b) in keys:
            graph.edges[(a, b)].position_2 = -graph.edges[(a, b)].position_2
        removed = gp.filter_view_pairs_from_relative_translation(
            graph, orient
        )
        still_bad = sum(1 for k in keys if k in graph.edges)
        assert removed >= 5 and still_bad <= 5
