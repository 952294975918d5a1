"""BA priors + covariance extraction tests.

Mirrors `pytests/sfm/bundle_adjuster_test.py` (position priors with sqrt
information matrices) and the WithCov entry points
(`bundle_adjustment.h:221-250`).
"""

import numpy as np
import jax.numpy as jnp

from pytheiasfm_tpu.ba import entry as ba
from pytheiasfm_tpu.ba.lm import BundleAdjustmentOptions
from pytheiasfm_tpu.utils import synthetic


def _scene(rng, V=6, T=40):
    return synthetic.random_reconstruction(
        num_views=V, num_tracks=T, seed=int(rng.integers(1 << 30))
    )


def test_position_priors_pull_solution():
    rng = np.random.default_rng(71)
    recon = _scene(rng)
    gt_positions = recon.view_extrinsics[:, :3].copy()
    # Perturb camera positions; give every view a strong position prior at GT.
    recon.view_extrinsics[:, :3] += rng.normal(size=(recon.num_views(), 3)) * 0.05
    for v in range(recon.num_views()):
        recon.view_priors[v].position = gt_positions[v]
        recon.view_priors[v].position_sqrt_information = np.eye(3) * 1e3
    opts = BundleAdjustmentOptions(use_position_priors=True)
    summary = ba.bundle_adjust_reconstruction(opts, recon, dtype=np.float64)
    assert bool(summary.success)
    err = np.abs(recon.view_extrinsics[:, :3] - gt_positions).max()
    assert err < 1e-3, err


def test_gravity_priors():
    rng = np.random.default_rng(72)
    recon = _scene(rng)
    # Gravity prior consistent with current orientation: g_cam = R (0,0,-1).
    from pytheiasfm_tpu.ops import rotation as rotops

    aa = recon.view_extrinsics[:, 3:6]
    R = np.asarray(rotops.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    g_cam = R @ np.array([0.0, 0.0, -1.0])
    for v in range(recon.num_views()):
        recon.view_priors[v].gravity = g_cam[v]
        recon.view_priors[v].gravity_sqrt_information = np.eye(3) * 100.0
    opts = BundleAdjustmentOptions(use_gravity_priors=True)
    summary = ba.bundle_adjust_reconstruction(opts, recon, dtype=np.float64)
    assert bool(summary.success)
    # Orientations should stay consistent with the gravity priors.
    R2 = np.asarray(
        rotops.angle_axis_to_rotation_matrix(
            jnp.asarray(recon.view_extrinsics[:, 3:6])
        )
    )
    g2 = R2 @ np.array([0.0, 0.0, -1.0])
    assert np.abs(g2 - g_cam).max() < 1e-2


def test_view_covariance():
    rng = np.random.default_rng(73)
    recon = _scene(rng)
    opts = BundleAdjustmentOptions()
    summary, cov, vf = ba.bundle_adjust_view_with_cov(opts, 1, recon, np.float64)
    assert cov is not None and cov.shape == (6, 6)
    # Covariance must be symmetric positive definite.
    assert np.abs(cov - cov.T).max() < 1e-9 * max(1.0, np.abs(cov).max())
    evals = np.linalg.eigvalsh(cov)
    assert evals.min() > 0
    assert vf >= 0


def test_track_covariance():
    rng = np.random.default_rng(74)
    recon = _scene(rng)
    opts = BundleAdjustmentOptions()
    summary, covs, vf = ba.bundle_adjust_tracks_with_cov(opts, [0, 1, 2], recon, np.float64)
    assert covs is not None and len(covs) == 3
    for c in covs.values():
        assert c.shape == (3, 3)
        assert np.linalg.eigvalsh(c).min() > 0


def test_joint_reconstruction_covariance_entry(rng):
    """compute_reconstruction_covariance on a small solved scene: SPD
    blocks for every free view/track, larger point uncertainty for
    shorter tracks on average."""
    from pytheiasfm_tpu.ba.entry import compute_reconstruction_covariance
    from pytheiasfm_tpu.ba.lm import BundleAdjustmentOptions
    from pytheiasfm_tpu.pipelines.synthetic_global import build_scene
    from pytheiasfm_tpu.sfm.estimator_options import (
        ReconstructionEstimatorOptions,
        ReconstructionEstimatorType,
    )
    from pytheiasfm_tpu.sfm.reconstruction_estimator import (
        create_reconstruction_estimator,
    )

    recon, graph, _gt = build_scene(V=24, T=800, neighborhood=8, seed=3)
    options = ReconstructionEstimatorOptions(
        reconstruction_estimator_type=ReconstructionEstimatorType.GLOBAL
    )
    summary = create_reconstruction_estimator(options).estimate(graph, recon)
    assert summary.success
    cam_covs, track_covs, vf = compute_reconstruction_covariance(
        BundleAdjustmentOptions(), recon, constant_views=(0, 1)
    )
    assert vf > 0
    assert len(cam_covs) >= 20 and len(track_covs) >= 500
    for cov in list(cam_covs.values())[:5]:
        ev = np.linalg.eigvalsh(cov)
        assert np.all(ev > 0), ev
    for cov in list(track_covs.values())[:5]:
        ev = np.linalg.eigvalsh(cov)
        assert np.all(ev > 0), ev


def test_selected_covariance_matches_dense(rng):
    """The matrix-free selected-block covariance (PCG against the
    implicit Schur operator) must reproduce the exact dense-path blocks
    — the mechanism that scales `compute_reconstruction_covariance`
    past the dense bound."""
    from pytheiasfm_tpu.ba.entry import compute_reconstruction_covariance
    from pytheiasfm_tpu.ba.lm import BundleAdjustmentOptions
    from pytheiasfm_tpu.pipelines.synthetic_global import build_scene
    from pytheiasfm_tpu.sfm.estimator_options import (
        ReconstructionEstimatorOptions,
        ReconstructionEstimatorType,
    )
    from pytheiasfm_tpu.sfm.reconstruction_estimator import (
        create_reconstruction_estimator,
    )

    recon, graph, _gt = build_scene(V=24, T=800, neighborhood=8, seed=3)
    options = ReconstructionEstimatorOptions(
        reconstruction_estimator_type=ReconstructionEstimatorType.GLOBAL
    )
    assert create_reconstruction_estimator(options).estimate(
        graph, recon
    ).success
    ba = BundleAdjustmentOptions()
    dense_cams, dense_tracks, vf_d = compute_reconstruction_covariance(
        ba, recon, constant_views=(0, 1)
    )
    view_ids = sorted(dense_cams)[:6]
    track_ids = [t for t in sorted(dense_tracks)[:4]]
    sel_cams, sel_tracks, vf_s = compute_reconstruction_covariance(
        ba, recon, constant_views=(0, 1),
        view_ids=view_ids, track_ids=track_ids,
    )
    np.testing.assert_allclose(vf_s, vf_d, rtol=1e-6)
    assert set(sel_cams) == set(view_ids)
    for v in view_ids:
        np.testing.assert_allclose(
            sel_cams[v], dense_cams[v], rtol=1e-3, atol=1e-12
        )
    for t in track_ids:
        np.testing.assert_allclose(
            sel_tracks[t], dense_tracks[t], rtol=1e-3, atol=1e-12
        )
