"""End-to-end global SfM on a synthetic scene.

Mirrors the reference's estimator test pattern (SURVEY.md §4): synthesize
ground truth -> add calibrated noise -> run -> assert tolerance
(cf. `global_reconstruction_estimator` usage in `pytests/sfm_pipeline.py`).
"""

import numpy as np
import pytest

from pytheiasfm_tpu.sfm.estimator_options import (
    GlobalPositionEstimatorType,
    ReconstructionEstimatorOptions,
)
from pytheiasfm_tpu.sfm.global_estimator import GlobalReconstructionEstimator
from pytheiasfm_tpu.utils.synthetic import (
    SyntheticSceneOptions,
    add_view_graph_edges,
    generate_scene,
)


def _ate(recon, gt_ext):
    """Sim3-aligned mean camera-position error."""
    import jax.numpy as jnp

    from pytheiasfm_tpu.transforms import align_point_clouds_umeyama, sim3_transform_points

    est_ids = [v for v in range(recon.num_views()) if recon.view_estimated[v]]
    assert len(est_ids) >= 3
    est = np.stack([recon.view_extrinsics[v, :3] for v in est_ids])
    gt = gt_ext[est_ids, :3]
    R, t, s = align_point_clouds_umeyama(jnp.asarray(est), jnp.asarray(gt))
    aligned = np.asarray(sim3_transform_points(jnp.asarray(est), R, t, s))
    return float(np.mean(np.linalg.norm(aligned - gt, axis=-1))), len(est_ids)


@pytest.mark.parametrize("noise_deg", [0.0, 1.0])
def test_global_pipeline_synthetic(noise_deg):
    scene_opt = SyntheticSceneOptions(
        num_views=8, num_tracks=150, pixel_noise=0.3, seed=7
    )
    recon, gt_ext, gt_pts = generate_scene(scene_opt)
    vg = add_view_graph_edges(
        recon,
        gt_ext,
        min_shared_tracks=20,
        rotation_noise_degrees=noise_deg,
        position_noise_degrees=noise_deg,
        seed=3,
    )
    assert vg.num_edges() >= scene_opt.num_views  # well connected

    options = ReconstructionEstimatorOptions(
        min_num_two_view_inliers=20,
        num_retriangulation_iterations=1,
    )
    estimator = GlobalReconstructionEstimator(options)
    summary = estimator.estimate(vg, recon)

    assert summary.success, summary.message
    assert len(summary.estimated_views) >= 6
    assert len(summary.estimated_tracks) >= 50

    ate, n = _ate(recon, gt_ext)
    # Cameras sit on a radius-10 ring; demand sub-percent ATE.
    tol = 0.05 if noise_deg == 0 else 0.3
    assert ate < tol, f"ATE {ate:.4f} over {n} cams (noise {noise_deg} deg)"


def test_global_pipeline_nonlinear_position():
    scene_opt = SyntheticSceneOptions(num_views=8, num_tracks=120, seed=11)
    recon, gt_ext, _ = generate_scene(scene_opt)
    vg = add_view_graph_edges(recon, gt_ext, min_shared_tracks=20)
    options = ReconstructionEstimatorOptions(
        global_position_estimator_type=GlobalPositionEstimatorType.NONLINEAR,
        min_num_two_view_inliers=20,
        num_retriangulation_iterations=0,
    )
    summary = GlobalReconstructionEstimator(options).estimate(vg, recon)
    assert summary.success
    ate, _ = _ate(recon, gt_ext)
    assert ate < 0.1, f"ATE {ate}"
