"""End-to-end incremental SfM on a synthetic scene (SURVEY.md §3.3)."""

import numpy as np

from pytheiasfm_tpu.sfm.estimator_options import ReconstructionEstimatorOptions
from pytheiasfm_tpu.sfm.incremental_estimator import (
    IncrementalReconstructionEstimator,
)
from pytheiasfm_tpu.utils.synthetic import (
    SyntheticSceneOptions,
    add_view_graph_edges,
    generate_scene,
)


def _ate(recon, gt_ext):
    import jax.numpy as jnp

    from pytheiasfm_tpu.transforms import (
        align_point_clouds_umeyama,
        sim3_transform_points,
    )

    est_ids = [v for v in range(recon.num_views()) if recon.view_estimated[v]]
    est = np.stack([recon.view_extrinsics[v, :3] for v in est_ids])
    gt = gt_ext[est_ids, :3]
    R, t, s = align_point_clouds_umeyama(jnp.asarray(est), jnp.asarray(gt))
    aligned = np.asarray(sim3_transform_points(jnp.asarray(est), R, t, s))
    return float(np.mean(np.linalg.norm(aligned - gt, axis=-1))), len(est_ids)


def test_incremental_pipeline_synthetic():
    scene_opt = SyntheticSceneOptions(
        num_views=7, num_tracks=300, pixel_noise=0.3, seed=5
    )
    recon, gt_ext, _ = generate_scene(scene_opt)
    vg = add_view_graph_edges(recon, gt_ext, min_shared_tracks=100, seed=1)
    assert vg.num_edges() >= 6

    options = ReconstructionEstimatorOptions(
        min_num_absolute_pose_inliers=30,
        full_bundle_adjustment_growth_percent=30.0,
        max_num_iterations=20,
        # Noise-free-ish synthetic: a small RANSAC budget localizes every
        # view and keeps the default-tier suite fast.
        ransac_max_iterations=256,
    )
    estimator = IncrementalReconstructionEstimator(options)
    summary = estimator.estimate(vg, recon)

    assert summary.success, summary.message
    assert len(summary.estimated_views) >= 6, summary.message
    ate, n = _ate(recon, gt_ext)
    assert ate < 0.1, f"ATE {ate:.4f} over {n} cams"
