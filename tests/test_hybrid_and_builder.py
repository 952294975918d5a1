"""End-to-end hybrid SfM + ReconstructionBuilder multi-stage driver."""

import numpy as np

from pytheiasfm_tpu.sfm.estimator_options import (
    ReconstructionEstimatorOptions,
    ReconstructionEstimatorType,
)
from pytheiasfm_tpu.sfm.hybrid_estimator import HybridReconstructionEstimator
from pytheiasfm_tpu.sfm.reconstruction_builder import (
    ImagePairMatch,
    ReconstructionBuilder,
    ReconstructionBuilderOptions,
)
from pytheiasfm_tpu.utils.synthetic import (
    SyntheticSceneOptions,
    add_view_graph_edges,
    generate_scene,
)


def _ate(recon, gt_pos_by_name):
    import jax.numpy as jnp

    from pytheiasfm_tpu.transforms import (
        align_point_clouds_umeyama,
        sim3_transform_points,
    )

    est_ids = [v for v in range(recon.num_views()) if recon.view_estimated[v]]
    est = np.stack([recon.view_extrinsics[v, :3] for v in est_ids])
    gt = np.stack([gt_pos_by_name[recon.view_names[v]] for v in est_ids])
    R, t, s = align_point_clouds_umeyama(jnp.asarray(est), jnp.asarray(gt))
    aligned = np.asarray(sim3_transform_points(jnp.asarray(est), R, t, s))
    return float(np.mean(np.linalg.norm(aligned - gt, axis=-1))), len(est_ids)


def test_hybrid_pipeline_synthetic():
    scene_opt = SyntheticSceneOptions(
        num_views=7, num_tracks=300, pixel_noise=0.3, seed=9
    )
    recon, gt_ext, _ = generate_scene(scene_opt)
    vg = add_view_graph_edges(recon, gt_ext, min_shared_tracks=100, seed=2)

    options = ReconstructionEstimatorOptions(
        min_num_absolute_pose_inliers=30,
        full_bundle_adjustment_growth_percent=30.0,
        max_num_iterations=20,
        # Noise-free-ish synthetic: a small RANSAC budget localizes every
        # view and keeps the default-tier suite fast.
        ransac_max_iterations=256,
    )
    summary = HybridReconstructionEstimator(options).estimate(vg, recon)
    assert summary.success, summary.message
    assert len(summary.estimated_views) >= 6

    gt_by_name = {recon.view_names[v]: gt_ext[v, :3] for v in range(7)}
    ate, n = _ate(recon, gt_by_name)
    assert ate < 0.1, f"ATE {ate:.4f} over {n} cams"


def test_reconstruction_builder_end_to_end():
    """Builder path: images + pixel matches in, models out (tracks built by
    the union-find track builder rather than pre-populated)."""
    scene_opt = SyntheticSceneOptions(
        num_views=6, num_tracks=250, pixel_noise=0.2, seed=13
    )
    src, gt_ext, _ = generate_scene(scene_opt)
    vg = add_view_graph_edges(src, gt_ext, min_shared_tracks=80, seed=4)

    builder = ReconstructionBuilder(
        ReconstructionBuilderOptions(
            min_num_inlier_matches=30,
            reconstruction_estimator_options=ReconstructionEstimatorOptions(
                reconstruction_estimator_type=ReconstructionEstimatorType.GLOBAL,
                min_num_two_view_inliers=30,
                num_retriangulation_iterations=0,
            ),
        )
    )
    for v in range(src.num_views()):
        builder.add_image_with_camera_intrinsics_prior(
            src.view_names[v], src.view_priors[v]
        )
    for (i, j), info in vg.edges.items():
        shared = sorted(
            set(src.tracks_in_view(i)) & set(src.tracks_in_view(j))
        )
        c1 = np.stack(
            [src.obs_uv[src._view_track_to_obs[i][t]] for t in shared]
        )
        c2 = np.stack(
            [src.obs_uv[src._view_track_to_obs[j][t]] for t in shared]
        )
        match = ImagePairMatch(
            image1=src.view_names[i],
            image2=src.view_names[j],
            twoview_info=info,
            correspondences1=c1,
            correspondences2=c2,
        )
        assert builder.add_two_view_match(
            src.view_names[i], src.view_names[j], match
        )

    models = builder.build_reconstruction()
    assert len(models) >= 1
    model = models[0]
    est = [v for v in range(model.num_views()) if model.view_estimated[v]]
    assert len(est) >= 5

    gt_by_name = {src.view_names[v]: gt_ext[v, :3] for v in range(6)}
    ate, n = _ate(model, gt_by_name)
    assert ate < 0.15, f"ATE {ate:.4f} over {n} cams"
