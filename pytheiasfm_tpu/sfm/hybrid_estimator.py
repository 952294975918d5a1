"""Hybrid SfM pipeline driver (HSfM, Cui et al. CVPR'17).

Re-design of `/root/reference/src/theia/sfm/hybrid_reconstruction_estimator.{h,cc}`
(`h:55-134`): global rotation averaging fixes all camera orientations, then
positions grow incrementally — position-only (2-point) localization with
full-pose fallback, triangulation after each camera, bundle adjustment with
orientations held constant.
"""

from __future__ import annotations

import time

import numpy as np

from ..ba.entry import bundle_adjust_partial_reconstruction
from ..global_pose import rotation_estimator as rot_est
from ..ops import rotation as rotops
from .estimator_options import (
    ReconstructionEstimatorOptions,
    ReconstructionEstimatorSummary,
    set_bundle_adjustment_options,
    set_ransac_parameters,
)
from .localize import (
    LocalizeViewToReconstructionOptions,
    localize_view_to_reconstruction,
)
from .reconstruction_estimator_utils import (
    num_estimated_tracks,
    num_estimated_views,
    set_outlier_tracks_to_unestimated,
    set_underconstrained_tracks_to_unestimated,
    set_underconstrained_views_to_unestimated,
)
from ..utils.log import logger
from .track_estimator import TrackEstimatorOptions, estimate_tracks
from .visibility_pyramid import VisibilityPyramid

__all__ = ["HybridReconstructionEstimator"]

kMinNumInitialTracks = 100
kMinNumObserved3dPoints = 30
kNumPyramidLevels = 6


class HybridReconstructionEstimator:
    """Parity: `theia::HybridReconstructionEstimator`
    (`hybrid_reconstruction_estimator.h:86`)."""

    def __init__(self, options: ReconstructionEstimatorOptions | None = None):
        self.options = options or ReconstructionEstimatorOptions()

    def estimate(self, view_graph, recon) -> ReconstructionEstimatorSummary:
        opt = self.options
        self.recon = recon
        self.view_graph = view_graph
        self.summary = ReconstructionEstimatorSummary()
        self.reconstructed_views: list[int] = []
        self.num_optimized_views = 0
        t_start = time.perf_counter()

        self.triangulation_options = TrackEstimatorOptions(
            max_acceptable_reprojection_error_pixels=(
                opt.triangulation_max_reprojection_error_in_pixels
            ),
            min_triangulation_angle_degrees=opt.min_triangulation_angle_degrees,
            bundle_adjustment=opt.bundle_adjust_tracks,
            triangulation_method=opt.triangulation_method,
        )
        base_loc = LocalizeViewToReconstructionOptions(
            reprojection_error_threshold_pixels=(
                opt.absolute_pose_reprojection_error_threshold
            ),
            ransac_params=set_ransac_parameters(opt),
            min_num_inliers=opt.min_num_absolute_pose_inliers,
            pnp_type=int(opt.localization_pnp_type),
        )
        self.localization_options = base_loc

        recon.set_camera_intrinsics_from_priors()

        # Step 1: global camera orientations (hybrid_reconstruction_
        # estimator.cc:309, `EstimateCameraOrientations`).
        t0 = time.perf_counter()
        self.orientations = rot_est.estimate_rotations(
            view_graph, int(opt.global_rotation_estimator_type)
        )
        for v, aa in self.orientations.items():
            recon.view_extrinsics[v, 3:] = np.asarray(aa)
        self.summary.pose_estimation_time += time.perf_counter() - t0
        logger.info(
            "hybrid: %d global orientations in %.3fs",
            len(self.orientations),
            self.summary.pose_estimation_time,
        )

        self.unlocalized_views = {
            v for v in view_graph.view_ids() if not recon.view_estimated[v]
        }

        # Steps 2-3: seed pair with positions in the global-rotation frame.
        if not self._choose_initial_view_pair():
            self.summary.success = False
            self.summary.message = "no suitable initial pair"
            logger.warning("hybrid SfM aborted: no suitable initial pair")
            return self.summary

        # Steps 4-7: position localization loop.
        views_to_localize: list[int] = []
        failed = -1
        while self.unlocalized_views and failed != len(views_to_localize):
            failed = 0
            views_to_localize = self._find_views_to_localize()
            if not views_to_localize:
                break
            for v in views_to_localize:
                t0 = time.perf_counter()
                ok = self._localize_view(v)
                self.summary.pose_estimation_time += time.perf_counter() - t0
                if not ok:
                    failed += 1
                    continue
                self.reconstructed_views.append(v)
                self.unlocalized_views.discard(v)

                t0 = time.perf_counter()
                self._estimate_structure(v)
                self.summary.triangulation_time += time.perf_counter() - t0

                t0 = time.perf_counter()
                if (
                    self._unoptimized_growth_percentage()
                    >= opt.full_bundle_adjustment_growth_percent
                ):
                    self._bundle_adjust(full=True)
                    set_underconstrained_tracks_to_unestimated(recon)
                    set_underconstrained_views_to_unestimated(recon)
                else:
                    self._bundle_adjust(full=False)
                self.summary.bundle_adjustment_time += time.perf_counter() - t0

        t0 = time.perf_counter()
        self._bundle_adjust(full=True, final=True)
        set_underconstrained_tracks_to_unestimated(recon)
        set_underconstrained_views_to_unestimated(recon)
        self.summary.bundle_adjustment_time += time.perf_counter() - t0

        self.summary.estimated_views = {
            v for v in range(recon.num_views()) if recon.view_estimated[v]
        }
        self.summary.estimated_tracks = {
            t for t in range(recon.num_tracks()) if recon.track_estimated[t]
        }
        self.summary.success = (
            num_estimated_views(recon) >= 2 and num_estimated_tracks(recon) > 0
        )
        self.summary.total_time = time.perf_counter() - t_start
        logger.info(
            "hybrid SfM: %d views, %d tracks in %.3fs (R %.3fs, tri %.3fs, "
            "BA %.3fs)",
            num_estimated_views(recon),
            num_estimated_tracks(recon),
            self.summary.total_time,
            self.summary.pose_estimation_time,
            self.summary.triangulation_time,
            self.summary.bundle_adjustment_time,
        )
        self.summary.message = (
            f"estimated {num_estimated_views(recon)} views, "
            f"{num_estimated_tracks(recon)} tracks"
        )
        return self.summary

    # ----------------------------------------------------------- sub-stages

    def _choose_initial_view_pair(self) -> bool:
        """Parity: `ChooseInitialViewPair` + `InitializeCamerasFromTwoViewInfo`
        (hybrid_reconstruction_estimator.cc): positions seeded in the
        coordinate frame of the GLOBAL orientations — the relative position
        rotates by R_1ᵀ into world."""
        import jax.numpy as jnp

        recon = self.recon
        candidates = sorted(
            (
                (info.num_homography_inliers, -info.num_verified_matches, (i, j))
                for (i, j), info in self.view_graph.edges.items()
                if info.num_verified_matches > kMinNumInitialTracks
                and i in self.orientations
                and j in self.orientations
            ),
        )
        for _, _, (i, j) in candidates:
            recon.view_estimated[:] = False
            recon.track_estimated[:] = False
            info = self.view_graph.get_edge(i, j)
            R1 = np.asarray(
                rotops.angle_axis_to_rotation_matrix(
                    jnp.asarray(self.orientations[i])
                )
            )
            recon.view_extrinsics[i, :3] = 0.0
            recon.view_extrinsics[i, 3:] = self.orientations[i]
            recon.view_extrinsics[j, :3] = R1.T @ np.asarray(info.position_2)
            recon.view_extrinsics[j, 3:] = self.orientations[j]
            recon.view_estimated[i] = True
            recon.view_estimated[j] = True

            self._estimate_structure(i)
            if num_estimated_tracks(recon) < kMinNumInitialTracks:
                continue
            if not self._bundle_adjust(full=True):
                continue
            if num_estimated_tracks(recon) > kMinNumInitialTracks:
                self.reconstructed_views = [i, j]
                self.unlocalized_views.discard(i)
                self.unlocalized_views.discard(j)
                return True
        return False

    def _localize_view(self, view_id: int) -> bool:
        """Parity: `LocalizeView` (.cc:285-306): position-only first (the
        orientation is known from rotation averaging), full pose fallback."""
        import dataclasses

        if view_id in self.orientations:
            self.recon.view_extrinsics[view_id, 3:] = self.orientations[view_id]
            opts = dataclasses.replace(
                self.localization_options,
                assume_known_orientation=True,
                bundle_adjust_view=False,
            )
            ok, _ = localize_view_to_reconstruction(view_id, opts, self.recon)
            if ok:
                return True
        opts = dataclasses.replace(
            self.localization_options, assume_known_orientation=False
        )
        ok, _ = localize_view_to_reconstruction(view_id, opts, self.recon)
        return ok

    def _find_views_to_localize(self) -> list[int]:
        recon = self.recon
        scores = []
        for v in self.unlocalized_views:
            prior = recon.view_priors[v]
            width = prior.image_width or 1024
            height = prior.image_height or 768
            pyramid = VisibilityPyramid(width, height, kNumPyramidLevels)
            n = 0
            for t, r in recon._view_track_to_obs[v].items():
                if recon.track_estimated[t]:
                    n += 1
                    pyramid.add_point(recon.obs_uv[r])
            if n >= kMinNumObserved3dPoints:
                scores.append((pyramid.compute_score(), v))
        scores.sort(reverse=True)
        return [v for _, v in scores]

    def _estimate_structure(self, view_id: int):
        estimate_tracks(
            self.recon,
            self.recon.tracks_in_view(view_id),
            self.triangulation_options,
        )

    def _unoptimized_growth_percentage(self) -> float:
        if self.num_optimized_views == 0:
            return 100.0
        return (
            100.0
            * (len(self.reconstructed_views) - self.num_optimized_views)
            / self.num_optimized_views
        )

    def _bundle_adjust(self, full: bool, final: bool = False) -> bool:
        """BA with orientations constant; the final pass frees full poses
        (the reference's last full BA refines everything)."""
        opt = self.options
        recon = self.recon
        if full:
            views = [
                v for v in range(recon.num_views()) if recon.view_estimated[v]
            ]
            self.num_optimized_views = len(self.reconstructed_views)
        else:
            k = min(
                len(self.reconstructed_views),
                opt.partial_bundle_adjustment_num_views,
            )
            views = self.reconstructed_views[-k:]
        tracks = {
            t
            for v in views
            for t in recon.tracks_in_view(v)
            if recon.track_estimated[t]
        }
        ba_options = set_bundle_adjustment_options(opt, len(views))
        summary = bundle_adjust_partial_reconstruction(
            ba_options,
            views,
            tracks,
            recon,
            orientation_constant=not final,
        )
        if full:
            set_outlier_tracks_to_unestimated(
                recon,
                opt.max_reprojection_error_in_pixels,
                opt.min_triangulation_angle_degrees,
            )
        return bool(summary.success)
