"""Incremental SfM pipeline driver.

Re-design of `/root/reference/src/theia/sfm/
incremental_reconstruction_estimator.{h,cc}` (`h:81-141`, flow `.cc:161-298`,
SURVEY §3.3). Host orchestration; the per-step numerics (RANSAC P3P
localization, batched track triangulation, implicit-Schur LM BA) are the
same device kernels the global path uses. Per-call batching replaces the
reference's per-view sequential solves where possible: each localization is
one batched RANSAC, each triangulation round is one [T, K] kernel.
"""

from __future__ import annotations

import dataclasses
import time

from ..utils.log import logger

import numpy as np

from ..ba.entry import bundle_adjust_partial_reconstruction
from .estimator_options import (
    ReconstructionEstimatorOptions,
    ReconstructionEstimatorSummary,
    set_bundle_adjustment_options,
    set_ransac_parameters,
)
from .localize import (
    LocalizeViewToReconstructionOptions,
    localize_view_to_reconstruction,
    localize_views_to_reconstruction_batch,
)
from .reconstruction_estimator_utils import (
    num_estimated_tracks,
    num_estimated_views,
    set_outlier_tracks_to_unestimated,
    set_underconstrained_tracks_to_unestimated,
    set_underconstrained_views_to_unestimated,
)
from .select_tracks import select_good_tracks_for_bundle_adjustment
from .track_estimator import TrackEstimatorOptions, estimate_tracks
from .visibility_pyramid import VisibilityPyramid

__all__ = ["IncrementalReconstructionEstimator"]

kMinNumInitialTracks = 100  # incremental_reconstruction_estimator.cc:326
kMinNumObserved3dPoints = 30  # .cc:432
kNumPyramidLevels = 6  # .cc:433


class IncrementalReconstructionEstimator:
    """Parity: `theia::IncrementalReconstructionEstimator`
    (`incremental_reconstruction_estimator.h:81-141`)."""

    def __init__(self, options: ReconstructionEstimatorOptions | None = None):
        self.options = options or ReconstructionEstimatorOptions()

    # ------------------------------------------------------------- pipeline

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
        self.localization_options = LocalizeViewToReconstructionOptions(
            reprojection_error_threshold_pixels=(
                opt.absolute_pose_reprojection_error_threshold
            ),
            ransac_params=set_ransac_parameters(opt),
            min_num_inliers=opt.min_num_absolute_pose_inliers,
            pnp_type=int(opt.localization_pnp_type),
        )

        self.unlocalized_views = {
            v for v in view_graph.view_ids() if not recon.view_estimated[v]
        }

        t0 = time.perf_counter()
        recon.set_camera_intrinsics_from_priors()
        self.summary.camera_intrinsics_calibration_time = (
            time.perf_counter() - t0
        )

        # Steps 1-3: initial seed pair (.cc:186-199).
        if (
            num_estimated_tracks(recon) < opt.min_num_absolute_pose_inliers
            or num_estimated_views(recon) < 2
        ):
            if not self._choose_initial_view_pair():
                self.summary.success = False
                self.summary.message = "no suitable initial pair"
                return self.summary
        else:
            self.reconstructed_views = [
                v for v in range(recon.num_views()) if recon.view_estimated[v]
            ]
            self.unlocalized_views -= set(self.reconstructed_views)
            self.num_optimized_views = len(self.reconstructed_views)

        # Step 4-6 loop: localize -> triangulate -> BA (.cc:205-298).
        # BATCHED mapping of the reference's candidate sweep: the reference
        # localizes the ranked candidates one at a time, re-triangulating
        # and bundle-adjusting after each (.cc:221-298) — at 200+ views
        # that schedule is one RANSAC launch, one triangulation launch,
        # and one BA PER VIEW. Here each pass localizes the candidates
        # within `multiple_view_localization_ratio` of the best visibility
        # score (capped at the partial-BA window so every new view is
        # optimized before the next pass) in ONE vmapped RANSAC launch,
        # triangulates the union of their tracks in one launch, and runs
        # one partial/full BA — same growth policy, device-shaped.
        views_to_localize: list[int] = []
        failed = -1
        while self.unlocalized_views and failed != len(views_to_localize):
            failed = 0
            t0 = time.perf_counter()
            scored = self._find_views_to_localize(with_scores=True)
            self.summary.pose_estimation_time += time.perf_counter() - t0
            if not scored:
                break
            best_score = scored[0][0]
            cutoff = best_score * opt.multiple_view_localization_ratio
            batch = [v for s, v in scored if s >= cutoff]
            batch = batch[: max(1, opt.partial_bundle_adjustment_num_views)]
            views_to_localize = batch
            logger.info(
                "localizing %d candidate views in one launch (%d unlocalized)",
                len(batch),
                len(self.unlocalized_views),
            )
            t0 = time.perf_counter()
            localized = localize_views_to_reconstruction_batch(
                batch, self.localization_options, recon
            )
            self.summary.pose_estimation_time += time.perf_counter() - t0
            failed = len(batch) - len(localized)
            if not localized:
                continue
            new_views = list(localized)
            self.reconstructed_views.extend(new_views)
            self.unlocalized_views -= set(new_views)

            # Outlier tracks seen in the new views (.cc:236-246).
            tracks_new: set[int] = set()
            for v in new_views:
                tracks_new.update(recon.tracks_in_view(v))
            set_outlier_tracks_to_unestimated(
                recon,
                self.triangulation_options.max_acceptable_reprojection_error_pixels,
                self.triangulation_options.min_triangulation_angle_degrees,
                track_ids=tracks_new,
            )

            t0 = time.perf_counter()
            estimate_tracks(recon, tracks_new, self.triangulation_options)
            self.summary.triangulation_time += time.perf_counter() - t0

            t0 = time.perf_counter()
            if (
                self._unoptimized_growth_percentage()
                < opt.full_bundle_adjustment_growth_percent
            ):
                self._partial_bundle_adjustment()
            else:
                self._full_bundle_adjustment()
                set_underconstrained_tracks_to_unestimated(recon)
                set_underconstrained_views_to_unestimated(recon)
            self.summary.bundle_adjustment_time += time.perf_counter() - t0

        # Final full BA + pruning (.cc end of Estimate).
        t0 = time.perf_counter()
        self._full_bundle_adjustment()
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
        self.summary.message = (
            f"estimated {num_estimated_views(recon)} views, "
            f"{num_estimated_tracks(recon)} tracks"
        )
        return self.summary

    # ----------------------------------------------------------- sub-stages

    def _choose_initial_view_pair(self) -> bool:
        """Parity: `ChooseInitialViewPair` (.cc:325-384): candidates ordered
        by (fewest homography inliers, most verified matches); seed accepted
        when 2-view triangulation yields enough tracks and BA succeeds."""
        recon = self.recon
        candidates = sorted(
            (
                (info.num_homography_inliers, -info.num_verified_matches, (i, j))
                for (i, j), info in self.view_graph.edges.items()
                if info.num_verified_matches > kMinNumInitialTracks
            ),
        )
        for _, _, (i, j) in candidates:
            recon.view_estimated[:] = False
            recon.track_estimated[:] = False
            self._initialize_cameras_from_two_view_info(i, j)
            self._estimate_structure(i)
            if num_estimated_tracks(recon) < kMinNumInitialTracks:
                continue
            if not self._full_bundle_adjustment():
                continue
            if num_estimated_tracks(recon) > kMinNumInitialTracks:
                self.reconstructed_views = [i, j]
                self.unlocalized_views.discard(i)
                self.unlocalized_views.discard(j)
                return True
        return False

    def _initialize_cameras_from_two_view_info(self, v1: int, v2: int):
        """Parity: `InitializeCamerasFromTwoViewInfo` (.cc:305-323)."""
        recon = self.recon
        info = self.view_graph.get_edge(v1, v2)
        recon.view_extrinsics[v1] = 0.0
        recon.view_extrinsics[v2, :3] = info.position_2
        recon.view_extrinsics[v2, 3:] = info.rotation_2
        if info.focal_length_1 > 0:
            recon.intrinsics[recon.view_group[v1]][0] = info.focal_length_1
        if info.focal_length_2 > 0:
            recon.intrinsics[recon.view_group[v2]][0] = info.focal_length_2
        recon.view_estimated[v1] = True
        recon.view_estimated[v2] = True

    def _find_views_to_localize(self, with_scores: bool = False):
        """Parity: `FindViewsToLocalize` (.cc:427-464): rank unlocalized
        views by visibility-pyramid score over their estimated tracks."""
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
        if with_scores:
            return scores
        return [v for _, v in scores]

    def _estimate_structure(self, view_id: int):
        """Parity: `EstimateStructure` (.cc:465-474): triangulate the
        tracks observed by this view."""
        estimate_tracks(
            self.recon,
            self.recon.tracks_in_view(view_id),
            self.triangulation_options,
        )

    def _unoptimized_growth_percentage(self) -> float:
        """Parity: `UnoptimizedGrowthPercentage` (.cc:477)."""
        if self.num_optimized_views == 0:
            return 100.0
        return (
            100.0
            * (len(self.reconstructed_views) - self.num_optimized_views)
            / self.num_optimized_views
        )

    def _select_tracks(self, views) -> set[int]:
        opt = self.options
        if opt.subsample_tracks_for_bundle_adjustment:
            return select_good_tracks_for_bundle_adjustment(
                self.recon,
                views,
                opt.track_subset_selection_long_track_length_threshold,
                opt.track_selection_image_grid_cell_size_pixels,
                opt.min_num_optimized_tracks_per_view,
            )
        tracks = set()
        for v in views:
            for t in self.recon.tracks_in_view(v):
                if self.recon.track_estimated[t]:
                    tracks.add(t)
        return tracks

    def _full_bundle_adjustment(self) -> bool:
        """Parity: `FullBundleAdjustment` (.cc:482-518)."""
        opt = self.options
        recon = self.recon
        ba_options = set_bundle_adjustment_options(
            opt, len(self.reconstructed_views)
        )
        views = [v for v in range(recon.num_views()) if recon.view_estimated[v]]
        tracks = self._select_tracks(views)
        summary = bundle_adjust_partial_reconstruction(
            ba_options, views, tracks, recon
        )
        self.num_optimized_views = len(self.reconstructed_views)
        set_outlier_tracks_to_unestimated(
            recon,
            opt.max_reprojection_error_in_pixels,
            opt.min_triangulation_angle_degrees,
        )
        return bool(summary.success)

    def _partial_bundle_adjustment(self) -> bool:
        """Parity: `PartialBundleAdjustment` (.cc:521-577): the k most
        recently added views."""
        opt = self.options
        recon = self.recon
        k = min(
            len(self.reconstructed_views), opt.partial_bundle_adjustment_num_views
        )
        views = self.reconstructed_views[-k:]
        ba_options = set_bundle_adjustment_options(opt, k)
        tracks = self._select_tracks(views)
        summary = bundle_adjust_partial_reconstruction(
            ba_options, views, tracks, recon
        )
        return bool(summary.success)
