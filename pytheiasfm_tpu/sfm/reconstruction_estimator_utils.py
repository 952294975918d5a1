"""Shared helpers for the reconstruction estimators.

Re-design of `/root/reference/src/theia/sfm/reconstruction_estimator_utils.{h,cc}`
and `set_outlier_tracks_to_unestimated.{h,cc}`. The reference walks the
pointer graph per track/view; here reprojection errors for the WHOLE scene
are computed as one batched kernel over the observation table, and the
track/view gating reduces with segment ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import camera as cam
from ..ops import rotation as rotops

__all__ = [
    "compute_reprojection_errors",
    "set_outlier_tracks_to_unestimated",
    "set_underconstrained_tracks_to_unestimated",
    "set_underconstrained_views_to_unestimated",
    "num_estimated_views",
    "num_estimated_tracks",
    "set_reconstruction_from_estimated_poses",
    "relative_rotations_from_view_graph",
    "create_estimated_subreconstruction",
    "compute_resolution_scaled_threshold",
]

kMinNumObservingViews = 2  # reconstruction_estimator_utils.cc:292
kMinNumObservedTracks = 3  # reconstruction_estimator_utils.cc:323


def compute_resolution_scaled_threshold(
    threshold_pixels: float, image_width: int, image_height: int
) -> float:
    """Parity: `theia::ComputeResolutionScaledThreshold`
    (`reconstruction_estimator_utils.cc`): thresholds are calibrated for a
    1024-px-wide image and scale with the max dimension."""
    max_dim = max(image_width, image_height)
    if max_dim <= 0:
        return threshold_pixels
    return threshold_pixels * max_dim / 1024.0


@partial(jax.jit, static_argnames=("model",))
def _reproject_kernel(ext_o, params_o, pts_o, uv_o, model: int):
    """Per-observation (squared reprojection error [px^2], depth)."""

    from ..models import intrinsics as intr

    def one_obs(e6, params, x3, uv):
        adjusted = x3 - e6[:3]
        p_cam = rotops.angle_axis_rotate_point(e6[3:], adjusted)
        pixel = intr.camera_to_pixel(params, p_cam, model)
        err = jnp.sum((pixel - uv) ** 2)
        return err, p_cam[2]

    return jax.vmap(one_obs)(ext_o, params_o, pts_o, uv_o)


def compute_reprojection_errors(recon, rows: np.ndarray | None = None):
    """Squared pixel reprojection error + depth per observation row,
    batched by intrinsics group (one compile per camera model)."""
    if rows is None:
        rows = np.arange(recon.num_observations())
    rows = np.asarray(rows)
    err = np.full((len(rows),), np.inf, recon.dtype)
    depth = np.zeros((len(rows),), recon.dtype)
    if len(rows) == 0:
        return err, depth
    views = recon.obs_view[rows]
    tracks = recon.obs_track[rows]
    groups = recon.view_group[views]
    w = recon.points[tracks][:, 3:4]
    pts3 = recon.points[tracks][:, :3] / np.where(np.abs(w) < 1e-12, 1.0, w)
    for g in np.unique(groups):
        sel = groups == g
        e, d = _reproject_kernel(
            jnp.asarray(recon.view_extrinsics[views[sel]]),
            jnp.asarray(np.broadcast_to(recon.intrinsics[g], (int(sel.sum()), recon.intrinsics.shape[1]))),
            jnp.asarray(pts3[sel]),
            jnp.asarray(recon.obs_uv[rows[sel]]),
            int(recon.group_model[g]),
        )
        err[sel] = np.asarray(e)
        depth[sel] = np.asarray(d)
    return err, depth


def set_outlier_tracks_to_unestimated(
    recon,
    max_inlier_reprojection_error: float,
    min_triangulation_angle_degrees: float,
    track_ids=None,
) -> int:
    """Parity: `theia::SetOutlierTracksToUnestimated`
    (`set_outlier_tracks_to_unestimated.cc`): an estimated track is dropped
    when any estimated observing view sees it behind the camera, when the
    MEAN squared reprojection error exceeds the threshold, or when the best
    pair of viewing rays subtends less than the minimum angle."""
    max_sq = max_inlier_reprojection_error**2
    min_cos = np.cos(np.deg2rad(min_triangulation_angle_degrees))

    if track_ids is None:
        track_ids = np.where(recon.track_estimated)[0]
    else:
        track_ids = [t for t in track_ids if recon.track_estimated[t]]

    # Gather rows of estimated views observing estimated candidate tracks.
    rows = []
    for t in track_ids:
        for r in recon.track_observations(t):
            if recon.view_estimated[recon.obs_view[r]]:
                rows.append(r)
    rows = np.asarray(rows, np.int64)
    if len(rows) == 0:
        return 0
    err, depth = compute_reprojection_errors(recon, rows)
    tracks = recon.obs_track[rows]

    T = recon.num_tracks()
    sum_err = np.zeros(T)
    cnt = np.zeros(T)
    bad_depth = np.zeros(T, bool)
    np.add.at(sum_err, tracks, err)
    np.add.at(cnt, tracks, 1.0)
    np.logical_or.at(bad_depth, tracks, depth < 0)

    # Viewing-angle test per track.
    w = recon.points[:, 3:4]
    pts3 = recon.points[:, :3] / np.where(np.abs(w) < 1e-12, 1.0, w)
    num_removed = 0
    for t in track_ids:
        if cnt[t] == 0:
            continue
        drop = bad_depth[t] or (sum_err[t] / cnt[t] > max_sq)
        if not drop:
            trows = [
                r
                for r in recon.track_observations(t)
                if recon.view_estimated[recon.obs_view[r]]
            ]
            dirs = pts3[t] - recon.view_extrinsics[recon.obs_view[trows], :3]
            norms = np.linalg.norm(dirs, axis=-1, keepdims=True)
            dirs = dirs / np.where(norms < 1e-12, 1.0, norms)
            cosang = dirs @ dirs.T
            np.fill_diagonal(cosang, 1.0)
            drop = cosang.min() > min_cos
        if drop:
            recon.track_estimated[t] = False
            num_removed += 1
    return num_removed


def set_underconstrained_tracks_to_unestimated(recon) -> int:
    """Parity: `theia::SetUnderconstrainedTracksToUnestimated`
    (`reconstruction_estimator_utils.cc:292-316`): estimated tracks need
    >= 2 estimated observing views."""
    n = 0
    for t in range(recon.num_tracks()):
        if not recon.track_estimated[t]:
            continue
        cnt = sum(
            1
            for r in recon.track_observations(t)
            if recon.view_estimated[recon.obs_view[r]]
        )
        if cnt < kMinNumObservingViews:
            recon.track_estimated[t] = False
            n += 1
    return n


def set_underconstrained_views_to_unestimated(recon) -> int:
    """Parity: `theia::SetUnderconstrainedViewsToUnestimated`
    (`reconstruction_estimator_utils.cc:323-347`): estimated views need
    >= 3 estimated observed tracks."""
    n = 0
    for v in range(recon.num_views()):
        if not recon.view_estimated[v]:
            continue
        cnt = sum(1 for t in recon.tracks_in_view(v) if recon.track_estimated[t])
        if cnt < kMinNumObservedTracks:
            recon.view_estimated[v] = False
            n += 1
    return n


def num_estimated_views(recon) -> int:
    return int(np.sum(recon.view_estimated))


def num_estimated_tracks(recon) -> int:
    return int(np.sum(recon.track_estimated))


def set_reconstruction_from_estimated_poses(orientations, positions, recon):
    """Parity: `theia::SetReconstructionFromEstimatedPoses`
    (`reconstruction_estimator_utils.cc`): every view with both a rotation
    and a position estimate becomes an estimated view."""
    for v, aa in orientations.items():
        if v not in positions:
            continue
        recon.view_extrinsics[v, :3] = np.asarray(positions[v])
        recon.view_extrinsics[v, 3:] = np.asarray(aa)
        recon.view_estimated[v] = True


def relative_rotations_from_view_graph(view_graph):
    """Parity: `theia::RelativeRotationsFromViewGraph`."""
    return {
        (i, j): np.asarray(info.rotation_2)
        for (i, j), info in view_graph.edges.items()
    }


def create_estimated_subreconstruction(recon):
    """Parity: `theia::CreateEstimatedSubreconstruction`."""
    view_ids = [v for v in range(recon.num_views()) if recon.view_estimated[v]]
    return recon.get_sub_reconstruction(view_ids)
