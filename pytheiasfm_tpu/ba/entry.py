"""Bundle-adjustment entry points over the host `Reconstruction` container.

Re-design of `/root/reference/src/theia/sfm/bundle_adjustment/
bundle_adjustment.{h,cc}` (`BundleAdjustReconstruction`,
`BundleAdjustPartialReconstruction`, `BundleAdjustView(s)`,
`BundleAdjustTrack(s)` — decls `bundle_adjustment.h:181-219`). All variants
are ONE batched LM kernel (`ba/lm.py`) with different free-parameter masks;
the reference instead builds a fresh Ceres problem per call.

Padding discipline: the observation count is padded to the next power of
two and V/T paddings ride the container sizes, so repeated calls at similar
scene sizes reuse the jit cache.
"""

from __future__ import annotations

import numpy as np

from .lm import BundleAdjustmentOptions, BundleAdjustmentSummary, bundle_adjust

__all__ = [
    "bundle_adjust_reconstruction",
    "bundle_adjust_partial_reconstruction",
    "bundle_adjust_views",
    "bundle_adjust_tracks",
    "bundle_adjust_view",
    "bundle_adjust_track",
]


def _pad_pow2(n: int, floor: int = 16) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


def _gather_problem(recon, view_sel, track_sel, dtype):
    """Build the padded flat BA problem from the host container.

    view_sel/track_sel: boolean arrays — which views/tracks PARTICIPATE
    (residuals included). Observations of non-participating views/tracks are
    excluded entirely, matching BundleAdjustPartialReconstruction.
    """
    ov, ot = recon.obs_view, recon.obs_track
    rows = np.where(view_sel[ov] & track_sel[ot])[0]
    O = len(rows)
    Opad = _pad_pow2(max(O, 1))

    models = {int(recon.group_model[g]) for g in np.unique(recon.view_group)}
    if len(models) > 1:
        raise NotImplementedError(
            "mixed camera models in one BA problem not yet supported"
        )
    model = models.pop() if models else 0

    P = recon.intrinsics.shape[1]
    intr_rows = np.zeros((Opad, P), dtype)
    obs_view = np.zeros((Opad,), np.int32)
    obs_track = np.zeros((Opad,), np.int32)
    obs_uv = np.zeros((Opad, 2), dtype)
    obs_info = np.ones((Opad, 2), dtype)
    obs_mask = np.zeros((Opad,), bool)

    obs_view[:O] = ov[rows]
    obs_track[:O] = ot[rows]
    obs_uv[:O] = recon.obs_uv[rows]
    obs_info[:O] = recon.obs_sqrt_inv_cov[rows]
    obs_mask[:O] = True
    intr_rows[:O] = recon.intrinsics[recon.view_group[ov[rows]]]

    w = recon.points[:, 3:4]
    pts3 = recon.points[:, :3] / np.where(np.abs(w) < 1e-12, 1.0, w)
    return dict(
        extrinsics=recon.view_extrinsics.astype(dtype),
        points=pts3.astype(dtype),
        intrinsics_rows=intr_rows,
        obs_view=obs_view,
        obs_track=obs_track,
        obs_uv=obs_uv,
        obs_sqrt_info=obs_info,
        obs_mask=obs_mask,
        model=model,
    )


def _run(
    recon,
    view_sel,
    track_sel,
    camera_free,
    point_free,
    options,
    dtype,
    orientation_constant: bool = False,
):
    import jax.numpy as jnp

    prob = _gather_problem(recon, view_sel, track_sel, dtype)
    # Pad parameter axes so the jitted kernel is reused as the scene grows.
    V, T = recon.num_views(), recon.num_tracks()
    Vp, Tp = _pad_pow2(V, 8), _pad_pow2(T, 64)
    ext_in = np.zeros((Vp, 6), dtype)
    ext_in[:V] = prob["extrinsics"]
    pts_in = np.zeros((Tp, 3), dtype)
    pts_in[:T] = prob["points"]
    if orientation_constant:
        # Per-DOF mask: positions free, angle-axis rows frozen (HSfM-style).
        cam_free_p = np.zeros((Vp, 6), bool)
        cam_free_p[:V, :3] = camera_free[:, None]
    else:
        cam_free_p = np.zeros(Vp, bool)
        cam_free_p[:V] = camera_free
    pt_free_p = np.zeros(Tp, bool)
    pt_free_p[:T] = point_free

    ext, pts, summary = bundle_adjust(
        jnp.asarray(ext_in),
        jnp.asarray(pts_in),
        jnp.asarray(prob["intrinsics_rows"]),
        jnp.asarray(prob["obs_view"]),
        jnp.asarray(prob["obs_track"]),
        jnp.asarray(prob["obs_uv"]),
        jnp.asarray(prob["obs_sqrt_info"]),
        jnp.asarray(prob["obs_mask"]),
        jnp.asarray(cam_free_p),
        jnp.asarray(pt_free_p),
        model=prob["model"],
        num_views=Vp,
        num_tracks=Tp,
        options=options,
    )
    ext = np.asarray(ext, recon.dtype)[:V]
    pts = np.asarray(pts, recon.dtype)[:T]
    recon.view_extrinsics[camera_free] = ext[camera_free]
    recon.points[point_free, :3] = pts[point_free]
    recon.points[point_free, 3] = 1.0
    return summary


def bundle_adjust_reconstruction(
    options: BundleAdjustmentOptions, recon, dtype=np.float32
) -> BundleAdjustmentSummary:
    """Parity: `theia::BundleAdjustReconstruction`
    (`bundle_adjustment.cc:188`) — all estimated views + tracks."""
    view_sel = recon.view_estimated.copy()
    track_sel = recon.track_estimated.copy()
    return _run(recon, view_sel, track_sel, view_sel, track_sel, options, dtype)


def bundle_adjust_partial_reconstruction(
    options: BundleAdjustmentOptions,
    views_to_optimize,
    tracks_to_optimize,
    recon,
    dtype=np.float32,
    orientation_constant: bool = False,
) -> BundleAdjustmentSummary:
    """Parity: `theia::BundleAdjustPartialReconstruction`
    (`bundle_adjustment.h:188`): only the given views/tracks move; their
    residuals still couple to estimated-but-constant neighbors.
    `orientation_constant=True` freezes camera orientations (hybrid/HSfM)."""
    V, T = recon.num_views(), recon.num_tracks()
    cam_free = np.zeros(V, bool)
    pt_free = np.zeros(T, bool)
    for v in views_to_optimize:
        if recon.view_estimated[v]:
            cam_free[v] = True
    for t in tracks_to_optimize:
        if recon.track_estimated[t]:
            pt_free[t] = True
    view_sel = recon.view_estimated.copy()
    track_sel = recon.track_estimated.copy()
    return _run(
        recon, view_sel, track_sel, cam_free, pt_free, options, dtype,
        orientation_constant=orientation_constant,
    )


def bundle_adjust_views(
    options: BundleAdjustmentOptions, view_ids, recon, dtype=np.float32
) -> BundleAdjustmentSummary:
    """Parity: `theia::BundleAdjustViews` (`bundle_adjustment.h:199`):
    optimize the given views with all tracks constant."""
    return bundle_adjust_partial_reconstruction(
        options, view_ids, [], recon, dtype
    )


def bundle_adjust_view(options, view_id, recon, dtype=np.float32):
    """Parity: `theia::BundleAdjustView` (`bundle_adjustment.h:195`)."""
    return bundle_adjust_views(options, [view_id], recon, dtype)


def bundle_adjust_tracks(
    options: BundleAdjustmentOptions, track_ids, recon, dtype=np.float32
) -> BundleAdjustmentSummary:
    """Parity: `theia::BundleAdjustTracks` (`bundle_adjustment.h:214`):
    optimize the given tracks with all views constant."""
    return bundle_adjust_partial_reconstruction(
        options, [], track_ids, recon, dtype
    )


def bundle_adjust_track(options, track_id, recon, dtype=np.float32):
    """Parity: `theia::BundleAdjustTrack` (`bundle_adjustment.h:206`)."""
    return bundle_adjust_tracks(options, [track_id], recon, dtype)
