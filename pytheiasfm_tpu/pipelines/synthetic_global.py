"""Synthetic Notre-Dame-scale GLOBAL SfM pipeline benchmark.

The reference's 1DSfM tables (`docs/content/performance.md:52-70`) time the
global pipeline per phase — Notre Dame (553 cameras): Rotation 4.91 s,
Position 43.37 s, BA 196.22 s, Total 330.71 s on a 2016 CPU. This module
synthesizes a problem at that scale (ring of V cameras, covisibility-local
tracks, noisy relative-pose edges) and drives the REAL
`GlobalReconstructionEstimator` — MST init -> robust rotation averaging ->
orientation filtering -> pairwise-translation refinement -> 1DSfM filter ->
LUD positions -> triangulation -> dense-Schur BA rounds — reporting the
same per-phase split plus Sim3-aligned position accuracy vs the synthetic
ground truth. This exercises every host-loop and device-dispatch path the
fountain run (11 views) is too small to stress.
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["build_scene", "run"]


def _look_at_ring(V, rng):
    """GT cameras on a ring of radius 10 looking at the origin."""
    import jax
    import jax.numpy as jnp

    from ..ops import rotation as rot

    angles = np.sort(rng.uniform(0, 2 * np.pi, V))
    positions = np.stack(
        [10 * np.cos(angles), 10 * np.sin(angles), rng.normal(size=V) * 0.5], -1
    )
    z = -positions / np.linalg.norm(positions, axis=1, keepdims=True)
    x = np.cross(np.broadcast_to([0.0, 0.0, 1.0], z.shape), z)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=1)  # world->cam
    aa = np.asarray(jax.vmap(rot.rotation_matrix_to_angle_axis)(jnp.asarray(R)))
    return positions, R, aa


def build_scene(
    V=553,
    T=50_000,
    obs_per_track=6,
    neighborhood=20,
    noise_px=0.5,
    edge_rot_noise_deg=0.3,
    edge_pos_noise_deg=1.0,
    min_shared_tracks=30,
    seed=0,
):
    """Build (recon, view_graph, gt_positions).

    Tracks are VIEW-LOCAL (each picks `obs_per_track` views within a ring
    `neighborhood` of a random center view) so view pairs have realistic
    shared-track multiplicity; edges are GT relative poses with calibrated
    rotation/direction noise — the output contract of two-view geometric
    verification (`TwoViewInfoFromTwoCameras`, twoview_info.h:114).
    """
    from ..models import camera as cam
    from ..models.intrinsics import CameraIntrinsicsModelType as M
    from ..ops import rotation as rotops
    from ..sfm.reconstruction import CameraIntrinsicsPrior, Reconstruction
    from ..sfm.view_graph import TwoViewInfo, ViewGraph

    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    positions, R, aa = _look_at_ring(V, rng)
    points = rng.uniform(-3, 3, size=(T, 3))

    # Track views: center + distinct ring-local offsets.
    centers = rng.integers(0, V, size=T)
    offs = np.zeros((T, obs_per_track), np.int64)
    for k in range(obs_per_track):
        offs[:, k] = rng.integers(-neighborhood, neighborhood + 1, size=T)
    offs[:, 0] = 0
    track_views = (centers[:, None] + offs) % V
    # Dedup within rows (duplicates dropped by add_observations_bulk).

    prior = CameraIntrinsicsPrior(
        image_width=3072,
        image_height=2048,
        focal_length=1000.0,
        principal_point=(1536.0, 1024.0),
    )
    recon = Reconstruction()
    for v in range(V):
        recon.add_view(f"view_{v:04d}", group_id=0 if v else None, prior=prior)
    recon.set_camera_intrinsics_from_priors()
    recon.add_tracks_bulk(T)

    obs_view = track_views.reshape(-1).astype(np.int32)
    obs_track = np.repeat(np.arange(T, dtype=np.int32), obs_per_track)
    ext = np.concatenate([positions, aa], axis=1)
    depth, pixel = cam.project_point(
        jnp.asarray(ext[obs_view]),
        jnp.asarray(recon.intrinsics[0]),
        jnp.asarray(points[obs_track]),
        M.PINHOLE,
    )
    depth = np.asarray(depth)
    uv = np.asarray(pixel) + rng.normal(size=(len(obs_view), 2)) * noise_px
    good = depth > 0.5
    recon.add_observations_bulk(obs_view[good], obs_track[good], uv[good])

    # View graph: pairs sharing >= min_shared_tracks, GT relative pose +
    # calibrated noise. Edge math runs as a few BATCHED device calls (a
    # per-edge loop of tiny jax ops would pay ~5 ms dispatch each).
    import jax

    tv = track_views
    P = obs_per_track
    pairs_a = []
    pairs_b = []
    for i in range(P):
        for j in range(i + 1, P):
            a, b = tv[:, i], tv[:, j]
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            sel = lo != hi
            pairs_a.append(lo[sel])
            pairs_b.append(hi[sel])
    key = np.concatenate(pairs_a).astype(np.int64) * V + np.concatenate(pairs_b)
    uniq, counts = np.unique(key, return_counts=True)
    uniq = uniq[counts >= min_shared_tracks]
    counts = counts[counts >= min_shared_tracks]
    E = len(uniq)
    v1 = (uniq // V).astype(np.int64)
    v2 = (uniq % V).astype(np.int64)

    R12 = np.einsum("eij,ekj->eik", R[v2], R[v1])  # R2 R1^T
    ax = rng.normal(size=(E, 3))
    ax /= np.linalg.norm(ax, axis=1, keepdims=True)
    ang = np.deg2rad(rng.normal(size=E) * edge_rot_noise_deg)
    Rn = np.asarray(
        jax.vmap(rotops.angle_axis_to_rotation_matrix)(
            jnp.asarray(ax * ang[:, None])
        )
    )
    aa12 = np.asarray(
        jax.vmap(rotops.rotation_matrix_to_angle_axis)(
            jnp.asarray(np.einsum("eij,ejk->eik", Rn, R12))
        )
    )
    t12 = np.einsum("eij,ej->ei", R[v1], positions[v2] - positions[v1])
    t12 /= np.linalg.norm(t12, axis=1, keepdims=True)
    ax2 = rng.normal(size=(E, 3))
    ax2 -= np.sum(ax2 * t12, axis=1, keepdims=True) * t12
    ax2 /= np.linalg.norm(ax2, axis=1, keepdims=True)
    ang2 = np.deg2rad(rng.normal(size=E) * edge_pos_noise_deg)
    tn = np.asarray(
        jax.vmap(rotops.angle_axis_rotate_point)(
            jnp.asarray(ax2 * ang2[:, None]), jnp.asarray(t12)
        )
    )

    graph = ViewGraph()
    for e in range(E):
        info = TwoViewInfo(
            focal_length_1=1000.0,
            focal_length_2=1000.0,
            rotation_2=aa12[e],
            position_2=tn[e],
            num_verified_matches=int(counts[e]),
        )
        graph.add_edge(int(v1[e]), int(v2[e]), info)
    return recon, graph, positions


def run(V=553, T=50_000, seed=0, estimator_type="global", calibrated=False):
    """Build the scene and run the global estimator; returns phase times,
    accuracy, and counts (one dict).

    `calibrated=True` holds intrinsics constant (XYZW tracks): the
    synthetic scene carries EXACT calibration priors and zero distortion,
    and the reference's own guidance for accurately known calibration is
    constant intrinsics (`reconstruction_estimator_options.h:277-284`).
    The default (False) keeps the reference-default free
    focal+radial / manifold configuration.
    """
    from ..ba.lm import OptimizeIntrinsicsType, TrackParametrizationType
    from ..sfm.estimator_options import (
        ReconstructionEstimatorOptions,
        ReconstructionEstimatorType,
    )
    from ..sfm.reconstruction_estimator import create_reconstruction_estimator
    from ..transforms.alignment import align_point_clouds_umeyama

    t0 = time.perf_counter()
    recon, graph, gt_positions = build_scene(V=V, T=T, seed=seed)
    t_build = time.perf_counter() - t0

    options = ReconstructionEstimatorOptions(
        reconstruction_estimator_type=ReconstructionEstimatorType.GLOBAL,
        rng_seed=seed,
    )
    if calibrated:
        options.intrinsics_to_optimize = OptimizeIntrinsicsType.NONE
        options.track_parametrization_type = TrackParametrizationType.XYZW
    estimator = create_reconstruction_estimator(options)
    t0 = time.perf_counter()
    summary = estimator.estimate(graph, recon)
    t_total = time.perf_counter() - t0

    est_ids = [v for v in range(recon.num_views()) if recon.view_estimated[v]]
    est = recon.view_extrinsics[est_ids, :3]
    gt = gt_positions[est_ids]
    Ra, ta, s = align_point_clouds_umeyama(est, gt)
    aligned = s * est @ np.asarray(Ra).T + np.asarray(ta)
    err = np.linalg.norm(aligned - gt, axis=-1)
    return dict(
        success=bool(summary.success),
        views=len(est_ids),
        views_total=V,
        tracks=recon.num_tracks(),
        observations=recon.num_observations(),
        edges=graph.num_edges(),
        t_build_s=t_build,
        t_rotation_s=summary.rotation_estimation_time,
        t_position_s=summary.position_estimation_time,
        t_pose_total_s=summary.pose_estimation_time,
        t_triangulation_s=summary.triangulation_time,
        t_ba_s=summary.bundle_adjustment_time,
        t_total_s=t_total,
        median_pos_err=float(np.median(err)),
        mean_pos_err=float(np.mean(err)),
    )
