"""Sim(3) alignment and pose-graph optimization between reconstructions.

Re-design of the reference's Sim3 subsystem:
  - `OptimizeAlignmentSim3` (`transformation/align_point_clouds.h:157`):
    Umeyama init + iterative refinement over the Sim3 tangent, with
    POINT_TO_POINT / ROBUST_POINT_TO_POINT (Huber) / POINT_TO_PLANE costs.
  - `Sim3Manifold` + `SelfEdgesErrorTerm`/`CrossEdgesErrorTerm`
    (`align_reconstructions_pose_graph_optim.h:43-150`): pose-graph GN over
    per-view Sim3 nodes with relative (self) and absolute (cross) edges.
  - `FindCommonTracksByFeatureInReconstructions`
    (`find_common_tracks_by_feature_in_reconstructions.h:49`).
  - `AlignOverlapReconstructionsWithPointsAndPosesRobust`
    (`align_reconstructions.h:66`; workflow demonstrated in
    `align_reconstructions_pose_graph_optim_test.cc:169-200`): common tracks
    -> robust Sim3 -> transform -> pose priors from the reference recon ->
    prior-constrained bundle adjustment.

The reference runs Ceres autodiff per problem; here each solver is one
jitted Gauss-Newton program (residuals through `ops.lie` sim3 exp/log,
Jacobians by `jax.jacfwd`, dense normal equations — pose-graph sizes are
tiny next to BA).
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie
from .alignment import align_point_clouds_umeyama, transform_reconstruction

__all__ = [
    "Sim3AlignmentType",
    "Sim3AlignmentOptions",
    "Sim3AlignmentSummary",
    "optimize_alignment_sim3",
    "optimize_sim3_pose_graph",
    "find_common_tracks_by_feature_in_reconstructions",
    "align_overlap_reconstructions_with_points_and_poses_robust",
]


class Sim3AlignmentType(enum.Enum):
    """Parity: `theia::Sim3AlignmentType` (`align_point_clouds.h:73-77`)."""

    POINT_TO_POINT = 0
    ROBUST_POINT_TO_POINT = 1
    POINT_TO_PLANE = 2


@dataclasses.dataclass
class Sim3AlignmentOptions:
    """Parity: `theia::Sim3AlignmentOptions` (`align_point_clouds.h:80-105`)."""

    alignment_type: Sim3AlignmentType = Sim3AlignmentType.POINT_TO_POINT
    initial_sim3_params: np.ndarray | None = None  # [7] (rho, phi, sigma)
    point_weight: float = 1.0
    huber_threshold: float = 0.1
    outlier_threshold: float = 1.0
    max_iterations: int = 100
    target_normals: np.ndarray | None = None  # [N, 3] for POINT_TO_PLANE


@dataclasses.dataclass
class Sim3AlignmentSummary:
    """Parity: `theia::Sim3AlignmentSummary` (`align_point_clouds.h:143`)."""

    success: bool = False
    final_cost: float = 0.0
    num_iterations: int = 0
    alignment_error: float = 0.0
    sim3_params: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(7)
    )


@partial(jax.jit, static_argnames=("iters", "robust", "point_to_plane"))
def _sim3_gn(
    xi0, src, tgt, normals, huber, iters: int, robust: bool,
    point_to_plane: bool,
):
    """GN refinement of a Sim3 tangent vector [7] aligning src -> tgt."""

    def residuals(xi):
        s, R, t = lie.sim3_exp(xi)
        r = lie.sim3_action(
            s[None], jnp.broadcast_to(R, src.shape[:1] + (3, 3)),
            jnp.broadcast_to(t, src.shape), src,
        ) - tgt
        if point_to_plane:
            r = jnp.sum(r * normals, axis=-1, keepdims=True)
        return r

    def weights(r):
        if not robust:
            return jnp.ones(r.shape[0], r.dtype)
        nrm = jnp.linalg.norm(r, axis=-1)
        return jnp.where(nrm <= huber, 1.0, huber / jnp.maximum(nrm, 1e-12))

    def step(_, carry):
        xi, _cost = carry
        J = jax.jacfwd(lambda p: residuals(p).reshape(-1))(xi)  # [N*d, 7]
        r = residuals(xi)
        w = weights(r)
        wr = (r * w[:, None]).reshape(-1)
        Jw = J * jnp.repeat(w, r.shape[1])[:, None]
        H = Jw.T @ J + 1e-9 * jnp.eye(7, dtype=xi.dtype)
        g = Jw.T @ r.reshape(-1)
        delta = jnp.linalg.solve(H, g)
        xi_new = xi - delta
        cost_new = 0.5 * jnp.sum(wr * r.reshape(-1))
        return xi_new, cost_new

    xi, cost = jax.lax.fori_loop(
        0, iters, step, (xi0, jnp.asarray(jnp.inf, xi0.dtype))
    )
    return xi, cost


def optimize_alignment_sim3(
    source_points,
    target_points,
    options: Sim3AlignmentOptions | None = None,
) -> Sim3AlignmentSummary:
    """Parity: `theia::OptimizeAlignmentSim3` (`align_point_clouds.h:157`).
    Finds Sim3 S with target ~= S(source). Returns summary whose
    `sim3_params` is the tangent vector consumed by `lie.sim3_exp`."""
    options = options or Sim3AlignmentOptions()
    src = np.asarray(source_points, np.float64)
    tgt = np.asarray(target_points, np.float64)
    summary = Sim3AlignmentSummary()
    if len(src) < 3:
        return summary

    if options.initial_sim3_params is not None:
        xi0 = jnp.asarray(options.initial_sim3_params, jnp.float64)
    else:
        R, t, s = align_point_clouds_umeyama(
            jnp.asarray(src), jnp.asarray(tgt)
        )
        xi0 = lie.sim3_log(jnp.asarray(s), R, t)

    ptp = options.alignment_type == Sim3AlignmentType.POINT_TO_PLANE
    normals = (
        jnp.asarray(options.target_normals, jnp.float64)
        if ptp and options.target_normals is not None
        else jnp.zeros_like(jnp.asarray(tgt))
    )
    iters = max(1, min(options.max_iterations, 50))
    robust = options.alignment_type == Sim3AlignmentType.ROBUST_POINT_TO_POINT
    xi, cost = _sim3_gn(
        xi0,
        jnp.asarray(src),
        jnp.asarray(tgt),
        normals,
        jnp.asarray(options.huber_threshold, jnp.float64),
        iters,
        robust,
        ptp,
    )
    if robust:
        # Huber only downweights gross outliers; trim by outlier_threshold
        # and refit on the inliers for an unbiased final estimate.
        s, R, t = lie.sim3_exp(xi)
        aligned = np.asarray(
            lie.sim3_action(
                jnp.broadcast_to(s, (len(src),)),
                jnp.broadcast_to(R, (len(src), 3, 3)),
                jnp.broadcast_to(t, (len(src), 3)),
                jnp.asarray(src),
            )
        )
        inliers = (
            np.linalg.norm(aligned - tgt, axis=-1) < options.outlier_threshold
        )
        if inliers.sum() >= 3 and inliers.sum() < len(src):
            xi, cost = _sim3_gn(
                xi,
                jnp.asarray(src[inliers]),
                jnp.asarray(tgt[inliers]),
                jnp.zeros((int(inliers.sum()), 3)),
                jnp.asarray(options.huber_threshold, jnp.float64),
                iters,
                False,
                False,
            )
    s, R, t = lie.sim3_exp(xi)
    aligned = np.asarray(
        lie.sim3_action(
            jnp.broadcast_to(s, (len(src),)),
            jnp.broadcast_to(R, (len(src), 3, 3)),
            jnp.broadcast_to(t, (len(src), 3)),
            jnp.asarray(src),
        )
    )
    err = np.linalg.norm(aligned - tgt, axis=-1)
    summary.success = bool(np.isfinite(err).all())
    summary.final_cost = float(cost)
    summary.num_iterations = iters
    summary.alignment_error = float(np.mean(err))
    summary.sim3_params = np.asarray(xi, np.float64)
    return summary


@partial(jax.jit, static_argnames=("iters",))
def _pose_graph_gn(
    nodes0, self_i, self_j, self_sij, self_sqrt_info,
    cross_i, cross_sref, cross_sqrt_info, fixed_mask, iters: int,
):
    """GN over Sim3 nodes [N, 7] (log coords).

    Residuals (align_reconstructions_pose_graph_optim.h:77-127):
      self edge (i, j, Sji):  log( (Si^-1 Sj) * Sji^-1 )   [7]
      cross edge (i, Sref):   log( Si * Sref^-1 )          [7]
    `fixed_mask` [N] freezes nodes (e.g. gauge anchors).
    """
    N = nodes0.shape[0]

    def residuals(nodes):
        def self_res(i, j, sij, sq):
            si, Ri, ti = lie.sim3_exp(nodes[i])
            sj, Rj, tj = lie.sim3_exp(nodes[j])
            rel = lie.sim3_multiply(*lie.sim3_inverse(si, Ri, ti), sj, Rj, tj)
            sji_inv = lie.sim3_inverse(*lie.sim3_exp(sij))
            err = lie.sim3_multiply(*rel, *sji_inv)
            return sq @ lie.sim3_log(*err)

        def cross_res(i, sref, sq):
            si, Ri, ti = lie.sim3_exp(nodes[i])
            sref_inv = lie.sim3_inverse(*lie.sim3_exp(sref))
            err = lie.sim3_multiply(si, Ri, ti, *sref_inv)
            return sq @ lie.sim3_log(*err)

        rs = jax.vmap(self_res)(self_i, self_j, self_sij, self_sqrt_info)
        rc = jax.vmap(cross_res)(cross_i, cross_sref, cross_sqrt_info)
        return jnp.concatenate([rs.reshape(-1), rc.reshape(-1)])

    free = (~fixed_mask).astype(nodes0.dtype)

    def step(_, nodes):
        flat = nodes.reshape(-1)
        J = jax.jacfwd(lambda p: residuals(p.reshape(N, 7)))(flat)
        r = residuals(nodes)
        H = J.T @ J + 1e-8 * jnp.eye(flat.shape[0], dtype=flat.dtype)
        g = J.T @ r
        delta = jnp.linalg.solve(H, g).reshape(N, 7)
        return nodes - delta * free[:, None]

    nodes = jax.lax.fori_loop(0, iters, step, nodes0)
    return nodes, jnp.sum(residuals(nodes) ** 2)


def optimize_sim3_pose_graph(
    nodes,
    self_edges=(),
    cross_edges=(),
    fixed_nodes=(),
    iters: int = 20,
):
    """Sim3 pose-graph optimization.

    nodes: [N, 7] log coords (rho, phi, sigma) of world->camera Sim3s.
    self_edges: list of (i, j, Sji_log [7], sqrt_info [7,7] | None).
    cross_edges: list of (i, Sref_log [7], sqrt_info [7,7] | None).
    Returns (nodes [N, 7], final squared cost).
    """
    nodes = np.asarray(nodes, np.float64)
    N = len(nodes)
    eye = np.eye(7)

    def unpack(edges, n_idx):
        idx = [np.asarray([e[k] for e in edges], np.int32) for k in range(n_idx)]
        logs = np.asarray([e[n_idx] for e in edges], np.float64).reshape(-1, 7)
        sq = np.asarray(
            [eye if (len(e) <= n_idx + 1 or e[n_idx + 1] is None)
             else e[n_idx + 1] for e in edges],
            np.float64,
        ).reshape(-1, 7, 7)
        return idx, logs, sq

    if not self_edges:
        self_edges = [(0, 0, np.zeros(7), np.zeros((7, 7)))]
    if not cross_edges:
        cross_edges = [(0, nodes[0], np.zeros((7, 7)))]
    (si, sj), s_logs, s_sq = unpack(self_edges, 2)
    (ci,), c_logs, c_sq = unpack(cross_edges, 1)
    fixed = np.zeros(N, bool)
    fixed[list(fixed_nodes)] = True

    out, cost = _pose_graph_gn(
        jnp.asarray(nodes),
        jnp.asarray(si), jnp.asarray(sj), jnp.asarray(s_logs),
        jnp.asarray(s_sq),
        jnp.asarray(ci), jnp.asarray(c_logs), jnp.asarray(c_sq),
        jnp.asarray(fixed), iters,
    )
    return np.asarray(out), float(cost)


def find_common_tracks_by_feature_in_reconstructions(
    recon_ref,
    recon_qry,
    view_matches_ref_qry,
    pixel_tolerance: float = 0.25,
):
    """Parity: `theia::FindCommonTracksByFeatureInReconstructions`
    (`find_common_tracks_by_feature_in_reconstructions.h:49`): tracks are in
    correspondence when the two reconstructions observe a (near-)identical
    feature location in a matched view pair. Returns
    (points_ref [N, 3], points_qry [N, 3], track_id_pairs list)."""

    def feature_map(recon, view_id):
        out = {}
        for t, row in recon._view_track_to_obs[view_id].items():
            uv = recon.obs_uv[row]
            key = (round(uv[0] / pixel_tolerance), round(uv[1] / pixel_tolerance))
            out[key] = (t, row)
        return out

    def point3(recon, t):
        p = recon.points[t]
        w = p[3] if abs(p[3]) > 1e-12 else 1.0
        return p[:3] / w

    corr = {}
    pts_ref, pts_qry, pairs = [], [], []
    for vid_ref, vid_qry in view_matches_ref_qry:
        fm_qry = feature_map(recon_qry, vid_qry)
        for t_ref, row in recon_ref._view_track_to_obs[vid_ref].items():
            if not recon_ref.track_estimated[t_ref]:
                continue
            uv = recon_ref.obs_uv[row]
            key = (round(uv[0] / pixel_tolerance), round(uv[1] / pixel_tolerance))
            hit = fm_qry.get(key)
            if hit is None:
                continue
            t_qry = hit[0]
            if not recon_qry.track_estimated[t_qry]:
                continue
            if corr.get(t_ref, t_qry) != t_qry:
                continue
            corr[t_ref] = t_qry
            pts_ref.append(point3(recon_ref, t_ref))
            pts_qry.append(point3(recon_qry, t_qry))
            pairs.append((t_ref, t_qry))
    return (
        np.asarray(pts_ref).reshape(-1, 3),
        np.asarray(pts_qry).reshape(-1, 3),
        pairs,
    )


def align_overlap_reconstructions_with_points_and_poses_robust(
    recon_ref,
    recon_qry,
    view_matches_ref_qry,
    sim3_options: Sim3AlignmentOptions | None = None,
    position_prior_information: float = 100.0,
    orientation_prior_information: float = 5.0,
    ba_iterations: int = 50,
):
    """Parity: `theia::AlignOverlapReconstructionsWithPointsAndPosesRobust`
    (`align_reconstructions.h:66`; workflow
    `align_reconstructions_pose_graph_optim_test.cc:169-200`): find common
    tracks by feature -> robust Sim3 point alignment -> transform the query
    reconstruction -> install position/orientation priors from the reference
    poses on the overlap views -> prior-constrained bundle adjustment of the
    query reconstruction. Returns the Sim3AlignmentSummary."""
    from ..ba.entry import BundleAdjustmentOptions, bundle_adjust_reconstruction

    sim3_options = sim3_options or Sim3AlignmentOptions(
        alignment_type=Sim3AlignmentType.ROBUST_POINT_TO_POINT
    )
    pts_ref, pts_qry, _pairs = find_common_tracks_by_feature_in_reconstructions(
        recon_ref, recon_qry, view_matches_ref_qry
    )
    summary = optimize_alignment_sim3(pts_qry, pts_ref, sim3_options)
    if not summary.success:
        return summary
    s, R, t = lie.sim3_exp(jnp.asarray(summary.sim3_params))
    transform_reconstruction(recon_qry, np.asarray(R), np.asarray(t), float(s))

    for vid_ref, vid_qry in view_matches_ref_qry:
        prior = recon_qry.view_priors[vid_qry]
        prior.position = recon_ref.view_extrinsics[vid_ref, :3].copy()
        prior.position_sqrt_information = (
            np.eye(3) * position_prior_information
        )
        prior.orientation = recon_ref.view_extrinsics[vid_ref, 3:].copy()
        prior.orientation_sqrt_information = (
            np.eye(3) * orientation_prior_information
        )

    ba_options = BundleAdjustmentOptions(
        max_num_iterations=ba_iterations,
        use_position_priors=True,
        use_orientation_priors=True,
    )
    bundle_adjust_reconstruction(ba_options, recon_qry)
    return summary
