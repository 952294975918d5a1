"""Levenberg-Marquardt bundle adjustment with an implicit Schur complement.

TPU-native replacement for the reference's Ceres-based bundle adjustment
(`/root/reference/src/theia/sfm/bundle_adjustment/bundle_adjuster.{h,cc}`,
`bundle_adjustment.{h,cc}` — call stack SURVEY.md §3.4). Ceres builds a
block-sparse problem (points = Schur group 0, cameras = group 1,
`bundle_adjuster.h:124`) and runs SPARSE_SCHUR / ITERATIVE_SCHUR. Here the
same math is expressed as flat batched tensor ops over the observation table:

  residuals   r_o = sqrt_info_o * (project(cam_{v(o)}, X_{t(o)}) - uv_o)
  blocks      Jc [O,2,6], Jp [O,2,3]  (per-observation, via jacfwd)
  U_v = sum_o Jc^T Jc   (segment-sum by view)   [V,6,6]
  V_t = sum_o Jp^T Jp   (segment-sum by track)  [T,3,3]
  W_o = Jc^T Jp          (one per observation — a track is seen at most once
                          per view, the reference's track-consistency rule)

The reduced camera system S dc = g is never materialized: S x is applied as
  S x = U x - sum_o W_o * Vinv_{t(o)} * (sum_{o' in t} W_{o'}^T x_{v(o')})
(two gathers + two segment-sums per application), solved by PCG with the
block-Jacobi (Schur-Jacobi) preconditioner — the ITERATIVE_SCHUR +
SCHUR_JACOBI configuration of the reference
(`reconstruction_estimator_options.h:291-300`) as pure XLA. Point updates are
back-substituted per track. The LM loop (damping, accept/reject) runs as a
`lax.while_loop` so one `jit` covers the whole optimization.

Masks make the system partial: `BundleAdjustPartialReconstruction`,
`BundleAdjustView(s)`, `BundleAdjustTrack(s)` (`bundle_adjustment.h:181-219`)
are all this kernel with different constant-masks.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import camera as cam
from ..models import intrinsics as intr
from ..ops import rotation as rotops
from .losses import LossFunctionType, loss_rho, loss_weight

__all__ = ["BundleAdjustmentOptions", "BundleAdjustmentSummary", "bundle_adjust"]


@dataclasses.dataclass(frozen=True)
class BundleAdjustmentOptions:
    """Parity: `theia::BundleAdjustmentOptions`
    (`bundle_adjustment.h:87-167`) — fields that map to this solver."""

    loss_function_type: LossFunctionType = LossFunctionType.TRIVIAL
    robust_loss_width: float = 2.0
    max_num_iterations: int = 100
    function_tolerance: float = 1e-6
    gradient_tolerance: float = 1e-10
    parameter_tolerance: float = 1e-8
    # Implicit-Schur PCG controls (ITERATIVE_SCHUR + SCHUR_JACOBI).
    linear_solver_iterations: int = 40
    linear_solver_tolerance: float = 1e-2
    # LM trust region.
    initial_trust_region_radius: float = 1e4
    # What to optimize (mirrors constant_camera_* flags / intrinsics subsets).
    optimize_cameras: bool = True
    optimize_points: bool = True
    # View priors (`bundle_adjustment.h:154-166`, residuals from
    # position_error.h / orientation_error.h / gravity_error.h).
    use_position_priors: bool = False
    use_orientation_priors: bool = False
    use_gravity_priors: bool = False
    verbose: bool = False


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BundleAdjustmentSummary:
    """Parity: `theia::BundleAdjustmentSummary` (`bundle_adjustment.h:170`)."""

    success: jax.Array
    initial_cost: jax.Array
    final_cost: jax.Array
    num_iterations: jax.Array


def _project_residual(extrinsics6, intrinsics, point3, uv, sqrt_info, model):
    """One observation's weighted reprojection residual (2-vector).

    Mirrors `theia::ReprojectionError` (`camera/reprojection_error.h:50-115`):
    translate, guard near-center points, rotate, project through the camera
    model, weight by the sqrt information of the feature covariance.
    """
    adjusted = point3 - extrinsics6[:3]
    # Near-center guard (reprojection_error.h:69-80): freeze the residual
    # rather than dividing by ~0.
    too_close = jnp.sum(adjusted * adjusted) < 1e-8
    p_cam = rotops.angle_axis_rotate_point(extrinsics6[3:], adjusted)
    pixel = intr.camera_to_pixel(intrinsics, p_cam, model)
    r = sqrt_info * (pixel - uv)
    return jnp.where(too_close, jnp.zeros_like(r), r)


def _make_blocks(state, obs, model, loss, loss_width, dtype):
    """Residuals + per-observation Jacobian blocks with IRLS robust weights."""
    extrinsics, points = state
    obs_view, obs_track, obs_uv, obs_info, obs_mask, intr_rows = obs

    ext_o = extrinsics[obs_view]  # [O, 6]
    pts_o = points[obs_track]  # [O, 3]

    def f(e6, x3, uv, si, params):
        return _project_residual(e6, params, x3, uv, si, model)

    def rj(e6, x3, uv, si, params):
        r = f(e6, x3, uv, si, params)
        Jc = jax.jacfwd(f, argnums=0)(e6, x3, uv, si, params)
        Jp = jax.jacfwd(f, argnums=1)(e6, x3, uv, si, params)
        return r, Jc, Jp

    r, Jc, Jp = jax.vmap(rj)(ext_o, pts_o, obs_uv, obs_info, intr_rows)

    # Robust IRLS weights on the squared norm.
    s = jnp.sum(r * r, axis=-1)
    w = loss_weight(s, loss, loss_width) * obs_mask.astype(dtype)
    sw = jnp.sqrt(w)[..., None]
    return r * sw, Jc * sw[..., None], Jp * sw[..., None], s


def _segment_sum(values, segment_ids, num_segments):
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)


@partial(jax.jit, static_argnames=("model", "num_views", "num_tracks", "options"))
def hessian_blocks(
    extrinsics,
    points,
    intrinsics_rows,
    obs_view,
    obs_track,
    obs_uv,
    obs_sqrt_info,
    obs_mask,
    model: int,
    num_views: int,
    num_tracks: int,
    options: BundleAdjustmentOptions,
):
    """Per-view [V,6,6] and per-track [T,3,3] Gauss-Newton Hessian blocks
    plus the total robust cost and residual count.

    These are what `ceres::Covariance` inverts when the other parameter
    group is held constant (`bundle_adjuster.cc:660-744`): for
    BundleAdjustView(s)WithCov / BundleAdjustTrack(s)WithCov the problem is
    block-diagonal, so cov(view) = sigma^2 U_v^{-1} exactly.
    """
    dtype = extrinsics.dtype
    obs = (obs_view, obs_track, obs_uv, obs_sqrt_info, obs_mask, intrinsics_rows)
    loss = options.loss_function_type
    width = options.robust_loss_width
    r, Jc, Jp, s = _make_blocks((extrinsics, points), obs, model, loss, width, dtype)
    U = _segment_sum(jnp.einsum("ori,orj->oij", Jc, Jc), obs_view, num_views)
    Vt = _segment_sum(jnp.einsum("ori,orj->oij", Jp, Jp), obs_track, num_tracks)
    cost = jnp.sum(loss_rho(s, loss, width) * obs_mask.astype(dtype))
    return U, Vt, cost, jnp.sum(obs_mask)


def _prior_residual(e6, priors_row, dtype):
    """Per-view prior residual [9] = [position(3), orientation(3), gravity(3)].

    Parity: `position_error.h` (sqrt_info (p - p_prior)), `orientation_error.h`
    (sqrt_info log(R R_priorᵀ)), `gravity_error.h`
    (sqrt_info (R (0,0,-1) - g_prior)); masks zero unset priors.
    """
    (pp, psi, pm, op, osi, om, gp, gsi, gm) = priors_row
    r_pos = (psi @ (e6[:3] - pp)) * pm
    R = rotops.angle_axis_to_rotation_matrix(e6[3:])
    Rp = rotops.angle_axis_to_rotation_matrix(op)
    r_ori = (osi @ rotops.rotation_matrix_to_angle_axis(R @ Rp.T)) * om
    g_world = jnp.asarray([0.0, 0.0, -1.0], dtype)
    g_cam = R @ g_world
    r_grav = (gsi @ (g_cam - gp)) * gm
    return jnp.concatenate([r_pos, r_ori, r_grav])


def _prior_blocks(extrinsics, priors, dtype):
    """Residuals + Jacobians of all view priors: ([V, 9], [V, 9, 6])."""

    def rj(e6, *row):
        f = lambda e: _prior_residual(e, row, dtype)
        return f(e6), jax.jacfwd(f)(e6)

    return jax.vmap(rj)(extrinsics, *priors)


@partial(
    jax.jit,
    static_argnames=(
        "model",
        "num_views",
        "num_tracks",
        "options",
    ),
)
def bundle_adjust(
    extrinsics,  # [V, 6]
    points,  # [T, 3]
    intrinsics_rows,  # [O, P] per-observation intrinsics (gathered by caller)
    obs_view,  # [O]
    obs_track,  # [O]
    obs_uv,  # [O, 2]
    obs_sqrt_info,  # [O, 2]
    obs_mask,  # [O] bool
    camera_free,  # [V] bool — cameras allowed to move
    point_free,  # [T] bool — points allowed to move
    model: int,
    num_views: int,
    num_tracks: int,
    options: BundleAdjustmentOptions,
    priors=None,  # optional 9-tuple of per-view prior arrays (see _prior_residual)
):
    """Run LM to convergence. Returns (extrinsics, points, summary).

    Intrinsics are held constant this round (OptimizeIntrinsicsType::NONE);
    the caller gathers each observation's intrinsics row so shared groups
    need no extra indirection here.
    """
    dtype = extrinsics.dtype
    V, T = num_views, num_tracks
    loss = options.loss_function_type
    width = options.robust_loss_width
    obs = (obs_view, obs_track, obs_uv, obs_sqrt_info, obs_mask, intrinsics_rows)

    # camera_free may be [V] (whole camera) or [V, 6] (per-DOF — e.g. the
    # hybrid pipeline holds orientations constant, HSfM Cui CVPR'17).
    if camera_free.ndim == 1:
        camera_free = camera_free[..., None]
    cam_free = (camera_free & options.optimize_cameras).astype(dtype)
    cam_free = jnp.broadcast_to(cam_free, (num_views, 6))
    pt_free = (point_free & options.optimize_points)[..., None].astype(dtype)

    def cost_of(state):
        _, _, _, s = _make_blocks(state, obs, model, loss, width, dtype)
        raw = loss_rho(s, loss, width) * obs_mask.astype(dtype)
        c = 0.5 * jnp.sum(raw)
        if priors is not None:
            r_pr, _ = _prior_blocks(state[0], priors, dtype)
            c = c + 0.5 * jnp.sum(r_pr * r_pr)
        return c

    def lm_step(state, mu):
        """One LM iteration: build blocks, solve, propose a step."""
        extrinsics_c, points_c = state
        r, Jc, Jp, _ = _make_blocks(state, obs, model, loss, width, dtype)

        # Freeze constant parameters by zeroing their Jacobians.
        Jc = Jc * cam_free[obs_view][:, None, :]
        Jp = Jp * pt_free[obs_track][:, None, :]

        U = _segment_sum(jnp.einsum("ori,orj->oij", Jc, Jc), obs_view, V)
        Vt = _segment_sum(jnp.einsum("ori,orj->oij", Jp, Jp), obs_track, T)
        W = jnp.einsum("ori,orj->oij", Jc, Jp)  # [O, 6, 3]
        bc = -_segment_sum(jnp.einsum("ori,or->oi", Jc, r), obs_view, V)
        bp = -_segment_sum(jnp.einsum("ori,or->oi", Jp, r), obs_track, T)

        if priors is not None:
            # Prior residuals touch only camera blocks: dense per-view adds.
            r_pr, J_pr = _prior_blocks(extrinsics_c, priors, dtype)
            J_pr = J_pr * cam_free[:, None, :]
            U = U + jnp.einsum("vri,vrj->vij", J_pr, J_pr)
            bc = bc - jnp.einsum("vri,vr->vi", J_pr, r_pr)

        # LM damping (Marquardt: scale diagonals).
        eyeV = jnp.eye(6, dtype=dtype)
        eyeT = jnp.eye(3, dtype=dtype)
        diagU = jnp.einsum("vii->vi", U)
        diagVt = jnp.einsum("tii->ti", Vt)
        U_d = U + mu * (eyeV * jnp.maximum(diagU, 1e-6)[..., None, :])
        Vt_d = Vt + mu * (eyeT * jnp.maximum(diagVt, 1e-6)[..., None, :])
        # Guard empty tracks/views.
        Vt_d = Vt_d + 1e-10 * eyeT
        U_d = U_d + 1e-10 * eyeV

        Vinv = jnp.linalg.inv(Vt_d)  # [T, 3, 3]

        # Reduced RHS: g = bc - W Vinv bp (gather/segment ops).
        Vinv_bp = jnp.einsum("tij,tj->ti", Vinv, bp)
        g = bc - _segment_sum(
            jnp.einsum("oij,oj->oi", W, Vinv_bp[obs_track]), obs_view, V
        )

        # Implicit S @ x.
        def S_mv(x):  # x [V, 6]
            Ux = jnp.einsum("vij,vj->vi", U_d, x)
            Wx = jnp.einsum("oji,oj->oi", W, x[obs_view])  # W^T x: [O, 3]
            y = _segment_sum(Wx, obs_track, T)
            z = jnp.einsum("tij,tj->ti", Vinv, y)
            back = _segment_sum(
                jnp.einsum("oij,oj->oi", W, z[obs_track]), obs_view, V
            )
            return Ux - back

        # Schur-Jacobi preconditioner: diagonal blocks of S.
        WVW = _segment_sum(
            jnp.einsum("oij,ojk,olk->oil", W, Vinv[obs_track], W), obs_view, V
        )
        M = U_d - WVW + 1e-8 * eyeV
        Minv = jnp.linalg.inv(M)

        def precond(x):
            return jnp.einsum("vij,vj->vi", Minv, x)

        # PCG on S dc = g.
        def pcg_body(i, carry):
            x, rres, z, p, rz = carry
            Sp = S_mv(p)
            pSp = jnp.sum(p * Sp)
            alpha = rz / jnp.where(pSp == 0, 1.0, pSp)
            x = x + alpha * p
            rres = rres - alpha * Sp
            z_new = precond(rres)
            rz_new = jnp.sum(rres * z_new)
            beta = rz_new / jnp.where(rz == 0, 1.0, rz)
            p = z_new + beta * p
            return x, rres, z_new, p, rz_new

        x0 = jnp.zeros_like(g)
        z0 = precond(g)
        carry = (x0, g, z0, z0, jnp.sum(g * z0))
        carry = jax.lax.fori_loop(
            0, options.linear_solver_iterations, pcg_body, carry
        )
        dc = carry[0]  # [V, 6]

        # Back-substitute points: dp = Vinv (bp - W^T dc).
        Wt_dc = _segment_sum(
            jnp.einsum("oji,oj->oi", W, dc[obs_view]), obs_track, T
        )
        dp = jnp.einsum("tij,tj->ti", Vinv, bp - Wt_dc)

        dc = dc * cam_free
        dp = dp * pt_free
        new_state = (extrinsics_c + dc, points_c + dp)

        # Predicted reduction for the gain ratio:
        # 0.5 * dx^T (mu * D * dx + g) with g = -J^T r (= bc/bp here).
        pred = 0.5 * (
            jnp.sum(dc * (mu * jnp.maximum(diagU, 1e-6) * dc + bc))
            + jnp.sum(dp * (mu * jnp.maximum(diagVt, 1e-6) * dp + bp))
        )
        return new_state, pred

    initial_cost = cost_of((extrinsics, points))

    def while_cond(carry):
        state, mu, cost, it, done = carry
        return (~done) & (it < options.max_num_iterations)

    def while_body(carry):
        state, mu, cost, it, done = carry
        new_state, pred = lm_step(state, mu)
        new_cost = cost_of(new_state)
        actual = cost - new_cost
        accept = (actual > 0) & jnp.isfinite(new_cost)
        # Damping schedule (classic LM x2 / x3 rules on the gain).
        gain = actual / jnp.maximum(pred, 1e-30)
        mu_new = jnp.where(
            accept,
            mu * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * jnp.clip(gain, 0.0, 1.0) - 1.0) ** 3),
            mu * 4.0,
        )
        mu_new = jnp.clip(mu_new, 1e-12, 1e10)
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(accept, n, o), new_state, state
        )
        cost_next = jnp.where(accept, new_cost, cost)
        rel_decrease = actual / jnp.maximum(cost, 1e-30)
        done = accept & (rel_decrease < options.function_tolerance)
        return state, mu_new, cost_next, it + 1, done

    mu0 = jnp.asarray(1.0 / options.initial_trust_region_radius, dtype)
    carry = (
        (extrinsics, points),
        mu0,
        initial_cost,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    carry = jax.lax.while_loop(while_cond, while_body, carry)
    (ext_out, pts_out), _, final_cost, iters, _ = carry

    summary = BundleAdjustmentSummary(
        success=jnp.isfinite(final_cost) & (final_cost <= initial_cost),
        initial_cost=initial_cost,
        final_cost=final_cost,
        num_iterations=iters,
    )
    return ext_out, pts_out, summary
