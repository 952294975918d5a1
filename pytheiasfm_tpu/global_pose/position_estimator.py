"""Position averaging from pairwise translation directions.

Re-design of `/root/reference/src/theia/sfm/global_pose_estimation/`:
`least_unsquared_deviation_position_estimator.h:58` (LUD, Ozyesil & Singer
CVPR'15 — convex ‖·‖₂-deviation with scale variables s_ij ≥ 1),
`nonlinear_position_estimator.h:61` (Ceres robust LM over unit-direction
errors) and `linear_position_estimator.cc:195` (smallest-eigenvector linear
method). Every solver runs as fixed-trip jitted iterations with
operator-form CG (gather/segment-sum matvecs) — nothing sparse ever
materializes.

Edge data: for edge (i, j) the view graph stores `position_2` = unit
position of camera j in camera i's frame; the world-frame direction is
t_ij = R_iᵀ · position_2 with c_j − c_i ≈ s_ij t_ij, s_ij > 0.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..math.l1 import conjugate_gradient
from ..ops import rotation as rotops

__all__ = [
    "GlobalPositionEstimatorType",
    "relative_translations_to_world",
    "least_unsquared_deviation_positions",
    "nonlinear_positions",
    "linear_triplet_positions",
    "estimate_positions",
]


class GlobalPositionEstimatorType:
    """Parity: `GlobalPositionEstimatorType`
    (`reconstruction_estimator_options.h`)."""

    NONLINEAR = 0
    LINEAR_TRIPLET = 1
    LEAST_UNSQUARED_DEVIATION = 2
    LIGT = 3


def relative_translations_to_world(orientations, edge_i, rel_positions):
    """t_ij(world) = R_iᵀ · position_2, unit-normalized."""
    R = jax.vmap(rotops.angle_axis_to_rotation_matrix)(orientations)
    Ri = R[edge_i]
    t = jnp.einsum("eba,eb->ea", Ri, rel_positions)
    return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnames=("num_views", "outer_iters", "cg_iters"))
def least_unsquared_deviation_positions(
    edge_i, edge_j, t_world, free_mask, num_views: int,
    outer_iters: int = 200, cg_iters: int = 30, rho: float = 1.0,
):
    """LUD: min Σ ‖c_j − c_i − s_ij t_ij‖₂ s.t. s_ij ≥ 1.

    Parity: `LeastUnsquaredDeviationPositionEstimator`
    (`least_unsquared_deviation_position_estimator.h:58`, solved there by
    `ConstrainedL1Solver` ADMM, `.cc:104`). Same splitting here: with
    x = (c, s) and A x the stacked edge residuals,

        min Σ_e ‖z1_e‖₂ + 1_{z2 ≥ 1}   s.t.  A x = z1,  s = z2,

    the x-update is a CG solve of (AᵀA + [0; I_s]) x = Aᵀ(z1−u1) +
    (z2−u2), the z1-update is the group (block-L2) soft threshold — the
    prox of the sum-of-norms objective — and the z2-update projects the
    scales to s ≥ 1 (the constraint that forbids the trivial collapse
    c ≡ 0). A naive IRLS-with-clamping alternative stalls exactly at that
    collapse, which is why the reference carries a dedicated constrained
    solver.
    """
    E = edge_i.shape[0]
    dtype = t_world.dtype
    fm = free_mask.astype(dtype)[:, None]
    nC = num_views * 3

    deg = (
        jax.ops.segment_sum(jnp.ones((E,), dtype), edge_i, num_segments=num_views)
        + jax.ops.segment_sum(jnp.ones((E,), dtype), edge_j, num_segments=num_views)
    )
    inv_deg = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 1.0)

    def apply_A(x):
        dc = x[:nC].reshape(num_views, 3) * fm
        ds = x[nC:]
        return dc[edge_j] - dc[edge_i] - ds[:, None] * t_world

    def apply_At(re):
        gc = jax.ops.segment_sum(re, edge_j, num_segments=num_views)
        gc -= jax.ops.segment_sum(re, edge_i, num_segments=num_views)
        gs = -jnp.sum(re * t_world, axis=-1)
        return jnp.concatenate([(gc * fm).reshape(-1), gs])

    def matvec(x):
        out = apply_At(apply_A(x))
        # + identity on the s block from the s = z2 constraint.
        return out.at[nC:].add(x[nC:])

    def precond(v):
        pc = (v[:nC].reshape(num_views, 3) * inv_deg[:, None]).reshape(-1)
        return jnp.concatenate([pc, v[nC:] * 0.5])

    def group_shrink(v, kappa):
        nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        scale = jnp.maximum(1.0 - kappa / jnp.maximum(nrm, 1e-12), 0.0)
        return v * scale

    x0 = jnp.concatenate([jnp.zeros((nC,), dtype), jnp.ones((E,), dtype)])
    z1 = jnp.zeros((E, 3), dtype)
    u1 = jnp.zeros((E, 3), dtype)
    z2 = jnp.ones((E,), dtype)
    u2 = jnp.zeros((E,), dtype)

    def step(carry, _):
        x, z1, u1, z2, u2 = carry
        rhs = apply_At(z1 - u1)
        rhs = rhs.at[nC:].add(z2 - u2)
        x = conjugate_gradient(matvec, rhs, x0=x, iters=cg_iters, precond=precond)
        Ax = apply_A(x)
        z1 = group_shrink(Ax + u1, 1.0 / rho)
        u1 = u1 + Ax - z1
        s = x[nC:]
        z2 = jnp.maximum(s + u2, 1.0)
        u2 = u2 + s - z2
        return (x, z1, u1, z2, u2), None

    (x, *_), _ = jax.lax.scan(
        step, (x0, z1, u1, z2, u2), None, length=outer_iters
    )
    return x[:nC].reshape(num_views, 3) * fm


@partial(jax.jit, static_argnames=("num_views", "num_iterations", "cg_iters"))
def nonlinear_positions(
    positions, edge_i, edge_j, t_world, edge_weights, free_mask,
    num_views: int, num_iterations: int = 50, cg_iters: int = 30,
    huber_delta: float = 0.1,
):
    """Robust Levenberg-Marquardt over unit-direction errors.

    Parity: `NonlinearPositionEstimator`
    (`nonlinear_position_estimator.h:61`, `pairwise_translation_error.h`):
    residual = w·(t̂_ij − (c_j − c_i)/‖c_j − c_i‖), Huber loss. Jacobian
    matvecs come from `jax.jvp`/`jax.vjp` of the residual closure — autodiff
    is the cost-functor factory here.
    """
    dtype = positions.dtype
    fm = free_mask.astype(dtype)[:, None]
    w_edge = edge_weights.astype(dtype)

    def residuals(c):
        d = c[edge_j] - c[edge_i]
        dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        return (dn - t_world) * w_edge[:, None]

    def robust_sqrt_weights(r):
        nrm = jnp.linalg.norm(r, axis=-1)
        w = jnp.where(nrm <= huber_delta, 1.0, huber_delta / jnp.maximum(nrm, 1e-12))
        return jnp.sqrt(w)[:, None]

    def step(carry, _):
        c, lam = carry
        r = residuals(c)
        sw = robust_sqrt_weights(r)

        def f(cfree):
            return residuals(c + cfree.reshape(num_views, 3) * fm) * sw

        zero = jnp.zeros((num_views * 3,), dtype)
        r0 = f(zero)
        _, vjp = jax.vjp(f, zero)

        def matvec(v):
            _, jv = jax.jvp(f, (zero,), (v,))
            (jtjv,) = vjp(jv)
            return jtjv + lam * v

        rhs = -vjp(r0)[0]
        dx = conjugate_gradient(matvec, rhs, iters=cg_iters)
        c_new = c + dx.reshape(num_views, 3) * fm
        cost_old = jnp.sum(r0 * r0)
        r_new = residuals(c_new) * sw
        cost_new = jnp.sum(r_new * r_new)
        ok = cost_new < cost_old
        c = jnp.where(ok, c_new, c)
        lam = jnp.where(ok, lam * 0.5, lam * 4.0)
        return (c, lam), None

    (c, _), _ = jax.lax.scan(
        step, (positions, jnp.asarray(1e-3, dtype)), None, length=num_iterations
    )
    return c


@partial(jax.jit, static_argnames=("num_views", "power_iterations"))
def linear_triplet_positions(
    edge_i, edge_j, t_world, edge_weights, num_views: int,
    power_iterations: int = 200,
):
    """Linear position estimation: smallest eigenvector of the direction
    cross-constraint quadratic Σ w ‖(I − t tᵀ)(c_j − c_i)‖².

    Parity target: `LinearPositionEstimator`
    (`linear_position_estimator.cc:195-207`, Spectra shift-invert power
    iteration). Deflation removes the global-translation nullspace; shifted
    power iteration (λ_max I − L) finds the smallest mode on device.
    """
    dtype = t_world.dtype
    w = edge_weights.astype(dtype)
    P = (
        jnp.eye(3, dtype=dtype)[None]
        - t_world[:, :, None] * t_world[:, None, :]
    ) * w[:, None, None]

    deg = 2.0 * (
        jax.ops.segment_sum(w, edge_i, num_segments=num_views)
        + jax.ops.segment_sum(w, edge_j, num_segments=num_views)
    )
    lam = jnp.max(deg) + 1.0

    def apply_L(c):
        d = c[edge_j] - c[edge_i]
        Pd = jnp.einsum("eab,eb->ea", P, d)
        g = jax.ops.segment_sum(Pd, edge_j, num_segments=num_views)
        g -= jax.ops.segment_sum(Pd, edge_i, num_segments=num_views)
        return g

    def deflate(c):
        return c - jnp.mean(c, axis=0, keepdims=True)

    def body(c, _):
        y = lam * c - apply_L(c)
        y = deflate(y)
        return y / jnp.maximum(jnp.linalg.norm(y), 1e-12), None

    key = jax.random.PRNGKey(0)
    c0 = deflate(jax.random.normal(key, (num_views, 3), dtype))
    c0 = c0 / jnp.linalg.norm(c0)
    c, _ = jax.lax.scan(body, c0, None, length=power_iterations)

    # Resolve the sign so most edges have positive scale along t.
    s = jnp.sum((c[edge_j] - c[edge_i]) * t_world, axis=-1)
    sign = jnp.where(jnp.sum(jnp.sign(s)) >= 0, 1.0, -1.0)
    return c * sign


def estimate_positions(
    view_graph,
    orientations: dict,
    estimator_type: int = GlobalPositionEstimatorType.LEAST_UNSQUARED_DEVIATION,
    fixed_views: set | None = None,
    dtype=np.float64,
):
    """Host driver: view graph + orientations → {view_id: position}.

    Parity: the `PositionEstimator::EstimatePositions` interface
    (`position_estimator.h:53`) as dispatched by
    `GlobalReconstructionEstimator::EstimatePosition`
    (`global_reconstruction_estimator.cc:418-452`).
    """
    view_ids = view_graph.view_ids()
    if not view_ids:
        return {}
    index = {v: i for i, v in enumerate(view_ids)}
    V = len(view_ids)
    v1, v2, _, rel_pos, weights = view_graph.edge_arrays(dtype)
    ei = np.asarray([index[v] for v in v1], np.int32)
    ej = np.asarray([index[v] for v in v2], np.int32)
    orient = np.zeros((V, 3), dtype)
    for v, aa in orientations.items():
        if v in index:
            orient[index[v]] = aa

    free = np.ones(V, bool)
    if fixed_views:
        for v in fixed_views:
            if v in index:
                free[index[v]] = False
    else:
        free[0] = False

    t_world = relative_translations_to_world(
        jnp.asarray(orient), jnp.asarray(ei), jnp.asarray(rel_pos)
    )

    if estimator_type == GlobalPositionEstimatorType.NONLINEAR:
        # Reference initializes randomly (`nonlinear_position_estimator.h:97`)
        # then LM; LUD makes a far better TPU-native init.
        init = least_unsquared_deviation_positions(
            jnp.asarray(ei), jnp.asarray(ej), t_world, jnp.asarray(free), V
        )
        out = nonlinear_positions(
            init, jnp.asarray(ei), jnp.asarray(ej), t_world,
            jnp.asarray(np.sqrt(weights)), jnp.asarray(free), V,
        )
    elif estimator_type == GlobalPositionEstimatorType.LINEAR_TRIPLET:
        out = linear_triplet_positions(
            jnp.asarray(ei), jnp.asarray(ej), t_world, jnp.asarray(weights), V
        )
    else:
        out = least_unsquared_deviation_positions(
            jnp.asarray(ei), jnp.asarray(ej), t_world, jnp.asarray(free), V
        )
    out = np.asarray(out)
    return {v: out[index[v]] for v in view_ids}
