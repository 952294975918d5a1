"""Batched relative-translation refinement with known rotations.

Re-design of `/root/reference/src/theia/sfm/bundle_adjustment/
optimize_relative_position_with_known_rotation.{h,cc}`. The reference runs
per-pair IRLS problems in a loop (dispatched per edge by
`GlobalReconstructionEstimator::OptimizePairwiseTranslations`,
`global_reconstruction_estimator.cc:195-202`); here ALL view-graph edges
refine simultaneously: one `[E, K]` padded correspondence table, vmapped
IRLS with fixed iteration count, eigen-decomposition of the 3x3 weighted
constraint Gram matrix per edge, cheirality majority vote for the sign.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import rotation as rotops
from ..ops import triangulation as tri

__all__ = ["optimize_relative_positions_with_known_rotations"]


@partial(jax.jit, static_argnames=("iters",))
def optimize_relative_positions_with_known_rotations(
    rot1,  # [E, 3] angle-axis of view 1 (world->camera)
    rot2,  # [E, 3] angle-axis of view 2
    x1,  # [E, K, 2] normalized features in view 1
    x2,  # [E, K, 2] normalized features in view 2
    mask,  # [E, K] valid correspondence slots
    init_position,  # [E, 3] current relative position estimates
    iters: int = 20,
):
    """Returns ([E, 3] refined unit relative positions, [E] success)."""
    dtype = x1.dtype
    kMinWeight = 1e-7

    def one_edge(r1, r2, f1, f2, m, t0):
        R1 = rotops.angle_axis_to_rotation_matrix(r1)
        R2 = rotops.angle_axis_to_rotation_matrix(r2)
        h1 = jnp.concatenate([f1, jnp.ones_like(f1[..., :1])], axis=-1)
        h2 = jnp.concatenate([f2, jnp.ones_like(f2[..., :1])], axis=-1)
        rf1 = h1 @ R1  # R1^T x1 per row
        rf2 = h2 @ R2
        # Constraint vectors c_i = R1 (rf2 x rf1)
        # (CreateConstraintMatrix, optimize_relative_position_...cc:23-43).
        c = jnp.cross(rf2, rf1) @ R1.T  # [K, 3]
        c = c * m[..., None].astype(dtype)

        def irls_body(carry, _):
            w, _t = carry
            w = jnp.maximum(w, kMinWeight)
            lhs = jnp.einsum("ki,k,kj->ij", c, 1.0 / w, c)
            # Null vector of the weighted Gram matrix = eigvec of smallest
            # eigenvalue (eigh returns ascending order).
            _, vecs = jnp.linalg.eigh(lhs)
            t = vecs[:, 0]
            w_new = jnp.abs(c @ t)
            w_new = jnp.where(m, w_new, kMinWeight)
            return (w_new, t), None

        w0 = jnp.where(m, 1.0, kMinWeight).astype(dtype)
        (w, t), _ = jax.lax.scan(irls_body, (w0, t0), None, length=iters)

        # Sign: majority of correspondences in front of both cameras
        # (MajorityOfPointsInFrontOfCameras).
        R_rel = R2 @ R1.T
        in_front = tri.is_triangulated_point_in_front_of_cameras(
            f1, f2, R_rel[None].repeat(f1.shape[0], 0), t[None].repeat(f1.shape[0], 0)
        )
        votes = jnp.sum(in_front & m)
        n = jnp.maximum(jnp.sum(m), 1)
        t = jnp.where(votes > n // 2, t, -t)
        ok = jnp.sum(m) >= 5
        # Keep the original estimate for under-constrained edges.
        t = jnp.where(ok, t, t0 / jnp.maximum(jnp.linalg.norm(t0), 1e-12))
        return t, ok

    return jax.vmap(one_edge)(rot1, rot2, x1, x2, mask, init_position)
