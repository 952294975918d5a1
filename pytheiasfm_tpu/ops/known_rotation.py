"""Minimal solvers with known camera rotation (batched, vmappable).

Re-design of `/root/reference/src/theia/sfm/pose/`:
`position_from_two_rays.{h,cc}` (2-point absolute position),
`relative_pose_from_two_points_with_known_rotation.{h,cc}` (2-point relative
position). Features arrive pre-rotated into the world-aligned frame
(`R^T [u, v, 1]`, dehomogenized) exactly as the reference expects; each
solver is a tiny dense linear solve, so thousands run per RANSAC batch as
one vmapped kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["position_from_two_rays", "relative_pose_from_two_points_with_known_rotation"]


def position_from_two_rays(rotated_feature1, point1, rotated_feature2, point2):
    """Camera position from two 2D-3D correspondences with known rotation.

    Parity: `theia::PositionFromTwoRays` (`position_from_two_rays.h`):
    solve the 4x3 system  [I2 | -f_i] c = p_i.xy - f_i p_i.z  in least
    squares. Returns (position [3], valid).
    """
    dtype = point1.dtype
    eye2 = jnp.eye(2, dtype=dtype)
    lhs = jnp.concatenate(
        [
            jnp.concatenate([eye2, -rotated_feature1[:, None]], axis=1),
            jnp.concatenate([eye2, -rotated_feature2[:, None]], axis=1),
        ],
        axis=0,
    )  # [4, 3]
    rhs = jnp.concatenate(
        [
            point1[:2] - rotated_feature1 * point1[2],
            point2[:2] - rotated_feature2 * point2[2],
        ]
    )  # [4]
    AtA = lhs.T @ lhs
    Atb = lhs.T @ rhs
    # Rank-3 check via the conditioning of the normal matrix.
    eigs = jnp.linalg.eigvalsh(AtA)
    valid = eigs[0] > 1e-10 * jnp.maximum(eigs[-1], 1e-12)
    position = jnp.linalg.solve(AtA + 1e-12 * jnp.eye(3, dtype=dtype), Atb)
    return position, valid


def relative_pose_from_two_points_with_known_rotation(
    rotated_features1, rotated_features2
):
    """Unit relative position from 2 correspondences with known rotations.

    Parity: `theia::RelativePoseFromTwoPointsWithKnownRotation`
    (`relative_pose_from_two_points_with_known_rotation.h`): the epipolar
    constraint on rotated (world-aligned) features is linear in t; the
    solution is the null vector of the stacked 2x3 system.
    rotated_features1/2 [2, 2]. Returns (position [3], valid).
    """
    p = rotated_features1
    q = rotated_features2
    A = jnp.stack(
        [
            -p[:, 1] + q[:, 1],
            -q[:, 0] + p[:, 0],
            p[:, 1] * q[:, 0] - p[:, 0] * q[:, 1],
        ],
        axis=-1,
    )  # [2, 3]
    # Null vector via SVD of the 2x3 constraint.
    _, s, vt = jnp.linalg.svd(A, full_matrices=True)
    t = vt[-1]
    # 1-D kernel requires the two leading singular values to be non-degenerate.
    valid = s[1] > 1e-10 * jnp.maximum(s[0], 1e-12)
    return t / jnp.maximum(jnp.linalg.norm(t), 1e-12), valid
