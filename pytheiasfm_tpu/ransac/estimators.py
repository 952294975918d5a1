"""RANSAC-wrapped robust estimators — layer 7 of the reference
(`/root/reference/src/theia/sfm/estimators/`).

Each `Estimate*` function mirrors its reference namesake's model type,
minimal solver, and error function exactly (file:line cited per function),
but runs the whole hypothesis budget as one batched TPU program through
:mod:`pytheiasfm_tpu.ransac.engine`.

Conventions:
  - "normalized correspondences": calibrated image points (intrinsics
    removed), as produced by `pixel_to_camera`.
  - Relative pose models carry `position` = camera-2 center expressed in
    camera-1 coordinates (reference `RelativePose`, estimate_relative_pose.h).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import epipolar, five_point, p3p, triangulation as tri
from ..ops import rotation as rotops
from . import engine

__all__ = [
    "RelativePose",
    "CalibratedAbsolutePose",
    "estimate_relative_pose",
    "estimate_essential_matrix",
    "estimate_fundamental_matrix",
    "estimate_homography",
    "estimate_calibrated_absolute_pose",
    "estimate_uncalibrated_relative_pose",
    "estimate_triangulation",
    "estimate_absolute_pose_with_known_orientation",
    "estimate_relative_pose_with_known_orientation",
]


class RelativePose(NamedTuple):
    """Parity: `theia::RelativePose` (estimate_relative_pose.h)."""

    rotation: jax.Array  # [3, 3]
    position: jax.Array  # [3] camera-2 center in camera-1 frame
    essential_matrix: jax.Array  # [3, 3]


class CalibratedAbsolutePose(NamedTuple):
    """Parity: `theia::CalibratedAbsolutePose`
    (estimate_calibrated_absolute_pose.h)."""

    rotation: jax.Array  # [3, 3] world->camera
    position: jax.Array  # [3] camera center in world


class TwoViewData(NamedTuple):
    points1: jax.Array  # [N, 2]
    points2: jax.Array  # [N, 2]


class Corr2D3D(NamedTuple):
    """Parity: `theia::FeatureCorrespondence2D3D`."""

    feature: jax.Array  # [N, 2] normalized image point
    world_point: jax.Array  # [N, 3]


_BIG = 1e12


def _relative_pose_solver(subset: TwoViewData):
    """5-pt -> up to 10 E -> best cheirality pose each.

    Parity: `RelativePoseEstimator::EstimateModel`
    (estimate_relative_pose.cc:75).
    """
    E, valid = five_point.five_point_relative_pose(subset.points1, subset.points2)
    R, pos, _count = epipolar.get_best_pose_from_essential_matrix(
        E, subset.points1[None], subset.points2[None]
    )
    return RelativePose(rotation=R, position=pos, essential_matrix=E), valid


def _relative_pose_residuals(model: RelativePose, data: TwoViewData):
    """Sampson gated by cheirality (estimate_relative_pose.cc:142-152)."""
    sampson = epipolar.squared_sampson_distance(
        model.essential_matrix, data.points1, data.points2
    )
    in_front = tri.is_triangulated_point_in_front_of_cameras(
        data.points1, data.points2, model.rotation, model.position
    )
    return jnp.where(in_front, sampson, _BIG)


def _relative_pose_refine(model: RelativePose, data: TwoViewData, inliers):
    """Non-minimal LO step: 8-point on inliers projected to the essential
    manifold, then best-pose selection (stands in for the reference's
    two-view BA refine, estimate_relative_pose.cc:~100)."""
    F, ok = epipolar.eight_point_fundamental_matrix(
        data.points1, data.points2, mask=inliers
    )
    E = epipolar.project_to_essential(F)
    R, pos, _ = epipolar.get_best_pose_from_essential_matrix(
        E, data.points1, data.points2, mask=inliers
    )
    ok = ok & (jnp.sum(inliers) >= 8)
    return RelativePose(rotation=R, position=pos, essential_matrix=E), ok


def estimate_relative_pose(
    key, points1, points2, params: engine.RansacParameters, mask=None, **kw
):
    """Parity: `theia::EstimateRelativePose` (estimate_relative_pose.cc:160).

    points1/points2: normalized (calibrated) correspondences [N, 2].
    """
    est = engine.Estimator(
        sample_size=5,
        solve=_relative_pose_solver,
        residuals=_relative_pose_residuals,
        refine=_relative_pose_refine,
    )
    return engine.ransac(
        key, TwoViewData(points1, points2), est, params, mask=mask, **kw
    )


def _essential_solver(subset: TwoViewData):
    E, valid = five_point.five_point_relative_pose(subset.points1, subset.points2)
    return E, valid


def _essential_residuals(E, data: TwoViewData):
    return epipolar.squared_sampson_distance(E, data.points1, data.points2)


def estimate_essential_matrix(
    key, points1, points2, params: engine.RansacParameters, mask=None, **kw
):
    """Parity: `theia::EstimateEssentialMatrix` (estimate_essential_matrix.cc)."""

    def refine(E, data, inliers):
        F, ok = epipolar.eight_point_fundamental_matrix(
            data.points1, data.points2, mask=inliers
        )
        return epipolar.project_to_essential(F), ok & (jnp.sum(inliers) >= 8)

    est = engine.Estimator(
        sample_size=5,
        solve=_essential_solver,
        residuals=_essential_residuals,
        refine=refine,
    )
    return engine.ransac(
        key, TwoViewData(points1, points2), est, params, mask=mask, **kw
    )


def _fundamental_solver(subset: TwoViewData):
    F, valid = epipolar.seven_point_fundamental_matrix(subset.points1, subset.points2)
    return F, valid


def estimate_fundamental_matrix(
    key, points1, points2, params: engine.RansacParameters, mask=None, **kw
):
    """Parity: `theia::EstimateFundamentalMatrix`
    (estimate_fundamental_matrix.cc): 7-point minimal solver, Sampson error,
    8-point refit for local optimization."""

    def refine(F, data, inliers):
        F8, ok = epipolar.eight_point_fundamental_matrix(
            data.points1, data.points2, mask=inliers
        )
        return F8, ok & (jnp.sum(inliers) >= 8)

    est = engine.Estimator(
        sample_size=7,
        solve=_fundamental_solver,
        residuals=lambda F, d: epipolar.squared_sampson_distance(
            F, d.points1, d.points2
        ),
        refine=refine,
    )
    return engine.ransac(
        key, TwoViewData(points1, points2), est, params, mask=mask, **kw
    )


def _homography_solver(subset: TwoViewData):
    H, ok = epipolar.four_point_homography(subset.points1, subset.points2)
    return H[None], ok[None]


def _homography_residuals(H, data: TwoViewData):
    """Asymmetric transfer error in image 2 (estimate_homography.cc:108-114)."""
    p1 = jnp.concatenate(
        [data.points1, jnp.ones_like(data.points1[..., :1])], axis=-1
    )
    proj = jnp.einsum("ij,nj->ni", H, p1)
    w = proj[..., 2]
    reproj = proj[..., :2] / jnp.where(jnp.abs(w) < 1e-12, 1.0, w)[..., None]
    err = jnp.sum((data.points2 - reproj) ** 2, axis=-1)
    return jnp.where(jnp.abs(w) < 1e-12, _BIG, err)


def estimate_homography(
    key, points1, points2, params: engine.RansacParameters, mask=None, **kw
):
    """Parity: `theia::EstimateHomography` (estimate_homography.cc:122)."""

    def refine(H, data, inliers):
        H4, ok = epipolar.four_point_homography(
            data.points1, data.points2, mask=inliers
        )
        return H4, ok & (jnp.sum(inliers) >= 4)

    est = engine.Estimator(
        sample_size=4,
        solve=_homography_solver,
        residuals=_homography_residuals,
        refine=refine,
    )
    return engine.ransac(
        key, TwoViewData(points1, points2), est, params, mask=mask, **kw
    )


def _p3p_solver(subset: Corr2D3D):
    R, t, valid = p3p.pose_from_three_points(subset.feature, subset.world_point)
    # Convert t (p_cam = R p + t) to camera position c = -R^T t.
    pos = -(jnp.swapaxes(R, -1, -2) @ t[..., None])[..., 0]
    return CalibratedAbsolutePose(rotation=R, position=pos), valid


def _abs_pose_residuals(model: CalibratedAbsolutePose, data: Corr2D3D):
    """Squared reprojection of normalized features
    (estimate_calibrated_absolute_pose.cc:158-168)."""
    p_cam = jnp.einsum("ij,nj->ni", model.rotation, data.world_point - model.position)
    z = p_cam[..., 2]
    behind = z < 1e-8
    reproj = p_cam[..., :2] / jnp.where(behind, 1.0, z)[..., None]
    err = jnp.sum((reproj - data.feature) ** 2, axis=-1)
    return jnp.where(behind, _BIG, err)


def _abs_pose_refine(model, data: Corr2D3D, inliers):
    """Non-minimal DLT refit on inliers (stands in for the reference's
    single-view BA refine step)."""
    from ..ops import pnp

    R, pos, ok = pnp.dlt_pnp(data.feature, data.world_point, mask=inliers)
    ok = ok & (jnp.sum(inliers) >= 6)
    return CalibratedAbsolutePose(rotation=R, position=pos), ok


def estimate_calibrated_absolute_pose(
    key, feature, world_point, params: engine.RansacParameters, mask=None, **kw
):
    """Parity: `theia::EstimateCalibratedAbsolutePose`
    (estimate_calibrated_absolute_pose.cc:176; PnPType KNEIP path -> P3P)."""
    est = engine.Estimator(
        sample_size=3,
        solve=_p3p_solver,
        residuals=_abs_pose_residuals,
        refine=_abs_pose_refine,
    )
    return engine.ransac(
        key, Corr2D3D(feature, world_point), est, params, mask=mask, **kw
    )


class UncalibratedRelativePose(NamedTuple):
    """Parity: `theia::UncalibratedRelativePose`
    (estimate_uncalibrated_relative_pose.h)."""

    fundamental_matrix: jax.Array
    focal_length1: jax.Array
    focal_length2: jax.Array
    rotation: jax.Array
    position: jax.Array


def estimate_uncalibrated_relative_pose(
    key, points1, points2, params: engine.RansacParameters, mask=None, **kw
):
    """Parity: `theia::EstimateUncalibratedRelativePose`
    (estimate_uncalibrated_relative_pose.cc): 8-point F + focal recovery +
    pose from the implied E; Sampson residual on F (pixel units)."""

    def solve(subset: TwoViewData):
        F, ok = epipolar.eight_point_fundamental_matrix(
            subset.points1, subset.points2
        )
        f1, f2, fvalid = epipolar.focal_lengths_from_fundamental_matrix(F)
        E = epipolar.essential_matrix_from_fundamental_matrix(F, f1, f2)
        n1 = subset.points1 / f1[..., None, None]
        n2 = subset.points2 / f2[..., None, None]
        R, pos, _ = epipolar.get_best_pose_from_essential_matrix(E, n1, n2)
        model = UncalibratedRelativePose(
            fundamental_matrix=F[None],
            focal_length1=f1[None],
            focal_length2=f2[None],
            rotation=R[None],
            position=pos[None],
        )
        return model, (ok & fvalid)[None]

    def residuals(model: UncalibratedRelativePose, data: TwoViewData):
        return epipolar.squared_sampson_distance(
            model.fundamental_matrix, data.points1, data.points2
        )

    est = engine.Estimator(sample_size=8, solve=solve, residuals=residuals)
    return engine.ransac(
        key, TwoViewData(points1, points2), est, params, mask=mask, **kw
    )


def estimate_triangulation(
    key, poses, points, params: engine.RansacParameters, mask=None, **kw
):
    """Parity: `theia::EstimateTriangulation` (estimate_triangulation.cc):
    RANSAC over view pairs, DLT triangulation, squared reprojection residual
    against every observation.

    poses [N, 3, 4] calibrated projection matrices; points [N, 2] normalized
    observations of one track.
    """

    class TriData(NamedTuple):
        poses: jax.Array
        points: jax.Array

    def solve(subset: TriData):
        pt = tri.triangulate_dlt(
            subset.poses[0], subset.poses[1], subset.points[0], subset.points[1]
        )
        return pt[None], jnp.ones((1,), bool)

    def residuals(point4, data: TriData):
        proj = jnp.einsum("nij,j->ni", data.poses, point4)
        z = proj[..., 2]
        bad = jnp.abs(z) < 1e-12
        reproj = proj[..., :2] / jnp.where(bad, 1.0, z)[..., None]
        err = jnp.sum((reproj - data.points) ** 2, axis=-1)
        # Negative depth (w.r.t. homogeneous sign) -> reject.
        w_sign = jnp.sign(point4[3])
        behind = z * w_sign <= 0
        return jnp.where(bad | behind, _BIG, err)

    def refine(point4, data: TriData, inliers):
        pt = tri.triangulate_nview(data.poses, data.points, mask=inliers)
        return pt, jnp.sum(inliers) >= 2

    est = engine.Estimator(
        sample_size=2, solve=solve, residuals=residuals, refine=refine
    )
    return engine.ransac(
        key, TriData(poses, points), est, params, mask=mask, **kw
    )


# ---------------------------------------------------------------------------
# Known-orientation estimators (used by the hybrid pipeline, SURVEY §2.10).


def estimate_absolute_pose_with_known_orientation(
    key, rotated_feature, world_point, params: engine.RansacParameters,
    mask=None, **kw,
):
    """Parity: `theia::EstimateAbsolutePoseWithKnownOrientation`
    (estimators/estimate_absolute_pose_with_known_orientation.cc): 2-point
    position solver on world-aligned (pre-rotated, dehomogenized) features;
    squared reprojection residual in the rotated frame. Returns the camera
    position model."""
    from ..ops import known_rotation as kr

    def solve(subset: Corr2D3D):
        pos, ok = kr.position_from_two_rays(
            subset.feature[0], subset.world_point[0],
            subset.feature[1], subset.world_point[1],
        )
        return pos[None], ok[None]

    def residuals(position, data: Corr2D3D):
        adj = data.world_point - position
        z = adj[..., 2]
        behind = z < 1e-8
        reproj = adj[..., :2] / jnp.where(behind, 1.0, z)[..., None]
        err = jnp.sum((reproj - data.feature) ** 2, axis=-1)
        return jnp.where(behind, _BIG, err)

    est = engine.Estimator(sample_size=2, solve=solve, residuals=residuals)
    return engine.ransac(
        key, Corr2D3D(rotated_feature, world_point), est, params, mask=mask, **kw
    )


def estimate_relative_pose_with_known_orientation(
    key, rotated_points1, rotated_points2, params: engine.RansacParameters,
    mask=None, **kw,
):
    """Parity: `theia::EstimateRelativePoseWithKnownOrientation`
    (estimators/estimate_relative_pose_with_known_orientation.cc): 2-point
    relative-position nullspace solver on world-aligned features; Sampson
    residual on E = [t]_x. Returns the unit relative position."""
    from ..ops import known_rotation as kr

    def solve(subset: TwoViewData):
        pos, ok = kr.relative_pose_from_two_points_with_known_rotation(
            subset.points1, subset.points2
        )
        return pos[None], ok[None]

    def residuals(position, data: TwoViewData):
        t = position
        E = jnp.asarray(
            [[0.0, -t[2], t[1]], [t[2], 0.0, -t[0]], [-t[1], t[0], 0.0]],
        ).astype(t.dtype)
        return epipolar.squared_sampson_distance(E, data.points1, data.points2)

    est = engine.Estimator(sample_size=2, solve=solve, residuals=residuals)
    return engine.ransac(
        key, TwoViewData(rotated_points1, rotated_points2), est, params,
        mask=mask, **kw,
    )
