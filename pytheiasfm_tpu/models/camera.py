"""Camera extrinsics + projection: the SoA equivalent of `theia::Camera`.

Re-design of `/root/reference/src/theia/sfm/camera/camera.h:62`. The reference
stores per-camera state as a 6-vector extrinsics block
``[position(3), angle-axis orientation(3)]`` (`camera.h:202-204`) plus a
shared-pointer intrinsics model. Here a scene's cameras are flat arrays:

    extrinsics  [V, 6]    (position, angle_axis) exactly as the reference
    intrinsics  [G, MAX_INTRINSICS] with a view->group index (shared groups)

and every method of `theia::Camera` becomes a batched pure function. The
world-to-camera convention matches the reference: ``p_cam = R @ (X - c)``
where R = exp(angle_axis) is the world->camera rotation and c the camera
position in world coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from functools import partial as _partial

from ..ops import rotation as rot
from . import intrinsics as intr

__all__ = [
    "POSITION",
    "ORIENTATION",
    "EXTRINSICS_SIZE",
    "make_extrinsics",
    "position",
    "orientation",
    "rotation_matrix",
    "project_point",
    "project_point_homogeneous",
    "pixel_to_unit_depth_ray",
    "pixel_to_normalized",
    "compose_projection_matrix",
    "decompose_projection_matrix",
    "camera_from_projection_matrix",
]

POSITION = 0
ORIENTATION = 3
EXTRINSICS_SIZE = 6


def make_extrinsics(position: jax.Array, angle_axis: jax.Array) -> jax.Array:
    """Pack [.., 3] position + [.., 3] angle-axis into [.., 6] extrinsics."""
    return jnp.concatenate([position, angle_axis], axis=-1)


def position(extrinsics: jax.Array) -> jax.Array:
    return extrinsics[..., POSITION : POSITION + 3]


def orientation(extrinsics: jax.Array) -> jax.Array:
    return extrinsics[..., ORIENTATION : ORIENTATION + 3]


def rotation_matrix(extrinsics: jax.Array) -> jax.Array:
    """World->camera rotation matrix."""
    return rot.angle_axis_to_rotation_matrix(orientation(extrinsics))


def project_point_homogeneous(extrinsics, intrinsics, point4, model):
    """Project a homogeneous world point [.., 4] -> (depth [..], pixel [.., 2]).

    Parity: `theia::Camera::ProjectPoint` (`camera.h:122`): the returned depth
    is the camera-frame z divided by the homogeneous w, and the pixel is the
    full distorted projection. Negative depth means behind the camera.
    """
    adjusted = point4[..., :3] - point4[..., 3:4] * position(extrinsics)
    p_cam = rot.angle_axis_rotate_point(orientation(extrinsics), adjusted)
    pixel = intr.camera_to_pixel(intrinsics, p_cam, model)
    w = point4[..., 3]
    depth = p_cam[..., 2] / jnp.where(w == 0, 1.0, w)
    return depth, pixel


def project_point(extrinsics, intrinsics, point3, model):
    """Project an inhomogeneous world point [.., 3] -> (depth, pixel)."""
    point4 = jnp.concatenate([point3, jnp.ones_like(point3[..., :1])], axis=-1)
    return project_point_homogeneous(extrinsics, intrinsics, point4, model)


def pixel_to_normalized(intrinsics, pixel, model):
    """Pixel -> normalized camera-frame ray (intrinsics removed)."""
    return intr.pixel_to_camera(intrinsics, pixel, model)


@_partial(jax.jit, static_argnames=("model",))
def pixel_to_normalized_batch(intrinsics, pixels, model):
    """[N, 2] pixels -> [N, 3] rays, as ONE cached compilation per
    (model, shape). Call sites previously built `jax.vmap(lambda ...)`
    closures ad hoc — each call re-traced the vmap (~90 ms of pure host
    tracing per call, most of the fountain pipeline's non-device time)."""
    return jax.vmap(lambda p: intr.pixel_to_camera(intrinsics, p, model))(
        pixels
    )


def pixel_to_unit_depth_ray(extrinsics, intrinsics, pixel, model):
    """Pixel -> world-frame ray direction with unit depth along the optical
    axis. Parity: `theia::Camera::PixelToUnitDepthRay` (`camera.h:147`)."""
    ray_cam = intr.pixel_to_camera(intrinsics, pixel, model)
    # Rotate by R^T (camera->world): rotate by the negated angle-axis.
    return rot.angle_axis_rotate_point(-orientation(extrinsics), ray_cam)


def compose_projection_matrix(extrinsics, intrinsics_f=None):
    """[R | -R c] as a [.., 3, 4] matrix (calibrated projection, K = I).

    Parity: `theia::ComposeProjectionMatrix`
    (`camera/projection_matrix_utils.h`).
    """
    R = rotation_matrix(extrinsics)
    t = -(R @ position(extrinsics)[..., None])
    return jnp.concatenate([R, t], axis=-1)


def decompose_projection_matrix(P: jax.Array):
    """[.., 3, 4] calibrated projection matrix -> (angle_axis, position).

    Parity: `theia::DecomposeProjectionMatrix`. Assumes K = I (the reference's
    InitializeFromProjectionMatrix path also RQ-decomposes; calibrated-only
    here, full RQ lives with the uncalibrated utilities).
    """
    R = rot.project_to_so3(P[..., :3])
    t = P[..., 3]
    c = -(jnp.swapaxes(R, -1, -2) @ t[..., None])[..., 0]
    return rot.rotation_matrix_to_angle_axis(R), c


def camera_from_projection_matrix(P: jax.Array) -> jax.Array:
    """[.., 3, 4] -> [.., 6] extrinsics. Parity:
    `theia::Camera::InitializeFromProjectionMatrix` (`camera.h:85`)."""
    aa, c = decompose_projection_matrix(P)
    return make_extrinsics(c, aa)
