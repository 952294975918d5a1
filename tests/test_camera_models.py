"""Camera model tests — mirror the reference's per-model gtest specs
(e.g. pinhole_camera_model_test.cc): project/unproject roundtrips over a grid
of viewing angles, distortion on/off, and batched consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytheiasfm_tpu.models import camera as cam
from pytheiasfm_tpu.models import intrinsics as intr
from pytheiasfm_tpu.models.intrinsics import CameraIntrinsicsModelType as M

# (model, distortion params, roundtrip atol in normalized units)
MODEL_CASES = [
    (M.PINHOLE, (0.01, 0.001), 1e-8),
    (M.PINHOLE_RADIAL_TANGENTIAL, (0.01, 0.001, 0.0001, 0.001, 0.0005), 1e-8),
    (M.FISHEYE, (0.01, 0.001, 0.0005, 0.0001), 1e-7),
    (M.FOV, (0.75,), 1e-8),
    (M.DIVISION_UNDISTORTION, (-1e-8,), 1e-8),
    (M.DOUBLE_SPHERE, (0.2, 0.4), 1e-8),  # (xi, alpha)
    (M.EXTENDED_UNIFIED, (0.5, 1.2), 1e-8),  # (alpha, beta)
    (M.ORTHOGRAPHIC, (0.001, 0.0001), 1e-7),
]


def _params(model, distortion):
    if model == M.DIVISION_UNDISTORTION:
        focal = 1000.0
        pp = (500.0, 400.0)
    elif model == M.ORTHOGRAPHIC:
        focal = 30000.0
        pp = (960.0, 600.0)
    else:
        focal = 800.0
        pp = (640.0, 480.0)
    return intr.make_intrinsics(
        model,
        focal_length=focal,
        aspect_ratio=1.05 if model not in (M.FOV, M.DIVISION_UNDISTORTION) else 1.0,
        skew=0.0,
        principal_point=pp,
        distortion=distortion,
        dtype=jnp.float64,
    )


def _test_rays(model, n=25):
    """Grid of camera-frame rays within the model's usable FOV."""
    rng = np.random.default_rng(7)
    if model == M.ORTHOGRAPHIC:
        xy = rng.uniform(-0.01, 0.01, size=(n, 2))
        z = np.ones((n, 1))
        return jnp.asarray(np.concatenate([xy, z], axis=-1))
    lim = 0.6 if model in (M.FISHEYE, M.DOUBLE_SPHERE, M.EXTENDED_UNIFIED, M.FOV) else 0.4
    xy = rng.uniform(-lim, lim, size=(n, 2))
    z = np.ones((n, 1))
    rays = np.concatenate([xy, z], axis=-1)
    return jnp.asarray(rays)


@pytest.mark.parametrize("model,distortion,atol", MODEL_CASES)
def test_project_unproject_roundtrip(model, distortion, atol):
    params = _params(model, distortion)
    rays = _test_rays(model)
    pixels = intr.camera_to_pixel(params, rays, model)
    assert np.all(np.isfinite(np.asarray(pixels)))
    rays_back = intr.pixel_to_camera(params, pixels, model)
    # Compare as normalized image coordinates (scale-invariant directions).
    expected = np.asarray(rays[..., :2] / rays[..., 2:3])
    got = np.asarray(rays_back[..., :2] / rays_back[..., 2:3])
    if model == M.ORTHOGRAPHIC:
        # Orthographic "ray" is the (x, y) offset directly.
        expected = np.asarray(rays[..., :2])
        got = np.asarray(rays_back[..., :2])
    np.testing.assert_allclose(got, expected, atol=atol)


@pytest.mark.parametrize("model,distortion,atol", MODEL_CASES)
def test_no_distortion_matches_k_matrix(model, distortion, atol):
    """With zero distortion every projective model reduces to K @ ray.

    (Mirrors e.g. pinhole_camera_model_test.cc ProjectionWithoutDistortion.)
    """
    if model in (M.DOUBLE_SPHERE, M.EXTENDED_UNIFIED, M.FISHEYE):
        pytest.skip(
            "DS/EUCM/fisheye with zero distortion params are still "
            "non-perspective projections, not pinhole-equivalent"
        )
    params = _params(model, (0.0,) * len(distortion))
    rays = _test_rays(model)
    pixels = np.asarray(intr.camera_to_pixel(params, rays, model))
    f = float(params[0])
    aspect = float(params[1])
    ppx, ppy = np.asarray(intr.principal_point(params, model))
    if model == M.ORTHOGRAPHIC:
        norm = np.asarray(rays[..., :2])
    else:
        norm = np.asarray(rays[..., :2] / rays[..., 2:3])
    expected = np.stack(
        [f * norm[..., 0] + ppx, f * aspect * norm[..., 1] + ppy], axis=-1
    )
    np.testing.assert_allclose(pixels, expected, atol=1e-9)


@pytest.mark.parametrize("model,distortion,atol", MODEL_CASES)
def test_projection_is_differentiable(model, distortion, atol):
    params = _params(model, distortion)
    ray = _test_rays(model)[0]

    def f(p, r):
        return intr.camera_to_pixel(p, r, model)

    jp = jax.jacobian(f, argnums=0)(params, ray)
    jr = jax.jacobian(f, argnums=1)(params, ray)
    assert np.all(np.isfinite(np.asarray(jp)))
    assert np.all(np.isfinite(np.asarray(jr)))
    # Focal-length gradient must be nonzero.
    assert np.any(np.abs(np.asarray(jp)[:, 0]) > 1e-12)


def test_camera_project_point():
    """Full Camera::ProjectPoint parity check: world point -> depth + pixel."""
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.normal(size=(4, 3)))
    aa = jnp.asarray(0.2 * rng.normal(size=(4, 3)))
    ext = cam.make_extrinsics(pos, aa)
    params = _params(M.PINHOLE, (0.0, 0.0))
    # Points 5 units in front of each camera center along the optical axis.
    from pytheiasfm_tpu.ops import rotation as rot

    R = rot.angle_axis_to_rotation_matrix(aa)
    forward = R[..., 2, :]  # third row of world->cam rotation = optical axis
    points = pos + 5.0 * forward
    depth, pixel = cam.project_point(ext, params, points, M.PINHOLE)
    np.testing.assert_allclose(np.asarray(depth), 5.0, atol=1e-10)
    ppx, ppy = np.asarray(intr.principal_point(params, M.PINHOLE))
    np.testing.assert_allclose(np.asarray(pixel), np.tile([ppx, ppy], (4, 1)), atol=1e-6)


def test_pixel_to_unit_depth_ray_roundtrip():
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.normal(size=(3,)))
    aa = jnp.asarray(0.3 * rng.normal(size=(3,)))
    ext = cam.make_extrinsics(pos, aa)
    params = _params(M.PINHOLE, (0.01, 0.001))
    point = pos + cam.pixel_to_unit_depth_ray(
        ext, params, jnp.asarray([700.0, 500.0]), M.PINHOLE
    ) * 4.0
    depth, pixel = cam.project_point(ext, params, point, M.PINHOLE)
    np.testing.assert_allclose(float(depth), 4.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(pixel), [700.0, 500.0], atol=1e-6)


def test_projection_matrix_roundtrip():
    rng = np.random.default_rng(11)
    pos = jnp.asarray(rng.normal(size=(6, 3)))
    aa = jnp.asarray(0.5 * rng.normal(size=(6, 3)))
    ext = cam.make_extrinsics(pos, aa)
    P = cam.compose_projection_matrix(ext)
    ext_back = cam.camera_from_projection_matrix(P)
    np.testing.assert_allclose(np.asarray(ext_back), np.asarray(ext), atol=1e-9)
