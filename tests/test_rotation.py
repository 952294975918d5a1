"""Tests for SO(3) ops — mirrors the behavioral spec of the reference's
rotation utilities (math/rotation.h) and Ceres rotation conversions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytheiasfm_tpu.ops import rotation as rot


def random_angle_axis(rng, n, max_angle=np.pi * 0.95):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(0, max_angle, size=(n, 1))
    return jnp.asarray(axis * angle)


def test_exp_log_roundtrip(rng):
    aa = random_angle_axis(rng, 64)
    R = rot.angle_axis_to_rotation_matrix(aa)
    aa_back = rot.rotation_matrix_to_angle_axis(R)
    np.testing.assert_allclose(np.asarray(aa_back), np.asarray(aa), atol=1e-8)


def test_rotation_matrix_orthonormal(rng):
    aa = random_angle_axis(rng, 32)
    R = rot.angle_axis_to_rotation_matrix(aa)
    eye = jnp.eye(3)
    prod = R @ jnp.swapaxes(R, -1, -2)
    np.testing.assert_allclose(np.asarray(prod), np.broadcast_to(eye, prod.shape), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-12)


def test_small_angle_stability():
    for scale in [0.0, 1e-12, 1e-8, 1e-5]:
        aa = jnp.asarray([[scale, 0.0, 0.0]])
        R = rot.angle_axis_to_rotation_matrix(aa)
        assert np.all(np.isfinite(np.asarray(R)))
        aa_back = rot.rotation_matrix_to_angle_axis(R)
        np.testing.assert_allclose(np.asarray(aa_back), np.asarray(aa), atol=1e-10)


def test_near_pi_stability(rng):
    axis = rng.normal(size=(16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    aa = jnp.asarray(axis * (np.pi - 1e-7))
    R = rot.angle_axis_to_rotation_matrix(aa)
    aa_back = rot.rotation_matrix_to_angle_axis(R)
    R_back = rot.angle_axis_to_rotation_matrix(aa_back)
    np.testing.assert_allclose(np.asarray(R_back), np.asarray(R), atol=1e-6)


def test_gradient_at_zero():
    g = jax.jacobian(rot.angle_axis_to_rotation_matrix)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    # d/dw exp(w) at 0 is the generator basis: dR/dw_k = hat(e_k).
    expected = np.stack([np.asarray(rot.hat(jnp.eye(3)[k])) for k in range(3)], axis=-1)
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-6)


def test_angle_axis_rotate_point_matches_matrix(rng):
    aa = random_angle_axis(rng, 32)
    p = jnp.asarray(rng.normal(size=(32, 3)))
    rotated = rot.angle_axis_rotate_point(aa, p)
    R = rot.angle_axis_to_rotation_matrix(aa)
    expected = (R @ p[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(rotated), np.asarray(expected), atol=1e-12)


def test_multiply_rotations(rng):
    aa1 = random_angle_axis(rng, 16)
    aa2 = random_angle_axis(rng, 16)
    aa12 = rot.multiply_rotations(aa1, aa2)
    R = rot.angle_axis_to_rotation_matrix(aa12)
    expected = rot.angle_axis_to_rotation_matrix(aa1) @ rot.angle_axis_to_rotation_matrix(aa2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(expected), atol=1e-10)


def test_relative_rotation(rng):
    """Parity spec: RelativeRotationFromTwoRotations returns R2 @ R1^T."""
    aa1 = random_angle_axis(rng, 16)
    aa2 = random_angle_axis(rng, 16)
    rel = rot.relative_rotation_from_two_rotations(aa1, aa2)
    R_rel = rot.angle_axis_to_rotation_matrix(rel)
    R1 = rot.angle_axis_to_rotation_matrix(aa1)
    R2 = rot.angle_axis_to_rotation_matrix(aa2)
    np.testing.assert_allclose(
        np.asarray(R_rel), np.asarray(R2 @ jnp.swapaxes(R1, -1, -2)), atol=1e-10
    )
    # ApplyRelativeRotation(aa1, rel) == aa2.
    aa2_back = rot.apply_relative_rotation(aa1, rel)
    np.testing.assert_allclose(
        np.asarray(rot.angle_axis_to_rotation_matrix(aa2_back)),
        np.asarray(R2),
        atol=1e-10,
    )


def test_project_to_so3(rng):
    aa = random_angle_axis(rng, 8)
    R = rot.angle_axis_to_rotation_matrix(aa)
    noisy = R + 0.05 * jnp.asarray(rng.normal(size=R.shape))
    P = rot.project_to_so3(noisy)
    prod = P @ jnp.swapaxes(P, -1, -2)
    np.testing.assert_allclose(np.asarray(prod), np.broadcast_to(np.eye(3), prod.shape), atol=1e-10)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(P)), 1.0, atol=1e-10)
    # Projection of an exact rotation is itself.
    np.testing.assert_allclose(np.asarray(rot.project_to_so3(R)), np.asarray(R), atol=1e-10)


def test_align_rotations(rng):
    """Mirrors the reference AlignRotations spec: estimated rotations that
    differ from GT by a constant right-multiplied gauge rotation align
    exactly."""
    gt = random_angle_axis(rng, 20)
    gauge = random_angle_axis(rng, 1)[0]
    R_gt = rot.angle_axis_to_rotation_matrix(gt)
    R_gauge = rot.angle_axis_to_rotation_matrix(gauge)
    est = rot.rotation_matrix_to_angle_axis(R_gt @ R_gauge.T)
    aligned = rot.align_rotations(gt, est)
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(gt), atol=1e-8)


def test_quaternion_roundtrip(rng):
    aa = random_angle_axis(rng, 32)
    q = rot.angle_axis_to_quaternion(aa)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, atol=1e-12)
    R_q = rot.quaternion_to_rotation_matrix(q)
    R_aa = rot.angle_axis_to_rotation_matrix(aa)
    np.testing.assert_allclose(np.asarray(R_q), np.asarray(R_aa), atol=1e-10)


def test_vmap_and_jit(rng):
    aa = random_angle_axis(rng, 8)
    jitted = jax.jit(rot.angle_axis_to_rotation_matrix)
    np.testing.assert_allclose(
        np.asarray(jitted(aa)), np.asarray(rot.angle_axis_to_rotation_matrix(aa)), atol=1e-12
    )
    vmapped = jax.vmap(rot.rotation_matrix_to_angle_axis)
    R = rot.angle_axis_to_rotation_matrix(aa)
    np.testing.assert_allclose(np.asarray(vmapped(R)), np.asarray(aa), atol=1e-8)
