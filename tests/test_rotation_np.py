"""Host numpy SO(3) conversions vs the jax device kernels."""

import jax
import jax.numpy as jnp
import numpy as np

from pytheiasfm_tpu.ops import rotation as rotops
from pytheiasfm_tpu.ops.rotation_np import (
    angle_axis_rotate_point_np,
    angle_axis_to_rotation_matrix_np,
    rotation_matrix_to_angle_axis_np,
)


def test_aa_to_R_matches_jax(rng):
    aa = rng.normal(size=(64, 3)) * rng.uniform(0, np.pi, (64, 1))
    aa[0] = 0.0
    aa[1] = [1e-14, 0, 0]
    R_np = angle_axis_to_rotation_matrix_np(aa)
    R_jax = np.asarray(
        jax.vmap(rotops.angle_axis_to_rotation_matrix)(jnp.asarray(aa))
    )
    np.testing.assert_allclose(R_np, R_jax, atol=1e-12)


def test_R_to_aa_roundtrip(rng):
    aa = rng.normal(size=(64, 3))
    aa /= np.linalg.norm(aa, axis=1, keepdims=True)
    aa *= rng.uniform(0.01, np.pi - 1e-3, (64, 1))
    R = angle_axis_to_rotation_matrix_np(aa)
    back = rotation_matrix_to_angle_axis_np(R)
    np.testing.assert_allclose(back, aa, atol=1e-9)


def test_R_to_aa_near_pi(rng):
    for axis in ([1.0, 0, 0], [0, 1.0, 0], [0.6, -0.8, 0]):
        axis = np.asarray(axis) / np.linalg.norm(axis)
        for theta in (np.pi - 1e-9, np.pi):
            aa = axis * theta
            R = angle_axis_to_rotation_matrix_np(aa)
            back = rotation_matrix_to_angle_axis_np(R)
            Rb = angle_axis_to_rotation_matrix_np(back)
            # Angle-axis may flip sign at exactly pi; compare rotations.
            np.testing.assert_allclose(Rb, R, atol=1e-6)


def test_rotate_point_matches_jax(rng):
    aa = rng.normal(size=(32, 3))
    pts = rng.normal(size=(32, 3))
    got = angle_axis_rotate_point_np(aa, pts)
    want = np.asarray(
        jax.vmap(rotops.angle_axis_rotate_point)(jnp.asarray(aa), jnp.asarray(pts))
    )
    np.testing.assert_allclose(got, want, atol=1e-12)
