"""SE3/Sim3 tests — mirror the reference's Sophus integration tests
(pytests/test_sophus_integration.py): exp/log roundtrips, group laws."""

import jax.numpy as jnp
import numpy as np

from pytheiasfm_tpu.ops import lie


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(32, 6)))
    R, t = lie.se3_exp(xi)
    xi_back = lie.se3_log(R, t)
    np.testing.assert_allclose(np.asarray(xi_back), np.asarray(xi), atol=1e-8)


def test_se3_small_tangent():
    xi = jnp.asarray([[1e-10, -1e-10, 0, 0, 1e-12, 0], [0.0] * 6])
    R, t = lie.se3_exp(xi)
    assert np.all(np.isfinite(np.asarray(R))) and np.all(np.isfinite(np.asarray(t)))
    np.testing.assert_allclose(np.asarray(lie.se3_log(R, t)), np.asarray(xi), atol=1e-12)


def test_se3_group_laws(rng):
    xi1 = jnp.asarray(rng.normal(size=(8, 6)))
    xi2 = jnp.asarray(rng.normal(size=(8, 6)))
    R1, t1 = lie.se3_exp(xi1)
    R2, t2 = lie.se3_exp(xi2)
    R12, t12 = lie.se3_multiply(R1, t1, R2, t2)
    p = jnp.asarray(rng.normal(size=(8, 3)))
    lhs = lie.se3_action(R12, t12, p)
    rhs = lie.se3_action(R1, t1, lie.se3_action(R2, t2, p))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)
    Ri, ti = lie.se3_inverse(R1, t1)
    Re, te = lie.se3_multiply(R1, t1, Ri, ti)
    np.testing.assert_allclose(np.asarray(Re), np.broadcast_to(np.eye(3), Re.shape), atol=1e-12)
    np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-12)


def test_sim3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(32, 7)) * np.asarray([1, 1, 1, 1, 1, 1, 0.3]))
    s, R, t = lie.sim3_exp(xi)
    xi_back = lie.sim3_log(s, R, t)
    np.testing.assert_allclose(np.asarray(xi_back), np.asarray(xi), atol=1e-8)


def test_sim3_identity_and_small(rng):
    xi = jnp.zeros((7,))
    s, R, t = lie.sim3_exp(xi)
    assert float(s) == 1.0
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-12)
    # Tiny but nonzero components in each regime.
    for xi_np in [
        np.asarray([0.1, -0.2, 0.3, 1e-10, 0, 0, 0.5]),  # theta ~ 0
        np.asarray([0.1, -0.2, 0.3, 0.4, -0.1, 0.2, 1e-10]),  # sigma ~ 0
        np.asarray([0.1, -0.2, 0.3, 1e-10, 0, 0, 1e-10]),  # both ~ 0
    ]:
        s, R, t = lie.sim3_exp(jnp.asarray(xi_np))
        back = np.asarray(lie.sim3_log(s, R, t))
        np.testing.assert_allclose(back, xi_np, atol=1e-9)


def test_sim3_group_laws(rng):
    xi1 = jnp.asarray(rng.normal(size=(8, 7)) * 0.5)
    xi2 = jnp.asarray(rng.normal(size=(8, 7)) * 0.5)
    s1, R1, t1 = lie.sim3_exp(xi1)
    s2, R2, t2 = lie.sim3_exp(xi2)
    s12, R12, t12 = lie.sim3_multiply(s1, R1, t1, s2, R2, t2)
    p = jnp.asarray(rng.normal(size=(8, 3)))
    lhs = lie.sim3_action(s12, R12, t12, p)
    rhs = lie.sim3_action(s1, R1, t1, lie.sim3_action(s2, R2, t2, p))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)
    si, Ri, ti = lie.sim3_inverse(s1, R1, t1)
    se, Re, te = lie.sim3_multiply(s1, R1, t1, si, Ri, ti)
    np.testing.assert_allclose(np.asarray(se), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Re), np.broadcast_to(np.eye(3), Re.shape), atol=1e-12)
    np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-10)


def test_sim3_w_matches_numerical_integral(rng):
    """W(phi, sigma) = int_0^1 e^{sigma u} exp(phi u) du — check by quadrature."""
    from pytheiasfm_tpu.ops import rotation as rot

    phi = rng.normal(size=3)
    sigma = 0.7
    u = np.linspace(0, 1, 20001)
    du = u[1] - u[0]
    R_all = np.asarray(
        rot.angle_axis_to_rotation_matrix(jnp.asarray(u[:, None] * phi[None, :]))
    )
    weights = np.exp(sigma * u)
    acc = np.einsum("u,uij->ij", weights, R_all) * du
    # Trapezoid correction at the ends.
    acc -= 0.5 * du * (np.eye(3) + weights[-1] * R_all[-1])
    W = np.asarray(lie._sim3_w(jnp.asarray(phi), jnp.asarray(sigma)))
    np.testing.assert_allclose(W, acc, atol=1e-6)
