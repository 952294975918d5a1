"""Non-minimal PnP tests — mirror pose/dls_pnp_test.cc and sqpnp_test.cc:
noiseless recovery, noisy tolerance, masked outliers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytheiasfm_tpu.ops import pnp
from pytheiasfm_tpu.ops import rotation as rot


def make_pnp_scene(rng, B=8, N=20, noise=0.0):
    aa = rng.normal(size=(B, 3)) * 0.5
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    c = rng.normal(size=(B, 3))
    p_cam = rng.uniform(-2, 2, size=(B, N, 3)) + np.asarray([0, 0, 8.0])
    world = np.einsum("bij,bnj->bni", np.linalg.inv(R), p_cam) + c[:, None, :]
    feat = p_cam[..., :2] / p_cam[..., 2:3]
    if noise:
        feat = feat + rng.normal(size=feat.shape) * noise
    return feat, world, R, c


@pytest.mark.parametrize("solver", [pnp.dlt_pnp, pnp.sqpnp])
def test_pnp_noiseless(rng, solver):
    feat, world, R, c = make_pnp_scene(rng)
    Re, ce, ok = jax.jit(solver)(jnp.asarray(feat), jnp.asarray(world))
    assert np.all(np.asarray(ok))
    np.testing.assert_allclose(np.asarray(Re), R, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ce), c, atol=1e-9)


@pytest.mark.parametrize("solver", [pnp.dlt_pnp, pnp.sqpnp])
def test_pnp_noisy(rng, solver):
    feat, world, R, c = make_pnp_scene(rng, N=50, noise=1e-3)
    Re, ce, ok = solver(jnp.asarray(feat), jnp.asarray(world))
    Re, ce = np.asarray(Re), np.asarray(ce)
    for b in range(len(R)):
        angle = np.degrees(
            np.arccos(np.clip((np.trace(Re[b] @ R[b].T) - 1) / 2, -1, 1))
        )
        assert angle < 0.5, angle
        assert np.linalg.norm(ce[b] - c[b]) < 0.05


def test_pnp_masked(rng):
    feat, world, R, c = make_pnp_scene(rng, N=30)
    world = world.copy()
    world[:, 25:] = rng.normal(size=(len(R), 5, 3))  # garbage in masked rows
    mask = np.ones(world.shape[:2], bool)
    mask[:, 25:] = False
    Re, ce, ok = pnp.dlt_pnp(
        jnp.asarray(feat), jnp.asarray(world), mask=jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(Re), R, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ce), c, atol=1e-8)


def test_dls_pnp_shim(rng):
    feat, world, R, c = make_pnp_scene(rng, B=4)
    Rs, cs, valid = pnp.dls_pnp(jnp.asarray(feat), jnp.asarray(world))
    assert Rs.shape == (4, 1, 3, 3)
    np.testing.assert_allclose(np.asarray(Rs[:, 0]), R, atol=1e-9)


def test_pnp_f32(rng):
    feat, world, R, c = make_pnp_scene(rng, B=16)
    Re, ce, ok = jax.jit(pnp.sqpnp)(
        jnp.asarray(feat, jnp.float32), jnp.asarray(world, jnp.float32)
    )
    Re, ce = np.asarray(Re), np.asarray(ce)
    recovered = sum(
        np.abs(Re[b] - R[b]).max() + np.linalg.norm(ce[b] - c[b]) < 1e-2
        for b in range(16)
    )
    assert recovered >= 14
