"""compute_triplet_baseline_ratios vs synthetic ground truth.

Mirrors the reference's test strategy for
`compute_triplet_baseline_ratios.cc`: known cameras -> project points ->
recover the relative baseline scales from triangulated depths.
"""

import jax.numpy as jnp
import numpy as np

from pytheiasfm_tpu.global_pose.triplet_baseline import (
    compute_triplet_baseline_ratios,
)
from pytheiasfm_tpu.ops import rotation as rot


def _aa(R):
    return np.asarray(rot.rotation_matrix_to_angle_axis(jnp.asarray(R)))


def _look_rotation(angle_deg):
    a = np.deg2rad(angle_deg)
    return np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
    )


def _triplet(rng, c2, c3, n=80, noise=0.0):
    cams = [np.zeros(3), np.asarray(c2, float), np.asarray(c3, float)]
    Rs = [_look_rotation(d) for d in (3.0, -2.0, 4.0)]
    pts = rng.uniform([-2, -2, 4], [2, 2, 9], size=(n, 3))

    feats = []
    for R, c in zip(Rs, cams):
        p_cam = (pts - c) @ R.T
        f = p_cam[:, :2] / p_cam[:, 2:3]
        feats.append(f + rng.normal(size=f.shape) * noise)

    def rel(i, j):
        Rij = Rs[j] @ Rs[i].T
        t = Rs[i] @ (cams[j] - cams[i])
        return _aa(Rij), t / np.linalg.norm(t)

    aa12, p12 = rel(0, 1)
    aa13, p13 = rel(0, 2)
    aa23, p23 = rel(1, 2)
    return (aa12, p12, aa13, p13, aa23, p23), feats


def test_recovers_known_baseline_ratios(rng):
    infos, feats = _triplet(rng, c2=(1.0, 0.0, 0.0), c3=(3.0, 0.3, 0.0))
    mask = np.ones(len(feats[0]), bool)
    baseline, n = compute_triplet_baseline_ratios(
        *(jnp.asarray(a) for a in infos),
        *(jnp.asarray(f) for f in feats),
        jnp.asarray(mask),
    )
    baseline = np.asarray(baseline)
    assert int(n) > 50
    d12 = np.linalg.norm([1.0, 0.0, 0.0])
    d13 = np.linalg.norm([3.0, 0.3, 0.0])
    d23 = np.linalg.norm([2.0, 0.3, 0.0])
    np.testing.assert_allclose(baseline[0], 1.0)
    np.testing.assert_allclose(baseline[1], d13 / d12, rtol=1e-3)
    np.testing.assert_allclose(baseline[2], d23 / d12, rtol=1e-3)


def test_noise_robust_median(rng):
    infos, feats = _triplet(
        rng, c2=(0.8, 0.1, 0.0), c3=(2.0, -0.2, 0.1), noise=5e-4
    )
    mask = np.ones(len(feats[0]), bool)
    baseline, n = compute_triplet_baseline_ratios(
        *(jnp.asarray(a) for a in infos),
        *(jnp.asarray(f) for f in feats),
        jnp.asarray(mask),
    )
    baseline = np.asarray(baseline)
    d12 = np.linalg.norm([0.8, 0.1, 0.0])
    d13 = np.linalg.norm([2.0, -0.2, 0.1])
    np.testing.assert_allclose(baseline[1], d13 / d12, rtol=0.05)


def test_degenerate_returns_zero_count(rng):
    # All features identical rays -> no triangulation angle -> n == 0.
    infos, feats = _triplet(rng, c2=(1.0, 0, 0), c3=(2.0, 0, 0), n=16)
    f = np.zeros_like(feats[0])
    mask = np.ones(len(f), bool)
    baseline, n = compute_triplet_baseline_ratios(
        *(jnp.asarray(a) for a in infos),
        jnp.asarray(f), jnp.asarray(f), jnp.asarray(f),
        jnp.asarray(mask),
    )
    assert int(n) == 0
    assert np.asarray(baseline)[1] == 0.0
