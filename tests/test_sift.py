"""Pure-JAX upright-SIFT extractor: repeatability + matching sanity.

Mirrors the reference's keypoint/descriptor test style
(`data/image/keypoint_detector/`, `image/descriptor/` fixtures): synthetic
blob/checker scenes with known geometry -> detect -> verify localization
and that descriptors match across a translated copy.
"""

import numpy as np

from pytheiasfm_tpu.features import SiftParams, detect_and_describe


def _blob_image(rng, H=256, W=256, n=24, seed_shift=(0, 0)):
    """Gaussian blobs at random positions (analytic, subpixel shiftable)."""
    ys = rng.uniform(40, H - 40, n)
    xs = rng.uniform(40, W - 40, n)
    sig = rng.uniform(2.5, 5.0, n)
    amp = rng.uniform(0.5, 1.0, n) * np.where(rng.uniform(size=n) < 0.5, -1, 1)
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.full((H, W), 0.5)
    dy, dx = seed_shift
    for y, x, s, a in zip(ys + dy, xs + dx, sig, amp):
        img += a * np.exp(-(((yy - y) ** 2 + (xx - x) ** 2) / (2 * s * s)))
    return np.clip(img, 0, 1).astype(np.float32), np.stack([xs + dx, ys + dy], -1)


def test_detects_blobs(rng):
    img, centers = _blob_image(rng)
    kp, sc, desc, resp = detect_and_describe(img, SiftParams(num_octaves=3))
    assert len(kp) >= len(centers) * 0.7
    # Most blob centers should have a detection within 2 px.
    d = np.linalg.norm(centers[:, None, :] - kp[None, :, :], axis=-1)
    hit = (d.min(axis=1) < 2.0).mean()
    assert hit > 0.7, f"only {hit:.0%} of blobs detected"
    assert desc.shape[1] == 128
    n = np.linalg.norm(desc, axis=1)
    assert np.all(n[n > 0] < 1.01)


def test_descriptors_match_across_translation(rng):
    img1, c1 = _blob_image(np.random.default_rng(7))
    img2, c2 = _blob_image(np.random.default_rng(7), seed_shift=(7, -12))
    kp1, _, d1, _ = detect_and_describe(img1, SiftParams(num_octaves=3))
    kp2, _, d2, _ = detect_and_describe(img2, SiftParams(num_octaves=3))

    import jax.numpy as jnp

    from pytheiasfm_tpu.matching.brute_force import match_descriptor_pair

    n1, n2 = len(kp1), len(kp2)
    N = 1 << (max(n1, n2) - 1).bit_length()
    D1 = np.zeros((N, 128), np.float32)
    D2 = np.zeros((N, 128), np.float32)
    D1[:n1], D2[:n2] = d1, d2
    m1 = np.arange(N) < n1
    m2 = np.arange(N) < n2
    idx, _ = match_descriptor_pair(
        jnp.asarray(D1), jnp.asarray(D2), jnp.asarray(m1), jnp.asarray(m2),
        jnp.asarray(0.8, jnp.float32),
    )
    idx = np.asarray(idx)
    rows = np.nonzero(idx[:n1] >= 0)[0]
    assert len(rows) >= 10
    # Matched displacement must equal the known shift (dx=-12, dy=7).
    disp = kp2[idx[rows]] - kp1[rows]
    med = np.median(disp, axis=0)
    np.testing.assert_allclose(med, [-12.0, 7.0], atol=1.0)
