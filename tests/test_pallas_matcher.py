"""Pallas streaming matcher vs the XLA reference path (interpret mode on
CPU; the driver's bench exercises the compiled kernel on the real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytheiasfm_tpu.matching.brute_force import match_descriptors_batch
from pytheiasfm_tpu.matching.pallas_matcher import (
    match_descriptors_batch_pallas,
)

INTERPRET = jax.default_backend() != "tpu"


def _descs(rng, P, N, D, noise=0.05):
    base = rng.normal(size=(P, N, D)).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    d2 = base + rng.normal(size=base.shape).astype(np.float32) * noise
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    perm = np.stack([rng.permutation(N) for _ in range(P)])
    d2_shuf = np.take_along_axis(d2, perm[:, :, None], axis=1)
    return base, d2_shuf, perm


@pytest.mark.parametrize("N,D", [(256, 128), (512, 64)])
def test_pallas_matches_xla(rng, N, D):
    P = 2
    d1, d2, perm = _descs(rng, P, N, D)
    m1 = np.ones((P, N), bool)
    m2 = np.ones((P, N), bool)
    m1[:, -7:] = False  # exercise masking
    m2[:, -3:] = False
    ratio = jnp.asarray(0.8, jnp.float32)

    idx_ref, dist_ref = match_descriptors_batch(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2),
        ratio,
    )
    idx_pl, dist_pl = match_descriptors_batch_pallas(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2),
        ratio, tile_i=128, tile_j=128, interpret=INTERPRET,
    )
    idx_ref = np.asarray(idx_ref)
    idx_pl = np.asarray(idx_pl)
    # bf16 rounding can flip near-ties; demand near-exact agreement.
    agree = (idx_ref == idx_pl).mean()
    assert agree > 0.99, f"agreement {agree}"
    # And the matches that agree must be the ground-truth permutation.
    ok = idx_pl >= 0
    for p in range(P):
        rows = np.flatnonzero(ok[p])
        inv = np.empty(N, np.int64)
        inv[perm[p]] = np.arange(N)
        correct = (idx_pl[p][rows] == inv[rows]).mean()
        assert correct > 0.95
    # Distances agree where defined.
    sel = (idx_ref == idx_pl) & (idx_ref >= 0)
    np.testing.assert_allclose(
        np.asarray(dist_pl)[sel], np.asarray(dist_ref)[sel], rtol=1e-3,
        atol=1e-4,
    )


def test_pallas_no_ratio_no_symmetric(rng):
    P, N, D = 1, 256, 128
    d1, d2, _ = _descs(rng, P, N, D)
    m = jnp.ones((P, N), bool)
    ratio = jnp.asarray(0.8, jnp.float32)
    idx_ref, _ = match_descriptors_batch(
        jnp.asarray(d1), jnp.asarray(d2), m, m, ratio,
        use_lowes_ratio=False, keep_only_symmetric=False,
    )
    idx_pl, _ = match_descriptors_batch_pallas(
        jnp.asarray(d1), jnp.asarray(d2), m, m, ratio,
        use_lowes_ratio=False, keep_only_symmetric=False,
        tile_i=128, tile_j=128, interpret=INTERPRET,
    )
    assert (np.asarray(idx_ref) == np.asarray(idx_pl)).mean() > 0.99
