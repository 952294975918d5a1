"""Matching layer tests (SURVEY.md §2.7): brute-force kernel semantics
(Lowe's ratio, symmetric cross-check), graph match, guided epipolar
matching, database, and the matcher -> builder integration."""

import numpy as np
import pytest

import jax.numpy as jnp

from pytheiasfm_tpu.matching import (
    FeatureMatcherOptions,
    GuidedEpipolarMatcher,
    InMemoryFeaturesAndMatchesDatabase,
    KeypointsAndDescriptors,
    BruteForceFeatureMatcher,
    graph_match,
    match_descriptor_pair,
)


def _rand_unit(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_match_descriptor_pair_identity(rng):
    d = _rand_unit(rng, 40, 64)
    perm = rng.permutation(40)
    idx, dist = match_descriptor_pair(
        jnp.asarray(d),
        jnp.asarray(d[perm] + rng.normal(size=d.shape).astype(np.float32) * 0.01),
        jnp.ones(40, bool),
        jnp.ones(40, bool),
        jnp.asarray(0.8, jnp.float32),
        use_bf16=False,
    )
    idx = np.asarray(idx)
    # Every descriptor should match its permuted twin.
    inv = np.argsort(perm)
    matched = idx >= 0
    assert matched.sum() >= 38
    np.testing.assert_array_equal(idx[matched], inv[np.flatnonzero(matched)])


def test_lowes_ratio_rejects_ambiguous(rng):
    # Two identical target descriptors -> ratio ~1 -> reject.
    a = _rand_unit(rng, 1, 32)
    d2 = np.concatenate([a + 1e-4, a - 1e-4], axis=0).astype(np.float32)
    idx, _ = match_descriptor_pair(
        jnp.asarray(a),
        jnp.asarray(d2),
        jnp.ones(1, bool),
        jnp.ones(2, bool),
        jnp.asarray(0.8, jnp.float32),
        use_bf16=False,
    )
    assert int(idx[0]) == -1


def test_symmetric_check(rng):
    # d1[0] and d1[1] both closest to d2[0], but d2[0]'s best is d1[0]:
    # symmetric check must kill d1[1]'s match.
    base = _rand_unit(rng, 1, 32)[0]
    d1 = np.stack([base, base + 0.05 * _rand_unit(rng, 1, 32)[0]]).astype(
        np.float32
    )
    far = _rand_unit(rng, 1, 32)[0]
    d2 = np.stack([base, far]).astype(np.float32)
    idx, _ = match_descriptor_pair(
        jnp.asarray(d1),
        jnp.asarray(d2),
        jnp.ones(2, bool),
        jnp.ones(2, bool),
        jnp.asarray(0.95, jnp.float32),
        use_lowes_ratio=False,
        keep_only_symmetric=True,
        use_bf16=False,
    )
    idx = np.asarray(idx)
    assert idx[0] == 0
    assert idx[1] == -1


def test_graph_match(rng):
    # Three tight clusters of global descriptors; neighbors should stay
    # mostly intra-cluster.
    centers = _rand_unit(rng, 3, 16) * 10
    desc = np.concatenate(
        [c + rng.normal(size=(4, 16)) * 0.1 for c in centers]
    ).astype(np.float32)
    pairs = graph_match(desc, num_nearest_neighbors=3)
    intra = sum(1 for a, b in pairs if a // 4 == b // 4)
    assert intra / len(pairs) > 0.9


def test_database_roundtrip(tmp_path, rng):
    db = InMemoryFeaturesAndMatchesDatabase()
    feats = KeypointsAndDescriptors(
        image_name="a.png",
        keypoints=rng.normal(size=(5, 2)),
        descriptors=rng.normal(size=(5, 8)).astype(np.float32),
    )
    db.put_features("a.png", feats)
    assert db.contains_features("a.png")
    db.save(str(tmp_path / "db.pkl"))
    db2 = InMemoryFeaturesAndMatchesDatabase()
    db2.load(str(tmp_path / "db.pkl"))
    np.testing.assert_array_equal(
        db2.get_features("a.png").descriptors, feats.descriptors
    )


def test_guided_epipolar_matcher(rng):
    # Identity-ish geometry: F maps points to lines through the same y.
    # Use a synthetic F = [e]_x for a pure-translation pair along x: the
    # epipolar lines are horizontal, so matches must share y.
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], float)  # [t]_x, t = x-axis
    pts1 = np.array([[10.0, 5.0], [20.0, 40.0]])
    pts2 = np.array([[12.0, 5.0], [22.0, 40.0], [30.0, 90.0]])
    base = _rand_unit(rng, 2, 16)
    d1 = base.astype(np.float32)
    d2 = np.concatenate([base, _rand_unit(rng, 1, 16)]).astype(np.float32)
    m = GuidedEpipolarMatcher(max_epipolar_distance=2.0)
    out = m.get_matches(
        F,
        KeypointsAndDescriptors(keypoints=pts1, descriptors=d1),
        KeypointsAndDescriptors(keypoints=pts2, descriptors=d2),
        existing_matches=[],
    )
    assert (0, 0) in out and (1, 1) in out


def test_full_matcher_pipeline(rng):
    """Project synthetic 3D points into cameras, attach per-track random
    descriptors, and check the matcher recovers verified pairs."""
    from pytheiasfm_tpu.utils.synthetic import SyntheticSceneOptions, generate_scene

    recon, gt_ext, gt_pts = generate_scene(
        SyntheticSceneOptions(num_views=4, num_tracks=120, pixel_noise=0.2, seed=21)
    )
    track_desc = _rand_unit(np.random.default_rng(0), 120, 32)

    matcher = BruteForceFeatureMatcher(
        FeatureMatcherOptions(min_num_feature_matches=20)
    )
    for v in range(recon.num_views()):
        tracks = recon.tracks_in_view(v)
        kps = np.stack(
            [recon.obs_uv[recon._view_track_to_obs[v][t]] for t in tracks]
        )
        descs = track_desc[tracks] + rng.normal(size=(len(tracks), 32)).astype(
            np.float32
        ) * 0.01
        matcher.add_image(
            recon.view_names[v], kps, descs.astype(np.float32), recon.view_priors[v]
        )

    matches = matcher.match_images()
    assert len(matches) >= 4  # most of the 6 pairs verify
    for m in matches:
        assert m.twoview_info.num_verified_matches >= 20
        assert len(m.correspondences1) == len(m.correspondences2)
    assert matcher.database.num_matches() == len(matches)
