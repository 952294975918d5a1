"""Composed two-view geometric verification: RANSAC -> guided epipolar
rematch -> two-view BA (mirrors the reference's
two_view_match_geometric_verification.cc flow on synthetic data)."""

import numpy as np
import pytest

from pytheiasfm_tpu.matching.matcher import FeatureMatcher
from pytheiasfm_tpu.matching.options import FeatureMatcherOptions
from pytheiasfm_tpu.matching.types import KeypointsAndDescriptors
from pytheiasfm_tpu.sfm.reconstruction import CameraIntrinsicsPrior
from pytheiasfm_tpu.sfm.two_view_match_geometric_verification import (
    TwoViewMatchGeometricVerification,
    TwoViewMatchGeometricVerificationOptions,
)

FOCAL = 800.0
PP = (400.0, 300.0)
W, H = 800, 600


def _synthetic_pair(seed=0, n_points=200, desc_dim=32, pixel_noise=0.3):
    rng = np.random.default_rng(seed)
    points = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n_points, 3))
    # Camera 1 at origin identity; camera 2 translated + slightly rotated.
    angle = 0.12
    R2 = np.array(
        [
            [np.cos(angle), 0, np.sin(angle)],
            [0, 1, 0],
            [-np.sin(angle), 0, np.cos(angle)],
        ]
    )
    c2 = np.array([1.0, 0.15, 0.0])
    aa_gt = np.array([0.0, angle, 0.0])

    def project(X, R, c):
        Xc = (X - c) @ R.T
        uv = Xc[:, :2] / Xc[:, 2:3] * FOCAL + np.asarray(PP)
        return uv

    uv1 = project(points, np.eye(3), np.zeros(3))
    uv2 = project(points, R2, c2)
    uv1 += rng.normal(size=uv1.shape) * pixel_noise
    uv2 += rng.normal(size=uv2.shape) * pixel_noise

    desc = rng.normal(size=(n_points, desc_dim)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    d1 = desc + rng.normal(size=desc.shape).astype(np.float32) * 0.05
    d2 = desc + rng.normal(size=desc.shape).astype(np.float32) * 0.05
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)

    feats1 = KeypointsAndDescriptors(
        image_name="a", keypoints=uv1, descriptors=d1
    )
    feats2 = KeypointsAndDescriptors(
        image_name="b", keypoints=uv2, descriptors=d2
    )
    prior = CameraIntrinsicsPrior(
        image_width=W,
        image_height=H,
        focal_length=FOCAL,
        principal_point=PP,
    )
    return feats1, feats2, prior, aa_gt, c2 / np.linalg.norm(c2)


def test_verify_matches_recovers_pose_and_guided_adds_matches():
    feats1, feats2, prior, aa_gt, pos_gt = _synthetic_pair()
    n = len(feats1.keypoints)
    rng = np.random.default_rng(1)
    # Initial matches: 55% of the correct matches plus 15 wrong ones.
    correct = rng.choice(n, size=int(0.55 * n), replace=False)
    matches = [(int(i), int(i)) for i in correct]
    wrong1 = rng.choice(n, 15, replace=False)
    wrong2 = rng.permutation(wrong1)
    matches += [
        (int(a), int(b)) for a, b in zip(wrong1, wrong2) if a != b
    ]

    base_opts = TwoViewMatchGeometricVerificationOptions(
        min_num_inlier_matches=30,
        guided_matching=False,
        bundle_adjustment=True,
    )
    out = TwoViewMatchGeometricVerification(
        base_opts, prior, prior, feats1, feats2, matches
    ).verify_matches()
    assert out is not None
    verified_base, info_base = out
    # Wrong matches rejected; most correct ones retained.
    assert all(i == j for i, j in verified_base)
    assert len(verified_base) >= 0.8 * len(correct)
    assert np.linalg.norm(info_base.rotation_2 - aa_gt) < 0.01
    assert np.dot(info_base.position_2, pos_gt) > 0.999

    guided_opts = TwoViewMatchGeometricVerificationOptions(
        min_num_inlier_matches=30,
        guided_matching=True,
        guided_matching_max_distance_pixels=3.0,
        bundle_adjustment=True,
    )
    out = TwoViewMatchGeometricVerification(
        guided_opts, prior, prior, feats1, feats2, matches
    ).verify_matches()
    assert out is not None
    verified_guided, info_guided = out
    # Guided matching recovers correspondences the descriptor matcher missed.
    assert len(verified_guided) > len(verified_base) + 0.2 * n
    assert all(i == j for i, j in verified_guided)
    assert info_guided.num_verified_matches == len(verified_guided)
    assert np.linalg.norm(info_guided.rotation_2 - aa_gt) < 0.01


def test_verify_matches_homography_count_and_failure():
    feats1, feats2, prior, _, _ = _synthetic_pair(seed=2)
    opts = TwoViewMatchGeometricVerificationOptions(min_num_inlier_matches=30)
    # Too few matches -> None.
    v = TwoViewMatchGeometricVerification(
        opts, prior, prior, feats1, feats2, [(0, 0)] * 10
    )
    assert v.verify_matches() is None
    # Pure-garbage matches -> None.
    rng = np.random.default_rng(3)
    garbage = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 200, 80), rng.integers(0, 200, 80))
    ]
    v = TwoViewMatchGeometricVerification(
        opts, prior, prior, feats1, feats2, garbage
    )
    assert v.verify_matches() is None


@pytest.mark.parametrize("guided", [False, True])
def test_feature_matcher_composed_verification(guided):
    feats1, feats2, prior, aa_gt, pos_gt = _synthetic_pair(seed=4)
    opts = FeatureMatcherOptions()
    opts.min_num_feature_matches = 30
    opts.geometric_verification_options.guided_matching = guided
    opts.geometric_verification_options.bundle_adjustment = True
    matcher = FeatureMatcher(opts)
    matcher.add_image("a", feats1.keypoints, feats1.descriptors, prior)
    matcher.add_image("b", feats2.keypoints, feats2.descriptors, prior)
    out = matcher.match_images()
    assert len(out) == 1
    m = out[0]
    assert m.twoview_info.num_verified_matches >= 100
    assert np.linalg.norm(m.twoview_info.rotation_2 - aa_gt) < 0.02
    assert np.dot(m.twoview_info.position_2, pos_gt) > 0.995
    assert len(m.correspondences1) == m.twoview_info.num_verified_matches
