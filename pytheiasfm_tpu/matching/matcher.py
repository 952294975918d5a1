"""Feature-matcher driver: all-pairs (or selected pairs) descriptor matching
with batched geometric verification.

Re-design of `/root/reference/src/theia/matching/feature_matcher.{h,cc}`
(`feature_matcher.h:77`; pair chunking over a ThreadPool at
`feature_matcher.cc:104-133`, per-pair match → GeometricVerification →
database store at `:198-217`). Here the ThreadPool fan-out becomes DEVICE
batching: pairs are padded into [P, N, ...] blocks, descriptor matching and
RANSAC verification each run as one vmapped program over the pair axis
(shardable across chips).
"""

from __future__ import annotations

import numpy as np

from ..sfm.reconstruction import CameraIntrinsicsPrior
from ..sfm.reconstruction_builder import ImagePairMatch
from ..sfm.two_view import estimate_two_view_info, estimate_two_view_info_batch
from .brute_force import match_descriptors_batch
from .database import InMemoryFeaturesAndMatchesDatabase
from .options import FeatureMatcherOptions
from .types import KeypointsAndDescriptors

__all__ = ["FeatureMatcher", "BruteForceFeatureMatcher"]


def _pad_pow2(n: int, floor: int = 64) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


class FeatureMatcher:
    """Parity: `theia::FeatureMatcher` (`feature_matcher.h:77`)."""

    def __init__(
        self,
        options: FeatureMatcherOptions | None = None,
        database: InMemoryFeaturesAndMatchesDatabase | None = None,
    ):
        self.options = options or FeatureMatcherOptions()
        self.database = database or InMemoryFeaturesAndMatchesDatabase()
        self._image_names: list[str] = []
        self._pairs_to_match: list[tuple[str, str]] | None = None

    # ------------------------------------------------------------------ input

    def add_image(
        self,
        image_name: str,
        keypoints: np.ndarray,
        descriptors: np.ndarray,
        intrinsics_prior: CameraIntrinsicsPrior | None = None,
    ):
        """Parity: `FeatureMatcher::AddImage` (feature_matcher.h:95)."""
        self.database.put_features(
            image_name,
            KeypointsAndDescriptors(
                image_name=image_name,
                keypoints=np.asarray(keypoints, np.float64),
                descriptors=np.asarray(descriptors, np.float32),
            ),
        )
        if intrinsics_prior is not None:
            self.database.put_camera_intrinsics_prior(image_name, intrinsics_prior)
        self._image_names.append(image_name)

    def set_image_pairs_to_match(self, pairs: list[tuple[str, str]]):
        """Parity: `FeatureMatcher::SetImagePairsToMatch`."""
        self._pairs_to_match = list(pairs)

    # ----------------------------------------------------------------- output

    def match_images(self) -> list[ImagePairMatch]:
        """Parity: `FeatureMatcher::MatchImages` (feature_matcher.cc:104):
        descriptor-match every pair (one batched kernel), then geometric
        verification (one batched RANSAC program over the survivors)."""
        import jax.numpy as jnp

        opt = self.options
        pairs = self._pairs_to_match
        if pairs is None:
            names = self._image_names
            pairs = [
                (names[i], names[j])
                for i in range(len(names))
                for j in range(i + 1, len(names))
            ]
        if not pairs:
            return []

        feats = {n: self.database.get_features(n) for n in self._image_names}
        N = _pad_pow2(
            min(
                max(len(feats[n].keypoints) for n in self._image_names),
                opt.max_num_features,
            )
        )
        D = max(feats[n].descriptors.shape[1] for n in self._image_names)

        def padded(name):
            f = feats[name]
            k = min(len(f.keypoints), N)
            d = np.zeros((N, D), np.float32)
            d[:k] = f.descriptors[:k]
            kp = np.zeros((N, 2))
            kp[:k] = f.keypoints[:k, :2]
            m = np.zeros(N, bool)
            m[:k] = True
            return d, kp, m

        P = len(pairs)
        d1 = np.zeros((P, N, D), np.float32)
        d2 = np.zeros((P, N, D), np.float32)
        kp1 = np.zeros((P, N, 2))
        kp2 = np.zeros((P, N, 2))
        m1 = np.zeros((P, N), bool)
        m2 = np.zeros((P, N), bool)
        cache = {}
        for i, (a, b) in enumerate(pairs):
            if a not in cache:
                cache[a] = padded(a)
            if b not in cache:
                cache[b] = padded(b)
            d1[i], kp1[i], m1[i] = cache[a]
            d2[i], kp2[i], m2[i] = cache[b]

        match_idx, _dist = match_descriptors_batch(
            jnp.asarray(d1),
            jnp.asarray(d2),
            jnp.asarray(m1),
            jnp.asarray(m2),
            jnp.asarray(opt.lowes_ratio, jnp.float32),
            use_lowes_ratio=opt.use_lowes_ratio,
            keep_only_symmetric=opt.keep_only_symmetric_matches,
        )
        match_idx = np.asarray(match_idx)

        # Gather per-pair correspondences on host.
        candidates = []
        for i, (a, b) in enumerate(pairs):
            rows = np.flatnonzero(match_idx[i] >= 0)
            if len(rows) < opt.min_num_feature_matches:
                continue
            c1 = kp1[i][rows]
            c2 = kp2[i][match_idx[i][rows]]
            candidates.append((a, b, c1, c2))
        if not candidates:
            return []

        if not opt.perform_geometric_verification:
            out = []
            for a, b, c1, c2 in candidates:
                m = ImagePairMatch(
                    image1=a, image2=b, correspondences1=c1, correspondences2=c2
                )
                m.twoview_info.num_verified_matches = len(c1)
                self.database.put_image_pair_match(a, b, m)
                out.append(m)
            return out

        return self._verify_pairs(candidates)

    def _verify_pairs(self, candidates) -> list[ImagePairMatch]:
        """Batched two-view geometric verification
        (parity: `FeatureMatcher::GeometricVerification`,
        feature_matcher.cc:198-217 → estimate_twoview_info)."""
        import jax

        opt = self.options

        def prior_of(name):
            if self.database.contains_camera_intrinsics_prior(name):
                return self.database.get_camera_intrinsics_prior(name)
            return CameraIntrinsicsPrior()

        priors1 = [prior_of(a) for a, _, _, _ in candidates]
        priors2 = [prior_of(b) for _, b, _, _ in candidates]
        calibrated = [
            p1.focal_length is not None and p2.focal_length is not None
            for p1, p2 in zip(priors1, priors2)
        ]

        out: list[ImagePairMatch] = []
        key = jax.random.PRNGKey(0)

        # Calibrated pairs verify as one batch.
        cal = [i for i, c in enumerate(calibrated) if c]
        if cal:
            K = _pad_pow2(max(len(candidates[i][2]) for i in cal))
            P = len(cal)
            pts1 = np.zeros((P, K, 2))
            pts2 = np.zeros((P, K, 2))
            masks = np.zeros((P, K), bool)
            for row, i in enumerate(cal):
                c1, c2 = candidates[i][2], candidates[i][3]
                pts1[row, : len(c1)] = c1
                pts2[row, : len(c2)] = c2
                masks[row, : len(c1)] = True
            results = estimate_two_view_info_batch(
                key,
                opt.geometric_verification_options,
                [priors1[i] for i in cal],
                [priors2[i] for i in cal],
                pts1,
                pts2,
                masks,
                min_num_inlier_matches=opt.min_num_feature_matches,
            )
            for row, i in enumerate(cal):
                info, inlier_idx = results[row]
                if info is None:
                    continue
                a, b, c1, c2 = candidates[i]
                inlier_idx = inlier_idx[inlier_idx < len(c1)]
                m = ImagePairMatch(
                    image1=a,
                    image2=b,
                    twoview_info=info,
                    correspondences1=c1[inlier_idx],
                    correspondences2=c2[inlier_idx],
                )
                self.database.put_image_pair_match(a, b, m)
                out.append(m)

        # Uncalibrated pairs verify per pair (F + focal recovery path).
        for i, c in enumerate(calibrated):
            if c:
                continue
            a, b, c1, c2 = candidates[i]
            info, inlier_idx = estimate_two_view_info(
                key,
                opt.geometric_verification_options,
                priors1[i],
                priors2[i],
                c1,
                c2,
                min_num_inlier_matches=opt.min_num_feature_matches,
            )
            if info is None:
                continue
            m = ImagePairMatch(
                image1=a,
                image2=b,
                twoview_info=info,
                correspondences1=c1[inlier_idx],
                correspondences2=c2[inlier_idx],
            )
            self.database.put_image_pair_match(a, b, m)
            out.append(m)
        return out


class BruteForceFeatureMatcher(FeatureMatcher):
    """Parity: `theia::BruteForceFeatureMatcher`
    (`brute_force_feature_matcher.h`) — the batched kernel IS brute force;
    the subclass exists for API parity."""
