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
from .brute_force import match_descriptors_batch_auto
from .database import InMemoryFeaturesAndMatchesDatabase
from ..utils.log import logger
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

        match_idx, _dist = match_descriptors_batch_auto(
            jnp.asarray(d1),
            jnp.asarray(d2),
            jnp.asarray(m1),
            jnp.asarray(m2),
            jnp.asarray(opt.lowes_ratio, jnp.float32),
            use_lowes_ratio=opt.use_lowes_ratio,
            keep_only_symmetric=opt.keep_only_symmetric_matches,
        )
        match_idx = np.asarray(match_idx)
        logger.info(
            "matcher: %d pairs descriptor-matched (N=%d, D=%d)",
            len(pairs), N, D,
        )

        # Gather per-pair correspondences on host. Each candidate keeps the
        # pair row plus per-image feature indices so the guided-rematch stage
        # can flag already-matched features.
        candidates = []
        for i, (a, b) in enumerate(pairs):
            rows = np.flatnonzero(match_idx[i] >= 0)
            if len(rows) < opt.min_num_feature_matches:
                continue
            cols = match_idx[i][rows]
            candidates.append(
                dict(
                    row=i,
                    a=a,
                    b=b,
                    idx1=rows,
                    idx2=cols,
                    c1=kp1[i][rows],
                    c2=kp2[i][cols],
                )
            )
        logger.info(
            "matcher: %d/%d pairs passed min_num_feature_matches=%d",
            len(candidates), len(pairs), opt.min_num_feature_matches,
        )
        if not candidates:
            return []

        if not opt.perform_geometric_verification:
            out = []
            for cand in candidates:
                m = ImagePairMatch(
                    image1=cand["a"],
                    image2=cand["b"],
                    correspondences1=cand["c1"],
                    correspondences2=cand["c2"],
                )
                m.twoview_info.num_verified_matches = len(cand["c1"])
                self.database.put_image_pair_match(cand["a"], cand["b"], m)
                out.append(m)
            return out

        padded = dict(d1=d1, d2=d2, kp1=kp1, kp2=kp2, m1=m1, m2=m2)
        return self._verify_pairs(candidates, padded)

    def _verify_pairs(self, candidates, padded) -> list[ImagePairMatch]:
        """Batched two-view geometric verification.

        Parity: `FeatureMatcher::GeometricVerification`
        (feature_matcher.cc:198-217) which delegates to
        `TwoViewMatchGeometricVerification::VerifyMatches`
        (two_view_match_geometric_verification.cc:114-183). Stage 1 (RANSAC
        geometry) runs as one batched program over calibrated pairs; stage 2
        (guided epipolar rematch + triangulation gate + two-view BA) runs as
        a second batched program over the survivors.
        """
        import jax

        opt = self.options
        gv = opt.geometric_verification_options
        etvi = gv.estimate_twoview_info_options

        def prior_of(name):
            if self.database.contains_camera_intrinsics_prior(name):
                return self.database.get_camera_intrinsics_prior(name)
            return CameraIntrinsicsPrior()

        priors1 = [prior_of(c["a"]) for c in candidates]
        priors2 = [prior_of(c["b"]) for c in candidates]
        calibrated = [
            p1.focal_length is not None and p2.focal_length is not None
            for p1, p2 in zip(priors1, priors2)
        ]

        key = jax.random.PRNGKey(0)
        # survivors: list of (cand, prior1, prior2, info, idx1, idx2) where
        # idx1/idx2 are per-image feature indices of the inlier matches.
        survivors = []

        # Calibrated pairs verify as one batch.
        cal = [i for i, c in enumerate(calibrated) if c]
        if cal:
            K = _pad_pow2(max(len(candidates[i]["c1"]) for i in cal))
            P = len(cal)
            pts1 = np.zeros((P, K, 2))
            pts2 = np.zeros((P, K, 2))
            masks = np.zeros((P, K), bool)
            for row, i in enumerate(cal):
                c1, c2 = candidates[i]["c1"], candidates[i]["c2"]
                pts1[row, : len(c1)] = c1
                pts2[row, : len(c2)] = c2
                masks[row, : len(c1)] = True
            results = estimate_two_view_info_batch(
                key,
                etvi,
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
                cand = candidates[i]
                inlier_idx = inlier_idx[inlier_idx < len(cand["c1"])]
                survivors.append(
                    (
                        cand,
                        priors1[i],
                        priors2[i],
                        info,
                        cand["idx1"][inlier_idx],
                        cand["idx2"][inlier_idx],
                    )
                )

        # Uncalibrated pairs verify per pair (F + focal recovery path).
        for i, c in enumerate(calibrated):
            if c:
                continue
            cand = candidates[i]
            info, inlier_idx = estimate_two_view_info(
                key,
                etvi,
                priors1[i],
                priors2[i],
                cand["c1"],
                cand["c2"],
                min_num_inlier_matches=opt.min_num_feature_matches,
            )
            if info is None:
                continue
            survivors.append(
                (
                    cand,
                    priors1[i],
                    priors2[i],
                    info,
                    cand["idx1"][inlier_idx],
                    cand["idx2"][inlier_idx],
                )
            )

        if survivors and (gv.guided_matching or gv.bundle_adjustment):
            survivors = self._refine_survivors(survivors, padded)

        out: list[ImagePairMatch] = []
        for cand, _p1, _p2, info, idx1, idx2 in survivors:
            if len(idx1) < opt.min_num_feature_matches:
                continue
            row = cand["row"]
            m = ImagePairMatch(
                image1=cand["a"],
                image2=cand["b"],
                twoview_info=info,
                correspondences1=padded["kp1"][row][idx1],
                correspondences2=padded["kp2"][row][idx2],
            )
            self.database.put_image_pair_match(cand["a"], cand["b"], m)
            out.append(m)
        return out

    def _refine_survivors(self, survivors, padded, guided_chunk: int = 4):
        """Stage 2 of verification, batched over pairs: guided epipolar
        rematch (two_view_match_geometric_verification.cc:157-168), then
        triangulation gate + two-view BA + final reprojection gate
        (`:170-180` and `BundleAdjustRelativePose`)."""
        import jax
        import jax.numpy as jnp

        from ..sfm.two_view_match_geometric_verification import (
            _prior_K,
            fundamental_from_two_view_info,
            refine_relative_pose_batch_jit,
        )

        gv = self.options.geometric_verification_options
        P = len(survivors)
        N = padded["kp1"].shape[1]
        Ks1 = [_prior_K(p1) for _, p1, _, _, _, _ in survivors]
        Ks2 = [_prior_K(p2) for _, _, p2, _, _, _ in survivors]
        # Focal lengths actually used for normalization (priors or recovered).
        f1s = np.array([s[3].focal_length_1 or 1.0 for s in survivors])
        f2s = np.array([s[3].focal_length_2 or 1.0 for s in survivors])

        if gv.guided_matching:
            rows = [s[0]["row"] for s in survivors]
            F = np.stack(
                [
                    np.asarray(
                        fundamental_from_two_view_info(
                            jnp.asarray(s[3].rotation_2),
                            jnp.asarray(s[3].position_2),
                            jnp.asarray(Ks1[i]),
                            jnp.asarray(Ks2[i]),
                        )
                    )
                    for i, s in enumerate(survivors)
                ]
            )
            already1 = np.zeros((P, N), bool)
            already2 = np.zeros((P, N), bool)
            for i, (_c, _p1, _p2, _info, idx1, idx2) in enumerate(survivors):
                already1[i, idx1] = True
                already2[i, idx2] = True

            from .guided_epipolar import guided_epipolar_match

            vm = jax.vmap(
                guided_epipolar_match,
                in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None, None),
            )
            guided_idx = np.empty((P, N), np.int32)
            for s0 in range(0, P, guided_chunk):
                s1 = min(s0 + guided_chunk, P)
                sl = slice(s0, s1)
                r = rows[s0:s1]
                guided_idx[sl] = np.asarray(
                    vm(
                        jnp.asarray(F[sl], jnp.float32),
                        jnp.asarray(padded["kp1"][r], jnp.float32),
                        jnp.asarray(padded["kp2"][r], jnp.float32),
                        jnp.asarray(padded["d1"][r]),
                        jnp.asarray(padded["d2"][r]),
                        jnp.asarray(padded["m1"][r]),
                        jnp.asarray(padded["m2"][r]),
                        jnp.asarray(already1[sl]),
                        jnp.asarray(already2[sl]),
                        jnp.asarray(
                            gv.guided_matching_max_distance_pixels, jnp.float32
                        ),
                        jnp.asarray(gv.guided_matching_lowes_ratio, jnp.float32),
                    )
                )
            new_survivors = []
            for i, (cand, p1, p2, info, idx1, idx2) in enumerate(survivors):
                extra1 = np.flatnonzero(guided_idx[i] >= 0)
                extra2 = guided_idx[i][extra1]
                new_survivors.append(
                    (
                        cand,
                        p1,
                        p2,
                        info,
                        np.concatenate([idx1, extra1]),
                        np.concatenate([idx2, extra2]),
                    )
                )
            survivors = new_survivors

        if not gv.bundle_adjustment:
            return survivors

        K = _pad_pow2(max(len(s[4]) for s in survivors), floor=32)
        n1 = np.zeros((P, K, 2), np.float32)
        n2 = np.zeros((P, K, 2), np.float32)
        mask = np.zeros((P, K), bool)
        aa0 = np.zeros((P, 3), np.float32)
        pos0 = np.zeros((P, 3), np.float32)
        for i, (cand, p1, p2, info, idx1, idx2) in enumerate(survivors):
            row = cand["row"]
            k = len(idx1)
            n1[i, :k] = (padded["kp1"][row][idx1] - Ks1[i][:2, 2]) / f1s[i]
            n2[i, :k] = (padded["kp2"][row][idx2] - Ks2[i][:2, 2]) / f2s[i]
            mask[i, :k] = True
            aa0[i] = info.rotation_2
            pos0[i] = info.position_2
        geo_f = np.sqrt(f1s * f2s)[:, None].astype(np.float32)
        aa, pos, keep = refine_relative_pose_batch_jit(
            jnp.asarray(aa0),
            jnp.asarray(pos0),
            jnp.asarray(n1),
            jnp.asarray(n2),
            jnp.asarray(mask),
            jnp.asarray(gv.triangulation_max_reprojection_error / geo_f),
            gv.min_triangulation_angle_degrees,
            jnp.asarray(gv.final_max_reprojection_error / geo_f),
        )
        aa = np.asarray(aa, np.float64)
        pos = np.asarray(pos, np.float64)
        keep = np.asarray(keep)
        out = []
        for i, (cand, p1, p2, info, idx1, idx2) in enumerate(survivors):
            sel = np.flatnonzero(keep[i][: len(idx1)])
            nrm = np.linalg.norm(pos[i])
            info.rotation_2 = aa[i]
            info.position_2 = pos[i] / (nrm if nrm > 0 else 1.0)
            info.num_verified_matches = len(sel)
            out.append((cand, p1, p2, info, idx1[sel], idx2[sel]))
        return out


class BruteForceFeatureMatcher(FeatureMatcher):
    """Parity: `theia::BruteForceFeatureMatcher`
    (`brute_force_feature_matcher.h`) — the batched kernel IS brute force;
    the subclass exists for API parity."""
