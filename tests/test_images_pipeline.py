"""Images -> reconstruction end-to-end on the reference's real test images.

Exercises the full layer-15 pipeline (`pytests/sfm_pipeline.py:175-287`
analogue) with the package's own feature extractor and matcher on real
pixels for the first time: img1-4 from `/root/reference/data/image/`
(sequential views of one scene) must reconstruct into a connected model.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

IMAGES = [f"/root/reference/data/image/img{i}.png" for i in (1, 2, 3, 4)]


@pytest.mark.skipif(
    not all(os.path.exists(p) for p in IMAGES),
    reason="reference image fixtures unavailable",
)
def test_images_to_reconstruction_global():
    from pytheiasfm_tpu.pipelines.images import run_images_pipeline

    models, stats = run_images_pipeline(
        IMAGES,
        max_dim=1024,
        max_features=2048,
        estimator_type="global",
        lowes_ratio=0.85,
        min_num_inlier_matches=15,
        # Exercise the GraphMatch global-descriptor preselection path
        # (feature_extractor_and_matcher.h:55-138 orchestration).
        pair_preselection_neighbors=3,
    )
    assert stats["preselected_pairs"] >= 3, stats
    assert stats["verified_pairs"] >= 2, stats
    assert models, stats
    views = int(np.sum(models[0].view_estimated))
    tracks = int(np.sum(models[0].track_estimated))
    assert views >= 3, stats
    assert tracks >= 100, stats
    # Estimated camera centers must be finite and distinct (a degenerate
    # solution would collapse them).
    centers = models[0].view_extrinsics[models[0].view_estimated][:, :3]
    assert np.all(np.isfinite(centers))
    d = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)
    assert d[np.triu_indices(views, 1)].min() > 1e-6
