"""Similarity / alignment transforms (parity: `src/theia/sfm/transformation/`)."""

from .alignment import (  # noqa: F401
    align_point_clouds_umeyama,
    align_reconstructions,
    align_reconstructions_robust,
    sim3_transform_points,
    transform_reconstruction,
)
