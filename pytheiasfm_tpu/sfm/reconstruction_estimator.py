"""Reconstruction-estimator factory.

Parity: `theia::ReconstructionEstimator::Create`
(`/root/reference/src/theia/sfm/reconstruction_estimator.h:75`,
`reconstruction_estimator.cc`).
"""

from __future__ import annotations

from .estimator_options import (
    ReconstructionEstimatorOptions,
    ReconstructionEstimatorType,
)
from .global_estimator import GlobalReconstructionEstimator
from .hybrid_estimator import HybridReconstructionEstimator
from .incremental_estimator import IncrementalReconstructionEstimator

__all__ = ["create_reconstruction_estimator"]


def create_reconstruction_estimator(
    options: ReconstructionEstimatorOptions | None = None,
):
    options = options or ReconstructionEstimatorOptions()
    t = options.reconstruction_estimator_type
    if t == ReconstructionEstimatorType.GLOBAL:
        return GlobalReconstructionEstimator(options)
    if t == ReconstructionEstimatorType.INCREMENTAL:
        return IncrementalReconstructionEstimator(options)
    if t == ReconstructionEstimatorType.HYBRID:
        return HybridReconstructionEstimator(options)
    raise ValueError(f"unknown reconstruction estimator type: {t}")
