"""Bundle adjustment: LM with implicit Schur complement + PCG."""

from . import lm, losses  # noqa: F401
from .lm import BundleAdjustmentOptions, BundleAdjustmentSummary, bundle_adjust  # noqa: F401
from .losses import LossFunctionType  # noqa: F401
