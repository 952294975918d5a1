"""SfM core: scene data model, view graph, track building, two-view
pipeline, reconstruction estimators."""

from . import reconstruction, track_builder, view_graph  # noqa: F401
from .reconstruction import CameraIntrinsicsPrior, Reconstruction  # noqa: F401
from .track_builder import TrackBuilder  # noqa: F401
from .view_graph import TwoViewInfo, ViewGraph  # noqa: F401
