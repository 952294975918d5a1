"""Camera models: the eight intrinsics models and the extrinsics block."""

from . import camera, intrinsics  # noqa: F401
from .intrinsics import CameraIntrinsicsModelType  # noqa: F401
