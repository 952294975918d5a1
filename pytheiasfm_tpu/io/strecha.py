"""Strecha MVS dataset reader (`*.camera` ground-truth files).

Re-design of `/root/reference/src/theia/io/read_strecha_dataset.{h,cc}`:
each `<image>.camera` file holds K (3 rows), a zero line, R stored
column-major, the camera position, and the image size. All cameras share
one PINHOLE intrinsics group and are flagged estimated.
"""

from __future__ import annotations

import glob
import os

import jax.numpy as jnp
import numpy as np

from ..ops import rotation as rotops
from ..sfm.reconstruction import CameraIntrinsicsPrior, Reconstruction

__all__ = ["read_strecha_dataset"]


def read_strecha_dataset(dataset_directory: str) -> Reconstruction:
    """Parity: `theia::ReadStrechaDataset` (`read_strecha_dataset.cc`)."""
    camera_files = sorted(glob.glob(os.path.join(dataset_directory, "*.camera")))
    if not camera_files:
        raise FileNotFoundError(f"no .camera files in {dataset_directory}")
    recon = Reconstruction()
    for idx, path in enumerate(camera_files):
        image_name = os.path.basename(path).replace(".camera", "")
        vals = np.array(open(path).read().split(), float)
        K = vals[0:9].reshape(3, 3)
        # vals[9:12] is the zero line.
        R = vals[12:21].reshape(3, 3).T  # stored column-major
        position = vals[21:24]
        width, height = int(vals[24]), int(vals[25])

        prior = CameraIntrinsicsPrior(
            image_width=width,
            image_height=height,
            focal_length=float(K[0, 0]),
            principal_point=(float(K[0, 2]), float(K[1, 2])),
            aspect_ratio=float(K[1, 1] / K[0, 0]),
            skew=float(K[0, 1]),
        )
        v = recon.add_view(image_name, group_id=0, timestamp=float(idx), prior=prior)
        recon.view_extrinsics[v, :3] = position
        recon.view_extrinsics[v, 3:] = np.asarray(
            rotops.rotation_matrix_to_angle_axis(jnp.asarray(R))
        )
        recon.view_estimated[v] = True
        if v == 0:
            recon.intrinsics[0] = prior.to_intrinsics(recon.dtype)
    return recon
