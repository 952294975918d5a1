"""COLMAP text-model export.

Re-design of `/root/reference/src/theia/io/write_colmap_files.{h,cc}`:
cameras.txt (one RADIAL camera per intrinsics group), images.txt
(`qw qx qy qz tx ty tz` with t = -R c, plus the 2D point list), points3D.txt.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..ops import rotation as rotops
from ..ops import rotation_np

__all__ = ["write_colmap_files"]


def write_colmap_files(recon, output_dir: str) -> bool:
    """Parity: `theia::WriteColmapFiles` (`write_colmap_files.h`)."""
    os.makedirs(output_dir, exist_ok=True)

    with open(os.path.join(output_dir, "cameras.txt"), "w") as f:
        for g in range(len(recon.group_model)):
            # First view of the group supplies image dimensions.
            views = np.flatnonzero(recon.view_group == g)
            if len(views) == 0:
                continue
            prior = recon.view_priors[views[0]]
            params = recon.intrinsics[g]
            focal = params[0]
            # Pinhole layout: [f, ar, skew, px, py, k1, k2] (intrinsics.py).
            px, py = params[3], params[4]
            k1 = params[5] if len(params) > 5 else 0.0
            f.write(
                f"{g} RADIAL {prior.image_width} {prior.image_height} "
                f"{focal} {px} {py} {k1} {k1}\n"
            )

    with open(os.path.join(output_dir, "images.txt"), "w") as f:
        for v in range(recon.num_views()):
            if not recon.view_estimated[v]:
                continue
            aa = recon.view_extrinsics[v, 3:]
            c = recon.view_extrinsics[v, :3]
            R = rotation_np.angle_axis_to_rotation_matrix_np(aa)
            q = np.asarray(rotops.rotation_matrix_to_quaternion(jnp.asarray(R)))
            t = -R @ c
            f.write(
                f"{v} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} "
                f"{int(recon.view_group[v])} {recon.view_names[v]}\n"
            )
            parts = []
            for track, row in recon._view_track_to_obs[v].items():
                uv = recon.obs_uv[row]
                parts.append(f"{uv[0]} {uv[1]} {track}")
            f.write(" ".join(parts) + "\n")

    with open(os.path.join(output_dir, "points3D.txt"), "w") as f:
        for t in range(recon.num_tracks()):
            if not recon.track_estimated[t]:
                continue
            w = recon.points[t, 3]
            p = recon.points[t, :3] / (w if abs(w) > 1e-12 else 1.0)
            c = recon.track_colors[t]
            f.write(
                f"{t} {p[0]} {p[1]} {p[2]} {int(c[0])} {int(c[1])} {int(c[2])} 0.0 "
            )
            parts = []
            for row in recon.track_observations(t):
                v = int(recon.obs_view[row])
                idx = list(recon._view_track_to_obs[v]).index(t)
                parts.append(f"{v} {idx}")
            f.write(" ".join(parts) + "\n")
    return True
