"""Bundler (`bundle.out` + `list.txt`) import/export.

Re-design of `/root/reference/src/theia/io/write_bundler_files.{h,cc}` and
`read_bundler_files.{h,cc}` / `bundler_file_reader.h:76-92`. Bundler's
camera frame differs from ours by diag(1, -1, -1) (the reference's
`theia_to_bundler`); pixels are re-centered on the principal point with a
flipped y.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import rotation as rotops
from ..ops import rotation_np
from ..sfm.reconstruction import CameraIntrinsicsPrior, Reconstruction

__all__ = ["write_bundler_files", "read_bundler_files"]

_FLIP = np.diag([1.0, -1.0, -1.0])


def write_bundler_files(recon, bundle_file: str, lists_file: str) -> bool:
    """Parity: `theia::WriteBundlerFiles` (`write_bundler_files.cc`)."""
    with open(lists_file, "w") as lf, open(bundle_file, "w") as bf:
        bf.write("# Bundle file v0.3\n")
        bf.write(f"{recon.num_views()} {recon.num_tracks()}\n")
        for v in range(recon.num_views()):
            prior = recon.view_priors[v]
            lf.write(recon.view_names[v])
            if prior.focal_length is not None:
                lf.write(f" 0 {prior.focal_length}")
            lf.write("\n")

            g = recon.view_group[v]
            params = recon.intrinsics[g]
            focal = params[0]
            k1 = params[5] if len(params) > 5 else 0.0
            k2 = params[6] if len(params) > 6 else 0.0
            bf.write(f"{focal} {k1} {k2}\n")
            aa = recon.view_extrinsics[v, 3:]
            c = recon.view_extrinsics[v, :3]
            R = rotation_np.angle_axis_to_rotation_matrix_np(aa)
            Rb = _FLIP @ R
            tb = _FLIP @ (-R @ c)
            for row in Rb:
                bf.write(f"{row[0]} {row[1]} {row[2]}\n")
            bf.write(f"{tb[0]} {tb[1]} {tb[2]}\n")

        for t in range(recon.num_tracks()):
            w = recon.points[t, 3]
            p = recon.points[t, :3] / (w if abs(w) > 1e-12 else 1.0)
            c = recon.track_colors[t]
            bf.write(f"{p[0]} {p[1]} {p[2]}\n")
            bf.write(f"{int(c[0])} {int(c[1])} {int(c[2])}\n")
            rows = recon.track_observations(t)
            parts = [str(len(rows))]
            for row in rows:
                v = int(recon.obs_view[row])
                g = recon.view_group[v]
                px, py = recon.intrinsics[g][3], recon.intrinsics[g][4]
                uv = recon.obs_uv[row]
                # Bundler: origin at image center, y up.
                parts.append(f"{v} 0 {uv[0] - px} {-(uv[1] - py)}")
            bf.write(" ".join(parts) + "\n")
    return True


def read_bundler_files(lists_file: str, bundle_file: str) -> Reconstruction:
    """Parity: `theia::ReadBundlerFiles` (`read_bundler_files.cc`)."""
    recon = Reconstruction()
    names = []
    focals = []
    with open(lists_file) as lf:
        for line in lf:
            parts = line.split()
            if not parts:
                continue
            names.append(parts[0])
            focals.append(float(parts[2]) if len(parts) >= 3 else None)

    with open(bundle_file) as bf:
        tokens = bf.read().split("\n")
        # Drop comments.
        lines = [ln for ln in tokens if not ln.startswith("#")]
        flat = " ".join(lines).split()
        it = iter(flat)

        def nxt():
            return next(it)

        num_cams = int(nxt())
        num_points = int(nxt())
        assert num_cams == len(names), "lists/bundle camera count mismatch"
        for v in range(num_cams):
            focal = float(nxt())
            k1, k2 = float(nxt()), float(nxt())
            prior = CameraIntrinsicsPrior(focal_length=focal or focals[v])
            recon.add_view(names[v], prior=prior)
            Rb = np.array([[float(nxt()) for _ in range(3)] for _ in range(3)])
            tb = np.array([float(nxt()) for _ in range(3)])
            R = _FLIP @ Rb
            t = _FLIP @ tb
            c = -R.T @ t
            aa = np.asarray(
                rotops.rotation_matrix_to_angle_axis(jnp.asarray(R))
            )
            recon.view_extrinsics[v, :3] = c
            recon.view_extrinsics[v, 3:] = aa
            recon.view_estimated[v] = focal > 0
            g = recon.view_group[v]
            recon.intrinsics[g][0] = focal or (focals[v] or 1.0)
            recon.intrinsics[g][5:7] = [k1, k2]

        for _ in range(num_points):
            p = np.array([float(nxt()) for _ in range(3)])
            color = np.array([int(float(nxt())) for _ in range(3)], np.uint8)
            t_id = recon.add_track(np.concatenate([p, [1.0]]))
            recon.track_colors[t_id] = color
            n_obs = int(nxt())
            for _ in range(n_obs):
                v = int(nxt())
                _key = nxt()
                x, y = float(nxt()), float(nxt())
                recon.add_observation(v, t_id, np.asarray([x, -y]))
    return recon
