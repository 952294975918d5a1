"""VisualSfM NVM_V3 import/export.

Re-design of `/root/reference/src/theia/io/write_nvm_file.{h,cc}` and
`import_nvm_file.{h,cc}`: per camera `name f qw qx qy qz cx cy cz k1 0`;
per point `xyz rgb n (img feat x y)*` with features centered on the
principal point.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import rotation as rotops
from ..ops import rotation_np
from ..sfm.reconstruction import CameraIntrinsicsPrior, Reconstruction

__all__ = ["export_nvm_file", "import_nvm_file"]


def export_nvm_file(recon, path: str) -> bool:
    """Parity: `theia::WriteNVMFile` (`write_nvm_file.cc`)."""
    with open(path, "w") as f:
        f.write("NVM_V3 \n\n")
        f.write(f"{recon.num_views()}\n")
        feature_index: list[dict[int, int]] = []
        for v in range(recon.num_views()):
            g = recon.view_group[v]
            params = recon.intrinsics[g]
            aa = recon.view_extrinsics[v, 3:]
            c = recon.view_extrinsics[v, :3]
            R = rotation_np.angle_axis_to_rotation_matrix_np(aa)
            q = np.asarray(rotops.rotation_matrix_to_quaternion(jnp.asarray(R)))
            k1 = params[5] if len(params) > 5 else 0.0
            f.write(
                f"{recon.view_names[v]} {params[0]} {q[0]} {q[1]} {q[2]} {q[3]} "
                f"{c[0]} {c[1]} {c[2]} {k1} 0\n"
            )
            feature_index.append(
                {t: i for i, t in enumerate(recon._view_track_to_obs[v])}
            )
        f.write(f"{recon.num_tracks()}\n")
        for t in range(recon.num_tracks()):
            w = recon.points[t, 3]
            p = recon.points[t, :3] / (w if abs(w) > 1e-12 else 1.0)
            color = recon.track_colors[t]
            rows = recon.track_observations(t)
            parts = [
                f"{p[0]} {p[1]} {p[2]}",
                f"{int(color[0])} {int(color[1])} {int(color[2])}",
                str(len(rows)),
            ]
            for row in rows:
                v = int(recon.obs_view[row])
                g = recon.view_group[v]
                px, py = recon.intrinsics[g][3], recon.intrinsics[g][4]
                uv = recon.obs_uv[row]
                parts.append(
                    f"{v} {feature_index[v][t]} {uv[0] - px} {uv[1] - py}"
                )
            f.write(" ".join(parts) + "\n")
    return True


def import_nvm_file(path: str) -> Reconstruction:
    """Parity: `theia::ImportNVMFile` (`import_nvm_file.cc`)."""
    recon = Reconstruction()
    with open(path) as f:
        flat = f.read().split()
    it = iter(flat)

    def nxt():
        return next(it)

    header = nxt()
    assert header.startswith("NVM_V3"), f"not an NVM_V3 file: {header}"
    num_cams = int(nxt())
    for v in range(num_cams):
        name = nxt()
        focal = float(nxt())
        q = np.array([float(nxt()) for _ in range(4)])
        c = np.array([float(nxt()) for _ in range(3)])
        k1 = float(nxt())
        _zero = nxt()
        prior = CameraIntrinsicsPrior(focal_length=focal)
        recon.add_view(name, prior=prior)
        R = np.asarray(
            rotops.quaternion_to_rotation_matrix(jnp.asarray(q))
        )
        aa = rotation_np.rotation_matrix_to_angle_axis_np(R)
        recon.view_extrinsics[v, :3] = c
        recon.view_extrinsics[v, 3:] = aa
        recon.view_estimated[v] = True
        g = recon.view_group[v]
        recon.intrinsics[g][0] = focal
        if recon.intrinsics.shape[1] > 5:
            recon.intrinsics[g][5] = k1

    num_points = int(nxt())
    for _ in range(num_points):
        p = np.array([float(nxt()) for _ in range(3)])
        color = np.array([int(float(nxt())) for _ in range(3)], np.uint8)
        t_id = recon.add_track(np.concatenate([p, [1.0]]))
        recon.track_colors[t_id] = color
        n_obs = int(nxt())
        for _ in range(n_obs):
            v = int(nxt())
            _feat = nxt()
            x, y = float(nxt()), float(nxt())
            g = recon.view_group[v]
            px, py = recon.intrinsics[g][3], recon.intrinsics[g][4]
            recon.add_observation(v, t_id, np.asarray([x + px, y + py]))
    return recon
