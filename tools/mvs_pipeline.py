"""Reconstruction -> MVS view selection -> export.

The analogue of the reference's `pyexamples/mvs_pipeline_fountain.py`
(reconstruction -> `ViewSelectionMVSNet` -> MVSNet-style depth inputs;
depth inference itself stays out of scope there too — the reference hands
off to torch). Reads a reconstruction (Theia `.recon` cereal binary or the
native npz checkpoint), runs covisibility+angle-scored neighbor selection,
and writes the MVSNet-style `pair.txt` plus per-view camera files.

Usage:
  python tools/mvs_pipeline.py RECON [--neighbors 10] [--out DIR] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recon")
    ap.add_argument("--neighbors", type=int, default=10)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from pytheiasfm_tpu.mvs.view_selection import view_selection_mvsnet
    from pytheiasfm_tpu.ops.rotation_np import angle_axis_to_rotation_matrix_np
    from pytheiasfm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    if args.recon.endswith(".npz"):
        from pytheiasfm_tpu.io.recon import read_reconstruction

        recon = read_reconstruction(args.recon)
    else:
        from pytheiasfm_tpu.io.theia_recon import read_theia_reconstruction

        recon = read_theia_reconstruction(args.recon)

    selection = view_selection_mvsnet(recon, args.neighbors)

    if args.out:
        os.makedirs(args.out, exist_ok=True)
        # MVSNet pair.txt: per view, the scored neighbor list.
        est = [v for v in selection]
        with open(os.path.join(args.out, "pair.txt"), "w") as f:
            f.write(f"{len(est)}\n")
            for v in est:
                f.write(f"{v}\n{len(selection[v])}")
                for score, nb in selection[v]:
                    f.write(f" {nb} {score:.4f}")
                f.write("\n")
        # Per-view camera: world->cam extrinsic + K (per-model parameter
        # slots from models/intrinsics: focal@0, aspect@1, pp@_PP_INDEX).
        from pytheiasfm_tpu.models.intrinsics import _PP_INDEX

        for v in est:
            R = angle_axis_to_rotation_matrix_np(recon.view_extrinsics[v, 3:])
            t = -R @ recon.view_extrinsics[v, :3]
            g = recon.view_group[v]
            p = recon.intrinsics[g]
            pp = _PP_INDEX[recon.group_model[g]]
            fx, fy = p[0], p[0] * p[1]
            cx, cy = p[pp], p[pp + 1]
            with open(
                os.path.join(args.out, f"cam_{v:08d}.txt"), "w"
            ) as f:
                f.write("extrinsic\n")
                for i in range(3):
                    f.write(f"{R[i,0]} {R[i,1]} {R[i,2]} {t[i]}\n")
                f.write("0 0 0 1\nintrinsic\n")
                f.write(f"{fx} 0 {cx}\n0 {fy} {cy}\n0 0 1\n")

    n_with = sum(1 for v in selection if selection[v])
    print(
        json.dumps(
            {
                "metric": "mvs_view_selection",
                "value": n_with,
                "unit": "views with MVS neighbors",
                "views": len(selection),
                "avg_neighbors": round(
                    float(np.mean([len(s) for s in selection.values()] or [0])),
                    2,
                ),
                "out": args.out,
            }
        )
    )


if __name__ == "__main__":
    main()
