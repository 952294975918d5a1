"""Scale ladder for the synthetic global pipeline (1DSfM-style problems).

Runs the full GlobalReconstructionEstimator at Notre-Dame scale (553
views) and Piccadilly scale (2152 views) — or any --views/--tracks —
twice each (run 2 = post-compile), printing one JSON line per scale with
per-phase timings vs the reference's tables (BASELINE.md):

  Notre Dame  553 views: R 4.91 / t 43.37 / BA 196.22 / total 330.71 s
  Piccadilly 2152 views: R 49.56 / t 129.21 / BA 72.26 / total 330.33 s

Usage: python tools/bench_scale.py [--views V --tracks T] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BASELINES = {
    553: {"rotation": 4.91, "position": 43.37, "ba": 196.22, "total": 330.71},
    2152: {"rotation": 49.56, "position": 129.21, "ba": 72.26, "total": 330.33},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=None)
    ap.add_argument("--tracks", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--default-config",
        action="store_true",
        help="run the reference-default free-intrinsics/manifold config "
        "instead of the calibrated one (the synthetic scenes carry exact "
        "priors and zero distortion, so calibrated is the apples-to-apples "
        "configuration — see README)",
    )
    args = ap.parse_args()

    from pytheiasfm_tpu.pipelines import synthetic_global as sg
    from pytheiasfm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    if args.views:
        scales = [(args.views, args.tracks or args.views * 50)]
    else:
        scales = [(553, 50_000), (2152, 100_000)]

    for V, T in scales:
        out = None
        for _ in range(max(args.repeats, 1)):
            out = sg.run(
                V=V, T=T, seed=0, calibrated=not args.default_config
            )
        base = BASELINES.get(V)
        row = {
            "metric": f"global_pipeline_{V}v",
            "value": round(out["t_total_s"], 2),
            "unit": f"s total ({V} views / {T} tracks, post-compile)",
            "views": f"{out['views']}/{out['views_total']}",
            "median_pos_err_m": round(out["median_pos_err"], 4),
            "t_rotation_s": round(out["t_rotation_s"], 2),
            "t_position_s": round(out["t_position_s"], 2),
            "t_triangulation_s": round(out["t_triangulation_s"], 2),
            "t_ba_s": round(out["t_ba_s"], 2),
        }
        if base:
            row["vs_baseline"] = round(base["total"] / out["t_total_s"], 2)
            row["rotation_vs_baseline"] = round(
                base["rotation"] / max(out["t_rotation_s"], 1e-9), 2
            )
            row["position_vs_baseline"] = round(
                base["position"] / max(out["t_position_s"], 1e-9), 2
            )
            row["ba_vs_baseline"] = round(
                base["ba"] / max(out["t_ba_s"], 1e-9), 2
            )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
