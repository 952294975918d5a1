"""Fountain-11 end-to-end SfM + ATE evaluation against the reference GT.

Thin CLI over `pytheiasfm_tpu.pipelines.fountain` (see its docstring).
Reference numbers: median 2.0 mm / mean 2.4 mm / 11 cams / 1.76 s total
(`docs/content/performance.md:20`).

Usage:
  python tools/sfm_eval_fountain.py [--estimator global|incremental|hybrid]
                                    [--max-tracks N] [--cpu] [--repeat K]
Prints one JSON line with the ATE stats. `--repeat 2` runs the pipeline
twice and reports the second (post-compile) timings as the headline — the
first run pays one-time jit compiles (persisted to .jax_cache across
processes).
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
    ap.add_argument("--estimator", default="global",
                    choices=["global", "incremental", "hybrid"])
    ap.add_argument("--max-tracks", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from pytheiasfm_tpu.pipelines import fountain
    from pytheiasfm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    runs = [
        fountain.evaluate(
            estimator_type=args.estimator,
            max_tracks=args.max_tracks,
            seed=args.seed,
        )
        for _ in range(max(args.repeat, 1))
    ]
    first, last = runs[0], runs[-1]
    result = {
        "metric": f"fountain11_ate_{args.estimator}",
        "value": round(last["median_mm"], 3),
        "unit": "mm median camera-center error (Sim3-aligned, Strecha GT)",
        "vs_baseline": round(2.0 / max(last["median_mm"], 1e-9), 3),
        "mean_mm": round(last["mean_mm"], 3),
        "max_mm": round(last["max_mm"], 3),
        "cameras": f"{last['cameras']}/11",
        "edges": last["edges"],
        "tracks_used": last["tracks_used"],
        "t_verify_s": round(last["t_verify_s"], 2),
        "t_sfm_s": round(last["t_sfm_s"], 2),
        "t_sfm_pose_s": round(last["t_sfm_pose_s"], 2),
        "t_sfm_triangulation_s": round(last["t_sfm_triangulation_s"], 2),
        "t_sfm_ba_s": round(last["t_sfm_ba_s"], 2),
        "t_total_s": round(last["t_total_s"], 2),
        "t_total_first_run_s": round(first["t_total_s"], 2),
        "success": bool(last["success"]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
