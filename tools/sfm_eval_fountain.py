"""Fountain-11 end-to-end SfM + ATE evaluation against the reference GT.

The north-star validation (BASELINE.md): run our full SfM pipeline on the
reference's own fountain-11 feature tracks (`data/sfm/fountain11.bin`) from
scratch (poses and points discarded, only observations + intrinsics priors
kept), then Sim3-align the estimated camera centers to the Strecha ground
truth (`data/sfm/gt_fountain11.bin`) and report the position error in mm —
the metric of `docs/content/performance.md:20` (reference: median 2.0 mm,
mean 2.4 mm, 11/11 cameras) and of the reference's own eval tooling
(`examples/vismatch_sfm/sfm_eval_dataset.py`).

Usage:
  python tools/sfm_eval_fountain.py [--estimator global|incremental|hybrid]
                                    [--max-tracks N] [--cpu]
Prints one JSON line with the ATE stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

FOUNTAIN = "/root/reference/data/sfm/fountain11.bin"
GT_FOUNTAIN = "/root/reference/data/sfm/gt_fountain11.bin"


def strip_geometry(recon, max_tracks=None, seed=0):
    """Forget everything the reference solved: poses, points, estimated
    flags. Keep views, intrinsics priors, and the observation table
    (= the matched feature tracks). Optionally subsample tracks."""
    recon.view_extrinsics[:] = 0.0
    recon.view_estimated[:] = False
    recon.points[:] = 0.0
    recon.track_estimated[:] = False
    recon.set_camera_intrinsics_from_priors()
    if max_tracks is not None and recon.num_tracks() > max_tracks:
        rng = np.random.default_rng(seed)
        # Prefer long tracks (stronger constraints per residual).
        lengths = np.asarray(
            [len(recon.track_observations(t)) for t in range(recon.num_tracks())]
        )
        order = np.argsort(-lengths, kind="stable")
        keep = np.zeros(recon.num_tracks(), bool)
        keep[order[:max_tracks]] = True
        return _subsample_tracks(recon, keep)
    return recon


def _subsample_tracks(recon, keep):
    from pytheiasfm_tpu.sfm.reconstruction import Reconstruction

    out = Reconstruction(recon.dtype)
    for v in range(recon.num_views()):
        out.add_view(
            recon.view_names[v],
            group_id=int(recon.view_group[v]),
            timestamp=recon.view_timestamps[v],
            prior=recon.view_priors[v],
        )
    out.view_group = recon.view_group.copy()
    out.intrinsics = recon.intrinsics.copy()
    out.group_model = list(recon.group_model)
    tid_map = {}
    for t in range(recon.num_tracks()):
        if not keep[t]:
            continue
        nt = out.add_track()
        tid_map[t] = nt
        for row in recon.track_observations(t):
            out.add_observation(
                int(recon.obs_view[row]),
                nt,
                recon.obs_uv[row],
                recon.obs_sqrt_inv_cov[row],
            )
    return out


def build_view_graph(recon, seed=0, min_inliers=30):
    """Two-view geometric verification over all co-observing pairs
    (parity: the matcher→EstimateTwoViewInfo loop of
    `pytests/sfm_pipeline.py:136` driven from the track table)."""
    import jax

    from pytheiasfm_tpu.sfm.two_view import (
        EstimateTwoViewInfoOptions,
        estimate_two_view_info_batch,
    )
    from pytheiasfm_tpu.sfm.view_graph import ViewGraph

    V = recon.num_views()
    # Collect correspondences per pair from commonly observed tracks.
    pair_corr = {}
    for t in range(recon.num_tracks()):
        rows = recon.track_observations(t)
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                va, vb = int(recon.obs_view[rows[i]]), int(recon.obs_view[rows[j]])
                ra, rb = rows[i], rows[j]
                if va > vb:
                    va, vb, ra, rb = vb, va, rb, ra
                pair_corr.setdefault((va, vb), []).append((ra, rb))

    pairs = [k for k, v in pair_corr.items() if len(v) >= min_inliers]
    N = max(len(pair_corr[k]) for k in pairs)
    Np = 1 << (N - 1).bit_length()
    P = len(pairs)
    pts1 = np.zeros((P, Np, 2))
    pts2 = np.zeros((P, Np, 2))
    masks = np.zeros((P, Np), bool)
    priors1, priors2 = [], []
    for i, (va, vb) in enumerate(pairs):
        corr = pair_corr[(va, vb)]
        n = len(corr)
        ra = [c[0] for c in corr]
        rb = [c[1] for c in corr]
        pts1[i, :n] = recon.obs_uv[ra]
        pts2[i, :n] = recon.obs_uv[rb]
        masks[i, :n] = True
        priors1.append(recon.view_priors[va])
        priors2.append(recon.view_priors[vb])

    # Dense tracks make these pairs ~99% inliers: a few hundred RANSAC
    # hypotheses suffice, and chunking the pair axis bounds the scored
    # [pairs, models, N] residual tensor to ~1 GB on-chip.
    opts = EstimateTwoViewInfoOptions(max_ransac_iterations=256)
    key = jax.random.PRNGKey(seed)
    chunk = max(1, int(2.5e8 // (2560 * Np)))
    results = []
    for lo in range(0, P, chunk):
        hi = min(lo + chunk, P)
        key, sub = jax.random.split(key)
        results.extend(
            estimate_two_view_info_batch(
                sub, opts, priors1[lo:hi], priors2[lo:hi],
                pts1[lo:hi], pts2[lo:hi], masks[lo:hi],
            )
        )
    graph = ViewGraph()
    n_edges = 0
    for (va, vb), (info, inliers) in zip(pairs, results):
        if info is None or len(inliers) < min_inliers:
            continue
        info.num_verified_matches = len(inliers)
        graph.add_edge(va, vb, info)
        n_edges += 1
    return graph


def sim3_ate_mm(recon, gt_recon):
    """Sim3-align estimated camera centers to GT by name; return per-camera
    position errors in mm (parity: sfm_eval_dataset.py)."""
    from pytheiasfm_tpu.transforms.alignment import align_point_clouds_umeyama

    est, gt = [], []
    for v in range(recon.num_views()):
        if not recon.view_estimated[v]:
            continue
        g = gt_recon.view_id_from_name(recon.view_names[v])
        if g < 0:
            continue
        est.append(recon.view_extrinsics[v, :3])
        gt.append(gt_recon.view_extrinsics[g, :3])
    est = np.asarray(est)
    gt = np.asarray(gt)
    R, t, s = align_point_clouds_umeyama(est, gt)
    aligned = s * est @ np.asarray(R).T + np.asarray(t)
    err_m = np.linalg.norm(aligned - gt, axis=-1)
    return err_m * 1000.0, len(est)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--estimator", default="global",
                    choices=["global", "incremental", "hybrid"])
    ap.add_argument("--max-tracks", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from pytheiasfm_tpu.io.theia_recon import read_theia_reconstruction
    from pytheiasfm_tpu.sfm.estimator_options import (
        ReconstructionEstimatorOptions,
        ReconstructionEstimatorType,
    )
    from pytheiasfm_tpu.sfm.reconstruction_estimator import create_reconstruction_estimator

    t_all = time.perf_counter()
    recon = read_theia_reconstruction(FOUNTAIN)
    gt = read_theia_reconstruction(GT_FOUNTAIN)
    recon = strip_geometry(recon, max_tracks=args.max_tracks, seed=args.seed)

    t0 = time.perf_counter()
    graph = build_view_graph(recon, seed=args.seed)
    t_verify = time.perf_counter() - t0

    options = ReconstructionEstimatorOptions(
        reconstruction_estimator_type={
            "global": ReconstructionEstimatorType.GLOBAL,
            "incremental": ReconstructionEstimatorType.INCREMENTAL,
            "hybrid": ReconstructionEstimatorType.HYBRID,
        }[args.estimator],
        rng_seed=args.seed,
    )
    estimator = create_reconstruction_estimator(options)
    t0 = time.perf_counter()
    summary = estimator.estimate(graph, recon)
    t_sfm = time.perf_counter() - t0

    err_mm, n_est = sim3_ate_mm(recon, gt)
    result = {
        "metric": f"fountain11_ate_{args.estimator}",
        "value": round(float(np.median(err_mm)), 3),
        "unit": "mm median camera-center error (Sim3-aligned, Strecha GT)",
        "vs_baseline": round(2.0 / max(float(np.median(err_mm)), 1e-9), 3),
        "mean_mm": round(float(np.mean(err_mm)), 3),
        "max_mm": round(float(np.max(err_mm)), 3),
        "cameras": f"{n_est}/11",
        "edges": graph.num_edges(),
        "tracks_used": recon.num_tracks(),
        "t_verify_s": round(t_verify, 2),
        "t_sfm_s": round(t_sfm, 2),
        "t_total_s": round(time.perf_counter() - t_all, 2),
        "success": bool(summary.success),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
