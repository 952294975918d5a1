"""Headline benchmarks: BA wall-clock at 1DSfM Notre-Dame scale + matched
descriptor pairs per second per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baselines (BASELINE.md):
  - TheiaSfM/Ceres-CPU Notre Dame final BA = 196.22 s for 553 cameras
    (docs/content/performance.md:59). We synthesize a problem at that scale
    (553 cameras, 50k tracks, 300k observations), run a fixed 30-iteration LM
    schedule on the TPU, and report wall-clock; vs_baseline > 1 = faster.
  - The reference publishes no matcher throughput; matched_pairs_per_s is
    reported absolute (4096x4096 descriptors, 128-D, bf16 MXU matmul +
    Lowe's ratio + symmetric cross-check, batch of 8 image pairs).
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_problem(V=553, T=50_000, obs_per_track=6, seed=0, dtype=np.float32):
    import jax.numpy as jnp

    from pytheiasfm_tpu.models import intrinsics as intr
    from pytheiasfm_tpu.models.intrinsics import CameraIntrinsicsModelType as M
    from pytheiasfm_tpu.ops import rotation as rot

    rng = np.random.default_rng(seed)
    # Cameras on a ring of radius 10 looking inward; points in the bulk.
    angles = rng.uniform(0, 2 * np.pi, V)
    positions = np.stack(
        [10 * np.cos(angles), 10 * np.sin(angles), rng.normal(size=V)], -1
    )
    # Build all V look-at rotations on host, convert to angle-axis in ONE
    # vmapped device call (per-view dispatches are tunnel round-trips).
    z = -positions / np.linalg.norm(positions, axis=1, keepdims=True)
    x = np.cross(np.broadcast_to([0.0, 0.0, 1.0], z.shape), z)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=1)  # [V, 3, 3]
    import jax

    aa = np.asarray(jax.vmap(rot.rotation_matrix_to_angle_axis)(jnp.asarray(R)))
    ext = np.concatenate([positions, aa], axis=1)
    points = rng.uniform(-3, 3, size=(T, 3))
    params = np.asarray(
        intr.make_intrinsics(M.PINHOLE, focal_length=1000.0, principal_point=(1536, 1024))
    )

    # Observations: each track seen by `obs_per_track` random cameras.
    obs_track = np.repeat(np.arange(T, dtype=np.int32), obs_per_track)
    obs_view = rng.integers(0, V, size=T * obs_per_track).astype(np.int32)
    # Project (vectorized, on host in f64 for clean GT).
    from pytheiasfm_tpu.models import camera as cam

    ext_o = ext[obs_view]
    pts_o = points[obs_track]
    depth, pixel = cam.project_point(
        jnp.asarray(ext_o), jnp.asarray(params), jnp.asarray(pts_o), M.PINHOLE
    )
    depth = np.asarray(depth)
    pixel = np.asarray(pixel)
    mask = depth > 0.5
    noise = rng.normal(size=pixel.shape) * 0.5
    uv = pixel + noise

    O = len(obs_view)
    # Perturb initial state.
    ext_n = ext + rng.normal(size=ext.shape) * 0.005
    pts_n = points + rng.normal(size=points.shape) * 0.01
    cam_free = np.ones(V, bool)
    cam_free[:2] = False
    ext_n[:2] = ext[:2]

    return dict(
        extrinsics=jnp.asarray(ext_n, dtype),
        intrinsics=jnp.asarray(params, dtype)[None, :],
        points=jnp.asarray(pts_n, dtype),
        view_group=jnp.zeros((V,), jnp.int32),
        group_model_idx=jnp.zeros((1,), jnp.int32),
        obs_view=jnp.asarray(obs_view),
        obs_track=jnp.asarray(obs_track),
        obs_uv=jnp.asarray(uv, dtype),
        obs_sqrt_info=jnp.ones((O, 2), dtype),
        obs_mask=jnp.asarray(mask),
        camera_free=jnp.asarray(cam_free),
        point_free=jnp.ones(T, bool),
        intrinsics_free=jnp.zeros((1, params.shape[0]), bool),
        track_ref_view=jnp.zeros((T,), jnp.int32),
        track_bearing=jnp.zeros((T, 3), dtype),
        V=V,
        T=T,
        O=O,
    )


def bench_ba(obs_per_track=6):
    """Dense-Schur MXU BA at Notre-Dame scale (the DENSE_SCHUR path —
    V=553 is far below the ITERATIVE_SCHUR crossover, matching the
    reference's own solver choice at this size)."""
    import jax
    import jax.numpy as jnp

    from pytheiasfm_tpu.ba import BundleAdjustmentOptions, bundle_adjust_dense
    from pytheiasfm_tpu.ba.dense_schur import _bundle_adjust_dense_impl
    from pytheiasfm_tpu.models.intrinsics import CameraIntrinsicsModelType as M

    prob = build_problem(obs_per_track=obs_per_track)
    T, L = prob["T"], obs_per_track
    iters = 30
    options = BundleAdjustmentOptions(
        max_num_iterations=iters,
        function_tolerance=0.0,  # run the full fixed schedule
    )

    # The synthetic problem is exactly `obs_per_track` observations per
    # track: the [T, L] slot layout is a reshape.
    args = (
        prob["extrinsics"],
        prob["intrinsics"],
        prob["points"],
        prob["view_group"],
        prob["group_model_idx"],
        prob["obs_view"].reshape(T, L),
        prob["obs_uv"].reshape(T, L, 2),
        prob["obs_sqrt_info"].reshape(T, L, 2),
        prob["obs_mask"].reshape(T, L),
        prob["camera_free"],
        prob["point_free"],
    )
    kw = dict(
        present_models=(int(M.PINHOLE),),
        num_views=prob["V"],
        num_tracks=T,
        max_track_len=L,
        num_groups=1,
        options=options,
    )

    def run(opts):
        ext, q, pts, summary = bundle_adjust_dense(
            *args, **{**kw, "options": opts}
        )
        return ext, pts, summary

    def timed(opts):
        # Warm-up (compile), then time. Timing uses HOST FETCHES, not
        # block_until_ready: through the axon tunnel block_until_ready
        # does not reliably force queued work, a fetch does (the
        # transferred arrays are <1 MB, noise next to the solve).
        out = run(opts)
        np.asarray(out[0])
        np.asarray(out[1])
        t0 = time.perf_counter()
        out = run(opts)
        np.asarray(out[0])
        np.asarray(out[1])
        return time.perf_counter() - t0, out[2]

    elapsed, summary = timed(options)
    # bf16 Schur-product variant (use_mixed_precision_solves,
    # bundle_adjustment.h:111 parity).
    import dataclasses as _dc

    try:
        mixed_elapsed, mixed_summary = timed(
            _dc.replace(options, use_mixed_precision_solves=True)
        )
        mixed = {
            "elapsed": mixed_elapsed,
            "final_cost": float(mixed_summary.final_cost),
        }
    except Exception:
        mixed = None

    # Compiler cost model for the whole 30-iteration LM program — the basis
    # for the stated utilization numbers.
    cost = {}
    try:
        # Cost model of ONE launch chunk of the jitted kernel (the public
        # wrapper is a host loop); flops/bytes count the loop body once.
        import dataclasses as _dc

        chunk_kw = dict(kw)
        chunk_kw["options"] = _dc.replace(
            options,
            max_num_iterations=min(iters, options.max_iterations_per_launch),
        )
        lowered = _bundle_adjust_dense_impl.lower(*args, **chunk_kw)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca:
            cost = {
                "flops": float(ca.get("flops", 0.0)),
                "bytes": float(ca.get("bytes accessed", 0.0)),
            }
    except Exception:
        pass
    return elapsed, iters, summary, cost, mixed


def bench_ba_free_intrinsics(obs_per_track=6):
    """Reference-DEFAULT BA configuration at Notre-Dame scale: free
    focal length + radial distortion (`reconstruction_estimator_options.h:
    281-284`) from an off-truth focal start, on the rowchunk
    iterative-Schur kernel with exact intrinsics elimination. Closes the
    round-3 'flattered configuration' gap: the headline dense-kernel row
    freezes intrinsics; this row prices the configuration the reference
    actually benchmarks with."""
    import jax.numpy as jnp

    from pytheiasfm_tpu.ba import (
        BundleAdjustmentOptions,
        bundle_adjust_iterative,
    )
    from pytheiasfm_tpu.ba.entry import _rowchunk_layout
    from pytheiasfm_tpu.models.intrinsics import (
        CameraIntrinsicsModelType as M,
        OptimizeIntrinsicsType as OI,
        intrinsics_subset_mask,
    )

    prob = build_problem(obs_per_track=obs_per_track)
    T, L, V = prob["T"], obs_per_track, prob["V"]
    tv = np.asarray(prob["obs_view"]).reshape(T, L)
    mask = np.asarray(prob["obs_mask"]).reshape(T, L)
    rc = _rowchunk_layout(dict(track_views=tv, mask=mask), V)
    P = prob["intrinsics"].shape[1]
    flags = OI.FOCAL_LENGTH | OI.RADIAL_DISTORTION
    ifree = np.zeros((1, P), bool)
    ifree[0] = intrinsics_subset_mask(int(M.PINHOLE), flags)[:P]
    intr0 = np.asarray(prob["intrinsics"]).copy()
    intr0[0, 0] *= 1.03  # 3% focal error to optimize away
    iters = 30
    options = BundleAdjustmentOptions(
        max_num_iterations=iters,
        function_tolerance=0.0,
        intrinsics_to_optimize=flags,
    )
    args = (
        prob["extrinsics"], jnp.asarray(intr0), prob["points"],
        prob["view_group"], prob["group_model_idx"],
        jnp.asarray(tv),
        prob["obs_uv"].reshape(T, L, 2),
        prob["obs_sqrt_info"].reshape(T, L, 2),
        jnp.asarray(mask),
        jnp.asarray(rc["row_view"]), jnp.asarray(rc["rc_src"]),
        jnp.asarray(rc["rc_mask"]),
        prob["camera_free"], prob["point_free"], jnp.asarray(ifree),
    )
    kw = dict(
        present_models=(int(M.PINHOLE),),
        num_views=V, num_tracks=T, max_track_len=L,
        num_rows=rc["R"], row_chunk=rc["C"], num_groups=1,
        options=options,
    )

    def run():
        out = bundle_adjust_iterative(*args, **kw)
        np.asarray(out[0])
        np.asarray(out[2])
        return out

    out = run()  # compile
    t0 = time.perf_counter()
    out = run()
    elapsed = time.perf_counter() - t0
    return elapsed, iters, out[3], float(np.asarray(out[1])[0, 0])


def bench_pipeline_2152():
    """Piccadilly-scale (2152 views / 100k tracks) global pipeline, run
    twice (run 2 = post-compile), in the REFERENCE-DEFAULT configuration
    (free focal length + radial distortion, XYZW-manifold tracks —
    `reconstruction_estimator_options.h:281-290`). Baselines:
    Piccadilly R 49.56 / t 129.21 / BA 72.26 / total 330.33 s
    (performance.md:62)."""
    from pytheiasfm_tpu.pipelines import synthetic_global as sg

    first = sg.run(V=2152, T=100_000, seed=0, calibrated=False)
    second = sg.run(V=2152, T=100_000, seed=0, calibrated=False)
    second["config"] = "default_free_intrinsics"
    second["first_run_s"] = first["t_total_s"]
    return second


def bench_pipeline_5288():
    """Trafalgar-scale (5288 views / 250k tracks) global pipeline in the
    reference-default configuration, run twice (run 2 = post-compile).
    Baselines: Trafalgar R 156.33 / position 387.29 / BA 142.10 /
    total 880.74 s (performance.md:68)."""
    from pytheiasfm_tpu.pipelines import synthetic_global as sg

    first = sg.run(V=5288, T=250_000, seed=0, calibrated=False)
    second = sg.run(V=5288, T=250_000, seed=0, calibrated=False)
    second["config"] = "default_free_intrinsics"
    second["first_run_s"] = first["t_total_s"]
    return second


def bench_ba_5288_kernel(iters=30):
    """Trafalgar-scale BA at the KERNEL interface (5288 cams / 250k
    tracks / 1.5M obs, rowchunk iterative-Schur, free-intrinsics path
    disabled — pure camera/point solve), f32 and mixed-precision.
    Baseline: Trafalgar BA 142.10 s (performance.md:68). Measured
    round 5: f32 280 ms/LM-iter at the TC=32768 scan chunking; the bf16
    matvec variant is SLOWER here (368 ms) — at the optimal chunking the
    f32 schedule is already fusion-limited and the pack conversion only
    adds copies — so f32 is the production default and both are tracked."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from pytheiasfm_tpu.ba import entry as E
    from pytheiasfm_tpu.ba.iterative_schur import bundle_adjust_iterative
    from pytheiasfm_tpu.ba.lm import BundleAdjustmentOptions
    from pytheiasfm_tpu.models.intrinsics import CameraIntrinsicsModelType as M

    V, T = 5288, 250_000
    prob = build_problem(V=V, T=T, obs_per_track=6)
    Vp = E._pad_soft(V, 8, 512, 256)
    Tp = E._pad_soft(T, 64, 16384, 16384)
    flat = {k: np.asarray(prob[k]) for k in (
        "obs_view", "obs_track", "obs_uv", "obs_sqrt_info", "obs_mask",
    )}
    slot = E._slot_layout(flat, Tp, np.float32)
    rc = E._rowchunk_layout(slot, Vp)
    L = slot["L"]
    ext = np.zeros((Vp, 6), np.float32)
    ext[:V] = np.asarray(prob["extrinsics"])
    pts = np.zeros((Tp, 3), np.float32)
    pts[:T] = np.asarray(prob["points"])
    cam_free = np.zeros((Vp,), bool)
    cam_free[:V] = np.asarray(prob["camera_free"])
    pt_free = np.zeros((Tp,), bool)
    pt_free[:T] = True
    base = BundleAdjustmentOptions(
        max_num_iterations=iters, function_tolerance=0.0,
        max_iterations_per_launch=iters,
    )

    def run(opts):
        out = bundle_adjust_iterative(
            jnp.asarray(ext), prob["intrinsics"], jnp.asarray(pts),
            jnp.asarray(np.zeros((Vp,), np.int32)),
            prob["group_model_idx"],
            jnp.asarray(slot["track_views"]), jnp.asarray(slot["uv"]),
            jnp.asarray(slot["info"]), jnp.asarray(slot["mask"]),
            jnp.asarray(rc["row_view"]), jnp.asarray(rc["rc_src"]),
            jnp.asarray(rc["rc_mask"]),
            jnp.asarray(cam_free), jnp.asarray(pt_free),
            jnp.asarray(np.zeros((1, prob["intrinsics"].shape[1]), bool)),
            present_models=(int(M.PINHOLE),),
            num_views=Vp, num_tracks=Tp, max_track_len=L,
            num_rows=rc["R"], row_chunk=rc["C"], num_groups=1,
            options=opts,
        )
        np.asarray(out[0])
        np.asarray(out[2])
        return out

    def timed(opts):
        out = run(opts)  # compile
        t0 = time.perf_counter()
        out = run(opts)
        return time.perf_counter() - t0, float(out[3].final_cost)

    t_f32, cost_f32 = timed(base)
    t_mixed, cost_mixed = timed(
        _dc.replace(base, use_mixed_precision_solves=True)
    )
    return dict(
        f32_s=t_f32, f32_final_cost=cost_f32,
        mixed_s=t_mixed, mixed_final_cost=cost_mixed, iters=iters,
    )


def bench_matching(n_desc=4096, dim=128, pairs=8, reps=20):
    """Matched pairs/s/chip: image pairs fully matched per second (4096x4096
    descriptors each, Lowe ratio + symmetric check) + raw descriptor-pair
    comparisons/s for the roofline view.

    Timing methodology: `reps` matcher invocations run INSIDE one jitted
    `fori_loop` with a data dependency between iterations, fetched once.
    Per-call host timing through the axon tunnel measures ~170 ms of RPC
    round-trip latency per call, and block_until_ready does not force
    queued async dispatches — the on-device loop measures what the chip
    actually does.
    """
    import jax
    import jax.numpy as jnp

    from pytheiasfm_tpu.matching.brute_force import match_descriptors_batch
    from pytheiasfm_tpu.matching.pallas_matcher import (
        match_descriptors_batch_pallas,
    )

    rng = np.random.default_rng(0)
    d1 = rng.normal(size=(pairs, n_desc, dim)).astype(np.float32)
    d2 = rng.normal(size=(pairs, n_desc, dim)).astype(np.float32)
    # L2-normalized descriptors like SIFT/deep features.
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    d1, d2 = jnp.asarray(d1), jnp.asarray(d2)
    m = jnp.ones((pairs, n_desc), bool)
    ratio = jnp.asarray(0.8, jnp.float32)

    def timed_loop(fn):
        @jax.jit
        def loop(a, b):
            def body(i, carry):
                acc, ax = carry
                _idx, dist = fn(ax, b)
                s = jnp.sum(dist)
                return acc + s, ax + 0.0 * s
            acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), a))
            return acc

        float(loop(d1, d2))  # compile + run
        t0 = time.perf_counter()
        float(loop(d1, d2))
        return (time.perf_counter() - t0) / reps

    dt_xla = timed_loop(lambda a, b: match_descriptors_batch(a, b, m, m, ratio))
    on_tpu = jax.default_backend() not in ("cpu",)
    dt_pallas = None
    parity = None
    if on_tpu:
        try:
            dt_pallas = timed_loop(
                lambda a, b: match_descriptors_batch_pallas(a, b, m, m, ratio)
            )
            # On-hardware numerical parity: the Mosaic-compiled kernel must
            # produce the XLA matcher's matches (modulo exact-tie argmin
            # order, which random descriptors essentially never hit).
            ix, dx = match_descriptors_batch(d1, d2, m, m, ratio)
            ip, dp = match_descriptors_batch_pallas(d1, d2, m, m, ratio)
            ix, ip = np.asarray(ix), np.asarray(ip)
            agree = float(np.mean(ix == ip))
            dd = float(
                np.max(np.abs(np.asarray(dx) - np.asarray(dp)))
            )
            parity = dict(match_agreement=agree, max_dist_delta=dd)
        except Exception:
            dt_pallas = None
    dt = min(d for d in (dt_xla, dt_pallas) if d is not None)
    image_pairs_per_s = pairs / dt
    # Each image pair computes n_desc^2 descriptor distances (2*D flops for
    # the matmul term alone) — the MXU-bound part of the kernel.
    matmul_tflops = pairs * (2.0 * n_desc * n_desc * dim) / dt / 1e12
    return dict(
        pairs_per_s=image_pairs_per_s,
        matmul_tflops=matmul_tflops,
        n_desc=n_desc,
        dim=dim,
        pairs=pairs,
        xla_pairs_per_s=pairs / dt_xla,
        pallas_pairs_per_s=(pairs / dt_pallas) if dt_pallas else None,
        parity=parity,
    )


def bench_fountain():
    """End-to-end fountain-11 (tracks -> verification -> global SfM -> ATE)
    on the TPU, run twice in-process: run 1 pays one-time jit compiles
    (persisted across processes via .jax_cache), run 2 is the device-speed
    number. Reference total: 1.76 s on a 2016 CPU (performance.md:20)."""
    import os

    from pytheiasfm_tpu.pipelines import fountain

    if not os.path.exists(fountain.DEFAULT_FOUNTAIN):
        return None
    first = fountain.evaluate(estimator_type="global")
    second = fountain.evaluate(estimator_type="global")
    # Calibrated run: the reference's Strecha methodology feeds per-camera
    # calibration files (performance.md:12), i.e. its 2.0 mm fountain
    # number holds intrinsics known — this row is the apples-to-apples
    # accuracy comparison; the default rows above keep free intrinsics.
    calibrated = fountain.evaluate(estimator_type="global", calibrated=True)
    return dict(first=first, second=second, calibrated=calibrated)


def bench_global_pipeline():
    """Synthetic Notre-Dame-scale GLOBAL pipeline (553 views / 50k tracks /
    ~280k obs / ~11k edges) through the real GlobalReconstructionEstimator,
    per phase, twice (run 2 = post-compile). Baselines: Notre Dame
    rotation 4.91 s / position 43.37 s / BA 196.22 s / total 330.71 s
    (BASELINE.md, performance.md:59)."""
    from pytheiasfm_tpu.pipelines import synthetic_global as sg

    sg.run(V=553, T=50_000, seed=0)  # warm (compiles -> persistent cache)
    return sg.run(V=553, T=50_000, seed=0)


def main():
    from pytheiasfm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    elapsed, iters, summary, cost, mixed = bench_ba()
    try:
        free = bench_ba_free_intrinsics()
    except Exception:
        free = None
    match = bench_matching()
    try:
        fount = bench_fountain()
    except Exception:
        fount = None
    try:
        gp = bench_global_pipeline()
    except Exception:
        gp = None
    try:
        gp2152 = bench_pipeline_2152()
    except Exception:
        gp2152 = None
    try:
        gp5288 = bench_pipeline_5288()
    except Exception:
        gp5288 = None
    try:
        k5288 = bench_ba_5288_kernel()
    except Exception:
        k5288 = None

    baseline_s = 196.22  # Notre Dame BA, Ceres CPU (BASELINE.md)
    result = {
        "metric": "ba_wallclock_notre_dame_scale",
        "value": round(elapsed, 4),
        "unit": f"s per {iters}-iter LM BA (553 cams, 50k tracks, 300k obs)",
        "vs_baseline": round(baseline_s / elapsed, 2),
        "ba_s_per_iter": round(elapsed / iters, 4),
        "final_cost": float(summary.final_cost),
        "initial_cost": float(summary.initial_cost),
        "lm_iterations": int(summary.num_iterations),
        "ba_config": "dense_schur, frozen intrinsics, f32, 30 LM iters",
        "matched_pairs_per_s": round(match["pairs_per_s"], 2),
        "matcher_config": (
            f"{match['n_desc']}x{match['n_desc']} desc, {match['dim']}-D, "
            f"batch {match['pairs']}, bf16"
        ),
        "matcher_matmul_tflops": round(match["matmul_tflops"], 2),
        "matcher_xla_pairs_per_s": round(match["xla_pairs_per_s"], 2),
    }
    if match["pallas_pairs_per_s"]:
        result["matcher_pallas_pairs_per_s"] = round(
            match["pallas_pairs_per_s"], 2
        )
    if match.get("parity"):
        result["matcher_pallas_match_agreement"] = round(
            match["parity"]["match_agreement"], 5
        )
        result["matcher_pallas_max_dist_delta"] = round(
            match["parity"]["max_dist_delta"], 5
        )
    if free is not None:
        f_elapsed, f_iters, f_summary, f_focal = free
        result["ba_free_intrinsics_wallclock"] = round(f_elapsed, 4)
        result["ba_free_intrinsics_vs_baseline"] = round(
            baseline_s / f_elapsed, 2
        )
        result["ba_free_intrinsics_final_cost"] = float(f_summary.final_cost)
        result["ba_free_intrinsics_recovered_focal"] = round(f_focal, 2)
        result["ba_free_intrinsics_config"] = (
            "iterative_schur, free focal+radial, f32, 30 LM iters"
        )
    if fount is not None:
        # vs the reference's 1.76 s total (performance.md:20); post-compile
        # run is the headline, first run shows the one-time compile cost.
        result["fountain_t_total_s"] = round(fount["second"]["t_total_s"], 2)
        result["fountain_dispatch_total"] = int(
            fount["second"].get("dispatch_total", 0)
        )
        result["fountain_t_total_first_run_s"] = round(
            fount["first"]["t_total_s"], 2
        )
        result["fountain_t_verify_s"] = round(fount["second"]["t_verify_s"], 2)
        result["fountain_t_sfm_s"] = round(fount["second"]["t_sfm_s"], 2)
        result["fountain_median_ate_mm"] = round(
            fount["second"]["median_mm"], 3
        )
        result["fountain_cameras"] = f"{fount['second']['cameras']}/11"
        result["fountain_config"] = "default_free_intrinsics"
        if "calibrated" in fount:
            result["fountain_calibrated_median_ate_mm"] = round(
                fount["calibrated"]["median_mm"], 3
            )
            result["fountain_calibrated_t_total_s"] = round(
                fount["calibrated"]["t_total_s"], 2
            )
    if gp is not None:
        # Per-phase vs the reference's Notre Dame table (performance.md:59).
        result["global_rotation_s"] = round(gp["t_rotation_s"], 2)
        result["global_rotation_vs_baseline"] = round(
            4.91 / max(gp["t_rotation_s"], 1e-9), 2
        )
        result["global_position_s"] = round(gp["t_position_s"], 2)
        result["global_position_vs_baseline"] = round(
            43.37 / max(gp["t_position_s"], 1e-9), 2
        )
        result["global_triangulation_s"] = round(gp["t_triangulation_s"], 2)
        result["global_ba_s"] = round(gp["t_ba_s"], 2)
        result["global_ba_vs_baseline"] = round(
            196.22 / max(gp["t_ba_s"], 1e-9), 2
        )
        result["global_total_s"] = round(gp["t_total_s"], 2)
        result["global_total_vs_baseline"] = round(
            330.71 / max(gp["t_total_s"], 1e-9), 2
        )
        result["global_median_pos_err_m"] = round(gp["median_pos_err"], 4)
        result["global_views"] = f"{gp['views']}/{gp['views_total']}"
        result["global_config"] = "default_free_intrinsics"
    if gp2152 is not None:
        # Piccadilly-scale ladder row (round-3 blind spot: the driver only
        # tracked the 553-view scale while 2152-view BA was below baseline).
        result["pipeline2152_total_s"] = round(gp2152["t_total_s"], 2)
        result["pipeline2152_vs_baseline"] = round(
            330.33 / max(gp2152["t_total_s"], 1e-9), 2
        )
        result["pipeline2152_rotation_s"] = round(gp2152["t_rotation_s"], 2)
        result["pipeline2152_rotation_vs_baseline"] = round(
            49.56 / max(gp2152["t_rotation_s"], 1e-9), 2
        )
        result["pipeline2152_position_s"] = round(gp2152["t_position_s"], 2)
        result["pipeline2152_position_vs_baseline"] = round(
            129.21 / max(gp2152["t_position_s"], 1e-9), 2
        )
        result["pipeline2152_ba_s"] = round(gp2152["t_ba_s"], 2)
        result["pipeline2152_ba_vs_baseline"] = round(
            72.26 / max(gp2152["t_ba_s"], 1e-9), 2
        )
        result["pipeline2152_median_pos_err_m"] = round(
            gp2152["median_pos_err"], 4
        )
        result["pipeline2152_views"] = (
            f"{gp2152['views']}/{gp2152['views_total']}"
        )
        result["pipeline2152_config"] = gp2152.get("config", "unknown")
        if "first_run_s" in gp2152:
            result["pipeline2152_first_run_s"] = round(
                gp2152["first_run_s"], 2
            )
    if gp5288 is not None:
        # Trafalgar-scale ladder row (performance.md:68: rotation 156.33,
        # position 387.29, BA 142.10, total 880.74 s).
        result["pipeline5288_total_s"] = round(gp5288["t_total_s"], 2)
        result["pipeline5288_vs_baseline"] = round(
            880.74 / max(gp5288["t_total_s"], 1e-9), 2
        )
        result["pipeline5288_rotation_s"] = round(gp5288["t_rotation_s"], 2)
        result["pipeline5288_rotation_vs_baseline"] = round(
            156.33 / max(gp5288["t_rotation_s"], 1e-9), 2
        )
        result["pipeline5288_position_s"] = round(gp5288["t_position_s"], 2)
        result["pipeline5288_position_vs_baseline"] = round(
            387.29 / max(gp5288["t_position_s"], 1e-9), 2
        )
        result["pipeline5288_ba_s"] = round(gp5288["t_ba_s"], 2)
        result["pipeline5288_ba_vs_baseline"] = round(
            142.10 / max(gp5288["t_ba_s"], 1e-9), 2
        )
        result["pipeline5288_median_pos_err_m"] = round(
            gp5288["median_pos_err"], 4
        )
        result["pipeline5288_views"] = (
            f"{gp5288['views']}/{gp5288['views_total']}"
        )
        result["pipeline5288_config"] = gp5288.get("config", "unknown")
        if "first_run_s" in gp5288:
            result["pipeline5288_first_run_s"] = round(
                gp5288["first_run_s"], 2
            )
    if k5288 is not None:
        # Kernel-interface Trafalgar BA rows (30 fixed LM iterations)
        # vs Trafalgar BA 142.10 s.
        result["ba5288_kernel_s"] = round(k5288["f32_s"], 2)
        result["ba5288_kernel_vs_baseline"] = round(
            142.10 / max(k5288["f32_s"], 1e-9), 2
        )
        result["ba5288_kernel_mixed_s"] = round(k5288["mixed_s"], 2)
        result["ba5288_kernel_mixed_vs_baseline"] = round(
            142.10 / max(k5288["mixed_s"], 1e-9), 2
        )
        result["ba5288_kernel_final_cost"] = k5288["f32_final_cost"]
    if mixed is not None:
        result["ba_mixed_precision_wallclock"] = round(mixed["elapsed"], 4)
        result["ba_mixed_precision_vs_baseline"] = round(
            baseline_s / mixed["elapsed"], 2
        )
        result["ba_mixed_precision_final_cost"] = mixed["final_cost"]
    if cost:
        # Utilization vs TPU v5e peaks (197 TFLOP/s bf16 MXU, ~819 GB/s
        # HBM) from the compiler's cost model. XLA counts the LM
        # while-loop BODY once (trip count is dynamic), so per-iteration
        # figures use elapsed/iters.
        per_iter = elapsed / iters
        tflops = cost["flops"] / per_iter / 1e12
        gbps = cost["bytes"] / per_iter / 1e9
        result["ba_achieved_tflops"] = round(tflops, 3)
        result["ba_achieved_hbm_gbps"] = round(gbps, 1)
        flop_frac = tflops / 197.0
        bw_frac = gbps / 819.0
        result["ba_utilization_pct"] = round(100 * max(flop_frac, bw_frac), 1)
        result["ba_limiting_resource"] = (
            "hbm_bandwidth" if bw_frac >= flop_frac else "mxu_flops"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
