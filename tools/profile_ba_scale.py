"""A/B the large-scale iterative-Schur BA kernel at Trafalgar scale
(5288 cams / 250k tracks / 1.5M obs) directly at the kernel interface.

Usage: python tools/profile_ba_scale.py [--views 5288] [--tracks 250000]
       [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=5288)
    ap.add_argument("--tracks", type=int, default=250_000)
    ap.add_argument("--obs", type=int, default=6)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--pcg", type=int, default=40)
    ap.add_argument("--mixed", action="store_true")
    ap.add_argument("--ftol", type=float, default=0.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_problem
    from pytheiasfm_tpu.ba import entry as E
    from pytheiasfm_tpu.ba.iterative_schur import bundle_adjust_iterative
    from pytheiasfm_tpu.ba.lm import BundleAdjustmentOptions
    from pytheiasfm_tpu.models.intrinsics import (
        CameraIntrinsicsModelType as M,
    )
    from pytheiasfm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    V, T = args.views, args.tracks
    prob = build_problem(V=V, T=T, obs_per_track=args.obs)
    Vp = E._pad_soft(V, 8, 512, 256)
    # Mirror entry.py's production padding rule (16384-step track axis past
    # 150k tracks selects the TC=16384 scan chunking) so measured constants
    # correspond to the shipped configuration.
    Tp = E._pad_soft(T, 64, 16384, 16384 if T > 150_000 else 8192)
    O = prob["O"]

    flat = dict(
        obs_view=np.asarray(prob["obs_view"]),
        obs_track=np.asarray(prob["obs_track"]),
        obs_uv=np.asarray(prob["obs_uv"]),
        obs_sqrt_info=np.asarray(prob["obs_sqrt_info"]),
        obs_mask=np.asarray(prob["obs_mask"]),
    )
    slot = E._slot_layout(flat, Tp, np.float32)
    rc = E._rowchunk_layout(slot, Vp)
    L = slot["L"]
    print(f"V={V} (pad {Vp})  T={T} (pad {Tp})  O={O}  L={L}  "
          f"R={rc['R']} C={rc['C']}  slots={Tp * L}")

    ext = np.zeros((Vp, 6), np.float32)
    ext[:V] = np.asarray(prob["extrinsics"])
    pts = np.zeros((Tp, 3), np.float32)
    pts[:T] = np.asarray(prob["points"])
    cam_free = np.zeros((Vp,), bool)
    cam_free[:V] = np.asarray(prob["camera_free"])
    pt_free = np.zeros((Tp,), bool)
    pt_free[:T] = True
    vg = np.zeros((Vp,), np.int32)

    opts = BundleAdjustmentOptions(
        max_num_iterations=args.iters,
        linear_solver_iterations=args.pcg,
        function_tolerance=args.ftol,
        max_iterations_per_launch=args.iters,
        use_mixed_precision_solves=args.mixed,
    )

    def run():
        out = bundle_adjust_iterative(
            jnp.asarray(ext), prob["intrinsics"], jnp.asarray(pts),
            jnp.asarray(vg), prob["group_model_idx"],
            jnp.asarray(slot["track_views"]),
            jnp.asarray(slot["uv"]), jnp.asarray(slot["info"]),
            jnp.asarray(slot["mask"]),
            jnp.asarray(rc["row_view"]), jnp.asarray(rc["rc_src"]),
            jnp.asarray(rc["rc_mask"]),
            jnp.asarray(cam_free), jnp.asarray(pt_free),
            jnp.asarray(np.zeros((1, prob["intrinsics"].shape[1]), bool)),
            present_models=(int(M.PINHOLE),),
            num_views=Vp, num_tracks=Tp, max_track_len=L,
            num_rows=rc["R"], row_chunk=rc["C"], num_groups=1,
            options=opts,
        )
        jax.block_until_ready(out[:3])
        return out

    t0 = time.perf_counter()
    out = run()
    t_compile = time.perf_counter() - t0
    s = out[3]
    t0 = time.perf_counter()
    out = run()
    dt = time.perf_counter() - t0
    print(
        f"compile+run {t_compile:.2f}s   run {dt:.2f}s "
        f"({dt / args.iters * 1e3:.1f} ms/LM-iter)   "
        f"cost {float(s.initial_cost):.4g} -> {float(s.final_cost):.4g}  "
        f"iters {int(s.num_iterations)}"
    )


if __name__ == "__main__":
    main()
