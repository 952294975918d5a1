"""Headline benchmark: bundle adjustment wall-clock at 1DSfM Notre-Dame scale.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: TheiaSfM/Ceres-CPU Notre Dame BA = 196.22 s for the final bundle
adjustment of 553 cameras (BASELINE.md, docs/content/performance.md:59). We
synthesize a problem at that scale (553 cameras, 50k tracks, ~300k
observations), run a fixed 30-iteration LM schedule on the TPU, and report
wall-clock. vs_baseline > 1 means faster than the reference.
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
    ext = np.zeros((V, 6))
    for v in range(V):
        z = -positions[v] / np.linalg.norm(positions[v])
        x = np.cross([0.0, 0.0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        aa = np.asarray(rot.rotation_matrix_to_angle_axis(jnp.asarray(R)))
        ext[v] = np.concatenate([positions[v], aa])
    points = rng.uniform(-3, 3, size=(T, 3))
    params = np.asarray(
        intr.make_intrinsics(M.PINHOLE, focal_length=1000.0, principal_point=(1536, 1024))
    )

    # Observations: each track seen by `obs_per_track` random cameras.
    obs_track = np.repeat(np.arange(T, dtype=np.int32), obs_per_track)
    obs_view = rng.integers(0, V, size=T * obs_per_track).astype(np.int32)
    # Project (vectorized, on host in f64 for clean GT).
    from pytheiasfm_tpu.models import camera as cam
    from pytheiasfm_tpu.models.intrinsics import CameraIntrinsicsModelType as M2

    ext_o = ext[obs_view]
    pts_o = points[obs_track]
    depth, pixel = cam.project_point(
        jnp.asarray(ext_o), jnp.asarray(params), jnp.asarray(pts_o), M2.PINHOLE
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
        points=jnp.asarray(pts_n, dtype),
        intrinsics_rows=jnp.asarray(np.tile(params, (O, 1)), dtype),
        obs_view=jnp.asarray(obs_view),
        obs_track=jnp.asarray(obs_track),
        obs_uv=jnp.asarray(uv, dtype),
        obs_sqrt_info=jnp.ones((O, 2), dtype),
        obs_mask=jnp.asarray(mask),
        camera_free=jnp.asarray(cam_free),
        point_free=jnp.ones(T, bool),
        V=V,
        T=T,
        O=O,
    )


def main():
    import jax

    from pytheiasfm_tpu.ba import BundleAdjustmentOptions, bundle_adjust
    from pytheiasfm_tpu.models.intrinsics import CameraIntrinsicsModelType as M

    prob = build_problem()
    iters = 30
    options = BundleAdjustmentOptions(
        max_num_iterations=iters,
        function_tolerance=0.0,  # run the full fixed schedule
        linear_solver_iterations=30,
    )

    def run():
        ext, pts, summary = bundle_adjust(
            prob["extrinsics"],
            prob["points"],
            prob["intrinsics_rows"],
            prob["obs_view"],
            prob["obs_track"],
            prob["obs_uv"],
            prob["obs_sqrt_info"],
            prob["obs_mask"],
            prob["camera_free"],
            prob["point_free"],
            model=int(M.PINHOLE),
            num_views=prob["V"],
            num_tracks=prob["T"],
            options=options,
        )
        return ext, pts, summary

    # Warm-up (compile).
    out = run()
    jax.block_until_ready(out[:2])

    t0 = time.perf_counter()
    out = run()
    jax.block_until_ready(out[:2])
    elapsed = time.perf_counter() - t0

    summary = out[2]
    baseline_s = 196.22  # Notre Dame BA, Ceres CPU (BASELINE.md)
    result = {
        "metric": "ba_wallclock_notre_dame_scale",
        "value": round(elapsed, 4),
        "unit": f"s per {iters}-iter LM BA (553 cams, 50k tracks, 300k obs)",
        "vs_baseline": round(baseline_s / elapsed, 2),
        "final_cost": float(summary.final_cost),
        "initial_cost": float(summary.initial_cost),
        "lm_iterations": int(summary.num_iterations),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
