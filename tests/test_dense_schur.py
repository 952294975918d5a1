"""Dense-Schur BA kernel vs the implicit-PCG kernel.

The dense kernel (`ba/dense_schur.py`) must reach the same optimum as the
iterative kernel (`ba/lm.py`) on identical problems — both implement the
reference's BA semantics (`bundle_adjuster.cc:315-341`), differing only in
the linear-solver realization (materialized Schur + Cholesky vs PCG).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pytheiasfm_tpu.ba import (
    BundleAdjustmentOptions,
    bundle_adjust,
    bundle_adjust_dense,
)
from pytheiasfm_tpu.ba.lm import TrackParametrizationType, inv3x3, inv_small_spd
from pytheiasfm_tpu.models import intrinsics as intr
from pytheiasfm_tpu.models.intrinsics import CameraIntrinsicsModelType as M
from pytheiasfm_tpu.ops import rotation as rot


def _make_problem(rng, V=8, T=60, L=4, noise=0.5, perturb=0.02, dtype=np.float64):
    """Small synthetic BA problem in BOTH layouts (flat + track-slot)."""
    import jax

    angles = np.linspace(0, 2 * np.pi, V, endpoint=False)
    positions = np.stack(
        [6 * np.cos(angles), 6 * np.sin(angles), rng.normal(size=V) * 0.3], -1
    )
    z = -positions / np.linalg.norm(positions, axis=1, keepdims=True)
    x = np.cross(np.broadcast_to([0.0, 0.0, 1.0], z.shape), z)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=1)
    aa = np.asarray(jax.vmap(rot.rotation_matrix_to_angle_axis)(jnp.asarray(R)))
    ext = np.concatenate([positions, aa], axis=1)
    points = rng.uniform(-2, 2, size=(T, 3))
    params = np.asarray(
        intr.make_intrinsics(M.PINHOLE, focal_length=800.0, principal_point=(640, 480))
    )

    track_views = np.zeros((T, L), np.int32)
    for t in range(T):
        track_views[t] = rng.choice(V, size=L, replace=False)
    obs_view = track_views.reshape(-1)
    obs_track = np.repeat(np.arange(T, dtype=np.int32), L)

    from pytheiasfm_tpu.models import camera as cam

    depth, pixel = cam.project_point(
        jnp.asarray(ext[obs_view]),
        jnp.asarray(params),
        jnp.asarray(points[obs_track]),
        M.PINHOLE,
    )
    uv = np.asarray(pixel) + rng.normal(size=(T * L, 2)) * noise
    mask = np.asarray(depth) > 0.1

    ext_n = ext + rng.normal(size=ext.shape) * perturb
    pts_n = points + rng.normal(size=points.shape) * perturb
    cam_free = np.ones(V, bool)
    cam_free[:2] = False
    ext_n[:2] = ext[:2]

    return dict(
        ext=ext_n.astype(dtype),
        intr=params.astype(dtype)[None, :],
        pts=pts_n.astype(dtype),
        view_group=np.zeros(V, np.int32),
        group_model_idx=np.zeros(1, np.int32),
        track_views=track_views,
        obs_view=obs_view,
        obs_track=obs_track,
        uv=np.asarray(uv, dtype),
        info=np.ones((T * L, 2), dtype),
        mask=mask,
        cam_free=cam_free,
        pt_free=np.ones(T, bool),
        V=V,
        T=T,
        L=L,
    )


def _run_flat(p, options):
    V, T = p["V"], p["T"]
    return bundle_adjust(
        jnp.asarray(p["ext"]),
        jnp.asarray(p["intr"]),
        jnp.asarray(p["pts"]),
        jnp.asarray(p["view_group"]),
        jnp.asarray(p["group_model_idx"]),
        jnp.asarray(p["obs_view"]),
        jnp.asarray(p["obs_track"]),
        jnp.asarray(p["uv"]),
        jnp.asarray(p["info"]),
        jnp.asarray(p["mask"]),
        jnp.asarray(p["cam_free"]),
        jnp.asarray(p["pt_free"]),
        jnp.zeros((1, p["intr"].shape[1]), bool),
        jnp.zeros((T,), jnp.int32),
        jnp.zeros((T, 3), p["ext"].dtype),
        present_models=(int(M.PINHOLE),),
        num_views=V,
        num_tracks=T,
        num_groups=1,
        options=options,
    )


def _run_dense(p, options, pts_in=None):
    V, T, L = p["V"], p["T"], p["L"]
    return bundle_adjust_dense(
        jnp.asarray(p["ext"]),
        jnp.asarray(p["intr"]),
        jnp.asarray(pts_in if pts_in is not None else p["pts"]),
        jnp.asarray(p["view_group"]),
        jnp.asarray(p["group_model_idx"]),
        jnp.asarray(p["track_views"]),
        jnp.asarray(p["uv"].reshape(T, L, 2)),
        jnp.asarray(p["info"].reshape(T, L, 2)),
        jnp.asarray(p["mask"].reshape(T, L)),
        jnp.asarray(p["cam_free"]),
        jnp.asarray(p["pt_free"]),
        present_models=(int(M.PINHOLE),),
        num_views=V,
        num_tracks=T,
        max_track_len=L,
        num_groups=1,
        options=options,
    )


def test_inv3x3_matches_linalg(rng):
    A = rng.normal(size=(50, 3, 3))
    A = A @ np.swapaxes(A, -1, -2) + 3 * np.eye(3)
    got = np.asarray(inv3x3(jnp.asarray(A)))
    np.testing.assert_allclose(got, np.linalg.inv(A), rtol=1e-9, atol=1e-10)


def test_inv6x6_spd_matches_linalg(rng):
    A = rng.normal(size=(20, 6, 6))
    A = A @ np.swapaxes(A, -1, -2) + 6 * np.eye(6)
    got = np.asarray(inv_small_spd(jnp.asarray(A), 6))
    np.testing.assert_allclose(got, np.linalg.inv(A), rtol=1e-8, atol=1e-9)


def test_dense_matches_iterative_optimum(rng):
    p = _make_problem(rng)
    options = BundleAdjustmentOptions(
        max_num_iterations=30, function_tolerance=1e-12
    )
    e1, _, p1, s1 = _run_flat(p, options)
    e2, _, p2, s2 = _run_dense(p, options)
    assert float(s1.final_cost) < float(s1.initial_cost)
    assert float(s2.final_cost) < float(s2.initial_cost)
    # Same optimum (both solve the same nonlinear LSQ to convergence).
    np.testing.assert_allclose(
        float(s2.final_cost), float(s1.final_cost), rtol=1e-3
    )
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), atol=1e-4)


def test_dense_reduces_cost_manifold(rng):
    p = _make_problem(rng)
    options = BundleAdjustmentOptions(
        max_num_iterations=25,
        function_tolerance=1e-12,
        track_parametrization_type=TrackParametrizationType.XYZW_MANIFOLD,
    )
    T = p["T"]
    p4 = np.concatenate([p["pts"], np.ones((T, 1))], axis=1)
    p4 /= np.linalg.norm(p4, axis=1, keepdims=True)
    e2, _, pts2, s2 = _run_dense(p, options, pts_in=p4)
    assert float(s2.final_cost) < 0.2 * float(s2.initial_cost)


def test_dense_mixed_precision_still_converges(rng):
    p = _make_problem(rng)
    # bf16 Schur product: coarser solve, same optimizer contract.
    options = BundleAdjustmentOptions(
        max_num_iterations=30,
        function_tolerance=1e-12,
        use_mixed_precision_solves=True,
    )
    e2, _, p2, s2 = _run_dense(p, options)
    assert float(s2.final_cost) < 0.1 * float(s2.initial_cost)


def test_dense_respects_frozen_cameras(rng):
    p = _make_problem(rng)
    options = BundleAdjustmentOptions(max_num_iterations=10)
    e2, _, _, _ = _run_dense(p, options)
    np.testing.assert_array_equal(np.asarray(e2)[:2], p["ext"][:2])


def test_dense_invdepth_rejected(rng):
    p = _make_problem(rng)
    options = BundleAdjustmentOptions(
        track_parametrization_type=TrackParametrizationType.INVERSE_DEPTH
    )
    with pytest.raises(ValueError):
        _run_dense(p, options)


def test_joint_covariance_matches_explicit_inverse(rng):
    """joint_covariance_dense vs the explicitly assembled (J^T J)^-1."""
    from pytheiasfm_tpu.ba.dense_schur import joint_covariance_dense
    from pytheiasfm_tpu.ba.lm import _Problem
    from pytheiasfm_tpu.ba.losses import LossFunctionType
    from pytheiasfm_tpu.models.intrinsics import CameraIntrinsicsModelType as M

    p = _make_problem(rng, V=8, T=40, L=4)
    V, T, L = p["V"], p["T"], p["L"]
    options = BundleAdjustmentOptions()
    cam_free = p["cam_free"]  # first 2 frozen -> gauge fixed
    pt_free = p["pt_free"]

    cam_cov, track_cov, cost, nres = joint_covariance_dense(
        jnp.asarray(p["ext"]),
        jnp.asarray(p["intr"]),
        jnp.asarray(p["pts"]),
        jnp.asarray(p["view_group"]),
        jnp.asarray(p["group_model_idx"]),
        jnp.asarray(p["track_views"]),
        jnp.asarray(p["uv"].reshape(T, L, 2)),
        jnp.asarray(p["info"].reshape(T, L, 2)),
        jnp.asarray(p["mask"].reshape(T, L)),
        jnp.asarray(cam_free),
        jnp.asarray(pt_free),
        present_models=(int(M.PINHOLE),),
        num_views=V,
        num_tracks=T,
        max_track_len=L,
        num_groups=1,
        options=options,
    )

    # Reference: explicit dense J^T J over (free cams, all tracks).
    prob = _Problem(
        (
            jnp.asarray(p["obs_view"]),
            jnp.asarray(p["obs_track"]),
            jnp.asarray(p["uv"]),
            jnp.asarray(p["info"]),
            jnp.asarray(p["mask"]),
        ),
        jnp.asarray(p["view_group"]),
        jnp.zeros((T,), jnp.int32),
        jnp.zeros((T, 3)),
        (int(M.PINHOLE),),
        jnp.asarray(p["group_model_idx"]),
        0,
        LossFunctionType.TRIVIAL,
        2.0,
        jnp.float64,
    )
    r, Jc, _, _, Jp, _ = prob.residuals(
        jnp.asarray(p["ext"]), jnp.asarray(p["intr"]), jnp.asarray(p["pts"]),
        with_jac=True, want_intr_jac=False,
    )
    Jc = np.asarray(Jc) * cam_free[p["obs_view"]][:, None, None]
    Jp = np.asarray(Jp)
    O = len(p["obs_view"])
    n = 6 * V + 3 * T
    J = np.zeros((2 * O, n))
    for o in range(O):
        v, t = p["obs_view"][o], p["obs_track"][o]
        J[2 * o : 2 * o + 2, 6 * v : 6 * v + 6] = Jc[o]
        J[2 * o : 2 * o + 2, 6 * V + 3 * t : 6 * V + 3 * t + 3] = Jp[o]
    H = J.T @ J
    # Same regularization as the kernel (identity on frozen cams + jitter).
    for v in range(V):
        if not cam_free[v]:
            H[6 * v : 6 * v + 6, 6 * v : 6 * v + 6] += np.eye(6)
    H[: 6 * V, : 6 * V] += 1e-8 * np.eye(6 * V)
    H[6 * V :, 6 * V :] += 1e-10 * np.eye(3 * T)
    Hinv = np.linalg.inv(H)

    for v in range(V):
        if not cam_free[v]:
            continue
        np.testing.assert_allclose(
            np.asarray(cam_cov)[v],
            Hinv[6 * v : 6 * v + 6, 6 * v : 6 * v + 6],
            rtol=2e-4, atol=1e-10,
        )
    for t in range(0, T, 7):
        i = 6 * V + 3 * t
        np.testing.assert_allclose(
            np.asarray(track_cov)[t],
            Hinv[i : i + 3, i : i + 3],
            rtol=2e-4, atol=1e-10,
        )
