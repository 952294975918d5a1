"""Rowchunk iterative-Schur BA kernel vs the flat and dense kernels.

The scatter-free iterative kernel (`ba/iterative_schur.py`) is the
large-problem path (the reference's ITERATIVE_SCHUR configuration,
`reconstruction_estimator_options.h:291-300`); on identical problems it
must reach the flat implicit-PCG kernel's optimum exactly (same math, same
PCG, different data layout) and the dense kernel's optimum to solver
tolerance.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pytheiasfm_tpu.ba import (
    BundleAdjustmentOptions,
    LinearSolverType,
    bundle_adjust,
    bundle_adjust_iterative,
)
from pytheiasfm_tpu.ba.entry import _rowchunk_layout, _slot_layout
from pytheiasfm_tpu.ba.lm import TrackParametrizationType
from pytheiasfm_tpu.models.intrinsics import (
    CameraIntrinsicsModelType as M,
    OptimizeIntrinsicsType as OI,
    intrinsics_subset_mask,
)

from test_dense_schur import _make_problem, _run_dense, _run_flat


def _run_iterative(p, options, rc=None, intr_free=None, priors=None,
                   intr_in=None):
    V, T, L = p["V"], p["T"], p["L"]
    if rc is None:
        slot = dict(
            track_views=p["track_views"], mask=p["mask"].reshape(T, L)
        )
        rc = _rowchunk_layout(slot, V)
    P = p["intr"].shape[1]
    if intr_free is None:
        intr_free = np.zeros((1, P), bool)
    return bundle_adjust_iterative(
        jnp.asarray(p["ext"]),
        jnp.asarray(intr_in if intr_in is not None else p["intr"]),
        jnp.asarray(p["pts"]),
        jnp.asarray(p["view_group"]),
        jnp.asarray(p["group_model_idx"]),
        jnp.asarray(p["track_views"]),
        jnp.asarray(p["uv"].reshape(T, L, 2)),
        jnp.asarray(p["info"].reshape(T, L, 2)),
        jnp.asarray(p["mask"].reshape(T, L)),
        jnp.asarray(rc["row_view"]),
        jnp.asarray(rc["rc_src"]),
        jnp.asarray(rc["rc_mask"]),
        jnp.asarray(p["cam_free"]),
        jnp.asarray(p["pt_free"]),
        jnp.asarray(intr_free),
        present_models=(int(M.PINHOLE),),
        num_views=V,
        num_tracks=T,
        max_track_len=L,
        num_rows=rc["R"],
        row_chunk=rc["C"],
        num_groups=1,
        options=options,
        priors=priors,
    )


def test_rowchunk_layout_roundtrip(rng):
    """Every observation lands in exactly one row slot of its own view."""
    p = _make_problem(rng)
    T, L, V = p["T"], p["L"], p["V"]
    slot = dict(track_views=p["track_views"], mask=p["mask"].reshape(T, L))
    rc = _rowchunk_layout(slot, V)
    got = rc["rc_src"][rc["rc_mask"]]
    want = np.nonzero(p["mask"])[0]
    assert sorted(got.tolist()) == sorted(want.tolist())
    # Row slots carry the view of their row.
    v_of = p["track_views"].reshape(-1)[got]
    rows = np.nonzero(rc["rc_mask"])[0]
    np.testing.assert_array_equal(v_of, rc["row_view"][rows])


def test_iterative_matches_flat_exactly(rng):
    """Identical math + layout change only => bitwise-level agreement."""
    p = _make_problem(rng)
    options = BundleAdjustmentOptions(max_num_iterations=30)
    ext_f, _, pts_f, s_f = _run_flat(p, options)
    ext_i, _, pts_i, s_i = _run_iterative(p, options)
    assert int(s_i.num_iterations) == int(s_f.num_iterations)
    np.testing.assert_allclose(ext_i, ext_f, atol=1e-12)
    np.testing.assert_allclose(pts_i, pts_f, atol=1e-12)


def test_iterative_matches_dense_optimum(rng):
    p = _make_problem(rng)
    options = BundleAdjustmentOptions(max_num_iterations=40)
    _, _, _, s_d = _run_dense(p, options)
    _, _, _, s_i = _run_iterative(p, options)
    assert float(s_i.final_cost) == pytest.approx(
        float(s_d.final_cost), rel=1e-5
    )


def test_iterative_free_intrinsics_recovers_focal(rng):
    p = _make_problem(rng, noise=0.0, perturb=0.01)
    P = p["intr"].shape[1]
    intr_free = np.zeros((1, P), bool)
    intr_free[0] = intrinsics_subset_mask(int(M.PINHOLE), OI.FOCAL_LENGTH)[:P]
    intr_bad = p["intr"].copy()
    intr_bad[0, 0] *= 1.04
    options = BundleAdjustmentOptions(
        max_num_iterations=60, intrinsics_to_optimize=OI.FOCAL_LENGTH
    )
    _, q_i, _, s_i = _run_iterative(
        p, options, intr_free=intr_free, intr_in=intr_bad
    )
    assert bool(s_i.success)
    assert float(q_i[0, 0]) == pytest.approx(float(p["intr"][0, 0]), rel=1e-3)


def test_iterative_manifold_parametrization(rng):
    p = _make_problem(rng)
    pts4 = np.concatenate(
        [p["pts"], np.ones((p["T"], 1), p["pts"].dtype)], axis=1
    )
    pts4 /= np.linalg.norm(pts4, axis=1, keepdims=True)
    p = dict(p, pts=pts4)
    options = BundleAdjustmentOptions(
        max_num_iterations=40,
        track_parametrization_type=TrackParametrizationType.XYZW_MANIFOLD,
    )
    ext_f, _, pts_f, s_f = _run_flat(p, options)
    ext_i, _, pts_i, s_i = _run_iterative(p, options)
    np.testing.assert_allclose(ext_i, ext_f, atol=1e-10)
    assert float(s_i.final_cost) == pytest.approx(
        float(s_f.final_cost), rel=1e-8
    )


def test_entry_dispatches_iterative_solver(rng, monkeypatch):
    """Forcing ITERATIVE_SCHUR at the public entry routes through the
    rowchunk kernel and reaches the AUTO (dense) optimum."""
    from pytheiasfm_tpu.ba import entry as entry_mod
    from pytheiasfm_tpu.ba.entry import bundle_adjust_partial_reconstruction
    from pytheiasfm_tpu.utils.synthetic import random_reconstruction

    calls = {"iter": 0}
    orig = entry_mod.bundle_adjust_iterative

    def spy(*a, **kw):
        calls["iter"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(entry_mod, "bundle_adjust_iterative", spy)

    def scene():
        recon = random_reconstruction(
            num_views=8, num_tracks=60, seed=11, model=M.PINHOLE
        )
        recon.view_extrinsics[2:] += rng.normal(size=(6, 6)) * 0.01
        recon.points[:, :3] += 0.02
        return recon

    free = list(range(2, 8)), list(range(60))
    opts_auto = BundleAdjustmentOptions(max_num_iterations=30)
    opts_iter = dataclasses.replace(
        opts_auto, linear_solver_type=LinearSolverType.ITERATIVE_SCHUR
    )
    r1, r2 = scene(), scene()
    s_auto = bundle_adjust_partial_reconstruction(opts_auto, *free, r1)
    assert calls["iter"] == 0  # AUTO at 8 views takes the dense path
    s_it = bundle_adjust_partial_reconstruction(opts_iter, *free, r2)
    assert calls["iter"] == 1
    # Noise-free scene: both solvers drive the cost to the float noise
    # floor and recover the same cameras.
    assert float(s_auto.final_cost) < 1e-4
    assert float(s_it.final_cost) < 1e-4
    np.testing.assert_allclose(
        r2.view_extrinsics, r1.view_extrinsics, atol=1e-5
    )


def test_iterative_mixed_precision_converges(rng):
    p = _make_problem(rng)
    options = BundleAdjustmentOptions(
        max_num_iterations=30, use_mixed_precision_solves=True
    )
    _, _, _, s_f = _run_flat(p, BundleAdjustmentOptions(max_num_iterations=30))
    _, _, _, s_i = _run_iterative(p, options)
    assert bool(s_i.success)
    # bf16 matvec operands still converge to the same basin.
    assert float(s_i.final_cost) <= 1.05 * float(s_f.final_cost)


def test_coarse_preconditioner_reaches_flat_optimum(rng):
    """Above the V >= 1024 gate the kernel adds the two-level (coarse
    Schur) preconditioner; the PCG trajectory changes but the LM optimum
    must match the flat kernel's."""
    p = _make_problem(rng, V=1024, T=1500, L=4, noise=0.3, perturb=0.005)
    options = BundleAdjustmentOptions(
        max_num_iterations=25, function_tolerance=0.0
    )
    ext_f, _, pts_f, s_f = _run_flat(p, options)
    ext_i, _, pts_i, s_i = _run_iterative(p, options)
    assert bool(s_i.success)
    # Different preconditioner => different PCG trajectory; the near-gauge
    # directions of a ring scene leave parameters loosely pinned, so the
    # check is on the OBJECTIVE: same basin, equal-or-better progress.
    assert float(s_i.final_cost) <= float(s_f.final_cost) * (1 + 1e-3)


@pytest.mark.slow
def test_chunked_build_scan_path(rng, monkeypatch):
    """Past the slot threshold the block build runs as a lax.scan over
    track chunks (the Trafalgar-scale memory fix); the optimum must match
    the flat kernel. The threshold is lowered so the scan engages at a
    CPU-testable size."""
    from pytheiasfm_tpu.ba import iterative_schur as it

    monkeypatch.setattr(it, "_SCAN_SLOT_THRESHOLD", 1000)
    p = _make_problem(rng, V=64, T=16384, L=4, noise=0.3, perturb=0.005)
    options = BundleAdjustmentOptions(max_num_iterations=8)
    _, _, _, s_f = _run_flat(p, options)
    _, _, _, s_i = _run_iterative(p, options)
    assert bool(s_i.success)
    assert float(s_i.final_cost) == pytest.approx(
        float(s_f.final_cost), rel=1e-6
    )
