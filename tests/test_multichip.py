"""Multi-device correctness tests on the 8-device virtual CPU mesh.

The conftest forces `--xla_force_host_platform_device_count=8`; these tests
assert that the sharded execution paths produce the single-device numbers:
  - the explicit shard_map+psum Schur reduction (parallel/distributed.py),
  - the full BA kernel with GSPMD-sharded observations,
  - the batched descriptor matcher sharded over the pair axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pytheiasfm_tpu.parallel import make_mesh, pad_to_multiple
from pytheiasfm_tpu.parallel.distributed import (
    distributed_normal_equation_blocks,
    sharded_segment_sum,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


def test_sharded_segment_sum_matches_reference(rng):
    mesh = make_mesh(8)
    O, S = 4096, 37
    vals = jnp.asarray(rng.normal(size=(O, 5)))
    ids = jnp.asarray(rng.integers(0, S, size=O), jnp.int32)
    got = sharded_segment_sum(vals, ids, S, mesh)
    want = jax.ops.segment_sum(vals, ids, num_segments=S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_distributed_schur_blocks_match(rng):
    mesh = make_mesh(8)
    O, V, T = 2048, 12, 100
    Jc = jnp.asarray(rng.normal(size=(O, 2, 6)))
    Jp = jnp.asarray(rng.normal(size=(O, 2, 3)))
    r = jnp.asarray(rng.normal(size=(O, 2)))
    ov = jnp.asarray(rng.integers(0, V, size=O), jnp.int32)
    ot = jnp.asarray(rng.integers(0, T, size=O), jnp.int32)
    U, Vt, bc, bp = distributed_normal_equation_blocks(
        Jc, Jp, r, ov, ot, V, T, mesh
    )
    U_ref = jax.ops.segment_sum(jnp.einsum("ori,orj->oij", Jc, Jc), ov, num_segments=V)
    Vt_ref = jax.ops.segment_sum(jnp.einsum("ori,orj->oij", Jp, Jp), ot, num_segments=T)
    bc_ref = -jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jc, r), ov, num_segments=V)
    bp_ref = -jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jp, r), ot, num_segments=T)
    for got, want in ((U, U_ref), (Vt, Vt_ref), (bc, bc_ref), (bp, bp_ref)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10)


def test_ba_sharded_observations_matches_single_device():
    """The full LM kernel with observations sharded over 8 devices must
    produce the single-device solve (f64 CPU: exact up to reduction order)."""
    import __graft_entry__ as ge

    from pytheiasfm_tpu.ba import BundleAdjustmentOptions, bundle_adjust
    from pytheiasfm_tpu.models.intrinsics import CameraIntrinsicsModelType as M

    mesh = make_mesh(8)
    prob = ge._synthetic_ba_problem(V=10, T=120, seed=3, dtype=np.float64)
    obs = {}
    for name in ("obs_view", "obs_track", "obs_uv", "obs_sqrt_info", "obs_mask"):
        padded, _ = pad_to_multiple(prob[name], 8)
        obs[name] = padded
    obs["obs_mask"][len(prob["obs_view"]):] = False

    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    options = BundleAdjustmentOptions(max_num_iterations=5, function_tolerance=0.0)

    def step(*args):
        ext, q, pts, s = bundle_adjust(
            *args,
            present_models=(int(M.PINHOLE),),
            num_views=prob["V"],
            num_tracks=prob["T"],
            num_groups=1,
            options=options,
        )
        return ext, pts, s.final_cost

    def args_for(device_put):
        out = []
        for k in ge._ARG_ORDER:
            src = obs.get(k, prob[k])
            arr = jnp.asarray(src)
            if device_put is not None:
                arr = jax.device_put(
                    arr, shard if k in obs else repl
                )
            out.append(arr)
        return tuple(out)

    ext_m, pts_m, cost_m = jax.jit(step)(*args_for("sharded"))
    ext_s, pts_s, cost_s = jax.jit(step)(*args_for(None))
    np.testing.assert_allclose(float(cost_m), float(cost_s), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ext_m), np.asarray(ext_s), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(pts_m), np.asarray(pts_s), rtol=1e-8, atol=1e-10)


def test_matcher_sharded_pairs_matches_single_device(rng):
    from pytheiasfm_tpu.matching.brute_force import match_descriptors_batch

    mesh = make_mesh(8)
    pairs, n, d = 8, 128, 32
    d1 = jnp.asarray(rng.normal(size=(pairs, n, d)), jnp.float32)
    d2 = jnp.asarray(rng.normal(size=(pairs, n, d)), jnp.float32)
    m = jnp.ones((pairs, n), bool)
    ratio = jnp.asarray(0.9, jnp.float32)

    shard = NamedSharding(mesh, P("data"))
    idx_s, dist_s = match_descriptors_batch(
        jax.device_put(d1, shard), jax.device_put(d2, shard),
        jax.device_put(m, shard), jax.device_put(m, shard), ratio,
        use_bf16=False,
    )
    idx_1, dist_1 = match_descriptors_batch(d1, d2, m, m, ratio, use_bf16=False)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_1))
    np.testing.assert_allclose(np.asarray(dist_s), np.asarray(dist_1), rtol=1e-6)


def test_public_entry_mesh_ba_matches_single_device(rng):
    """`bundle_adjust_reconstruction(options(mesh=...))` — the PUBLIC
    multi-device path (SURVEY §7.9): a user enables distributed BA with one
    options field, no kernel imports."""
    import dataclasses

    from pytheiasfm_tpu.ba import BundleAdjustmentOptions
    from pytheiasfm_tpu.ba.entry import bundle_adjust_partial_reconstruction
    from pytheiasfm_tpu.utils.synthetic import random_reconstruction

    def scene():
        r = random_reconstruction(num_views=10, num_tracks=120, seed=3)
        r.view_extrinsics[2:] += rng.standard_normal((8, 6)) * 0.01
        r.points[:, :3] += 0.02
        return r

    free = (list(range(2, 10)), list(range(120)))
    base = BundleAdjustmentOptions(max_num_iterations=10)
    r_single, r_mesh = scene(), scene()
    # f64: LM accept/reject decisions sit on knife edges that f32
    # shard-reduction-order noise can flip; at f64 the sharded and
    # single-device trajectories must agree to ~1e-8.
    s1 = bundle_adjust_partial_reconstruction(
        base, *free, r_single, dtype=np.float64
    )
    s2 = bundle_adjust_partial_reconstruction(
        dataclasses.replace(base, mesh=make_mesh(8)),
        *free,
        r_mesh,
        dtype=np.float64,
    )
    assert bool(s1.success) and bool(s2.success)
    np.testing.assert_allclose(
        r_mesh.view_extrinsics, r_single.view_extrinsics, rtol=1e-7, atol=1e-8
    )
    # Noise-free scene: both costs sit at the f64 noise floor.
    np.testing.assert_allclose(
        float(s2.final_cost), float(s1.final_cost), rtol=1e-6, atol=1e-18
    )


def test_public_entry_mesh_free_intrinsics(rng):
    """The mesh path must also cover the default (free-intrinsics) config,
    which routes to the rowchunk iterative kernel under GSPMD sharding."""
    import dataclasses

    from pytheiasfm_tpu.ba import BundleAdjustmentOptions
    from pytheiasfm_tpu.ba.entry import bundle_adjust_partial_reconstruction
    from pytheiasfm_tpu.models.intrinsics import OptimizeIntrinsicsType as OI
    from pytheiasfm_tpu.utils.synthetic import random_reconstruction

    def scene():
        r = random_reconstruction(num_views=10, num_tracks=120, seed=5)
        r.view_group[:] = 0
        r.intrinsics = r.intrinsics[:1]
        r.group_model = r.group_model[:1]
        r.view_extrinsics[2:] += rng.standard_normal((8, 6)) * 0.01
        r.intrinsics[0, 0] *= 1.03
        return r

    free = (list(range(2, 10)), list(range(120)))
    base = BundleAdjustmentOptions(
        max_num_iterations=30, intrinsics_to_optimize=OI.FOCAL_LENGTH
    )
    r1, r2 = scene(), scene()
    s1 = bundle_adjust_partial_reconstruction(base, *free, r1)
    s2 = bundle_adjust_partial_reconstruction(
        dataclasses.replace(base, mesh=make_mesh(8)), *free, r2
    )
    assert bool(s1.success) and bool(s2.success)
    np.testing.assert_allclose(
        float(r2.intrinsics[0, 0]), float(r1.intrinsics[0, 0]), rtol=1e-6
    )


def test_global_estimator_on_mesh(rng):
    """Estimator-level multi-device run: the full global pipeline with
    `ReconstructionEstimatorOptions.mesh` set, on the 8-device CPU mesh."""
    from pytheiasfm_tpu.pipelines import synthetic_global as sg
    from pytheiasfm_tpu.sfm.estimator_options import (
        ReconstructionEstimatorOptions,
        ReconstructionEstimatorType,
    )
    from pytheiasfm_tpu.sfm.reconstruction_estimator import (
        create_reconstruction_estimator,
    )
    from pytheiasfm_tpu.transforms.alignment import align_point_clouds_umeyama

    recon, graph, gt_positions = sg.build_scene(
        V=24, T=900, obs_per_track=6, neighborhood=8, seed=4,
        min_shared_tracks=10,
    )
    options = ReconstructionEstimatorOptions(
        reconstruction_estimator_type=ReconstructionEstimatorType.GLOBAL,
        mesh=make_mesh(8),
        max_num_iterations=30,
    )
    estimator = create_reconstruction_estimator(options)
    summary = estimator.estimate(graph, recon)
    assert summary.success
    est_ids = [v for v in range(recon.num_views()) if recon.view_estimated[v]]
    assert len(est_ids) >= 20
    est = recon.view_extrinsics[est_ids, :3]
    gt = gt_positions[est_ids]
    Ra, ta, s = align_point_clouds_umeyama(est, gt)
    aligned = s * est @ np.asarray(Ra).T + np.asarray(ta)
    err = np.linalg.norm(aligned - gt, axis=-1)
    assert np.median(err) < 0.05, np.median(err)


def test_rotation_averaging_sharded_edges_matches_single_device(rng):
    """Robust rotation averaging with the edge axis sharded over the mesh
    must reproduce the single-device trajectory: the masked padding makes
    the padded operator EXACTLY the unpadded one (rotation_estimator.py
    `edge_mask`), so agreement is to f64 reduction-order noise only."""
    import sys
    sys.path.insert(0, "tests")
    from test_global_pose import make_scene, rotation_error_deg

    from pytheiasfm_tpu import global_pose as gp

    gt_aa, _, graph = make_scene(30, 180, 0.5, 0.01, rng)
    est_single = gp.estimate_rotations(graph)
    est_mesh = gp.estimate_rotations(graph, mesh=make_mesh(8))
    assert set(est_single) == set(est_mesh)
    for v in est_single:
        np.testing.assert_allclose(
            est_mesh[v], est_single[v], rtol=1e-6, atol=1e-8
        )
    assert rotation_error_deg(gt_aa, est_mesh) < 1.5


def test_position_estimation_sharded_edges_matches_single_device(rng):
    """LUD positions with the edge axis sharded: padded edges carry
    t_world = 0 / i = j / mask False, so the sharded ADMM trajectory
    matches single-device bit-for-bit up to reduction order."""
    import sys
    sys.path.insert(0, "tests")
    from test_global_pose import make_scene, position_error

    from pytheiasfm_tpu import global_pose as gp

    gt_aa, gt_pos, graph = make_scene(30, 180, 0.0, 0.02, rng)
    orient = {i: gt_aa[i] for i in range(30)}
    est_single = gp.estimate_positions(graph, orient)
    est_mesh = gp.estimate_positions(graph, orient, mesh=make_mesh(8))
    assert set(est_single) == set(est_mesh)
    for v in est_single:
        np.testing.assert_allclose(
            est_mesh[v], est_single[v], rtol=1e-6, atol=1e-8
        )
    scale = np.linalg.norm(gt_pos - gt_pos.mean(0), axis=-1).mean()
    assert position_error(gt_pos, est_mesh) < 0.05 * scale


def test_triangulation_sharded_tracks_matches_single_device():
    """Track-axis-sharded triangulation (TrackEstimatorOptions.mesh) must
    triangulate the same tracks to the same points."""
    import copy

    from pytheiasfm_tpu.sfm.track_estimator import (
        TrackEstimatorOptions,
        estimate_all_tracks,
    )
    from pytheiasfm_tpu.utils.synthetic import random_reconstruction

    base = random_reconstruction(num_views=8, num_tracks=150, seed=3)
    base.track_estimated[:] = False
    base.points[:] = 0.0

    r1 = copy.deepcopy(base)
    r2 = copy.deepcopy(base)
    s1 = estimate_all_tracks(r1, TrackEstimatorOptions())
    s2 = estimate_all_tracks(r2, TrackEstimatorOptions(mesh=make_mesh(8)))
    assert s1.estimated_tracks == s2.estimated_tracks
    assert len(s1.estimated_tracks) > 100
    np.testing.assert_allclose(r2.points, r1.points, rtol=1e-6, atol=1e-9)
