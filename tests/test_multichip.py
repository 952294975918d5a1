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
