"""Pallas streaming descriptor matcher — the flagship TPU kernel.

The XLA matcher (`brute_force.py`) materializes the [N, N] squared-distance
matrix in HBM twice over (forward + transposed top-2), so at 4096x4096 it is
HBM-bandwidth-bound: 64 MB of distances written and re-read per direction
against only ~4 GFLOP of matmul. This kernel fuses the distance matmul with
BOTH direction top-2 reductions inside VMEM — flash-attention-style
streaming — so HBM traffic drops to the descriptors plus six [N] vectors
(~250x less). Measured on a v5e at 4096x4096x128-D, batch 8, with
on-device dependency-loop timing: ~17-20 TFLOP/s of distance matmul
(~4000+ image pairs/s, tiles 512x4096, bf16 descriptors) vs ~0.5 TFLOP/s
for the XLA path.

Roofline note (`tools/exp_matcher_roofline.py`): at K=128 contraction
depth the MXU's own output rate caps the PURE MATMUL at ~30 TF/s on v5e
(throughput scales linearly in K: 128->30, 256->50, 512->78 TF/s
measured), so the nameplate 197 TF/s is not the relevant bound for 128-D
descriptors. This kernel runs at ~70% of the K=128 bound; the remainder
is the six exact top-2/argmin VPU reductions, which MXU/VPU
double-buffered pipelining schedules did not hide (three schedules
measured, all within noise of this serial fusion).

Per grid step (pair p, row-tile i, col-tile j; j minor):
  1. dist tile [TI, TJ] = |d1|^2 + |d2|^2 - 2 d1 d2^T   (bf16 MXU matmul,
     f32 accumulation — same numerics as the XLA path)
  2. row-wise tile top-2 + argmin, merged into carried per-row accumulators
  3. col-wise tile top-2 + argmin, merged into carried per-column
     accumulators (scratch [N], reinitialized per pair)
  4. at the last j tile the row results are written; at the last (i, j)
     step the column results are written.

Lowe's ratio + symmetric cross-check run on the [P, N] outputs in XLA
(identical semantics to `brute_force.match_descriptor_pair`).

Reference behavior being accelerated:
`brute_force_feature_matcher.cc:48-107` + `feature_matcher_utils.h:45`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["match_descriptors_batch_pallas", "streaming_top2"]

_BIG = 3.4e38  # sentinel "infinity" that survives arithmetic (python float
# so the kernel closes over a compile-time constant, not a traced array)


def _tile_top2_rows(dist, col0, TJ):
    """Row-wise (m1, m2, arg1-global) of a [TI, TJ] tile."""
    m1 = jnp.min(dist, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    is_min = dist == m1[:, None]
    arg1 = jnp.min(jnp.where(is_min, cols, TJ), axis=1)
    masked = jnp.where(cols == arg1[:, None], _BIG, dist)
    m2 = jnp.min(masked, axis=1)
    return m1, m2, (arg1 + col0).astype(jnp.int32)


def _tile_top2_cols(dist, row0, TI):
    """Column-wise (m1, m2, arg1-global) of a [TI, TJ] tile — reduces over
    axis 0 directly so the tile is never transposed (a [TI, TJ] relayout
    per grid step was ~30% of the kernel's VPU time)."""
    m1 = jnp.min(dist, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 0)
    is_min = dist == m1[None, :]
    arg1 = jnp.min(jnp.where(is_min, rows, TI), axis=0)
    masked = jnp.where(rows == arg1[None, :], _BIG, dist)
    m2 = jnp.min(masked, axis=0)
    return m1, m2, (arg1 + row0).astype(jnp.int32)


def _merge_top2(b1, b2, a1, m1, m2, marg):
    """Merge carried (b1 <= b2, arg a1) with tile (m1 <= m2, arg marg)."""
    nb1 = jnp.minimum(b1, m1)
    na1 = jnp.where(m1 < b1, marg, a1)
    nb2 = jnp.minimum(jnp.maximum(b1, m1), jnp.minimum(b2, m2))
    return nb1, nb2, na1


def _matcher_kernel(
    d1_ref, d2t_ref, a1_ref, a2_ref,
    fb1_ref, fb2_ref, fa_ref, rb1_ref, rb2_ref, ra_ref,
    s_fb1, s_fb2, s_fa, s_rb1, s_rb2, s_ra,
):
    p = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nI = pl.num_programs(1)
    nJ = pl.num_programs(2)
    TI = d1_ref.shape[1]
    TJ = d2t_ref.shape[2]

    @pl.when(j == 0)
    def _():  # new row tile: reset forward accumulators
        s_fb1[:] = jnp.full((1, TI), _BIG, jnp.float32)
        s_fb2[:] = jnp.full((1, TI), _BIG, jnp.float32)
        s_fa[:] = jnp.zeros((1, TI), jnp.int32)

    @pl.when(i == 0)
    def _():  # new pair: reset this column slice of reverse accumulators
        s_rb1[0, pl.ds(j * TJ, TJ)] = jnp.full((TJ,), _BIG, jnp.float32)
        s_rb2[0, pl.ds(j * TJ, TJ)] = jnp.full((TJ,), _BIG, jnp.float32)
        s_ra[0, pl.ds(j * TJ, TJ)] = jnp.zeros((TJ,), jnp.int32)

    a1 = a1_ref[p, pl.ds(i * TI, TI)]
    a2 = a2_ref[p, pl.ds(j * TJ, TJ)]
    # d2 arrives pre-transposed [D, TJ] so the bf16 MXU matmul is a plain
    # ((1,),(0,)) contraction (Mosaic rejects rhs-contracted bf16 matmuls).
    # Descriptors arrive ALREADY bf16 (halves their HBM traffic).
    prod = jax.lax.dot_general(
        d1_ref[0],
        d2t_ref[0],
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )  # [TI, TJ]
    dist = jnp.maximum(a1[:, None] + a2[None, :] - 2.0 * prod, 0.0)
    # Mask sentinels need no extra pass: a1/a2 carry +BIG on masked rows,
    # and BIG + finite - 2ab stays ~BIG in f32 (the |2ab| term of unit
    # descriptors is O(1)), so masked entries dominate every comparison.

    # Forward (rows).
    m1, m2, marg = _tile_top2_rows(dist, j * TJ, TJ)
    nb1, nb2, na1 = _merge_top2(
        s_fb1[0], s_fb2[0], s_fa[0], m1, m2, marg
    )
    s_fb1[0] = nb1
    s_fb2[0] = nb2
    s_fa[0] = na1

    # Reverse (columns) — axis-0 reduction, no transpose.
    r1, r2, rarg = _tile_top2_cols(dist, i * TI, TI)
    ob1 = s_rb1[0, pl.ds(j * TJ, TJ)]
    ob2 = s_rb2[0, pl.ds(j * TJ, TJ)]
    oa = s_ra[0, pl.ds(j * TJ, TJ)]
    nb1, nb2, na1 = _merge_top2(ob1, ob2, oa, r1, r2, rarg)
    s_rb1[0, pl.ds(j * TJ, TJ)] = nb1
    s_rb2[0, pl.ds(j * TJ, TJ)] = nb2
    s_ra[0, pl.ds(j * TJ, TJ)] = na1

    @pl.when(j == nJ - 1)
    def _():  # row tile complete
        fb1_ref[p, pl.ds(i * TI, TI)] = s_fb1[0]
        fb2_ref[p, pl.ds(i * TI, TI)] = s_fb2[0]
        fa_ref[p, pl.ds(i * TI, TI)] = s_fa[0]

    @pl.when((i == nI - 1) & (j == nJ - 1))
    def _():  # pair complete: flush reverse accumulators
        rb1_ref[p, :] = s_rb1[0]
        rb2_ref[p, :] = s_rb2[0]
        ra_ref[p, :] = s_ra[0]


@functools.partial(
    jax.jit, static_argnames=("tile_i", "tile_j", "interpret")
)
def streaming_top2(
    d1, d2t, a1, a2, tile_i: int = 512, tile_j: int = 4096,
    interpret: bool = False,
):
    """Fused both-direction top-2 over squared-L2 distances.

    d1 [P, N, D], d2t [P, D, N] (D a multiple of 128, N a multiple of the
    tiles); a1/a2
    [P, N] = |d|^2 with +BIG on masked rows. Returns (fwd_best1, fwd_best2,
    fwd_arg [P, N] into d2, rev_best1, rev_best2, rev_arg [P, N] into d1).
    """
    P, N, D = d1.shape
    TI, TJ = min(tile_i, N), min(tile_j, N)
    del D
    D = d2t.shape[1]
    grid = (P, N // TI, N // TJ)
    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((P, N), f32),
        jax.ShapeDtypeStruct((P, N), f32),
        jax.ShapeDtypeStruct((P, N), jnp.int32),
        jax.ShapeDtypeStruct((P, N), f32),
        jax.ShapeDtypeStruct((P, N), f32),
        jax.ShapeDtypeStruct((P, N), jnp.int32),
    ]
    # a1/a2 and the six [P, N] outputs are tiny next to the descriptors, so
    # they ride as whole arrays in VMEM (TPU block tiling requires the last
    # two block dims be 8/128-divisible or full — (1, TI) blocks are not).
    full = pl.BlockSpec(
        (P, N), lambda p, i, j: (0, 0), memory_space=pltpu.VMEM
    )
    out_specs = [full] * 6
    return pl.pallas_call(
        _matcher_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, TI, D), lambda p, i, j: (p, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, D, TJ), lambda p, i, j: (p, 0, j),
                memory_space=pltpu.VMEM,
            ),
            full,
            full,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, TI), f32),
            pltpu.VMEM((1, TI), f32),
            pltpu.VMEM((1, TI), jnp.int32),
            pltpu.VMEM((1, N), f32),
            pltpu.VMEM((1, N), f32),
            pltpu.VMEM((1, N), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * P * N * N * D,
            bytes_accessed=P * (2 * N * D * 4 + 6 * N * 4),
            transcendentals=0,
        ),
    )(d1, d2t, a1, a2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "use_lowes_ratio", "keep_only_symmetric", "tile_i", "tile_j",
        "interpret",
    ),
)
def match_descriptors_batch_pallas(
    d1,  # [P, N, D]
    d2,  # [P, N, D]
    mask1,  # [P, N]
    mask2,  # [P, N]
    lowes_ratio,
    use_lowes_ratio: bool = True,
    keep_only_symmetric: bool = True,
    tile_i: int = 512,
    tile_j: int = 4096,
    interpret: bool = False,
):
    """Drop-in equivalent of `brute_force.match_descriptors_batch` running
    the fused streaming kernel. Returns (match_idx [P, N], distance [P, N]).

    Norms are computed in f32; descriptors are shipped to the kernel in
    bf16 (the same precision the MXU matmul uses either way), halving the
    dominant HBM traffic.
    """
    P, N, D = d1.shape
    Dp = -(-D // 128) * 128
    if Dp != D:
        pad = [(0, 0), (0, 0), (0, Dp - D)]
        d1 = jnp.pad(d1, pad)
        d2 = jnp.pad(d2, pad)
    d1 = d1.astype(jnp.float32)
    d2 = d2.astype(jnp.float32)
    a1 = jnp.sum(d1 * d1, axis=-1) + jnp.where(mask1, 0.0, _BIG)
    a2 = jnp.sum(d2 * d2, axis=-1) + jnp.where(mask2, 0.0, _BIG)

    fb1, fb2, fa, rb1, rb2, ra = streaming_top2(
        d1.astype(jnp.bfloat16),
        jnp.swapaxes(d2, 1, 2).astype(jnp.bfloat16),
        a1,
        a2,
        tile_i=tile_i,
        tile_j=tile_j,
        interpret=interpret,
    )

    ok = mask1 & (fb1 < _BIG / 2)
    if use_lowes_ratio:
        ratio2 = jnp.asarray(lowes_ratio, jnp.float32) ** 2
        ok &= fb1 < ratio2 * fb2
    if keep_only_symmetric:
        ok_r = rb1 < _BIG / 2
        if use_lowes_ratio:
            ok_r &= rb1 < ratio2 * rb2
        rows = jnp.arange(N)[None, :]
        sym = (
            jnp.take_along_axis(ra, fa, axis=1) == rows
        ) & jnp.take_along_axis(ok_r, fa, axis=1)
        ok &= sym
    return jnp.where(ok, fa, -1).astype(jnp.int32), fb1
