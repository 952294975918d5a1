"""Contraction-depth roofline sweep for the Pallas matcher matmul.

Measured on this machine's v5e (2026-08, matmul-only kernel, [N, D] x
[D, N] bf16 with the matcher's own block structure):

    D=128: ~30 TF/s    D=256: ~50 TF/s    D=512: ~78 TF/s

Throughput scales ~linearly with the contraction depth K: each output
element needs K MACs, and the MXU pipeline's output rate — not its MAC
rate — is the binding resource once K < ~512. At the matcher's D=128 the
*pure matmul* speed-of-light is therefore ~30 TF/s (~140 us per 4096x4096
pair), NOT the 197 TF/s bf16 nameplate; the shipped fused kernel measures
~19.5 TF/s = ~70% of that bound, the rest being the six exact top-2/argmin
VPU reductions (which double-buffered MXU/VPU pipelining variants did NOT
hide — measured three schedules, all within noise of the serial fusion).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, N = 8, 4096


def make(TI, TJ, D, semantics):
    def kern(d1_ref, d2t_ref, o1_ref, s1):
        p = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        nJ = pl.num_programs(2)
        prod = jax.lax.dot_general(
            d1_ref[0], d2t_ref[0], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        m = jnp.min(prod, axis=1)

        @pl.when(j == 0)
        def _():
            s1[:] = jnp.full((1, TI), 3.4e38, jnp.float32)

        s1[0] = jnp.minimum(s1[0], m)

        @pl.when(j == nJ - 1)
        def _():
            o1_ref[p, pl.ds(i * TI, TI)] = s1[0]

    @jax.jit
    def run(d1, d2t):
        grid = (P, N // TI, N // TJ)
        full = pl.BlockSpec((P, N), lambda p, i, j: (0, 0),
                            memory_space=pltpu.VMEM)
        cp = dict(vmem_limit_bytes=100 * 1024 * 1024)
        if semantics:
            cp["dimension_semantics"] = semantics
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, TI, D), lambda p, i, j: (p, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, TJ), lambda p, i, j: (p, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=full,
            out_shape=jax.ShapeDtypeStruct((P, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, TI), jnp.float32)],
            compiler_params=pltpu.CompilerParams(**cp),
        )(d1, d2t)

    return run


def timeit(fn, x, d2t, reps=30):
    @jax.jit
    def loop(x):
        def body(i, carry):
            acc, ax = carry
            out = fn(ax, d2t)
            s = jnp.sum(out)
            return acc + s, ax + 0.0 * s.astype(ax.dtype)
        return jax.lax.fori_loop(0, reps, body, (jnp.float32(0), x))[0]

    float(loop(x))
    t0 = time.perf_counter()
    float(loop(x))
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    for D in (128, 256, 512):
        d1 = jnp.asarray(
            rng.normal(size=(P, N, D)).astype(np.float32)
        ).astype(jnp.bfloat16)
        d2t = jnp.asarray(
            rng.normal(size=(P, D, N)).astype(np.float32)
        ).astype(jnp.bfloat16)
        flops = 2.0 * P * N * N * D
        for TI, TJ in [(512, 4096), (1024, 4096), (4096, 4096),
                       (2048, 2048)]:
            for sem in (None, ("parallel", "parallel", "arbitrary")):
                tag = "par" if sem else "arb"
                try:
                    dt = timeit(make(TI, TJ, D, sem), d1, d2t)
                    print(f"D={D:4d} TI={TI:5d} TJ={TJ:5d} {tag}: "
                          f"{flops / dt / 1e12:6.1f} TF/s  "
                          f"{dt * 1e6 / P:7.1f} us/pair")
                except Exception as e:
                    print(f"D={D:4d} TI={TI:5d} TJ={TJ:5d} {tag}: FAIL "
                          f"{str(e)[:80]}")


if __name__ == "__main__":
    main()
