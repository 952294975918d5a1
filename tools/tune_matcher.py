"""Sweep Pallas matcher tile configurations on the real TPU."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from pytheiasfm_tpu.matching.brute_force import match_descriptors_batch
from pytheiasfm_tpu.matching.pallas_matcher import match_descriptors_batch_pallas


def main():
    n_desc, dim, pairs = 4096, 128, 8
    rng = np.random.default_rng(0)
    d1 = rng.normal(size=(pairs, n_desc, dim)).astype(np.float32)
    d2 = rng.normal(size=(pairs, n_desc, dim)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    d1, d2 = jnp.asarray(d1), jnp.asarray(d2)
    m = jnp.ones((pairs, n_desc), bool)
    ratio = jnp.asarray(0.8, jnp.float32)

    def timed(fn, reps=10):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    flop = pairs * 2.0 * n_desc * n_desc * dim

    dt = timed(lambda: match_descriptors_batch(d1, d2, m, m, ratio))
    print(f"XLA baseline: {pairs/dt:9.1f} pairs/s  {flop/dt/1e12:6.2f} TF/s", flush=True)

    for ti, tj in [(256, 512), (256, 1024), (512, 1024), (256, 2048),
                   (512, 2048), (256, 4096), (512, 4096), (1024, 4096)]:
        try:
            dt = timed(
                lambda ti=ti, tj=tj: match_descriptors_batch_pallas(
                    d1, d2, m, m, ratio, tile_i=ti, tile_j=tj
                )
            )
            print(
                f"pallas ti={ti:5d} tj={tj:5d}: {pairs/dt:9.1f} pairs/s "
                f"{flop/dt/1e12:6.2f} TF/s",
                flush=True,
            )
        except Exception as e:
            print(f"pallas ti={ti} tj={tj}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
