"""Candidate-pair selection from global image descriptors.

Re-design of `/root/reference/src/theia/matching/graph_match.{h,cc}`
(`graph_match.h:63-66`): build a k-NN graph over global descriptors and
emit the union of (i, neighbor) pairs. The all-pairs similarity is one
matmul; k-NN is a top-k reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["graph_match"]


def graph_match(
    global_descriptors: np.ndarray,  # [V, D]
    num_nearest_neighbors: int = 10,
) -> list[tuple[int, int]]:
    """Parity: `theia::GraphMatch` (`graph_match.h:63`). Returns the sorted
    unique candidate pairs (i < j)."""
    x = jnp.asarray(np.asarray(global_descriptors, np.float32))
    V = x.shape[0]
    k = min(num_nearest_neighbors, V - 1)
    if k <= 0:
        return []
    sq = jnp.sum(x * x, axis=-1)
    dist = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    dist = dist + jnp.diag(jnp.full((V,), jnp.inf, dist.dtype))
    _, idx = jax.lax.top_k(-dist, k)  # [V, k]
    idx = np.asarray(idx)
    pairs = set()
    for i in range(V):
        for j in idx[i]:
            a, b = (i, int(j)) if i < j else (int(j), i)
            if a != b:
                pairs.add((a, b))
    return sorted(pairs)
