"""Tests: box QP, constrained L1, normalized graph cut, reservoir sampler.

Mirrors `math/qp_solver_test.cc`, `math/constrained_l1_solver_test.cc`,
`math/graph/normalized_graph_cut_test.cc`.
"""

import numpy as np
import jax.numpy as jnp

from pytheiasfm_tpu.math.qp import solve_box_qp, solve_constrained_l1
from pytheiasfm_tpu.math.graph import ReservoirSampler, normalized_graph_cut


def test_box_qp_matches_projection():
    # min 1/2||x - c||^2 s.t. box -> clipped c.
    rng = np.random.default_rng(51)
    n = 32
    c = rng.normal(size=n) * 3
    lower, upper = -np.ones(n), np.ones(n)
    q = jnp.asarray(-c)
    x = solve_box_qp(lambda v: v, q, jnp.asarray(lower), jnp.asarray(upper))
    assert np.abs(np.asarray(x) - np.clip(c, -1, 1)).max() < 1e-6


def test_box_qp_general_psd():
    rng = np.random.default_rng(52)
    n = 16
    A = rng.normal(size=(n, n))
    P = A @ A.T + np.eye(n)
    q = rng.normal(size=n)
    lower = np.full(n, -0.3)
    upper = np.full(n, 0.3)
    Pj = jnp.asarray(P)
    x = np.asarray(
        solve_box_qp(
            lambda v: Pj @ v, jnp.asarray(q), jnp.asarray(lower), jnp.asarray(upper),
            outer_iters=500,
        )
    )
    # KKT check: projected gradient is ~0.
    g = P @ x + q
    pg = np.clip(x - g, lower, upper) - x
    assert np.abs(pg).max() < 1e-4


def test_constrained_l1():
    # min ||x - b||_1 s.t. x >= h with h > b on some coords -> x = max(b, h).
    rng = np.random.default_rng(53)
    n = 24
    b = rng.normal(size=n)
    h = rng.normal(size=n) * 0.5
    x = np.asarray(
        solve_constrained_l1(
            lambda v: v, lambda v: v, jnp.asarray(b),
            lambda v: v, lambda v: v, jnp.asarray(h), n,
            outer_iters=400,
        )
    )
    expected = np.maximum(b, h)
    assert np.abs(x - expected).max() < 1e-3


def test_normalized_graph_cut_two_cliques():
    edges, w = [], []
    for a in range(6):
        for b in range(a + 1, 6):
            edges.append((a, b)); w.append(1.0)
    for a in range(6, 12):
        for b in range(a + 1, 12):
            edges.append((a, b)); w.append(1.0)
    edges.append((2, 8)); w.append(0.05)
    labels, val = normalized_graph_cut(np.array(edges), np.array(w), 12)
    assert len(set(labels[:6])) == 1 and len(set(labels[6:])) == 1
    assert labels[0] != labels[6]
    assert val < 0.05


def test_reservoir_sampler():
    rs = ReservoirSampler(5, seed=2)
    for i in range(1000):
        rs.add(i)
    s = rs.samples
    assert len(s) == 5 and all(0 <= v < 1000 for v in s)
