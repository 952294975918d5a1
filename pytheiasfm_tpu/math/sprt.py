"""Sequential probability ratio test for preemptive RANSAC verification.

Re-design of `/root/reference/src/theia/math/probability/
sequential_probability_ratio.h:51-65` (Matas & Chum SPRT). Pure functions;
the batched RANSAC engine consumes the decision threshold to mask out
hypotheses that fail early.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "calculate_sprt_decision_threshold",
    "sequential_probability_ratio_test",
]


def calculate_sprt_decision_threshold(
    sigma: float, epsilon: float, time_compute_model_ratio: float = 200.0,
    num_models_verified: int = 1,
):
    """Optimal SPRT decision threshold A* (Wald), parity with
    `CalculateSPRTDecisionThreshold` (`sequential_probability_ratio.h:51`)."""
    c = (1.0 - sigma) * jnp.log((1.0 - sigma) / (1.0 - epsilon)) + sigma * jnp.log(
        sigma / epsilon
    )
    a0 = time_compute_model_ratio * c / num_models_verified + 1.0

    def body(a):
        return a0 + jnp.log(a)

    a = a0
    for _ in range(10):
        a = body(a)
    return a


def sequential_probability_ratio_test(
    inlier_flags, sigma, epsilon, decision_threshold
):
    """Run the SPRT over a (batched) boolean inlier sequence.

    Returns (passed, observed_inlier_ratio). Vectorized form: the likelihood
    product is a cumulative product along the last axis; the test fails if
    it ever exceeds the decision threshold
    (`sequential_probability_ratio.h:65`).
    """
    flags = inlier_flags.astype(jnp.float32)
    ratio_in = sigma / epsilon
    ratio_out = (1.0 - sigma) / (1.0 - epsilon)
    log_lr = flags * jnp.log(ratio_in) + (1.0 - flags) * jnp.log(ratio_out)
    cum = jnp.cumsum(log_lr, axis=-1)
    passed = jnp.max(cum, axis=-1) < jnp.log(decision_threshold)
    observed = jnp.mean(flags, axis=-1)
    return passed, observed
