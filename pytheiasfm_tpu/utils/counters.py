"""Device-launch accounting.

Through this environment's TPU tunnel a synchronized dispatch costs
~170 ms of RPC latency, so pipeline wall-clock at small problem sizes
(fountain-11) is a LAUNCH-COUNT budget, not a FLOP budget. The hot paths
bump a named counter per device launch they issue; pipelines snapshot the
counters per phase to make regressions visible (VERDICT r3 #5: "no tracked
metric counts dispatches").

This counts the launches the framework issues deliberately (kernel
launches, chunk loops, batched solvers) — incidental jnp ops on host paths
are kept off the hot paths by design (see ops/rotation_np.py).
"""

from __future__ import annotations

from collections import Counter

__all__ = ["bump", "reset", "snapshot", "total"]

_counts: Counter = Counter()


def bump(name: str, n: int = 1) -> None:
    _counts[name] += n


def reset() -> None:
    _counts.clear()


def snapshot() -> dict:
    return dict(_counts)


def total() -> int:
    return sum(_counts.values())
