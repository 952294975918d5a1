"""Persistent XLA compilation cache.

The reference is a C++ library: its "compile time" is paid once at build.
A JAX pipeline pays it at trace time on every fresh process — through the
TPU tunnel a single kernel compile is 20-40 s, so an 11-image fountain run
was spending ~95% of its wall-clock compiling, not computing. Enabling
JAX's persistent compilation cache amortizes that across runs: the second
invocation of any pipeline hits the on-disk cache and runs at device speed.

Call `enable_persistent_cache()` once, before the first jitted call, from
any driver (tools/, bench.py). Library code does not call it implicitly —
opting into on-disk state is the application's decision.
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Enable the on-disk XLA compilation cache. Returns the cache dir."""
    import jax

    path = cache_dir or os.environ.get("PYTHEIASFM_TPU_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything that took meaningful compile time; the default
    # (1 s minimum) already covers the expensive kernels, but over the TPU
    # tunnel even small programs are worth keeping.
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    return path
