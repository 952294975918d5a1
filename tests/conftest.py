"""Test configuration: run on an 8-device virtual CPU mesh with x64 enabled.

The driver runs benchmarks on real TPU hardware; tests validate numerics and
sharding on the CPU backend (per SURVEY.md §4: CPU-backend simulation of
multi-device meshes via XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel) and
# a sitecustomize imports jax at interpreter startup, so the env var is
# already cached — jax.config.update is the reliable override. Running the
# unit tests over the tunnel is pathologically slow and f64 is unsupported
# there.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    With 250+ tests in one process the CPU XLA compiler segfaulted
    deterministically around test ~195 (inside backend_compile_and_load;
    host RAM was fine) — accumulated compilation state. Each module's
    kernels are mostly disjoint, so clearing between modules costs little
    and keeps the compiler state bounded.
    """
    yield
    jax.clear_caches()
