"""Test config: force CPU backend with 8 virtual devices so sharding tests
run without TPU hardware. The axon site hook pre-imports jax, so the platform
must be switched via jax.config (env var alone is too late)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the full suite compiles hundreds of programs;
# a cold XLA:CPU compile deep into the run has segfaulted before
# (accumulated compiler state — test_quantized passes in isolation).
# Caching makes reruns skip almost all compiles.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
