"""Test config: force CPU backend with 8 virtual devices so sharding tests
run without TPU hardware. The axon site hook pre-imports jax, so the platform
must be switched via jax.config (env var alone is too late)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
