"""Test config: force CPU backend with 8 virtual devices so sharding tests
run without TPU hardware. The axon site hook pre-imports jax, so the platform
must be switched via jax.config (env var alone is too late)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

# XLA:CPU JIT-loads several code mappings per compiled program; the full
# suite compiles ~1000 programs in one process and hits vm.max_map_count
# (default 65530) at a DETERMINISTIC test (~#95 — measured 65347 live maps
# at the crash): the kernel then fails mmap and LLVM segfaults or aborts
# mid-compile (or mid-cache-read). Raise the limit, best-effort (root).
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        _cur = int(_f.read())
    if _cur < 262144:
        with open("/proc/sys/vm/max_map_count", "w") as _f:
            _f.write("262144")
except (OSError, ValueError):
    pass

# Persistent compile cache: the full suite compiles hundreds of programs;
# caching makes reruns skip almost all compiles (and keeps the map count
# pressure lower on reruns).
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped on purpose: a shared stream makes every test's data
    # depend on which tests ran before it (order-dependent flakiness —
    # test_jl_tier_search measured recall .69 vs .73 purely by suite order)
    return np.random.default_rng(42)
