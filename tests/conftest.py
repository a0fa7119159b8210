"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised on host via the CPU device-count
override; real-TPU benchmarking happens in bench.py, not here.

Note: the axon TPU-tunnel sitecustomize imports jax at interpreter start,
freezing JAX_PLATFORMS=axon into jax.config — so env vars set here are
too late. jax.config.update is the only reliable switch.
"""

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    # XLA:CPU's JIT accumulates loaded executables across a long pytest
    # session; around the ~37th large compile (the vortgrad3d OD=12
    # pairwise broadcast in direct_oracle) LLVM segfaults
    # deterministically — 5/5 runs, same test, passes in isolation.
    # Dropping executable references at module boundaries keeps the
    # resident JIT footprint bounded and costs only cross-module cache
    # hits (tests in different modules rarely share compiles).
    jax.clear_caches()
    yield
