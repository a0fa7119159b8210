"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised on host via the CPU device-count
override; real-TPU benchmarking happens in bench.py, not here.

Note: the axon TPU-tunnel sitecustomize imports jax at interpreter start,
freezing JAX_PLATFORMS=axon into jax.config — so env vars set here are
too late. jax.config.update is the only reliable switch.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
