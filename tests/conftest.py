"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container pins JAX_PLATFORMS=axon (one real TPU chip); tests
override to CPU with 8 virtual devices so multi-chip sharding logic
(DP mesh, psum, collectives) is exercised in CI without TPU hardware.
Must run before any backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compile cache: the suite is dominated by XLA-CPU compiles of
# the big GSPMD graphs (cascade train step, mesh train step); caching them
# makes habitual re-runs fast while a cold run still validates compilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
