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
