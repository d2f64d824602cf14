"""Test configuration: force an 8-device virtual CPU mesh so data-parallel
sharding paths are exercised without TPU hardware.

Note: this environment's sitecustomize imports jax and pins
``JAX_PLATFORMS`` before conftest runs, so the platform must be overridden
through ``jax.config`` rather than the environment.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
