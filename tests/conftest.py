"""Test configuration: force CPU with 8 virtual devices for mesh tests.

The environment's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (TPU), so env vars set here are too late — but backends
initialize lazily, so jax.config.update still wins. XLA_FLAGS is read at
backend-init time and must be set before the first jax.devices() call.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
