"""Test configuration: force CPU with 8 virtual devices for mesh tests.

Must set XLA flags before jax initializes; pytest imports conftest before
test modules, so this is the single chokepoint.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets axon (TPU); tests run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
