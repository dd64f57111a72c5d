"""Test configuration: force CPU with 8 virtual devices for mesh tests.

The container's sitecustomize registers the axon TPU plugin and overrides
``jax_platforms``, so setting the env var is not enough — we must also update
the jax config before any backend is used.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
