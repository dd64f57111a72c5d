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

# Persistent compile cache: XLA compiles of the tiny-model scan/grad
# programs dominate the suite's wall time on this 1-core host; runs on the
# same machine hit the cache and skip them. The default is the repo's
# committed test cache (warmed by a full-suite run) so a fresh checkout's
# FIRST run is already warm; override with UAV_TEST_CACHE. Deliberately NOT
# .jax_cache (that one stays minimal — dryrun/bench programs only).
_cache = os.environ.get(
    "UAV_TEST_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".test_jax_cache"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
# Cache aggressively: the fast suite's wall time is dominated by hundreds of
# 1-5 s tiny-program compiles that a 5 s threshold would re-do every run.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
