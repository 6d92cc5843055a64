"""Test config: run on CPU with a virtual 8-device mesh for sharding tests.

The container's sitecustomize force-registers the `axon` TPU platform, so the
JAX_PLATFORMS env var alone is not enough — we must update the jax config
before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the step program is large (CPU compiles run minutes); cache compilations
# across test runs/processes
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
