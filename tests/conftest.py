"""Test configuration.

Tests run hermetically on CPU with a virtual 8-device platform so that
multi-chip sharding paths (mesh/pjit) are exercised without TPU hardware.

Note: this environment's sitecustomize registers the TPU PJRT plugin and
overwrites ``jax_platforms`` at interpreter start, so setting the
JAX_PLATFORMS env var is not enough — the config must be updated after
import (backends have not initialized yet at conftest time).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated suite runs skip most XLA CPU
# compiles (the dominant cost of this suite).
_cache_dir = os.environ.get(
    "VOICE100_TPU_TEST_CACHE",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
