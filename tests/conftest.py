"""Test configuration.

Tests run hermetically on CPU with a virtual 8-device platform so that
multi-chip sharding paths (mesh/pjit) are exercised without TPU hardware.

Note: this environment's sitecustomize registers the TPU PJRT plugin and
overwrites ``jax_platforms`` at interpreter start, so setting the
JAX_PLATFORMS env var is not enough — the config must be updated after
import (backends have not initialized yet at conftest time).
"""

import os

# Coarse collate buckets: every dummy-corpus batch (clips 0.4-1.2 s,
# texts <= 48 tokens) lands in ONE padded shape, so each fit compiles a
# single train step instead of one per bucket — and the shape is
# identical across tests, so the persistent cache hits across the suite.
# 128 stays a multiple of 64 for the bucketing assertions in test_data.
os.environ.setdefault("VOICE100_TPU_TIME_BUCKET", "128")
os.environ.setdefault("VOICE100_TPU_TEXT_BUCKET", "48")

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
# Stale entries accumulate as tests evolve (nothing evicts them);
# evict the OLDEST entries when the cache outgrows a sane bound so CI
# artifact sync doesn't erode the compile-time savings. Eviction (not
# a wipe) keeps concurrent pytest processes sharing the dir from
# deleting entries a sibling is actively writing.
if os.path.isdir(_cache_dir):
    _entries = [
        (e.stat().st_mtime, e.stat().st_size, e.path)
        for e in os.scandir(_cache_dir) if e.is_file()
    ]
    _size = sum(s for _, s, _ in _entries)
    if _size > 500 * 1024 * 1024:
        for _, s, p in sorted(_entries):
            try:
                os.unlink(p)
            except OSError:
                continue
            _size -= s
            if _size <= 400 * 1024 * 1024:
                break

jax.config.update("jax_compilation_cache_dir", _cache_dir)
# persist even sub-millisecond compiles: a suite run dispatches
# thousands of tiny eager programs, and loading beats recompiling
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
