"""Test configuration.

Tests run hermetically on CPU with a virtual 8-device platform so that
multi-chip sharding paths (mesh/pjit) are exercised without TPU hardware.
Must run before jax initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
