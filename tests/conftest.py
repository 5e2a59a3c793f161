"""Test harness config: force an 8-device virtual CPU mesh before jax loads.

Tests never require the real TPU: multi-chip sharding paths run on
xla_force_host_platform_device_count=8 virtual CPU devices, per the project's
multi-chip validation strategy.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
