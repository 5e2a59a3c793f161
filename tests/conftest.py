"""Test harness config: force the CPU backend with an 8-device virtual mesh.

Tests never require the real TPU: multi-chip sharding paths run on
xla_force_host_platform_device_count=8 virtual CPU devices.  The environment's
sitecustomize registers the remote `axon` TPU platform and overrides
JAX_PLATFORMS at interpreter start (every op would round-trip through the
tunnel), so the platform must be forced via jax.config here, before any
backend initializes.  Set RSFD_TEST_TPU=1 to run the suite against the real
chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: amortizes CPU jit compiles across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402  (must configure before backends initialize)

if not os.environ.get("RSFD_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
