"""Test environment: run JAX on CPU with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding tests use a virtual
8-device CPU mesh instead. Note: the axon TPU plugin overrides the
JAX_PLATFORMS env var, so the platform must be pinned via jax.config before
the backend initializes (XLA_FLAGS still must be set pre-import).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
