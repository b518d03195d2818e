"""Test environment: run JAX on CPU with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding tests use a virtual
8-device CPU mesh instead (set before jax import, as XLA reads these at
backend init).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
