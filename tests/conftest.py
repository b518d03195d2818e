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

# Persistent compile cache: the suite compiles hundreds of CPU programs;
# caching them across runs (and across the module-boundary cache clears
# below) cuts suite latency and makes recompiles ~free.
try:
    _cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound the in-process count of live compiled CPU executables.

    A full-suite run accumulates every module's jitted programs in memory
    and XLA:CPU's JIT deterministically segfaulted inside
    backend_compile at the same mid-suite test (test_serving, 3/3 runs,
    2026-08-20) once enough programs were resident — while the same file
    passes standalone. Dropping executables at module boundaries keeps the
    live set near a single module's, and the persistent cache above makes
    the re-loads cheap.
    """
    jax.clear_caches()
    yield
