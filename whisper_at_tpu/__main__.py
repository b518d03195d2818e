import os

# Honor an explicit JAX_PLATFORMS request (e.g. JAX_PLATFORMS=cpu for an
# offline run) even under TPU plugins that override the env var during
# backend init: a jax.config pin before the backend initializes always wins.
_platforms = os.environ.get("JAX_PLATFORMS")
if _platforms:
    import jax

    jax.config.update("jax_platforms", _platforms)

from .cli import cli  # noqa: E402

cli()
