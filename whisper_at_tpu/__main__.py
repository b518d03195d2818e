from .cli import cli  # cli() pins JAX_PLATFORMS before backend init

cli()
