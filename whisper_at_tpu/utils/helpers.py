"""Small host-side helpers shared across the package.

Behavioral parity with the reference utilities (whisper_at/utils.py:10-68):
`exact_div`, zlib `compression_ratio`, SRT/VTT `format_timestamp`, and the
argparse coercion helpers used by the CLI.
"""

import sys
import zlib

system_encoding = sys.getdefaultencoding()


def make_safe(string: str) -> str:
    """Replace characters not representable in the system encoding with '?'."""
    if system_encoding == "utf-8":
        return string
    return string.encode(system_encoding, errors="replace").decode(system_encoding)


def exact_div(x: int, y: int) -> int:
    assert x % y == 0
    return x // y


def str2bool(string: str) -> bool:
    str2val = {"True": True, "False": False}
    if string in str2val:
        return str2val[string]
    raise ValueError(f"Expected one of {set(str2val.keys())}, got {string}")


def optional_int(string: str):
    return None if string == "None" else int(string)


def optional_float(string: str):
    return None if string == "None" else float(string)


def compression_ratio(text: str) -> float:
    """zlib compression ratio of the UTF-8 text; >2.4 flags degenerate loops."""
    text_bytes = text.encode("utf-8")
    return len(text_bytes) / len(zlib.compress(text_bytes))


def format_timestamp(
    seconds: float, always_include_hours: bool = False, decimal_marker: str = "."
) -> str:
    assert seconds >= 0, "non-negative timestamp expected"
    milliseconds = round(seconds * 1000.0)

    hours = milliseconds // 3_600_000
    milliseconds -= hours * 3_600_000

    minutes = milliseconds // 60_000
    milliseconds -= minutes * 60_000

    seconds = milliseconds // 1_000
    milliseconds -= seconds * 1_000

    hours_marker = f"{hours:02d}:" if always_include_hours or hours > 0 else ""
    return (
        f"{hours_marker}{minutes:02d}:{seconds:02d}{decimal_marker}{milliseconds:03d}"
    )


def honor_jax_platforms_env() -> None:
    """Make an explicit JAX_PLATFORMS env request effective under TPU
    plugins that override the env var during backend init (e.g. the axon
    plugin): a jax.config pin before the backend initializes always wins.
    Call at the top of every process entry point (CLI, train main) —
    harmless after backend init if the platform already matches."""
    import os

    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        try:
            jax.config.update("jax_platforms", platforms)
        except RuntimeError:
            pass  # backend already initialized; nothing to salvage
