from .helpers import (
    compression_ratio,
    honor_jax_platforms_env,
    exact_div,
    format_timestamp,
    make_safe,
    optional_float,
    optional_int,
    str2bool,
)
from .writers import (
    ResultWriter,
    WriteJSON,
    WriteSRT,
    WriteTSV,
    WriteTXT,
    WriteVTT,
    get_writer,
)

__all__ = [
    "compression_ratio",
    "honor_jax_platforms_env",
    "exact_div",
    "format_timestamp",
    "make_safe",
    "optional_float",
    "optional_int",
    "str2bool",
    "ResultWriter",
    "WriteJSON",
    "WriteSRT",
    "WriteTSV",
    "WriteTXT",
    "WriteVTT",
    "get_writer",
]
