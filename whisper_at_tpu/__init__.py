"""whisper_at_tpu: TPU-native Whisper-AT — joint ASR + audio tagging on JAX/XLA.

Drop-in public API parity with the reference `whisper_at` package
(whisper_at/__init__.py): `load_model`, `available_models`, `transcribe`,
`decode`, `detect_language`, `parse_at_label`, plus this package's
`build_model` for random-initialized models of any official size.
"""

import os
import urllib.error
import urllib.request
from typing import List, Optional, Union

import jax.numpy as jnp
from tqdm import tqdm

from .audio import (
    load_audio,
    log_mel_spectrogram,
    pad_or_trim,
    prefetch_audio,
    prefetch_audio_many,
)
from .decoding import DecodingOptions, DecodingResult, decode, detect_language
from .models.dims import ModelDimensions, dims_for
from .models.whisper import Whisper, build_model
from .serving import TranscriptionService
from .streaming import StreamingService, StreamingTranscriber
from .transcribe import transcribe, transcribe_batched, transcribe_many
from .at_post_processing import parse_at_label, print_label_name, print_support_language
from .registry import _ALIGNMENT_HEADS, _MODELS, _MODELS_AT
from .version import __version__

# bind the inference entry points as model methods (reference model.py:316-318)
Whisper.detect_language = detect_language
Whisper.decode = decode
Whisper.transcribe = transcribe


def available_models() -> List[str]:
    """Names of the available official models."""
    return list(_MODELS.keys())


def _sha256_from_url(url: str) -> Optional[str]:
    """The official Whisper URLs embed the file's sha256 as a path segment
    (registry.py); the TL-TR head URLs do not. Returns the hex digest or
    None when the URL carries no checksum."""
    import re

    for segment in urllib.parse.urlparse(url).path.split("/"):
        if re.fullmatch(r"[0-9a-f]{64}", segment):
            return segment
    return None


def _download(url: str, root: str, in_memory: bool) -> Union[bytes, str]:
    """Download-with-cache, verifying the sha256 embedded in the URL path.

    The reference ships this check commented out (whisper_at/__init__.py:
    70-112), so a corrupted cache file surfaces as an opaque torch
    deserialization error. Here: a FRESH download that does not match the
    URL's digest is deleted and raises; a CACHED file that does not match
    is re-downloaded by default (corruption is the common cause), falling
    back to the cached bytes with a warning when the network is unreachable
    (offline use of an intentional local substitute keeps working). Set
    WHISPER_AT_TPU_KEEP_MISMATCHED_CACHE=1 to keep a mismatching cache
    without the re-download attempt — a locally-substituted checkpoint under
    an official name (the same case the alignment-heads fallback in
    load_model tolerates).
    """
    import hashlib
    import warnings

    os.makedirs(root, exist_ok=True)

    parsed_url = urllib.parse.urlparse(url).path
    download_target = os.path.join(root, os.path.basename(parsed_url))
    expected_sha256 = _sha256_from_url(url)

    if os.path.exists(download_target) and not os.path.isfile(download_target):
        raise RuntimeError(f"{download_target} exists and is not a regular file")

    if os.path.isfile(download_target):
        with open(download_target, "rb") as f:
            model_bytes = f.read()
        mismatched = False
        if expected_sha256 is not None:
            actual = hashlib.sha256(model_bytes).hexdigest()
            if actual != expected_sha256:
                mismatched = True
                if os.environ.get("WHISPER_AT_TPU_KEEP_MISMATCHED_CACHE"):
                    warnings.warn(
                        f"cached checkpoint {download_target} has sha256 "
                        f"{actual[:12]}..., expected "
                        f"{expected_sha256[:12]}... from its download URL; "
                        "keeping it because "
                        "WHISPER_AT_TPU_KEEP_MISMATCHED_CACHE is set.",
                        stacklevel=2,
                    )
                    mismatched = False
                else:
                    warnings.warn(
                        f"cached checkpoint {download_target} has sha256 "
                        f"{actual[:12]}..., expected "
                        f"{expected_sha256[:12]}... from its download URL; "
                        "re-downloading (set "
                        "WHISPER_AT_TPU_KEEP_MISMATCHED_CACHE=1 to keep an "
                        "intentional local substitute).",
                        stacklevel=2,
                    )
        if not mismatched:
            return model_bytes if in_memory else download_target
        try:
            return _download_fresh(url, download_target, expected_sha256,
                                   in_memory)
        except (urllib.error.URLError, OSError):
            # network unreachable — the mismatching cache is all we have;
            # it may be an intentional offline substitute, so use it.
            with open(download_target, "wb") as f:
                f.write(model_bytes)
            warnings.warn(
                f"re-download of {download_target} failed (network "
                "unreachable); using the mismatching cached file.",
                stacklevel=2,
            )
            return model_bytes if in_memory else download_target
    return _download_fresh(url, download_target, expected_sha256, in_memory)


def _download_fresh(url: str, download_target: str,
                    expected_sha256: Optional[str],
                    in_memory: bool) -> Union[bytes, str]:
    """Stream `url` to `download_target`, verifying sha256 as bytes arrive;
    a mismatching transfer is deleted and raises (never cached)."""
    import hashlib

    hasher = hashlib.sha256()
    with urllib.request.urlopen(url) as source, open(download_target, "wb") as output:
        with tqdm(
            total=int(source.info().get("Content-Length")),
            ncols=80,
            unit="iB",
            unit_scale=True,
            unit_divisor=1024,
        ) as loop:
            while True:
                buffer = source.read(8192)
                if not buffer:
                    break
                output.write(buffer)
                hasher.update(buffer)
                loop.update(len(buffer))

    if expected_sha256 is not None and hasher.hexdigest() != expected_sha256:
        os.remove(download_target)
        raise RuntimeError(
            f"downloaded checkpoint from {url} has sha256 "
            f"{hasher.hexdigest()[:12]}..., expected "
            f"{expected_sha256[:12]}...; the transfer is corrupted — "
            "please retry."
        )

    model_bytes = open(download_target, "rb").read()
    return model_bytes if in_memory else download_target


def load_model(
    name: str,
    device=None,
    download_root: Optional[str] = None,
    in_memory: bool = False,
    at_low_compute: bool = False,
    dtype=None,
    at_checkpoint: Optional[str] = None,
) -> Whisper:
    """Load a Whisper-AT model (whisper_at/__init__.py:120-196 semantics).

    name: an official model name, a local Whisper `.pt` path, or a native
    `.npz` checkpoint saved with checkpoint.save_params.
    at_checkpoint: optional local TL-TR head `.pth` path, merged when `name`
    is a local `.pt` (official names download the matching head; a lone `.pt`
    without a head gets a random head + warning — ASR-only).
    dtype: parameter storage dtype; defaults to bfloat16 (TPU-native half).
    `device` is accepted for API parity and ignored (JAX places arrays).
    """
    from .checkpoint import load_params, load_torch_checkpoint

    if dtype is None:
        dtype = jnp.bfloat16

    if download_root is None:
        default = os.path.join(os.path.expanduser("~"), ".cache")
        download_root = os.path.join(os.getenv("XDG_CACHE_HOME", default), "whisper")

    # low-dim projection heads only exist for large/medium/small
    at_mdl_name = name + "_low" if at_low_compute else name

    alignment_heads = None
    if name in _MODELS:
        checkpoint_file = _download(_MODELS[name], download_root, in_memory)
        checkpoint_file_at = _download(_MODELS_AT[at_mdl_name], download_root, in_memory)
        alignment_heads = _ALIGNMENT_HEADS[name]
        dims, params = load_torch_checkpoint(
            checkpoint_file, checkpoint_file_at, at_low_compute, dtype
        )
    elif os.path.isfile(name) and name.endswith(".npz"):
        dims, params = load_params(name, dtype)
        if dims is None:
            raise RuntimeError(f"{name} does not embed model dimensions")
    elif os.path.isfile(name):
        dims, params = load_torch_checkpoint(
            name, at_checkpoint, at_low_compute, dtype
        )
    else:
        raise RuntimeError(
            f"Model {name} not found; available models = {available_models()}"
        )

    model = Whisper(dims, at_low_compute=at_low_compute, params=params,
                    storage_dtype=dtype)
    if alignment_heads is not None:
        try:
            model.set_alignment_heads(alignment_heads)
        except ValueError:
            # a locally-substituted checkpoint under an official name whose
            # dims differ from the release: keep the default head mask
            import warnings

            warnings.warn(
                f"registry alignment heads for {name!r} do not match the "
                "checkpoint's dims; using the default (last half of "
                "decoder layers)", stacklevel=2,
            )
    return model
