"""Host-side audio frontend: decode, pad/trim, and the public log-mel API.

Decode strategy (reference uses an ffmpeg subprocess, whisper_at/audio.py:26-63):
we try ffmpeg first for universal container support, and fall back to a
built-in WAV reader + polyphase resampler when ffmpeg is not installed, so the
framework has no hard native-binary dependency for the common PCM case.
"""

import shutil
import subprocess
import wave
from typing import Union

import numpy as np

from .ops.mel import (
    CHUNK_LENGTH,
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_MELS,
    N_SAMPLES,
    SAMPLE_RATE,
    PrefetchedAudio,
    log_mel_spectrogram_jax,
    mel_filters,
    prefetch_stft_input,
)
from .utils import exact_div

N_SAMPLES_PER_TOKEN = HOP_LENGTH * 2  # initial convolutions have stride 2
FRAMES_PER_SECOND = exact_div(SAMPLE_RATE, HOP_LENGTH)  # 10 ms per mel frame
TOKENS_PER_SECOND = exact_div(SAMPLE_RATE, N_SAMPLES_PER_TOKEN)  # 20 ms per token

__all__ = [
    "SAMPLE_RATE",
    "N_FFT",
    "N_MELS",
    "HOP_LENGTH",
    "CHUNK_LENGTH",
    "N_SAMPLES",
    "N_FRAMES",
    "N_SAMPLES_PER_TOKEN",
    "FRAMES_PER_SECOND",
    "TOKENS_PER_SECOND",
    "load_audio",
    "load_audio_pcm16",
    "pad_or_trim",
    "mel_filters",
    "log_mel_spectrogram",
    "PrefetchedAudio",
    "prefetch_audio",
    "prefetch_audio_many",
]


def _ffmpeg_pcm16(file: str, sr: int) -> np.ndarray:
    """Decode any container/codec to mono int16 PCM at `sr` Hz via ffmpeg.

    The single source of the ffmpeg command line: both the float32 and the
    int16 device-transfer paths decode through here, so the bit-exactness
    contract between them (float = int16 / 32768) cannot drift.
    """
    cmd = [
        "ffmpeg",
        "-nostdin",
        "-threads", "0",
        "-i", file,
        "-f", "s16le",
        "-ac", "1",
        "-acodec", "pcm_s16le",
        "-ar", str(sr),
        "-",
    ]
    try:
        out = subprocess.run(cmd, capture_output=True, check=True).stdout
    except subprocess.CalledProcessError as e:
        raise RuntimeError(f"Failed to load audio: {e.stderr.decode()}") from e
    return np.frombuffer(out, np.int16).flatten()


def _load_audio_ffmpeg(file: str, sr: int) -> np.ndarray:
    return _ffmpeg_pcm16(file, sr).astype(np.float32) / 32768.0


def _resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return x
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_sr, target_sr)
    return resample_poly(x, target_sr // g, orig_sr // g).astype(np.float32)


def _load_audio_wav(file: str, sr: int) -> np.ndarray:
    """Built-in PCM WAV decode (8/16/24/32-bit int and raw stream via `wave`)."""
    with wave.open(file, "rb") as wf:
        n_channels = wf.getnchannels()
        sampwidth = wf.getsampwidth()
        framerate = wf.getframerate()
        raw = wf.readframes(wf.getnframes())

    if sampwidth == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sampwidth == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif sampwidth == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        vals = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        x = vals.astype(np.float32) / float(1 << 23)
    elif sampwidth == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / float(1 << 31)
    else:
        raise RuntimeError(f"Unsupported WAV sample width: {sampwidth}")

    if n_channels > 1:
        x = x.reshape(-1, n_channels).mean(axis=1)
    return _resample(x, framerate, sr)


def load_audio(file: str, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Open an audio file as a mono float32 waveform at `sr` Hz.

    Uses the ffmpeg CLI when present (any container/codec); otherwise decodes
    PCM WAV natively. Matches the reference int16 -> float32/32768 scaling.
    """
    if shutil.which("ffmpeg") is not None:
        return _load_audio_ffmpeg(file, sr)
    if file.lower().endswith(".wav"):
        return _load_audio_wav(file, sr)
    raise RuntimeError(
        "ffmpeg is not installed and the built-in decoder only supports WAV; "
        f"cannot load {file!r}"
    )


def load_audio_pcm16(file: str, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Open an audio file as mono int16 PCM at `sr` Hz when losslessly
    possible, else fall back to `load_audio`'s float32.

    The mel frontend ships int16 waveforms to the device at half the bytes
    and dequantizes there (x / 32768) — bit-identical to loading float32,
    since both start from the same int16 decode. The transcribe paths use
    this internally for file inputs; the float32 `load_audio` remains the
    reference-parity public API.
    """
    if shutil.which("ffmpeg") is not None:
        return _ffmpeg_pcm16(file, sr)
    if file.lower().endswith(".wav"):
        with wave.open(file, "rb") as wf:
            if wf.getsampwidth() == 2 and wf.getnchannels() == 1 \
                    and wf.getframerate() == sr:
                return np.frombuffer(
                    wf.readframes(wf.getnframes()), np.int16
                ).flatten()
        return _load_audio_wav(file, sr)
    return load_audio(file, sr)


def pad_or_trim(array, length: int = N_SAMPLES, *, axis: int = -1):
    """Pad with zeros or trim the array to `length` along `axis`.

    Works on numpy and jax arrays alike (the reference's torch/numpy split,
    whisper_at/audio.py:66-89).
    """
    import jax.numpy as jnp

    is_jax = not isinstance(array, np.ndarray)
    xp = jnp if is_jax else np

    if array.shape[axis] > length:
        idx = [slice(None)] * array.ndim
        idx[axis] = slice(0, length)
        array = array[tuple(idx)]

    if array.shape[axis] < length:
        pad_widths = [(0, 0)] * array.ndim
        pad_widths[axis] = (0, length - array.shape[axis])
        array = xp.pad(array, pad_widths)

    return array


def log_mel_spectrogram(
    audio: Union[str, np.ndarray],
    n_mels: int = N_MELS,
    padding: int = 0,
):
    """Log-mel spectrogram of a waveform or audio file, shape [80, n_frames].

    Device-accelerated via the matmul-DFT kernel in ops/mel.py; semantics match
    the reference (whisper_at/audio.py:110-157).
    """
    assert n_mels == N_MELS, f"Unsupported n_mels: {n_mels}"
    if isinstance(audio, PrefetchedAudio):
        return log_mel_spectrogram_jax(audio, padding=padding)
    if isinstance(audio, str):
        # int16 when losslessly possible: halves the host->device waveform
        # transfer; the device dequant (x / 32768) reproduces load_audio's
        # float32 bit-for-bit
        audio = load_audio_pcm16(audio)
    return log_mel_spectrogram_jax(np.asarray(audio), padding=padding)


def prefetch_audio(
    audio: Union[str, np.ndarray],
    padding: int = N_SAMPLES,
) -> PrefetchedAudio:
    """Start a waveform's host->device transfer NOW, without blocking.

    Returns a PrefetchedAudio accepted by `transcribe`, `transcribe_batched`,
    `transcribe_many`, and `log_mel_spectrogram` in place of the waveform.
    The `jax.device_put` dispatch returns in milliseconds while the transfer
    proceeds concurrently with whatever device work is already in flight —
    a serving loop prefetches request i+1 while request i decodes, hiding
    the audio transfer entirely (the transfer is the dominant mel-stage cost
    over a tunneled TPU). `padding` defaults to the 30 s tail the transcribe
    paths use; pass padding=0 to mirror bare `log_mel_spectrogram` calls.
    """
    if isinstance(audio, str):
        audio = load_audio_pcm16(audio)
    return prefetch_stft_input(np.asarray(audio), padding=padding)


def prefetch_audio_many(
    audios,
    padding: int = N_SAMPLES,
    workers: int = 8,
) -> list:
    """Decode + prep + dispatch MANY inputs concurrently (serving helper).

    ffmpeg decode (a subprocess) and the STFT host prep (numpy) both
    release the GIL, so a thread pool overlaps them across files, and each
    file's host->device transfer dispatches the moment its prep finishes
    instead of after every earlier file's. Returns PrefetchedAudio objects
    in input order — feed them straight to `transcribe_many`:

        results = transcribe_many(model, prefetch_audio_many(paths))
    """
    from concurrent.futures import ThreadPoolExecutor

    if not audios:
        return []
    with ThreadPoolExecutor(max_workers=min(workers, len(audios))) as ex:
        return list(ex.map(lambda a: prefetch_audio(a, padding), audios))
