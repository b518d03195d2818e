"""Log-mel spectrogram as a fused matmul chain (TPU-native STFT).

The reference computes mel via torch.stft + cuFFT (whisper_at/audio.py:110-157).
On TPU we avoid the FFT op entirely: with N_FFT=400 (not a power of two) the
best mapping to the MXU is a windowed real-DFT as two dense matmuls,

    Re = frames @ (hann * cos)   [n_frames, 400] x [400, 201]
    Im = frames @ (hann * sin)
    power = Re^2 + Im^2
    mel   = power @ mel_fb.T     [n_frames, 201] x [201, 80]

followed by the reference's log10 / clamp / dynamic-range / affine chain.
The Hann window folds into the DFT matrices, framing is pure reshape+slice
(no gather), and XLA fuses the elementwise tail into the matmuls. Per 30 s
window this is ~1 GFLOP - noise next to the encoder.

Frame semantics match torch.stft(center=True, pad_mode='reflect'): the caller
reflect-pads 200 samples on the left edge of the whole signal; blocks are then
processed with a 240-sample lookahead so block boundaries are seamless.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
N_MELS = 80
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000 samples / 30 s
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000 mel frames / 30 s

_ASSETS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")


@functools.lru_cache(maxsize=None)
def mel_filters(n_mels: int = N_MELS) -> np.ndarray:
    """The 80-bin librosa mel filterbank shipped as a data asset, [80, 201]."""
    assert n_mels == 80, f"Unsupported n_mels: {n_mels}"
    with np.load(os.path.join(_ASSETS, "mel_filters.npz")) as f:
        return f[f"mel_{n_mels}"].astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_matrices() -> tuple:
    """Windowed real-DFT analysis matrices, each [N_FFT, N_FFT//2 + 1]."""
    n = np.arange(N_FFT)[:, None]  # [400, 1]
    k = np.arange(N_FFT // 2 + 1)[None, :]  # [1, 201]
    angle = 2.0 * np.pi * n * k / N_FFT
    # periodic Hann, identical to torch.hann_window(N_FFT)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(N_FFT) / N_FFT))
    cos_m = (window[:, None] * np.cos(angle)).astype(np.float32)
    sin_m = (window[:, None] * np.sin(angle)).astype(np.float32)
    return cos_m, sin_m


def _frame_signal(x: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """Extract overlapping [n_frames, N_FFT] frames at HOP_LENGTH stride.

    Pure reshape + slice + concat: frame t = x[160*t : 160*t + 400], built from
    three shifted views of x reshaped to 160-sample chunks. Requires
    len(x) >= (n_frames + 2) * HOP_LENGTH.
    """
    n_chunks = n_frames + 2
    c = x[: n_chunks * HOP_LENGTH].reshape(n_chunks, HOP_LENGTH)
    return jnp.concatenate(
        [c[0:n_frames], c[1 : n_frames + 1], c[2 : n_frames + 2, : N_FFT - 2 * HOP_LENGTH]],
        axis=1,
    )


@functools.partial(jax.jit, static_argnums=(1,))
def _mel_power(x: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """Windowed DFT power -> mel energies for one padded block. [n_frames, 80].

    int16 input is PCM on the int16 grid: dequantized on device (x / 32768),
    bit-identical to the host float path. Shipping int16 halves the host ->
    device waveform transfer, which dominates the mel stage over a slow link
    (measured ~26 MB/s tunneled: 586 ms of a 1398 ms batch-8 pipeline).
    """
    cos_m, sin_m = _dft_matrices()
    if x.dtype == jnp.int16:
        x = x.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    frames = _frame_signal(x.astype(jnp.float32), n_frames)
    # HIGH precision (bf16_3x): a single bf16 pass is too coarse for the
    # log-domain mel chain (abs err ~0.3), while full fp32 (HIGHEST) runs 6
    # MXU passes and measured ~6x slower on long audio; 3-pass bf16 gives
    # ~1e-6 relative error — indistinguishable from fp32 downstream.
    dot = functools.partial(jnp.dot, precision=jax.lax.Precision.HIGH)
    re = dot(frames, jnp.asarray(cos_m))
    im = dot(frames, jnp.asarray(sin_m))
    power = re * re + im * im
    return dot(power, jnp.asarray(mel_filters().T))


@jax.jit
def _log_normalize(mel_spec: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """log10 + clamp + 8-dB dynamic-range floor + (x+4)/4 affine.

    The dynamic-range max is taken over the first `n_valid` frames only; the
    zero-power bucket-padding frames log out at -10 so they can never raise
    the max, but masking keeps the semantics exact even for silent inputs.
    """
    log_spec = jnp.log10(jnp.clip(mel_spec, min=1e-10))
    row = jax.lax.broadcasted_iota(jnp.int32, log_spec.shape, 0)
    valid_max = jnp.max(jnp.where(row < n_valid, log_spec, -jnp.inf))
    log_spec = jnp.maximum(log_spec, valid_max - 8.0)
    return (log_spec + 4.0) / 4.0


class PrefetchedAudio:
    """A waveform whose host->device transfer was dispatched asynchronously.

    Holds the STFT-ready padded signal as a device array (the `device_put`
    returns immediately; the transfer proceeds in the background while the
    caller runs other device work — measured on the tunneled v5e: a 23 MB
    int16 batch-24 payload hides completely under ~0.6 s of compute).
    Pass it anywhere a waveform is accepted (`log_mel_spectrogram`,
    `transcribe`, `transcribe_batched`, `transcribe_many`); the mel stage
    skips straight to the device DFT. `padding` is pinned at prefetch time
    and must match the consumer's request.
    """

    __slots__ = ("sig", "n_frames", "padding")

    def __init__(self, sig: jax.Array, n_frames: int, padding: int):
        self.sig = sig
        self.n_frames = n_frames
        self.padding = padding


def _stft_host_prep(audio, padding: int = 0, exact: bool = False):
    """Host-side numpy prep shared by the sync and prefetch mel paths.

    int16 grid detection, zero padding, torch-center reflect padding, and
    30 s-multiple bucket padding (exact=True keeps the device shape at the
    true frame count — for fixed-size callers like the streaming session,
    where bucketing would double the work). Returns (sig [pad_to], n_frames).
    """
    audio = np.asarray(audio).reshape(-1)
    # lossless int16 transfer fast path: PCM-sourced waveforms (ffmpeg/WAV
    # decode to int16, load_audio scales by 1/32768) are shipped as int16 and
    # dequantized on device — half the bytes over the host->device link, exact.
    if audio.dtype == np.int16:
        host_dtype = np.int16
    else:
        audio = audio.astype(np.float32)
        host_dtype = np.float32
        # cheap prefix probe rejects generic float audio in one small pass
        # before paying the full-array grid check
        probe = audio[:4096] * 32768.0
        if (probe >= -32768.0).all() and (probe <= 32767.0).all() \
                and (probe == np.rint(probe)).all():
            scaled = audio * 32768.0
            if (scaled >= -32768.0).all() and (scaled <= 32767.0).all() \
                    and (scaled == np.rint(scaled)).all():
                audio = scaled.astype(np.int16)
                host_dtype = np.int16
    if padding > 0:
        audio = np.concatenate([audio, np.zeros(padding, host_dtype)])
    total_len = audio.shape[0]
    n_frames = total_len // HOP_LENGTH

    # torch.stft(center=True) reflect padding of the zero-padded signal
    left = audio[1:201][::-1] if total_len > 200 else np.zeros(200, host_dtype)
    right = audio[-2:-202:-1] if total_len > 200 else np.zeros(200, host_dtype)
    sig = np.concatenate([left, audio, right])

    # bucket the device-side length to multiples of 30 s to bound recompiles
    bucket = (max(1, n_frames) if exact
              else max(1, -(-n_frames // N_FRAMES)) * N_FRAMES)
    pad_to = (bucket + 2) * HOP_LENGTH
    if sig.shape[0] < pad_to:
        sig = np.concatenate([sig, np.zeros(pad_to - sig.shape[0], host_dtype)])
    else:
        sig = sig[:pad_to]
    return sig, n_frames


def prefetch_stft_input(audio, padding: int = 0) -> PrefetchedAudio:
    """Dispatch the waveform's H2D transfer now; return a PrefetchedAudio.

    `jax.device_put` is asynchronous: this returns in milliseconds while the
    transfer rides the link in the background, overlapping whatever device
    work the caller runs next (the decode loop of the previous request, in
    the serving pattern)."""
    sig, n_frames = _stft_host_prep(audio, padding)
    return PrefetchedAudio(jax.device_put(sig), n_frames, padding)


@functools.partial(jax.jit, static_argnames=("lead",))
def mel_stream_pieces(sigs: jnp.ndarray, n_valid: jnp.ndarray,
                      lead: int) -> jax.Array:
    """Batched window mel for same-length streaming pieces.

    sigs: [N, L] `_stft_host_prep(exact=True)`-prepared window pieces from
    N concurrent streaming sessions (one 30 s window each, same margin
    geometry); n_valid: [N] true frame counts; lead: frames to drop at the
    head (the alignment margin — see streaming.StreamingTranscriber).
    Returns [N, 80, N_FRAMES] decode windows, each identical to the
    session-inline `log_mel_spectrogram_jax(piece, exact=True)` slice.
    One dispatch per GROUP of concurrent sessions replaces N batch-1 mel
    chains — the streaming analogue of `mel_windows_many` below.
    """
    bucket = sigs.shape[1] // HOP_LENGTH - 2
    mels = jax.vmap(lambda s: _mel_power(s, bucket))(sigs)   # [N, F, 80]
    logs = jax.vmap(_log_normalize)(mels, n_valid)           # [N, F, 80]
    return logs[:, lead:lead + N_FRAMES].transpose(0, 2, 1)  # [N, 80, 3000]


@jax.jit
def mel_windows_many(sigs: jnp.ndarray, n_valid: jnp.ndarray) -> jax.Array:
    """Batched mel -> 30 s decode windows for same-bucket prepped signals.

    sigs: [N, (bucket+2)*HOP_LENGTH] `_stft_host_prep`-prepared signals
    sharing one bucketed length (and dtype); n_valid: [N] true frame
    counts. Returns [N, W, 80, N_FRAMES], W = bucket//N_FRAMES - 1 — the
    padding=N_SAMPLES prep guarantees every file in a bucket yields the
    same window count, and W*N_FRAMES <= every file's n_valid, so the
    windows are exactly the per-file path's `pad_or_trim(mel, W*N_FRAMES)`
    (a pure trim). One compiled program and ONE dispatch per file GROUP
    replaces the per-file mel/normalize/trim/reshape chain — on a tunneled
    device each per-file chain costs linkbound dispatches, the dominant
    serving-path overhead beyond window padding.
    """
    bucket = sigs.shape[1] // HOP_LENGTH - 2
    w = bucket // N_FRAMES - 1
    n = sigs.shape[0]
    mels = jax.vmap(lambda s: _mel_power(s, bucket))(sigs)   # [N, F, 80]
    logs = jax.vmap(_log_normalize)(mels, n_valid)           # [N, F, 80]
    wins = logs[:, : w * N_FRAMES].reshape(n, w, N_FRAMES, N_MELS)
    return wins.transpose(0, 1, 3, 2)                        # [N, W, 80, 3000]


def log_mel_spectrogram_jax(audio, padding: int = 0,
                            exact: bool = False) -> jax.Array:
    """Compute the log-mel spectrogram of a 16 kHz waveform on device.

    Matches the reference formula chain (whisper_at/audio.py:110-157) at fp32:
    reflect-pad 200 samples on both edges (torch.stft center mode), hann-
    windowed DFT power, mel projection, log/clamp/floor/scale. The last STFT
    frame is dropped exactly as the reference's `stft[..., :-1]` does.

    `audio` may be a host waveform or a PrefetchedAudio (an already-
    dispatched transfer — see prefetch_stft_input); the math is identical.

    Returns [80, n_frames] with n_frames = (len(audio) + padding) // 160.
    Device-side shapes are bucketed to 30 s multiples so distinct audio
    lengths reuse one compiled program.
    """
    if isinstance(audio, PrefetchedAudio):
        if audio.padding != padding:
            raise ValueError(
                f"PrefetchedAudio was prepared with padding={audio.padding}, "
                f"but padding={padding} was requested"
            )
        sig, n_frames = audio.sig, audio.n_frames
    else:
        sig_np, n_frames = _stft_host_prep(audio, padding, exact=exact)
        sig = jnp.asarray(sig_np)
    # infer the padded frame count from the prepared signal itself, so the
    # exact and 30 s-bucketed preps both resolve without re-deriving policy
    bucket = sig.shape[0] // HOP_LENGTH - 2
    mel = _mel_power(sig, bucket)  # [bucket, 80]
    log_spec = _log_normalize(mel, jnp.int32(n_frames))
    return log_spec[:n_frames].T  # [80, n_frames]
