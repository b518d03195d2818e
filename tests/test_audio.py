"""Audio frontend tests: mel spectrogram parity against the reference formula.

The golden values are computed with torch.stft following the documented
reference chain (whisper_at/audio.py:110-157) — an independent oracle for our
matmul-DFT implementation.
"""

import numpy as np
import pytest
import torch

from whisper_at_tpu.audio import (
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_SAMPLES,
    load_audio,
    log_mel_spectrogram,
    mel_filters,
    pad_or_trim,
)

pytestmark = pytest.mark.quick


def golden_log_mel(audio: np.ndarray, padding: int = 0) -> np.ndarray:
    x = torch.from_numpy(audio.astype(np.float32))
    if padding > 0:
        x = torch.nn.functional.pad(x, (0, padding))
    window = torch.hann_window(N_FFT)
    stft = torch.stft(x, N_FFT, HOP_LENGTH, window=window, return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(mel_filters())
    mel_spec = filters @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.numpy()


@pytest.fixture(scope="module")
def chirp():
    rng = np.random.default_rng(0)
    t = np.arange(N_SAMPLES, dtype=np.float32) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * (200 + 40 * t) * t).astype(np.float32)
    x += 0.01 * rng.standard_normal(N_SAMPLES).astype(np.float32)
    return x


def test_mel_matches_reference_formula_30s(chirp):
    ours = np.asarray(log_mel_spectrogram(chirp))
    golden = golden_log_mel(chirp)
    assert ours.shape == (80, N_FRAMES)
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=0)


def test_mel_matches_reference_formula_with_padding(chirp):
    short = chirp[: 7 * 16000 + 1234]
    ours = np.asarray(log_mel_spectrogram(short, padding=N_SAMPLES))
    golden = golden_log_mel(short, padding=N_SAMPLES)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=0)


def test_mel_odd_length_no_padding(chirp):
    short = chirp[: 3 * 16000 + 77]
    ours = np.asarray(log_mel_spectrogram(short))
    golden = golden_log_mel(short)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=0)


def test_mel_dynamic_range_bounded(chirp):
    mel = np.asarray(log_mel_spectrogram(chirp))
    assert mel.max() - mel.min() <= 2.0 + 1e-6


def test_pad_or_trim_numpy():
    x = np.ones((80, 100), np.float32)
    padded = pad_or_trim(x, 3000)
    assert padded.shape == (80, 3000)
    assert padded[:, 100:].sum() == 0
    trimmed = pad_or_trim(np.ones((80, 5000), np.float32), 3000)
    assert trimmed.shape == (80, 3000)


def test_pad_or_trim_jax():
    import jax.numpy as jnp

    x = jnp.ones((80, 100))
    assert pad_or_trim(x, 3000).shape == (80, 3000)
    assert pad_or_trim(jnp.ones((80, 5000)), 3000).shape == (80, 3000)


def test_load_audio_wav_roundtrip(tmp_path, chirp):
    import wave

    path = str(tmp_path / "x.wav")
    pcm = (chirp[:16000] * 32767).astype(np.int16)
    with wave.open(path, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(pcm.tobytes())
    loaded = load_audio(path)
    np.testing.assert_allclose(loaded, pcm.astype(np.float32) / 32768.0, atol=1e-6)


def test_load_audio_wav_resample(tmp_path):
    import wave

    t = np.arange(8000, dtype=np.float32) / 8000.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    path = str(tmp_path / "x8k.wav")
    with wave.open(path, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes((x * 32767).astype(np.int16).tobytes())
    loaded = load_audio(path)
    assert abs(len(loaded) - 16000) <= 2


def test_mel_int16_fast_path_is_bit_exact(chirp):
    """PCM-grid float input must take the int16 H2D fast path (half the
    host->device waveform bytes) and produce BIT-IDENTICAL mel output to the
    generic float path; int16 arrays are accepted directly too."""
    pcm = (np.clip(chirp[:32000], -1, 1) * 32767).astype(np.int16)
    grid_f32 = pcm.astype(np.float32) / 32768.0

    m_grid = np.asarray(log_mel_spectrogram(grid_f32, padding=160))
    m_int16 = np.asarray(log_mel_spectrogram(pcm, padding=160))
    np.testing.assert_array_equal(m_grid, m_int16)

    # off-grid float input (values not on the int16 grid) must still go
    # through the generic float path and produce finite, close output
    off_grid = grid_f32 + np.float32(1e-6)
    ref_off = np.asarray(log_mel_spectrogram(off_grid, padding=160))
    assert np.isfinite(ref_off).all()
    np.testing.assert_allclose(m_grid, ref_off, atol=5e-2)


def test_prefetch_audio_mel_is_bit_exact(chirp):
    from whisper_at_tpu.audio import prefetch_audio

    direct = np.asarray(log_mel_spectrogram(chirp, padding=N_SAMPLES))
    pre = prefetch_audio(chirp)  # default padding = N_SAMPLES
    via_prefetch = np.asarray(log_mel_spectrogram(pre, padding=N_SAMPLES))
    assert via_prefetch.shape == direct.shape
    assert np.array_equal(via_prefetch, direct)


def test_prefetch_audio_padding_mismatch_raises(chirp):
    from whisper_at_tpu.audio import prefetch_audio

    pre = prefetch_audio(chirp, padding=0)
    with pytest.raises(ValueError, match="padding"):
        log_mel_spectrogram(pre, padding=N_SAMPLES)


def test_prefetch_audio_from_file(tmp_path, chirp):
    import wave

    from whisper_at_tpu.audio import prefetch_audio

    path = str(tmp_path / "pre.wav")
    pcm = (np.clip(chirp, -1, 1) * 32767).astype(np.int16)
    with wave.open(path, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(pcm.tobytes())
    pre = prefetch_audio(path, padding=0)
    via_prefetch = np.asarray(log_mel_spectrogram(pre))
    direct = np.asarray(log_mel_spectrogram(path))
    assert np.array_equal(via_prefetch, direct)


def test_mel_stream_pieces_is_jitted():
    """The scheduler's batched streaming mel must stay a SINGLE dispatch:
    un-jitted it runs op-by-op eagerly — dozens of tunneled dispatches per
    batch, measured 5.4 s/batch in sched-materialize (2026-08-20, the
    streaming-throughput regression)."""
    from whisper_at_tpu.ops.mel import mel_stream_pieces

    # a jax.jit wrapper exposes lower(); a plain function does not
    assert hasattr(mel_stream_pieces, "lower"), (
        "mel_stream_pieces lost its @jax.jit wrapper"
    )
