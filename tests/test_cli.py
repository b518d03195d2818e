"""CLI surface tests (subprocess-driven, no checkpoints needed)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def run_cli(*args):
    # generous timeout: the end-to-end runs jit-compile a dozen programs on
    # the CPU backend (~2 min cold) and the suite may share the machine
    return subprocess.run(
        [sys.executable, "-m", "whisper_at_tpu", *args],
        capture_output=True, text=True, cwd=REPO, env=ENV, timeout=900,
    )


def test_cli_help_lists_flags():
    result = run_cli("--help")
    assert result.returncode == 0
    for flag in ("--model", "--at_time_res", "--at_low_compute", "--beam_size",
                 "--word_timestamps", "--temperature_increment_on_fallback",
                 "--output_format", "--language"):
        assert flag in result.stdout, flag


def test_cli_invalid_model():
    result = run_cli("x.wav", "--model", "nosuch")
    assert result.returncode != 0
    assert "official name" in result.stderr


def _write_assets(tmp_path):
    import wave

    import numpy as np

    from whisper_at_tpu.checkpoint import save_params
    from whisper_at_tpu.models.dims import ModelDimensions
    from whisper_at_tpu.models.whisper import Whisper

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
        n_text_state=64, n_text_layer=2,
    )
    model = Whisper(dims, seed=2)
    ckpt = str(tmp_path / "tiny_test.npz")
    save_params(ckpt, model.params, dims)

    wav = str(tmp_path / "clip.wav")
    t = np.arange(16000 * 3) / 16000.0
    x = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    with wave.open(wav, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes((x * 32767).astype(np.int16).tobytes())
    return ckpt, wav


def test_cli_end_to_end_local_checkpoint(tmp_path):
    """Full offline CLI run: local .npz checkpoint -> transcribe a wav ->
    all five output formats written (VERDICT r1 item 7)."""
    ckpt, wav = _write_assets(tmp_path)
    out = tmp_path / "out"
    result = run_cli(
        wav, "--model", ckpt, "--output_dir", str(out),
        "--language", "en", "--fp16", "False", "--verbose", "False",
        "--beam_size", "None", "--best_of", "None",
        "--temperature_increment_on_fallback", "None",
        "--logprob_threshold", "None",
        "--compression_ratio_threshold", "None",
        "--no_speech_threshold", "None",
    )
    assert result.returncode == 0, result.stderr[-2000:]
    for ext in ("txt", "vtt", "srt", "tsv", "json"):
        assert (out / f"clip.{ext}").exists(), ext


def test_cli_batched_path(tmp_path):
    ckpt, wav = _write_assets(tmp_path)
    out = tmp_path / "outb"
    result = run_cli(
        wav, "--model", ckpt, "--output_dir", str(out), "--batched", "True",
        "--output_format", "json", "--language", "en", "--fp16", "False",
        "--verbose", "False", "--beam_size", "None", "--best_of", "None",
        "--temperature_increment_on_fallback", "None",
        "--logprob_threshold", "None",
        "--compression_ratio_threshold", "None",
        "--no_speech_threshold", "None",
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert (out / "clip.json").exists()


def test_cli_word_options_require_word_timestamps():
    result = run_cli("x.wav", "--highlight_words", "True")
    assert result.returncode != 0
    assert "--word_timestamps" in result.stderr


def test_train_cli_help():
    result = subprocess.run(
        [sys.executable, "-m", "whisper_at_tpu.train.run", "--help"],
        capture_output=True, text=True, cwd=REPO, env=ENV, timeout=120,
    )
    assert result.returncode == 0
    for flag in ("--model", "--bal", "--mixup", "--wa", "--resume",
                 "--lrscheduler_start", "--label_smooth"):
        assert flag in result.stdout, flag


def test_flops_cli():
    result = subprocess.run(
        [sys.executable, "-m", "whisper_at_tpu.ops.flops"],
        capture_output=True, text=True, cwd=REPO, env=ENV, timeout=120,
    )
    assert result.returncode == 0
    assert "large-v1" in result.stdout and "TL-TR-512" in result.stdout


def test_cli_batched_many_files(tmp_path):
    """--batched with several audio files routes through transcribe_many
    (cross-file window packing) and writes one output per input."""
    import wave

    import numpy as np
    ckpt, wav = _write_assets(tmp_path)
    wav2 = str(tmp_path / "clip2.wav")
    t = np.arange(16000 * 2) / 16000.0
    x = (0.2 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    with wave.open(wav2, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes((x * 32767).astype(np.int16).tobytes())
    out = tmp_path / "outm"
    result = run_cli(
        wav, wav2, "--model", ckpt, "--output_dir", str(out),
        "--batched", "True", "--output_format", "json",
        "--language", "en", "--fp16", "False", "--verbose", "False",
        "--beam_size", "None", "--best_of", "None",
        "--temperature_increment_on_fallback", "None",
        "--logprob_threshold", "None",
        "--compression_ratio_threshold", "None",
        "--no_speech_threshold", "None",
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert (out / "clip.json").exists()
    assert (out / "clip2.json").exists()
