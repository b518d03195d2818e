"""CLI surface tests (subprocess-driven, no checkpoints needed)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "whisper_at_tpu", *args],
        capture_output=True, text=True, cwd=REPO, env=ENV, timeout=120,
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
    assert "invalid choice" in result.stderr


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
