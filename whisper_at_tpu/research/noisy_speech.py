"""Noisy-speech test-set generation for the noise-robustness experiments.

Parity with the reference generator (noise_robust_asr/asr_experiments/
gen_noisy_speech.py:21-65): mix each clean utterance with a noise clip at a
target SNR, power-scaled, with the noise looped or truncated to the speech
length. Pure numpy + the built-in WAV IO (no torchaudio).
"""

import os
import wave
from typing import Dict, List, Sequence

import numpy as np

from ..audio import load_audio

SNR_LEVELS = [-20, -15, -10, -5, 0, 5, 10, 15, 20]


def add_noise(
    speech: np.ndarray, noise: np.ndarray, noise_db: float
) -> np.ndarray:
    """speech + scale * noise at the given SNR in dB (gen_noisy_speech.py:21-40).

    scale = 10^(-snr/20) * sqrt(P_speech) / sqrt(P_noise); noise is looped if
    shorter than the speech and truncated if longer.
    """
    power_speech = float((speech**2).mean())
    power_noise = float((noise**2).mean())
    scale = 10 ** (-noise_db / 20) * np.sqrt(power_speech) / np.sqrt(
        max(power_noise, 1e-10)
    )

    if len(speech) > len(noise):
        ratio = int(np.ceil(len(speech) / len(noise)))
        noise = np.concatenate([noise] * ratio)
    noise = noise[: len(speech)]

    return (speech + scale * noise).astype(np.float32)


def write_wav(path: str, audio: np.ndarray, sample_rate: int = 16000):
    pcm = np.clip(audio * 32767.0, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())


def generate_noisy_set(
    speech_files: List[str],
    noise_files_by_class: Dict[int, List[str]],
    out_dir: str,
    snr_levels: Sequence[int] = tuple(SNR_LEVELS),
    n_utterances: int = 40,
) -> List[str]:
    """Build the SNR x noise-class x utterance grid of mixed files
    (gen_noisy_speech.py:43-65). File naming matches the reference:
    '<db>_<class>_<utt>_mix_<noise>.wav' so the WER scorer can parse it."""
    os.makedirs(out_dir, exist_ok=True)
    speech_files = sorted(speech_files)[:n_utterances]
    written = []
    for db in snr_levels:
        for cla, noise_files in sorted(noise_files_by_class.items()):
            for idx in range(min(n_utterances, len(speech_files))):
                speech = load_audio(speech_files[idx])
                noise = load_audio(noise_files[idx % len(noise_files)])
                mixed = add_noise(speech, noise, db)
                utt = os.path.splitext(os.path.basename(speech_files[idx]))[0]
                noise_name = os.path.splitext(
                    os.path.basename(noise_files[idx % len(noise_files)])
                )[0]
                tar = os.path.join(
                    out_dir, f"{db}_{cla}_{utt}_mix_{noise_name}.wav"
                )
                write_wav(tar, mixed)
                written.append(tar)
    return written


def transcribe_noisy_set(
    model, noisy_dir: str, text_dir: str, language: str = "en"
) -> List[str]:
    """Transcribe every mixed wav into a sibling .txt (transcribe_whisper.py
    equivalent, minus the CUDA_VISIBLE_DEVICES job sharding — on TPU the
    batched pipeline covers a whole directory in large batches)."""
    os.makedirs(text_dir, exist_ok=True)
    outputs = []
    for root, _, files in os.walk(noisy_dir):
        for fname in sorted(files):
            if not fname.endswith((".wav", ".flac")):
                continue
            out_path = os.path.join(text_dir, os.path.splitext(fname)[0] + ".txt")
            if os.path.exists(out_path):
                continue
            result = model.transcribe(
                os.path.join(root, fname), language=language, verbose=None
            )
            with open(out_path, "w") as f:
                f.write(result["text"])
            outputs.append(out_path)
    return outputs
