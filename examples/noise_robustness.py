"""Noise-robustness WER experiment walkthrough.

The reference's core analysis pipeline (noise_robust_asr/): mix clean speech
with class-labeled noise at a grid of SNRs, transcribe every mixture, score
per-SNR WER, and plot the WER-vs-SNR curve. Runs offline with synthetic
"speech" (tone patterns) and noise; swap in LibriSpeech + ESC-50 paths and a
real checkpoint for the paper protocol.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import whisper_at_tpu as whisper  # noqa: E402
from whisper_at_tpu.research.noisy_speech import (  # noqa: E402
    generate_noisy_set,
    transcribe_noisy_set,
    write_wav,
)
from whisper_at_tpu.research.plots import plot_wer_vs_snr  # noqa: E402
from whisper_at_tpu.research.wer import eval_noise_wer  # noqa: E402


def make_corpus(root: str, n_utts: int = 3, n_noise_classes: int = 2):
    rng = np.random.default_rng(0)
    speech_dir = os.path.join(root, "speech")
    noise_dir = os.path.join(root, "noise")
    truth_dir = os.path.join(root, "truth")
    for d in (speech_dir, noise_dir, truth_dir):
        os.makedirs(d, exist_ok=True)

    speech_files = []
    for i in range(n_utts):
        t = np.arange(16000 * 3) / 16000.0
        x = 0.4 * np.sin(2 * np.pi * (300 + 50 * i) * t)
        x *= (np.sin(2 * np.pi * 2.0 * t) > 0)  # tone bursts ~ "speech"
        path = os.path.join(speech_dir, f"utt{i}.wav")
        write_wav(path, x.astype(np.float32))
        speech_files.append(path)
        with open(os.path.join(truth_dir, f"utt{i}.txt"), "w") as f:
            f.write(f"synthetic utterance {i}")

    noise_by_class = {}
    for cla in range(n_noise_classes):
        files = []
        for j in range(n_utts):
            noise = (0.5 * rng.standard_normal(16000 * 2)).astype(np.float32)
            path = os.path.join(noise_dir, f"n{cla}_{j}.wav")
            write_wav(path, noise)
            files.append(path)
        noise_by_class[cla] = files
    return speech_files, noise_by_class, truth_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/wat_noise_demo")
    parser.add_argument("--model", default="tiny")
    parser.add_argument("--snrs", type=int, nargs="*", default=[-10, 0, 10])
    args = parser.parse_args()

    model = whisper.build_model(args.model)  # random; real use: load_model
    speech, noise_by_class, truth_dir = make_corpus(args.root)

    mixed_dir = os.path.join(args.root, "mixed")
    written = generate_noisy_set(
        speech, noise_by_class, mixed_dir, snr_levels=args.snrs,
        n_utterances=len(speech),
    )
    print(f"mixed {len(written)} noisy clips -> {mixed_dir}")

    text_dir = os.path.join(args.root, "hyp")
    transcribe_noisy_set(model, mixed_dir, text_dir)

    result_csv = os.path.join(args.root, "wer_by_snr.csv")
    wer = eval_noise_wer(text_dir, truth_dir, result_csv, snr_levels=args.snrs)
    print("WER by SNR:", {k: round(v, 3) for k, v in wer.items()})
    plot_wer_vs_snr(
        {args.model: [wer[s] for s in args.snrs]},
        os.path.join(args.root, "wer_vs_snr.png"),
        snr_levels=args.snrs,
    )
    print(f"curve -> {os.path.join(args.root, 'wer_vs_snr.png')}")


if __name__ == "__main__":
    main()
