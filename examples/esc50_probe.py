"""ESC-50-style layer-wise probing walkthrough.

Reproduces the reference's representation-analysis experiment
(noise_robust_asr/baseline_sound_classification.py + the figure-1-lower /
figure-3 plots): extract all-layer time-pooled encoder features for labeled
clips, fit a linear probe per layer per fold, and plot layer-wise accuracy.
Runs offline with --synthetic tone data (5 s clips, 500-frame truncation —
the ESC-50 recipe).
"""

import argparse
import json
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import whisper_at_tpu as whisper  # noqa: E402
from whisper_at_tpu.research.feature_extract import extract_features  # noqa: E402
from whisper_at_tpu.research.layer_probe import layer_wise_probe  # noqa: E402
from whisper_at_tpu.research.plots import (  # noqa: E402
    plot_best_layer_histogram,
    plot_layerwise_accuracy,
)


def make_clips(root: str, n: int = 40, n_class: int = 5):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    freqs = [200 * (1.5**i) for i in range(n_class)]
    paths, labels, folds = [], [], []
    for i in range(n):
        cls = int(rng.integers(0, n_class))
        t = np.arange(16000 * 5) / 16000.0
        x = 0.4 * np.sin(2 * np.pi * freqs[cls] * t)
        x += 0.05 * rng.standard_normal(len(t))
        path = os.path.join(root, f"clip{i}.wav")
        with wave.open(path, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(16000)
            wf.writeframes((x * 32767).astype(np.int16).tobytes())
        paths.append(path)
        labels.append(cls)
        folds.append(i % 4)
    return paths, np.asarray(labels), np.asarray(folds)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/wat_esc50_demo")
    parser.add_argument("--model", default="tiny")
    args = parser.parse_args()

    model = whisper.build_model(args.model)  # random; real use: load_model
    paths, labels, folds = make_clips(args.root)

    # ESC-50 recipe: 5 s clips -> 500-frame mel truncation, all-layer taps,
    # time-pooled per layer
    feats = []
    for path in paths:
        f = extract_features(model, path, n_frames=500)  # [L, T', D]
        feats.append(f.mean(axis=1))  # time-pool -> [L, D]
    feats = np.stack(feats)  # [N, L, D]

    results = layer_wise_probe(feats, labels, folds, max_iter=1000)
    accs = [r["accuracy"] for r in results]
    print("layer-wise probe accuracy:")
    for r in results:
        print(f"  layer {r['layer']}: {r['accuracy']:.3f}")

    plot_layerwise_accuracy(
        {args.model: accs}, os.path.join(args.root, "layerwise_acc.png")
    )
    best = int(np.argmax(accs))
    plot_best_layer_histogram([best], len(accs),
                              os.path.join(args.root, "best_layer.png"))
    print(f"best layer: {best}; figures -> {args.root}")


if __name__ == "__main__":
    main()
