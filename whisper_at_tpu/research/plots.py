"""Paper-figure plotting for the noise-robustness experiments.

Equivalents of the reference plot scripts (noise_robust_asr/plots/):
WER-vs-SNR curves per model (figure 1 upper), layer-wise ESC-50 accuracy
(figure 1 lower), class-wise noise analysis (figure 2), and the best-layer
histogram (figure 3). matplotlib is optional; every function degrades to
returning the computed arrays when it is unavailable.
"""

from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except ImportError:  # pragma: no cover
    HAVE_MPL = False

SNR_LEVELS = [-20, -15, -10, -5, 0, 5, 10, 15, 20]


def plot_wer_vs_snr(
    wer_by_model: Dict[str, Sequence[float]],
    out_path: Optional[str] = None,
    snr_levels: Sequence[int] = tuple(SNR_LEVELS),
):
    """WER-vs-SNR curves, one line per ASR model (plot_figure1_upper.py)."""
    if not HAVE_MPL:
        return wer_by_model
    fig, ax = plt.subplots(figsize=(6, 4))
    for model, wers in wer_by_model.items():
        ax.plot(snr_levels, np.asarray(wers) * 100, marker="o", label=model)
    ax.set_xlabel("SNR (dB)")
    ax.set_ylabel("WER (%)")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return wer_by_model


def plot_layerwise_accuracy(
    acc_by_model: Dict[str, Sequence[float]],
    out_path: Optional[str] = None,
):
    """Layer-wise sound-classification accuracy (plot_figure1_lower.py)."""
    if not HAVE_MPL:
        return acc_by_model
    fig, ax = plt.subplots(figsize=(6, 4))
    for model, accs in acc_by_model.items():
        accs = np.asarray(accs)
        ax.plot(np.arange(len(accs)) / max(len(accs) - 1, 1), accs * 100,
                marker=".", label=model)
    ax.set_xlabel("relative layer depth")
    ax.set_ylabel("ESC-50 accuracy (%)")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return acc_by_model


def plot_classwise_noise(
    wer_per_class: np.ndarray,  # [n_classes] WER at a fixed SNR
    class_names: List[str],
    out_path: Optional[str] = None,
    top_k: int = 20,
):
    """Noise classes most harmful to ASR (plot_figure2.py)."""
    order = np.argsort(wer_per_class)[::-1][:top_k]
    if not HAVE_MPL:
        return [(class_names[i], float(wer_per_class[i])) for i in order]
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.bar(range(len(order)), wer_per_class[order] * 100)
    ax.set_xticks(range(len(order)))
    ax.set_xticklabels([class_names[i] for i in order], rotation=60, ha="right")
    ax.set_ylabel("WER (%)")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return [(class_names[i], float(wer_per_class[i])) for i in order]


def plot_best_layer_histogram(
    best_layers: Sequence[int],
    n_layers: int,
    out_path: Optional[str] = None,
):
    """Histogram of per-class best-performing layers (plot_figure3.py:27-40)."""
    counts = np.bincount(np.asarray(best_layers), minlength=n_layers)
    if not HAVE_MPL:
        return counts
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.bar(range(n_layers), counts)
    ax.set_xlabel("layer")
    ax.set_ylabel("# classes with best F1")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return counts
