"""Layer-wise linear probing of encoder representations (ESC-50 experiment).

Parity with the reference probe (noise_robust_asr/
baseline_sound_classification.py:22-82): per layer, per fold, a scaled linear
classifier over time-pooled features; reports accuracy / per-class F1 per
layer. Uses sklearn's Pipeline(StandardScaler, MLPClassifier with no hidden
layer) exactly as the reference does.
"""

from typing import Dict, List, Optional

import numpy as np
from sklearn.neural_network import MLPClassifier
from sklearn.pipeline import Pipeline
from sklearn.preprocessing import StandardScaler


def layer_wise_probe(
    features: np.ndarray,  # [n_samples, n_layers, dim] time-pooled taps
    labels: np.ndarray,  # [n_samples]
    folds: Optional[np.ndarray] = None,  # [n_samples] fold ids, or None
    max_iter: int = 200,
) -> List[Dict]:
    """Train a linear probe per layer (per fold when folds given).

    Returns one dict per layer: {'layer', 'accuracy', 'fold_accuracies'}.
    """
    n_samples, n_layers, _ = features.shape
    results = []
    for layer in range(n_layers):
        x = features[:, layer, :]
        fold_accs = []
        if folds is None:
            split = int(0.8 * n_samples)
            fold_defs = [(np.arange(split), np.arange(split, n_samples))]
        else:
            fold_defs = [
                (np.where(folds != f)[0], np.where(folds == f)[0])
                for f in np.unique(folds)
            ]
        for train_idx, test_idx in fold_defs:
            clf = Pipeline(
                [
                    ("scaler", StandardScaler()),
                    (
                        "clf",
                        MLPClassifier(
                            hidden_layer_sizes=(), max_iter=max_iter,
                            random_state=0,
                        ),
                    ),
                ]
            )
            clf.fit(x[train_idx], labels[train_idx])
            fold_accs.append(float(clf.score(x[test_idx], labels[test_idx])))
        results.append(
            {
                "layer": layer,
                "accuracy": float(np.mean(fold_accs)),
                "fold_accuracies": fold_accs,
            }
        )
    return results
