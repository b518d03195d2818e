"""Evaluation metrics: per-class AP/AUC/PR curves, mAP, d-prime.

Parity with the reference metric suite (whisper_at_train/utilities/stats.py):
class-wise average precision and ROC-AUC via sklearn, precision/recall and
ROC curves subsampled 1/1000, top-1 accuracy (single-label datasets), and
d_prime(auc) = ppf(auc) * sqrt(2).
"""

from typing import List

import numpy as np
from scipy import stats as scipy_stats
from sklearn import metrics


def d_prime(auc: float) -> float:
    return scipy_stats.norm().ppf(auc) * np.sqrt(2.0)


def calculate_stats(output: np.ndarray, target: np.ndarray) -> List[dict]:
    """Per-class statistics for multi-label predictions.

    output/target: [n_samples, n_classes]. Classes with no positive sample
    report -1 curves (same convention as the reference).
    """
    output = np.asarray(output)
    target = np.asarray(target)
    classes_num = target.shape[-1]
    out_stats = []

    acc = metrics.accuracy_score(np.argmax(target, 1), np.argmax(output, 1))

    for k in range(classes_num):
        avg_precision = metrics.average_precision_score(
            target[:, k], output[:, k], average=None
        )
        try:
            auc = metrics.roc_auc_score(target[:, k], output[:, k], average=None)
            precisions, recalls, _ = metrics.precision_recall_curve(
                target[:, k], output[:, k]
            )
            fpr, tpr, _ = metrics.roc_curve(target[:, k], output[:, k])
            save_every_steps = 1000  # subsample curves to bound pickle size
            entry = {
                "precisions": precisions[0::save_every_steps],
                "recalls": recalls[0::save_every_steps],
                "AP": avg_precision,
                "fpr": fpr[0::save_every_steps],
                "fnr": 1.0 - tpr[0::save_every_steps],
                "auc": auc,
                "acc": acc,  # not class-wise; kept for schema consistency
            }
        except ValueError:
            entry = {
                "precisions": -1,
                "recalls": -1,
                "AP": avg_precision,
                "fpr": -1,
                "fnr": -1,
                "auc": -1,
                "acc": acc,
            }
            print("class {:s} no true sample".format(str(k)))
        out_stats.append(entry)

    return out_stats


def mean_average_precision(stats: List[dict]) -> float:
    return float(np.mean([s["AP"] for s in stats]))


def mean_auc(stats: List[dict]) -> float:
    return float(np.mean([s["auc"] for s in stats]))
