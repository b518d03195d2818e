"""End-to-end AudioSet evaluation through the full inference package.

Parity with the reference eval drivers (whisper_at_train/utilities/
whisper_at_as_eval.py:1-76 and compute_mAP.py:1-37): run `transcribe` with
the quality thresholds disabled over the eval json, take the first 30 s
window's tag logits as the clip prediction, save pred/truth arrays, and
recompute mAP from saved arrays for any number of model variants.
"""

import json
import os
from typing import Dict, List, Optional

import numpy as np

from ..train.dataloader import make_index_dict
from ..train.stats import calculate_stats, mean_average_precision


def evaluate_audioset(
    model,
    eval_json: str,
    label_csv: str,
    out_dir: str,
    tag: str = "model",
    limit: Optional[int] = None,
    at_time_res: float = 10,
) -> Dict[str, float]:
    """Transcribe+tag each eval clip; clip prediction = first tag window."""
    os.makedirs(out_dir, exist_ok=True)
    index_dict = make_index_dict(label_csv)
    n_class = len(index_dict)

    with open(eval_json, "r") as fp:
        data = json.load(fp)["data"]
    if limit is not None:
        data = data[:limit]

    preds, truths = [], []
    for entry in data:
        result = model.transcribe(
            entry["wav"],
            at_time_res=at_time_res,
            logprob_threshold=None,
            compression_ratio_threshold=None,
            verbose=None,
        )
        preds.append(np.asarray(result["audio_tag"])[0])  # first 30 s window
        truth = np.zeros(n_class, np.float32)
        for label in entry["labels"].split(","):
            truth[int(index_dict[label])] = 1.0
        truths.append(truth)

    preds = np.stack(preds)
    truths = np.stack(truths)
    np.save(os.path.join(out_dir, f"{tag}_pred.npy"), preds)
    np.save(os.path.join(out_dir, f"{tag}_truth.npy"), truths)

    stats = calculate_stats(preds, truths)
    return {"mAP": mean_average_precision(stats)}


def compute_map_from_saved(out_dir: str, tags: List[str]) -> Dict[str, float]:
    """Recompute mAP for saved pred/truth arrays (compute_mAP.py:1-37)."""
    results = {}
    for tag in tags:
        preds = np.load(os.path.join(out_dir, f"{tag}_pred.npy"))
        truths = np.load(os.path.join(out_dir, f"{tag}_truth.npy"))
        stats = calculate_stats(preds, truths)
        results[tag] = mean_average_precision(stats)
        print("{:s} mAP: {:.4f}".format(tag, results[tag]))
    return results
