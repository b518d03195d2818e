"""Semantic matching of SONYC-UST fine classes to AudioSet labels.

Equivalent to the reference matcher (script/match_labels_audioset_sonyc.py):
embed SONYC class names and AudioSet ontology entries, map each SONYC label
to its best-scoring AudioSet label above a cosine threshold. Uses
sentence-transformers (MiniLM) when installed; otherwise falls back to a
character-trigram cosine similarity so the pipeline stays runnable in
minimal environments.
"""

import argparse
import csv
import json
import re
from collections import Counter
from typing import Dict, List, Optional


def load_sonyc_labels(csv_path: str) -> List[str]:
    with open(csv_path) as f:
        header = next(csv.reader(f))
    presence_cols = [c for c in header if c.endswith("_presence")]
    return sorted(
        {"_".join(c.replace("_presence", "").split("_")[1:]) for c in presence_cols}
    )


def load_audioset_ontology(json_path: str) -> Dict[str, str]:
    with open(json_path) as f:
        ontology = json.load(f)
    return {
        item["name"]: item.get("description", "")
        for item in ontology
        if item.get("restrictions") != ["abstract"]
    }


def _trigrams(text: str) -> Counter:
    text = re.sub(r"[^a-z0-9 ]", " ", text.lower())
    text = f"  {text}  "
    return Counter(text[i : i + 3] for i in range(len(text) - 2))


def _trigram_cosine(a: Counter, b: Counter) -> float:
    common = set(a) & set(b)
    num = sum(a[k] * b[k] for k in common)
    den = (sum(v * v for v in a.values()) ** 0.5) * (
        sum(v * v for v in b.values()) ** 0.5
    )
    return num / den if den else 0.0


def match_labels(
    sonyc_labels: List[str],
    audioset_data: Dict[str, str],
    threshold: float = 0.6,
) -> Dict[str, Optional[str]]:
    audioset_labels = list(audioset_data.keys())
    audioset_descs = [f"{k}: {v}" for k, v in audioset_data.items()]

    try:
        from sentence_transformers import SentenceTransformer, util

        model = SentenceTransformer("all-MiniLM-L6-v2")  # may download
        audioset_embs = model.encode(audioset_descs, convert_to_tensor=True)
        mapping = {}
        for s_label in sonyc_labels:
            query = s_label.replace("-", " ").replace("_", " ")
            s_emb = model.encode(query, convert_to_tensor=True)
            scores = util.cos_sim(s_emb, audioset_embs)[0]
            best_score, best_idx = float(scores.max()), int(scores.argmax())
            mapping[s_label] = (
                audioset_labels[best_idx] if best_score >= threshold else None
            )
        return mapping
    except Exception:
        # sentence-transformers missing or model download unavailable
        pass

    # fallback: character-trigram cosine on names (threshold recalibrated)
    audioset_grams = [_trigrams(d) for d in audioset_descs]
    mapping = {}
    for s_label in sonyc_labels:
        query = _trigrams(s_label.replace("-", " ").replace("_", " "))
        scores = [_trigram_cosine(query, g) for g in audioset_grams]
        best_idx = int(max(range(len(scores)), key=scores.__getitem__))
        mapping[s_label] = (
            audioset_labels[best_idx] if scores[best_idx] >= threshold * 0.5 else None
        )
    return mapping


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--sonyc_csv", required=True)
    parser.add_argument("--ontology_json", required=True)
    parser.add_argument("--output", default="semantic_sonyc_to_audioset_mapping.json")
    parser.add_argument("--threshold", type=float, default=0.6)
    args = parser.parse_args(argv)

    sonyc_labels = load_sonyc_labels(args.sonyc_csv)
    audioset = load_audioset_ontology(args.ontology_json)
    mapping = match_labels(sonyc_labels, audioset, args.threshold)
    with open(args.output, "w") as f:
        json.dump(mapping, f, indent=2, ensure_ascii=False)
    print(f"mapping saved: {args.output}")


if __name__ == "__main__":
    main()
