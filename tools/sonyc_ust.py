"""SONYC-UST dataset tooling: annotations -> whisper-at training jsons.

Equivalent functionality to the reference data scripts
(script/process_sonyc_ust_csv.py, convert_sonyc_ust_to_ohe.py,
filter_sonyc_labels.py): parse the SONYC-UST annotations CSV, map fine
classes onto AudioSet indices (527..+ for unmapped classes), emit train/
val/test jsons in the {'data': [{'wav','labels'}]} format plus the extended
class csv, with optional verified-only filtering.
"""

import argparse
import csv
import json
import os
from collections import defaultdict
from typing import Dict, List, Tuple


def load_audioset_classes(audioset_csv: str) -> Tuple[Dict[str, int], Dict[int, str]]:
    """display_name -> index and index -> mid from class_labels_indices.csv."""
    class_map, index_to_mid = {}, {}
    with open(audioset_csv) as f:
        for row in csv.DictReader(f):
            class_map[row["display_name"].strip('"')] = int(row["index"])
            index_to_mid[int(row["index"])] = row["mid"]
    return class_map, index_to_mid


def parse_annotations(
    annotations_csv: str, verified_only: bool = False
) -> Tuple[Dict[str, set], Dict[str, str]]:
    """audio file -> set of present fine-class names, and file -> split.

    A class counts as present when any annotator marked its *_presence column
    1 (annotator_id == 0 only when verified_only).
    """
    audio_classes: Dict[str, set] = defaultdict(set)
    audio_split: Dict[str, str] = {}
    with open(annotations_csv) as f:
        reader = csv.DictReader(f)
        presence_cols = [c for c in reader.fieldnames if c.endswith("_presence")]
        for row in reader:
            if verified_only and row.get("annotator_id", "0") != "0":
                continue
            fname = row["audio_filename"]
            audio_split[fname] = row.get("split", "train")
            for col in presence_cols:
                try:
                    present = float(row[col] or 0) == 1.0
                except ValueError:
                    present = False
                if present:
                    # column format: <coarse>_<fine...>_presence
                    fine = "_".join(col.replace("_presence", "").split("_")[1:])
                    audio_classes[fname].add(fine)
    return dict(audio_classes), audio_split


def build_label_space(
    audio_classes: Dict[str, set],
    class_mapping: Dict[str, str],
    audioset_classes: Dict[str, int],
    index_to_mid: Dict[int, str],
) -> Tuple[Dict[str, int], Dict[int, str]]:
    """Assign each fine class an index: mapped AudioSet index when the
    semantic mapping hits, else a fresh index past 527."""
    label_index: Dict[str, int] = {}
    next_new = max(index_to_mid.keys()) + 1 if index_to_mid else 527
    mids = dict(index_to_mid)
    seen = sorted({c for classes in audio_classes.values() for c in classes})
    for fine in seen:
        mapped = class_mapping.get(fine)
        if mapped is not None and mapped in audioset_classes:
            label_index[fine] = audioset_classes[mapped]
        else:
            label_index[fine] = next_new
            mids[next_new] = f"/sonyc/{fine}"
            next_new += 1
    return label_index, mids


def write_dataset_jsons(
    audio_classes: Dict[str, set],
    audio_split: Dict[str, str],
    label_index: Dict[str, int],
    index_to_mid: Dict[int, str],
    audio_dir: str,
    output_dir: str,
) -> Dict[str, str]:
    os.makedirs(output_dir, exist_ok=True)
    by_split: Dict[str, List[dict]] = defaultdict(list)
    for fname, classes in audio_classes.items():
        mids = sorted({index_to_mid[label_index[c]] for c in classes})
        if not mids:
            continue
        by_split[audio_split.get(fname, "train")].append(
            {"wav": os.path.join(audio_dir, fname), "labels": ",".join(mids)}
        )

    out_paths = {}
    for split, data in by_split.items():
        path = os.path.join(output_dir, f"sonyc_{split}.json")
        with open(path, "w") as f:
            json.dump({"data": data}, f, indent=1)
        out_paths[split] = path

    # extended class csv covering AudioSet + new SONYC classes
    csv_path = os.path.join(output_dir, "class_labels_indices_sonyc.csv")
    with open(csv_path, "w") as f:
        f.write("index,mid,display_name\n")
        for idx in sorted(index_to_mid):
            name = index_to_mid[idx].split("/")[-1]
            f.write(f'{idx},{index_to_mid[idx]},"{name}"\n')
    out_paths["class_csv"] = csv_path
    return out_paths


def one_hot_labels(labels: str, index_dict: Dict[str, str], n_class: int):
    """mid list -> one-hot vector (convert_sonyc_ust_to_ohe.py semantics)."""
    import numpy as np

    vec = np.zeros(n_class, np.float32)
    for mid in labels.split(","):
        vec[int(index_dict[mid])] = 1.0
    return vec


def filter_labels_json(
    input_json: str, output_json: str, keep_indices: List[int],
    index_dict: Dict[str, str],
) -> int:
    """Drop samples whose labels are all outside keep_indices
    (filter_sonyc_labels.py semantics). Returns kept count."""
    keep = set(keep_indices)
    with open(input_json) as f:
        data = json.load(f)["data"]
    kept = []
    for entry in data:
        indices = {int(index_dict[m]) for m in entry["labels"].split(",")}
        inside = indices & keep
        if inside:
            mids = [m for m in entry["labels"].split(",")
                    if int(index_dict[m]) in keep]
            kept.append({"wav": entry["wav"], "labels": ",".join(mids)})
    with open(output_json, "w") as f:
        json.dump({"data": kept}, f, indent=1)
    return len(kept)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Process SONYC-UST annotations for Whisper-AT training"
    )
    parser.add_argument("--annotations_csv", required=True)
    parser.add_argument("--audio_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--class_mapping", required=True,
                        help="SONYC->AudioSet mapping json")
    parser.add_argument("--audioset_classes_csv", required=True)
    parser.add_argument("--verified_only", action="store_true")
    args = parser.parse_args(argv)

    with open(args.class_mapping) as f:
        class_mapping = json.load(f)
    audioset_classes, index_to_mid = load_audioset_classes(args.audioset_classes_csv)
    audio_classes, audio_split = parse_annotations(
        args.annotations_csv, args.verified_only
    )
    label_index, index_to_mid = build_label_space(
        audio_classes, class_mapping, audioset_classes, index_to_mid
    )
    out = write_dataset_jsons(
        audio_classes, audio_split, label_index, index_to_mid,
        args.audio_dir, args.output_dir,
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
