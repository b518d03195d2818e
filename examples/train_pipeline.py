"""End-to-end TL-TR training walkthrough: wavs -> features -> train -> eval
-> export.

The full training story of the framework in one runnable script (offline:
--synthetic generates labeled wavs). Mirrors the reference pipeline:
extraction (extract_as_full_whisper_all.py) -> run.py training ->
whisper_at_as_eval.py evaluation -> rename_state_dict.py export.
"""

import argparse
import json
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import whisper_at_tpu as whisper  # noqa: E402
from whisper_at_tpu.research.feature_extract import extract_feature_set  # noqa: E402
from whisper_at_tpu.train import (  # noqa: E402
    DataLoader,
    FeatureDataset,
    init_tltr,
    make_eval_step,
    mean_average_precision,
    train,
    validate,
    wa_model,
)


def make_synthetic_dataset(root: str, n_clips: int = 24, n_class: int = 6):
    """Labeled wavs where each class is a distinct tone frequency."""
    os.makedirs(os.path.join(root, "audio"), exist_ok=True)
    rng = np.random.default_rng(0)
    freqs = [220 * (1.3**i) for i in range(n_class)]
    data = []
    for i in range(n_clips):
        cls = int(rng.integers(0, n_class))
        t = np.arange(16000 * 10) / 16000.0
        x = 0.4 * np.sin(2 * np.pi * freqs[cls] * t)
        x += 0.02 * rng.standard_normal(len(t))
        path = os.path.join(root, "audio", f"clip{i}.wav")
        with wave.open(path, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(16000)
            wf.writeframes((x * 32767).astype(np.int16).tobytes())
        data.append({"wav": path, "labels": f"/m/{cls:03d}"})

    with open(os.path.join(root, "data.json"), "w") as f:
        json.dump({"data": data}, f)
    with open(os.path.join(root, "labels.csv"), "w") as f:
        f.write("index,mid,display_name\n")
        for c in range(n_class):
            f.write(f'{c},/m/{c:03d},"tone {c}"\n')
    return os.path.join(root, "data.json"), os.path.join(root, "labels.csv")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/wat_train_demo")
    parser.add_argument("--model", default="tiny", help="feature-source size")
    parser.add_argument("--epochs", type=int, default=4)
    parser.add_argument("--synthetic", action="store_true", default=True)
    args = parser.parse_args()

    data_json, label_csv = make_synthetic_dataset(args.root)
    model = whisper.build_model(args.model)  # random backbone; real use:
    # model = whisper.load_model(args.model)

    # 1. extract all-layer pooled features (batched, resume-by-skip);
    #    dir name contains 'feat_as' so the loader expects .npz
    feat_dir = os.path.join(args.root, "feat_as")
    written = extract_feature_set(model, data_json, feat_dir, n_frames=1000)
    print(f"extracted {len(written)} feature files -> {feat_dir}")

    # 2. train the TL-TR head on the features
    conf = {"freqm": 0, "timem": 3, "mixup": 0.2, "dataset": "demo",
            "label_smooth": 0.05, "tar_path": feat_dir}
    ds = FeatureDataset(data_json, conf, label_csv=label_csv)
    loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=2)
    # eval targets must stay binary for AP/AUC (label_smooth only in training)
    val_conf = dict(conf, freqm=0, timem=0, mixup=0, label_smooth=0.0)
    val_loader = DataLoader(
        FeatureDataset(data_json, val_conf, label_csv=label_csv),
        batch_size=8, num_workers=2,
    )

    n_layer = model.dims.n_audio_layer
    params = init_tltr(
        jax.random.PRNGKey(0), label_dim=6, n_layer=n_layer,
        rep_dim=model.dims.n_audio_state, mode="lw_tr_1_4",
    )
    exp_dir = os.path.join(args.root, "exp")
    params = train(
        params, "lw_tr_1_4", loader, val_loader, exp_dir=exp_dir,
        lr=5e-3, n_epochs=args.epochs, dataset="demo",
        compute_dtype=jnp.float32, n_print_steps=100,
    )

    # 3. weight-average the checkpoint tail and re-validate
    averaged = wa_model(exp_dir, max(1, args.epochs - 1), args.epochs)
    stats, _ = validate(make_eval_step("lw_tr_1_4", jnp.float32), averaged, val_loader)
    print(f"weight-averaged mAP: {mean_average_precision(stats):.4f}")

    # 4. export the trained head to the reference torch namespace
    try:
        import torch

        from whisper_at_tpu.checkpoint import export_torch_state_dict

        full = {**model.params, "at_model": averaged}
        sd = export_torch_state_dict(full)
        head_sd = {k: v for k, v in sd.items() if k.startswith("at_model.")}
        out = os.path.join(exp_dir, "head_for_reference.pth")
        torch.save(head_sd, out)
        print(f"exported reference-format head -> {out}")
    except ImportError:
        print("torch unavailable; skipping torch export")


if __name__ == "__main__":
    main()
