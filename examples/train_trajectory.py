"""TL-TR head training-trajectory demonstration — the offline analogue of the
reference's released training logs (src/whisper_at_train/log/*.txt).

The reference ships per-epoch mAP trajectories for its AudioSet head runs as
golden records. This sandbox has no AudioSet audio, so the trajectory is
demonstrated on a synthetic multi-label sound-event corpus with six
acoustically distinct classes (tone / chirp / noise burst / AM tone / click
train / harmonic stack), exercising the REAL pipeline end to end:

  wavs -> research.feature_extract (all-layer pooled features)
       -> train.FeatureDataset/DataLoader (mixup, SpecAug, label smoothing)
       -> train.train (bf16 steps, per-epoch checkpoints, result.csv)
       -> per-epoch eval mAP trajectory (must RISE)
       -> train.wa_model weight averaging (reference run.py:258-300)

Run:  python examples/train_trajectory.py [--epochs 8] [--root DIR]
The recorded output lives in examples/train_trajectory_log.md.
"""

import argparse
import csv
import json
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("WAT_FORCE_CPU"):
    # must land before first backend use: the axon TPU plugin overrides
    # JAX_PLATFORMS, so only this config pin reliably selects CPU
    jax.config.update("jax_platforms", "cpu")

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

SR = 16000
CLASSES = ["tone", "chirp", "noise_burst", "am_tone", "click_train",
           "harmonics"]


def _event(cls: int, dur_s: float, rng) -> np.ndarray:
    """One synthetic sound event of class `cls`."""
    n = int(SR * dur_s)
    t = np.arange(n) / SR
    if cls == 0:  # steady tone
        f = rng.uniform(300, 500)
        x = np.sin(2 * np.pi * f * t)
    elif cls == 1:  # rising chirp
        f0, f1 = rng.uniform(150, 250), rng.uniform(1500, 2500)
        x = np.sin(2 * np.pi * (f0 * t + (f1 - f0) / (2 * dur_s) * t * t))
    elif cls == 2:  # white noise burst
        x = rng.standard_normal(n)
    elif cls == 3:  # amplitude-modulated tone (tremolo)
        f = rng.uniform(600, 900)
        x = np.sin(2 * np.pi * f * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 6 * t))
    elif cls == 4:  # click train
        x = np.zeros(n)
        period = int(SR / rng.uniform(8, 14))
        x[::period] = 1.0
        x = np.convolve(x, np.hanning(64), mode="same")
    else:  # harmonic stack
        f = rng.uniform(180, 260)
        x = sum(np.sin(2 * np.pi * f * k * t) / k for k in range(1, 6))
    return (x / (np.abs(x).max() + 1e-9)).astype(np.float32)


def make_corpus(root: str, n_train: int, n_eval: int, seed: int = 0):
    """Multi-label clips: 1-2 events at random offsets over light noise."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "audio"), exist_ok=True)

    def one_split(name, n_clips, start_idx):
        data = []
        for i in range(n_clips):
            n = SR * 10
            x = 0.01 * rng.standard_normal(n).astype(np.float32)
            k_events = int(rng.integers(1, 3))
            labels = sorted(
                rng.choice(len(CLASSES), size=k_events, replace=False).tolist()
            )
            for cls in labels:
                dur = rng.uniform(2.0, 5.0)
                ev = _event(cls, dur, rng) * rng.uniform(0.25, 0.5)
                off = int(rng.integers(0, n - len(ev)))
                x[off:off + len(ev)] += ev
            path = os.path.join(root, "audio", f"{name}{start_idx + i}.wav")
            with wave.open(path, "wb") as wf:
                wf.setnchannels(1)
                wf.setsampwidth(2)
                wf.setframerate(SR)
                wf.writeframes(
                    (np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes()
                )
            data.append({
                "wav": path,
                "labels": ",".join(f"/m/{c:03d}" for c in labels),
            })
        out = os.path.join(root, f"{name}.json")
        with open(out, "w") as f:
            json.dump({"data": data}, f)
        return out

    train_json = one_split("train", n_train, 0)
    eval_json = one_split("eval", n_eval, n_train)
    label_csv = os.path.join(root, "labels.csv")
    with open(label_csv, "w") as f:
        f.write("index,mid,display_name\n")
        for c, name in enumerate(CLASSES):
            f.write(f'{c},/m/{c:03d},"{name}"\n')
    return train_json, eval_json, label_csv


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/wat_trajectory")
    parser.add_argument("--model", default="tiny", help="feature-source size")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--n-train", type=int, default=96)
    parser.add_argument("--n-eval", type=int, default=32)
    # 2e-4 learns cleanly on this corpus; 1e-3+ oscillates around chance
    # (a 6-class head sees only ~8 steps/epoch here)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--mesh-dp", type=int, default=0,
                        help="train the head over an N-device ('dp','tp') "
                             "mesh (pjit sharded step). Without N real "
                             "devices the demo re-execs itself on a virtual "
                             "N-device CPU mesh (the conftest recipe).")
    args = parser.parse_args()

    if args.mesh_dp and len(jax.devices()) < args.mesh_dp:
        if os.environ.get("WAT_TRAJ_CHILD"):
            raise SystemExit(
                f"re-exec'd child still sees {len(jax.devices())} devices "
                f"< dp={args.mesh_dp}; an ambient XLA_FLAGS "
                "xla_force_host_platform_device_count is overriding — unset "
                "it or pass a matching --mesh-dp"
            )
        import re
        import subprocess

        env = dict(os.environ)
        flags = env.get("XLA_FLAGS", "")
        # override any existing (smaller) forced device count
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       flags)
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.mesh_dp}"
        ).strip()
        env["WAT_FORCE_CPU"] = "1"  # read below before jax backend init
        env["WAT_TRAJ_CHILD"] = "1"  # re-exec at most once
        raise SystemExit(subprocess.run(
            [sys.executable, os.path.abspath(__file__)]
            + [a for a in sys.argv[1:]], env=env,
        ).returncode)

    print(f"=== corpus: {args.n_train} train / {args.n_eval} eval clips, "
          f"{len(CLASSES)} classes, multi-label ===")
    train_json, eval_json, label_csv = make_corpus(
        args.root, args.n_train, args.n_eval
    )

    # frozen backbone: random weights here (no downloads in this sandbox);
    # with real checkpoints swap in whisper.load_model(args.model)
    model = whisper.build_model(args.model)

    feat_dir = os.path.join(args.root, "feat_as")
    n_written = len(extract_feature_set(model, train_json, feat_dir,
                                        n_frames=1000))
    n_written += len(extract_feature_set(model, eval_json, feat_dir,
                                         n_frames=1000))
    print(f"extracted {n_written} all-layer pooled feature files")

    mesh = None
    if args.mesh_dp:
        from whisper_at_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_devices=args.mesh_dp, tp=1)
        print(f"=== sharded training over mesh {dict(mesh.shape)} ===")

    conf = {"freqm": 0, "timem": 3, "mixup": 0.3, "dataset": "demo",
            "label_smooth": 0.05, "tar_path": feat_dir}
    # sharded batches must divide by dp; 16 works for dp in {1,2,4,8}
    train_bs = 16 if args.mesh_dp else 12
    loader = DataLoader(
        FeatureDataset(train_json, conf, label_csv=label_csv),
        batch_size=train_bs, shuffle=True, num_workers=2,
    )
    val_conf = dict(conf, timem=0, mixup=0, label_smooth=0.0)
    val_loader = DataLoader(
        FeatureDataset(eval_json, val_conf, label_csv=label_csv),
        batch_size=16, num_workers=2,
    )

    mode = "lw_tr_1_8"
    params = init_tltr(
        jax.random.PRNGKey(0), label_dim=len(CLASSES),
        n_layer=model.dims.n_audio_layer, rep_dim=model.dims.n_audio_state,
        mode=mode,
    )
    exp_dir = os.path.join(args.root, "exp")
    params = train(
        params, mode, loader, val_loader, exp_dir=exp_dir, lr=args.lr,
        n_epochs=args.epochs, dataset="demo", compute_dtype=jnp.float32,
        n_print_steps=1000, mesh=mesh,
    )

    # --- the trajectory (reference logs' analogue): result.csv per epoch ---
    with open(os.path.join(exp_dir, "result.csv")) as f:
        rows = [r for r in csv.reader(f) if r]
    maps = [float(r[1]) for r in rows]  # columns: acc, mAP, mAUC, lr
    print("\nepoch  eval mAP")
    for e, m in enumerate(maps, 1):
        print(f"{e:5d}  {m:.4f}")
    assert maps[-1] > maps[0], "trajectory did not improve"
    print(f"\nfinal-epoch mAP {maps[-1]:.4f} "
          f"(chance ~{1.5 / len(CLASSES):.2f}; epoch-1 {maps[0]:.4f})")

    # --- weight averaging over the checkpoint tail (run.py wa story) ---
    start = max(1, args.epochs // 2)
    averaged = wa_model(exp_dir, start, args.epochs)
    stats, _ = validate(make_eval_step(mode, jnp.float32), averaged,
                        val_loader)
    wa_map = mean_average_precision(stats)
    print(f"wa_model(epochs {start}-{args.epochs}) mAP {wa_map:.4f} "
          f"vs final epoch {maps[-1]:.4f}"
          + ("  <- averaging helped" if wa_map >= maps[-1] else ""))


if __name__ == "__main__":
    main()
