"""Training stack tests: TLTR modes vs torch oracle, dataloader semantics,
losses vs torch, end-to-end tiny training run with weight averaging."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import oracle_torch as oracle
from whisper_at_tpu.train import (
    DataLoader,
    FeatureDataset,
    balanced_sample_weights,
    bce_with_logits_loss,
    calculate_stats,
    ce_loss,
    d_prime,
    init_tltr,
    make_eval_step,
    make_optimizer,
    make_train_step,
    mean_average_precision,
    tltr_apply,
    train,
    validate,
    wa_model,
)

ALL_MODES = [
    "mean_mlp", "last_mlp", "wa_mlp", "mean_tr_4", "last_tr_4", "wa_tr_4",
    "wa_down_tr_32_4", "lw_tr_1_4", "lw_down_tr_32_1_4",
]


@pytest.mark.parametrize("mode", ALL_MODES)
def test_tltr_mode_shapes(mode):
    key = jax.random.PRNGKey(0)
    params = init_tltr(key, label_dim=11, n_layer=3, rep_dim=64, mode=mode)
    x = jax.random.normal(key, (2, 3, 25, 64))
    out = tltr_apply(params, x, mode)
    assert out.shape == (2, 11)
    assert np.isfinite(np.asarray(out)).all()


def test_tltr_lw_tr_matches_at_head_math():
    """lw_tr mode must equal the production ATModel on a single segment."""
    from whisper_at_tpu.models.at_head import at_head_apply

    key = jax.random.PRNGKey(1)
    params = init_tltr(key, label_dim=527, n_layer=3, rep_dim=64, mode="lw_tr_1_4")
    x = jax.random.normal(key, (2, 3, 25, 64))
    out_tltr = tltr_apply(params, x, "lw_tr_1_4")
    # ATModel with a 25-frame decision window and one segment is the same math
    at_params = {k: v for k, v in params.items()}
    out_at = at_head_apply(at_params, x, "tl_tr_1_4", 25, 1)[:, 0]
    np.testing.assert_allclose(
        np.asarray(out_tltr), np.asarray(out_at), atol=2e-4
    )


def test_bce_loss_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 10)).astype(np.float32)
    targets = (rng.random((4, 10)) > 0.8).astype(np.float32)
    ours = float(bce_with_logits_loss(jnp.asarray(logits), jnp.asarray(targets)))
    golden = torch.nn.BCEWithLogitsLoss()(
        torch.from_numpy(logits), torch.from_numpy(targets)
    ).item()
    np.testing.assert_allclose(ours, golden, rtol=1e-5)

    ours_pw = float(
        bce_with_logits_loss(jnp.asarray(logits), jnp.asarray(targets), pos_weight=3.0)
    )
    golden_pw = torch.nn.BCEWithLogitsLoss(pos_weight=torch.full((10,), 3.0))(
        torch.from_numpy(logits), torch.from_numpy(targets)
    ).item()
    np.testing.assert_allclose(ours_pw, golden_pw, rtol=1e-5)


def test_ce_loss_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((4, 10)).astype(np.float32)
    targets = rng.random((4, 10)).astype(np.float32)
    targets /= targets.sum(axis=1, keepdims=True)
    ours = float(ce_loss(jnp.asarray(logits), jnp.asarray(targets)))
    golden = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(logits), torch.from_numpy(targets)
    ).item()
    np.testing.assert_allclose(ours, golden, rtol=1e-5)


def test_calculate_stats_and_dprime():
    rng = np.random.default_rng(2)
    target = (rng.random((50, 4)) > 0.7).astype(np.float32)
    target[0] = [1, 0, 0, 0]  # ensure class 0 has a positive
    output = target + 0.3 * rng.standard_normal((50, 4))
    stats = calculate_stats(output, target)
    assert len(stats) == 4
    m = mean_average_precision(stats)
    assert 0 <= m <= 1
    # predictions correlated with targets: far better than chance
    assert m > 0.5
    assert d_prime(0.5) == pytest.approx(0.0, abs=1e-9)
    assert d_prime(0.9) > 0


# --------------------------------------------------------------------------- #
# dataset fixtures
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("feat_as")
    feat_dir = root / "feat_as"
    feat_dir.mkdir()
    rng = np.random.default_rng(0)
    n, n_layer, rep_dim, n_class = 24, 3, 24, 8

    label_csv = root / "class_labels_indices.csv"
    with open(label_csv, "w") as f:
        f.write("index,mid,display_name\n")
        for i in range(n_class):
            f.write(f'{i},/m/{i:03d},"class {i}"\n')

    data = []
    for i in range(n):
        cls = int(rng.integers(0, n_class))
        # separable features: class signature + noise
        feat = rng.standard_normal((n_layer, 25, rep_dim)).astype(np.float32)
        feat[:, :, cls] += 4.0
        np.savez(feat_dir / f"clip{i}.npz", feat)
        data.append({"wav": f"/fake/clip{i}.wav", "labels": f"/m/{cls:03d}"})

    train_json = root / "train.json"
    with open(train_json, "w") as f:
        json.dump({"data": data}, f)

    return {
        "root": root, "feat_dir": feat_dir, "label_csv": str(label_csv),
        "train_json": str(train_json), "n_class": n_class,
        "n_layer": n_layer, "rep_dim": rep_dim, "n": n,
    }


def test_feature_dataset_loading(tiny_dataset):
    ds = FeatureDataset(
        tiny_dataset["train_json"],
        {"freqm": 0, "timem": 0, "mixup": 0, "dataset": "as-full",
         "label_smooth": 0.1, "tar_path": str(tiny_dataset["feat_dir"])},
        label_csv=tiny_dataset["label_csv"],
    )
    assert len(ds) == tiny_dataset["n"]
    feat, target = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert feat.shape == (3, 25, 24)
    assert target.shape == (8,)
    # label smoothing: positive = 1 - eps, negatives = eps / n_class
    assert target.max() == pytest.approx(0.9)
    assert target.min() == pytest.approx(0.1 / 8)


def test_feature_dataset_mixup(tiny_dataset):
    ds = FeatureDataset(
        tiny_dataset["train_json"],
        {"freqm": 0, "timem": 0, "mixup": 1.0, "dataset": "as-full",
         "label_smooth": 0.0, "tar_path": str(tiny_dataset["feat_dir"])},
        label_csv=tiny_dataset["label_csv"],
    )
    _, target = ds.__getitem__(0, rng=np.random.default_rng(1))
    # mixed labels sum to ~1 (two classes share the mass) or exactly 1 if same class
    assert target.sum() == pytest.approx(1.0, abs=1e-5)


def test_feature_dataset_specaug(tiny_dataset):
    ds = FeatureDataset(
        tiny_dataset["train_json"],
        {"freqm": 10, "timem": 10, "mixup": 0, "dataset": "as-full",
         "label_smooth": 0.0, "tar_path": str(tiny_dataset["feat_dir"])},
        label_csv=tiny_dataset["label_csv"],
    )
    feat, _ = ds.__getitem__(0, rng=np.random.default_rng(123))
    # some zeroed columns/rows expected with high probability
    assert (np.abs(feat).sum(axis=(0, 1)) == 0).any() or (
        np.abs(feat).sum(axis=(0, 2)) == 0
    ).any()


def test_missing_file_fallback(tiny_dataset, capsys):
    ds = FeatureDataset(
        tiny_dataset["train_json"],
        {"freqm": 0, "timem": 0, "mixup": 0, "dataset": "as-full",
         "tar_path": "/nonexistent"},
        label_csv=tiny_dataset["label_csv"],
    )
    feat, _ = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert feat.shape == (6, 25, 512)
    assert (feat == 0).all()


def test_balanced_sample_weights(tiny_dataset):
    w = balanced_sample_weights(
        tiny_dataset["train_json"], tiny_dataset["label_csv"]
    )
    assert w.shape == (tiny_dataset["n"],)
    assert (w > 0).all()


def test_dataloader_batching(tiny_dataset):
    ds = FeatureDataset(
        tiny_dataset["train_json"],
        {"freqm": 0, "timem": 0, "mixup": 0, "dataset": "as-full",
         "tar_path": str(tiny_dataset["feat_dir"])},
        label_csv=tiny_dataset["label_csv"],
    )
    loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    for feats, targets in batches:
        assert feats.shape == (8, 3, 25, 24)
        assert targets.shape == (8, 8)


def test_end_to_end_training_learns(tiny_dataset, tmp_path):
    """2-epoch training on separable synthetic data must beat chance mAP and
    produce the reference's artifact suite (result.csv, ckpts, wa)."""
    ds_conf = {"freqm": 0, "timem": 0, "mixup": 0, "dataset": "tiny",
               "label_smooth": 0.0, "tar_path": str(tiny_dataset["feat_dir"])}
    ds = FeatureDataset(
        tiny_dataset["train_json"], ds_conf, label_csv=tiny_dataset["label_csv"]
    )
    train_loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=2)
    val_loader = DataLoader(ds, batch_size=8, num_workers=2)

    mode = "lw_tr_1_4"
    params = init_tltr(
        jax.random.PRNGKey(0), label_dim=8, n_layer=3, rep_dim=24, mode=mode
    )
    exp_dir = str(tmp_path / "exp")
    params = train(
        params, mode, train_loader, val_loader,
        exp_dir=exp_dir, lr=5e-3, n_epochs=3, dataset="tiny",
        compute_dtype=jnp.float32, n_print_steps=1000,
    )

    assert os.path.exists(os.path.join(exp_dir, "result.csv"))
    assert os.path.exists(os.path.join(exp_dir, "models", "audio_model.3.npz"))
    result = np.loadtxt(os.path.join(exp_dir, "result.csv"), delimiter=",")
    final_mAP = result[2, 1]
    assert final_mAP > 0.5, f"did not learn: mAP={final_mAP}"

    averaged = wa_model(exp_dir, 2, 3)
    eval_step = make_eval_step(mode, jnp.float32)
    stats, _ = validate(eval_step, averaged, val_loader)
    assert mean_average_precision(stats) > 0.5


def test_training_resume(tiny_dataset, tmp_path):
    """--resume must continue from the last saved epoch with restored
    optimizer state (the reference cannot resume at all)."""
    from whisper_at_tpu.train.loop import latest_resumable_epoch

    ds_conf = {"freqm": 0, "timem": 0, "mixup": 0, "dataset": "tiny",
               "label_smooth": 0.0, "tar_path": str(tiny_dataset["feat_dir"])}
    ds = FeatureDataset(
        tiny_dataset["train_json"], ds_conf, label_csv=tiny_dataset["label_csv"]
    )
    loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=2)
    val_loader = DataLoader(ds, batch_size=8, num_workers=2)

    mode = "lw_tr_1_4"
    exp_dir = str(tmp_path / "exp_resume")
    params = init_tltr(
        jax.random.PRNGKey(0), label_dim=8, n_layer=3, rep_dim=24, mode=mode
    )
    train(params, mode, loader, val_loader, exp_dir=exp_dir, lr=5e-3,
          n_epochs=2, dataset="tiny", compute_dtype=jnp.float32,
          n_print_steps=1000)
    assert latest_resumable_epoch(exp_dir) == 2

    # resume for a third epoch from the saved state
    fresh = init_tltr(
        jax.random.PRNGKey(99), label_dim=8, n_layer=3, rep_dim=24, mode=mode
    )
    train(fresh, mode, loader, val_loader, exp_dir=exp_dir, lr=5e-3,
          n_epochs=3, dataset="tiny", compute_dtype=jnp.float32,
          n_print_steps=1000, resume=True)
    result = np.loadtxt(os.path.join(exp_dir, "result.csv"), delimiter=",")
    # rows 1-3 all populated; resumed row continues learning
    assert (result[:3, 1] > 0).all()
    assert result[2, 1] > 0.3
