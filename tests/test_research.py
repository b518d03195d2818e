"""Research/tooling tests: WER, noisy mixing, feature extraction, FLOPs,
SONYC tooling, checkpoint conversion, native BPE."""

import json
import os
import wave

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_at_tpu.models.dims import ModelDimensions
from whisper_at_tpu.models.whisper import Whisper
from whisper_at_tpu.research.noisy_speech import add_noise, write_wav
from whisper_at_tpu.research.wer import (
    calculate_wer,
    preprocess_text,
    word_edit_distance,
)

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
    n_text_state=64, n_text_layer=2,
)


# --------------------------------------------------------------------------- #
# WER
# --------------------------------------------------------------------------- #


def test_word_edit_distance():
    assert word_edit_distance("a b c".split(), "a b c".split()) == 0
    assert word_edit_distance("a x c".split(), "a b c".split()) == 1
    assert word_edit_distance("a c".split(), "a b c".split()) == 1
    assert word_edit_distance("a b c d".split(), "a b c".split()) == 1
    assert word_edit_distance([], "a b".split()) == 2
    assert word_edit_distance("x y z".split(), []) == 3


def test_calculate_wer():
    hyps = ["the cat sat", "hello world"]
    refs = ["the cat sat on the mat", "hello there world"]
    # 3 deletions + 1 deletion over 6+3=9 ref words
    assert calculate_wer(hyps, refs) == pytest.approx(4 / 9)


def test_preprocess_text():
    assert preprocess_text("Hello, World!") == "HELLO WORLD"


# --------------------------------------------------------------------------- #
# noisy speech
# --------------------------------------------------------------------------- #


def test_add_noise_snr():
    rng = np.random.default_rng(0)
    speech = rng.standard_normal(16000).astype(np.float32)
    noise = rng.standard_normal(8000).astype(np.float32) * 0.5
    mixed = add_noise(speech, noise, noise_db=0.0)
    assert mixed.shape == speech.shape
    # at 0 dB SNR the added noise power approximates the speech power
    added = mixed - speech
    ratio = (speech**2).mean() / (added**2).mean()
    assert 0.8 < ratio < 1.25
    # noise shorter than speech must be looped, not zero-padded
    assert np.abs(added[8000:]).sum() > 0


def test_write_wav_roundtrip(tmp_path):
    from whisper_at_tpu.audio import load_audio

    x = (0.5 * np.sin(np.linspace(0, 100, 16000))).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, x)
    loaded = load_audio(path)
    np.testing.assert_allclose(loaded, x, atol=1e-3)


# --------------------------------------------------------------------------- #
# SSL baselines (offline random-weight execution of the HF runners)
# --------------------------------------------------------------------------- #


def test_ctc_baseline_noise_experiment_end_to_end(tmp_path):
    """Drives the full noise-robustness baseline loop the reference runs
    with released wav2vec2 weights (transcribe_wav2vec.py + compute_wer.py):
    mix speech+noise at two SNRs -> greedy CTC transcribe -> per-SNR WER.
    Random weights (no egress), so WER is meaningless — the point is that
    every stage of the runner executes."""
    from whisper_at_tpu.research.baselines import build_local_ctc, transcribe_ctc
    from whisper_at_tpu.research.noisy_speech import generate_noisy_set
    from whisper_at_tpu.research.wer import eval_noise_wer

    rng = np.random.default_rng(0)
    speech_dir, noise_dir = tmp_path / "speech", tmp_path / "noise"
    truth_dir = tmp_path / "truth"
    for d in (speech_dir, noise_dir, truth_dir):
        os.makedirs(d)
    for utt in ("0001", "0002"):
        write_wav(str(speech_dir / f"{utt}.wav"),
                  rng.standard_normal(8000).astype(np.float32) * 0.1)
        (truth_dir / f"{utt}.txt").write_text("HELLO WORLD")
    write_wav(str(noise_dir / "dog.wav"),
              rng.standard_normal(4000).astype(np.float32) * 0.1)

    mixed = generate_noisy_set(
        [str(speech_dir / "0001.wav"), str(speech_dir / "0002.wav")],
        {0: [str(noise_dir / "dog.wav")]},
        str(tmp_path / "mix"), snr_levels=(0, 10), n_utterances=2,
    )
    assert len(mixed) == 4

    pm = build_local_ctc()
    text_dir = str(tmp_path / "texts")
    outputs = transcribe_ctc("wav2vec2-base", mixed, text_dir,
                             processor_model=pm)
    assert len(outputs) == 4
    for p in outputs:
        text = open(p).read()
        for tok in ("<s>", "</s>", "<unk>"):  # random weights emit specials
            text = text.replace(tok, "")
        assert set(text) <= set("ABCDEFGHIJKLMNOPQRSTUVWXYZ' ")
    # resume-by-skip: a second run transcribes nothing
    assert transcribe_ctc("wav2vec2-base", mixed, text_dir,
                          processor_model=pm) == []

    wer = eval_noise_wer(text_dir, str(truth_dir),
                         str(tmp_path / "wer.csv"), snr_levels=(0, 10))
    assert set(wer) == {0, 10} and all(v >= 0 for v in wer.values())


def test_ssl_feature_extraction_offline():
    """extract_ssl_features on a locally-built wav2vec2 encoder: all-layer
    taps [L+1, T, D], optional time pooling — the SSL analogue of the
    Whisper all-layer taps (intermediate_feat_extract/{w2v,hubert})."""
    from whisper_at_tpu.research.baselines import (
        build_local_ssl,
        extract_ssl_features,
    )

    rng = np.random.default_rng(1)
    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    pm = build_local_ssl()
    taps = extract_ssl_features("wav2vec2-base", audio,
                                pool=None, processor_model=pm)
    assert taps.ndim == 3 and taps.shape[0] == 3 and taps.shape[2] == 32
    pooled = extract_ssl_features("wav2vec2-base", audio,
                                  pool=4, processor_model=pm)
    assert pooled.shape == (3, taps.shape[1] // 4, 32)
    np.testing.assert_allclose(
        pooled[0, 0], taps[0, :4].mean(axis=0), rtol=1e-5, atol=1e-6
    )


# --------------------------------------------------------------------------- #
# feature extraction
# --------------------------------------------------------------------------- #


def test_extract_features_truncated():
    from whisper_at_tpu.research.feature_extract import extract_features

    model = Whisper(DIMS, seed=0)
    audio = np.random.default_rng(0).standard_normal(16000 * 10).astype(np.float32)
    feat = extract_features(model, audio, n_frames=1000, fp16=False)
    # 1000 frames -> 500 tokens -> 25 pooled; embedding tap dropped
    assert feat.shape == (DIMS.n_audio_layer, 25, 64)

    feat5 = extract_features(model, audio[: 16000 * 5], n_frames=500, fp16=False)
    assert feat5.shape == (DIMS.n_audio_layer, 12, 64)


def test_extract_features_padded():
    from whisper_at_tpu.research.feature_extract import extract_features_padded

    model = Whisper(DIMS, seed=0)
    audio = np.random.default_rng(1).standard_normal(16000 * 10).astype(np.float32)
    feat = extract_features_padded(model, audio, n_tokens=500, fp16=False)
    assert feat.shape == (DIMS.n_audio_layer, 25, 64)


def test_extract_feature_set(tmp_path):
    from whisper_at_tpu.research.feature_extract import extract_feature_set

    model = Whisper(DIMS, seed=0)
    rng = np.random.default_rng(0)
    wavs = []
    for i in range(3):
        path = str(tmp_path / f"clip{i}.wav")
        x = (0.3 * rng.standard_normal(16000 * 3)).astype(np.float32)
        write_wav(path, x)
        wavs.append({"wav": path, "labels": "/m/000"})
    data_json = str(tmp_path / "data.json")
    with open(data_json, "w") as f:
        json.dump({"data": wavs}, f)

    out = extract_feature_set(model, data_json, str(tmp_path / "feats"),
                              n_frames=1000, batch_size=2, fp16=False)
    assert len(out) == 3
    feat = np.load(out[0])["arr_0"]
    assert feat.shape == (DIMS.n_audio_layer, 25, 64)
    # resume-by-skip: second run extracts nothing
    out2 = extract_feature_set(model, data_json, str(tmp_path / "feats"),
                               n_frames=1000, batch_size=2, fp16=False)
    assert out2 == []


# --------------------------------------------------------------------------- #
# FLOPs
# --------------------------------------------------------------------------- #


def test_flops_accounting():
    from whisper_at_tpu.models.dims import dims_for
    from whisper_at_tpu.ops.flops import at_overhead, encoder_flops, tltr_flops

    dims = dims_for("large-v1")
    res = at_overhead(dims)
    # full TL-TR: a few percent of the ASR cost for a 30 s window; the
    # low-compute TL-TR-512 head is the one meeting the reference's "<1%"
    # claim (README.md:33,39 - "not for all sizes")
    assert res["at_overhead_ratio"] < 0.05
    res_low = at_overhead(dims, "tl_down_tr_512_1_8")
    assert res_low["at_overhead_ratio"] < 0.01
    assert encoder_flops(dims) > 1e11
    # low-compute head is cheaper than the full head
    assert tltr_flops("lw_down_tr_512_1_8", 32, 1280) < tltr_flops("lw_tr_1_8", 32, 1280)


# --------------------------------------------------------------------------- #
# SONYC tooling
# --------------------------------------------------------------------------- #


@pytest.fixture()
def sonyc_fixture(tmp_path):
    annotations = tmp_path / "annotations.csv"
    annotations.write_text(
        "split,audio_filename,annotator_id,1_engine_presence,2_dog-barking_presence\n"
        "train,a.wav,0,1,0\n"
        "train,b.wav,1,0,1\n"
        "validate,c.wav,0,1,1\n"
    )
    audioset_csv = tmp_path / "class_labels_indices.csv"
    audioset_csv.write_text(
        'index,mid,display_name\n0,/m/engine,"Engine"\n1,/m/dog,"Dog"\n'
    )
    mapping = tmp_path / "mapping.json"
    mapping.write_text(json.dumps({"engine": "Engine", "dog-barking": None}))
    return {
        "annotations": str(annotations),
        "audioset_csv": str(audioset_csv),
        "mapping": str(mapping),
        "tmp": tmp_path,
    }


def test_sonyc_processing(sonyc_fixture):
    import sys

    sys.path.insert(0, "tools")
    from sonyc_ust import (
        build_label_space,
        load_audioset_classes,
        parse_annotations,
        write_dataset_jsons,
    )

    audio_classes, audio_split = parse_annotations(sonyc_fixture["annotations"])
    assert audio_classes["a.wav"] == {"engine"}
    assert audio_classes["c.wav"] == {"engine", "dog-barking"}

    audioset_classes, index_to_mid = load_audioset_classes(
        sonyc_fixture["audioset_csv"]
    )
    mapping = json.load(open(sonyc_fixture["mapping"]))
    label_index, mids = build_label_space(
        audio_classes, mapping, audioset_classes, index_to_mid
    )
    assert label_index["engine"] == 0  # mapped to AudioSet
    assert label_index["dog-barking"] == 2  # new class past the table

    out = write_dataset_jsons(
        audio_classes, audio_split, label_index, mids, "/audio",
        str(sonyc_fixture["tmp"] / "out"),
    )
    train = json.load(open(out["train"]))["data"]
    assert len(train) == 2
    assert os.path.exists(out["class_csv"])


def test_sonyc_verified_only(sonyc_fixture):
    import sys

    sys.path.insert(0, "tools")
    from sonyc_ust import parse_annotations

    audio_classes, _ = parse_annotations(
        sonyc_fixture["annotations"], verified_only=True
    )
    assert "b.wav" not in audio_classes  # annotator_id 1 filtered out


def test_match_labels_fallback():
    import sys

    sys.path.insert(0, "tools")
    from match_labels import match_labels

    audioset = {"Dog": "a barking animal", "Engine": "motor sound"}
    mapping = match_labels(["dog-barking", "engine"], audioset, threshold=0.6)
    assert mapping["engine"] == "Engine"
    assert mapping["dog-barking"] == "Dog"


# --------------------------------------------------------------------------- #
# checkpoint conversion
# --------------------------------------------------------------------------- #


def test_torch_checkpoint_roundtrip(tmp_path):
    """export -> convert must reproduce the original pytree (strict merge
    semantics of whisper_at/__init__.py:187-191)."""
    import torch

    from whisper_at_tpu.checkpoint import (
        convert_torch_state_dict,
        export_torch_state_dict,
        load_torch_checkpoint,
    )

    model = Whisper(DIMS, seed=4)
    sd = export_torch_state_dict(model.params)
    params2 = convert_torch_state_dict(sd, DIMS)

    import jax

    for a, b in zip(jax.tree.leaves(model.params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-6
        )

    # two-file load path (whisper .pt + at .pth)
    whisper_sd = {k: v for k, v in sd.items() if not k.startswith("at_model.")}
    at_sd = {k: v for k, v in sd.items() if k.startswith("at_model.")}
    pt_path = str(tmp_path / "model.pt")
    torch.save({"dims": DIMS.__dict__, "model_state_dict": whisper_sd}, pt_path)
    pth_path = str(tmp_path / "at.pth")
    torch.save(at_sd, pth_path)

    dims2, params3 = load_torch_checkpoint(pt_path, pth_path)
    assert dims2 == DIMS
    for a, b in zip(jax.tree.leaves(model.params), jax.tree.leaves(params3)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-6
        )


def test_head_checkpoint_conversion():
    from whisper_at_tpu.checkpoint import (
        convert_head_state_dict,
        export_torch_state_dict,
        rename_head_state_dict,
    )

    model = Whisper(DIMS, seed=5)
    sd = export_torch_state_dict(model.params)
    at_sd = {k: v for k, v in sd.items() if k.startswith("at_model.")}

    # module.* namespace (raw training run) -> at_model.*
    module_sd = {"module." + k[len("at_model."):]: v for k, v in at_sd.items()}
    renamed = rename_head_state_dict(module_sd)
    assert set(renamed.keys()) == set(at_sd.keys())

    head = convert_head_state_dict(module_sd)
    import jax

    for a, b in zip(
        jax.tree.leaves(model.params["at_model"]), jax.tree.leaves(head)
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-6
        )


def test_native_checkpoint_roundtrip(tmp_path):
    from whisper_at_tpu.checkpoint import load_params, save_params

    model = Whisper(DIMS, seed=6)
    path = str(tmp_path / "ckpt.npz")
    save_params(path, model.params, DIMS)
    dims2, params2 = load_params(path)
    assert dims2 == DIMS
    import jax

    for a, b in zip(jax.tree.leaves(model.params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


# --------------------------------------------------------------------------- #
# native BPE
# --------------------------------------------------------------------------- #


def test_native_bpe_matches_python():
    from whisper_at_tpu.bpe import Encoding, _bpe_merge, load_ranks
    from whisper_at_tpu.native import native_bpe

    path = os.path.join(
        os.path.dirname(__file__), "..", "whisper_at_tpu", "assets",
        "gpt2.tiktoken",
    )
    engine = native_bpe(path)
    if engine is None:
        pytest.skip("native toolchain unavailable")
    ranks = load_ranks(path)
    assert engine.num_ranks == len(ranks)
    for text in [" hello", " world", "Zyzzyva", " antidisestablishmentarianism",
                 "12345", "ünïcödé"]:
        piece = text.encode("utf-8")
        assert engine.encode_piece(piece) == _bpe_merge(ranks, piece)


def test_as_eval_end_to_end(tmp_path):
    """whisper_at_as_eval equivalent: transcribe+tag each eval clip, save
    pred/truth arrays, compute mAP; compute_mAP re-reads the saved arrays."""
    import whisper_at_tpu  # noqa: F401  (binds transcribe)
    from whisper_at_tpu.research.as_eval import (
        compute_map_from_saved,
        evaluate_audioset,
    )

    model = Whisper(DIMS, seed=7)
    rng = np.random.default_rng(0)
    label_csv = tmp_path / "labels.csv"
    with open(label_csv, "w") as f:
        f.write("index,mid,display_name\n")
        for i in range(4):
            f.write(f'{i},/m/{i:03d},"c{i}"\n')
    entries = []
    for i in range(3):
        path = str(tmp_path / f"c{i}.wav")
        write_wav(path, (0.2 * rng.standard_normal(16000 * 2)).astype(np.float32))
        entries.append({"wav": path, "labels": f"/m/{i % 4:03d}"})
    eval_json = tmp_path / "eval.json"
    with open(eval_json, "w") as f:
        json.dump({"data": entries}, f)

    res = evaluate_audioset(
        model, str(eval_json), str(label_csv), str(tmp_path / "out"), tag="t"
    )
    assert 0 <= res["mAP"] <= 1
    again = compute_map_from_saved(str(tmp_path / "out"), ["t"])
    assert again["t"] == pytest.approx(res["mAP"])


def test_layer_probe():
    from whisper_at_tpu.research.layer_probe import layer_wise_probe

    rng = np.random.default_rng(0)
    n, n_layers, dim = 80, 3, 16
    labels = rng.integers(0, 4, n)
    feats = rng.standard_normal((n, n_layers, dim)).astype(np.float32)
    # layer 1 is separable, others are noise
    feats[np.arange(n), 1, labels] += 10.0
    folds = np.repeat(np.arange(4), n // 4)
    results = layer_wise_probe(feats, labels, folds, max_iter=1500)
    assert len(results) == n_layers
    accs = [r["accuracy"] for r in results]
    assert accs[1] > accs[0] and accs[1] > accs[2]
    assert accs[1] > 0.6


def test_plots_return_values(tmp_path):
    from whisper_at_tpu.research import plots

    wer = {"whisper": [0.9, 0.7, 0.5, 0.3, 0.2, 0.15, 0.1, 0.08, 0.05]}
    out = plots.plot_wer_vs_snr(wer, str(tmp_path / "f1.png"))
    assert out == wer
    counts = plots.plot_best_layer_histogram([0, 1, 1, 2], 4, str(tmp_path / "f3.png"))
    assert list(np.asarray(counts)) == [1, 2, 1, 0]
    top = plots.plot_classwise_noise(
        np.array([0.1, 0.9, 0.5]), ["a", "b", "c"], str(tmp_path / "f2.png"), top_k=2
    )
    assert top[0][0] == "b"
    if plots.HAVE_MPL:
        assert (tmp_path / "f1.png").exists()


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    import jax

    from whisper_at_tpu.checkpoint import load_params_orbax, save_params_orbax

    model = Whisper(DIMS, seed=8)
    path = str(tmp_path / "orbax_ckpt")
    save_params_orbax(path, model.params, DIMS)
    dims2, params2 = load_params_orbax(path)
    assert dims2 == DIMS
    for a, b in zip(jax.tree.leaves(model.params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_extract_features_many_matches_per_clip():
    """Batched device-pooled extraction equals the per-clip path (same
    mel truncation, same taps, pooling on device instead of numpy)."""
    from whisper_at_tpu.research.feature_extract import (
        extract_features,
        extract_features_many,
    )

    model = Whisper(DIMS, seed=3)
    rng = np.random.default_rng(7)
    clips = [rng.standard_normal(16000 * 10).astype(np.float32) * 0.1
             for _ in range(3)]
    batched = np.asarray(
        extract_features_many(model, clips, n_frames=1000, fp16=False),
        np.float32,
    )
    for i, clip in enumerate(clips):
        solo = extract_features(model, clip, n_frames=1000, fp16=False)
        np.testing.assert_allclose(batched[i], solo, rtol=1e-5, atol=1e-6)


def test_extract_features_many_ragged_and_fetch_dtype():
    """Ragged clip lengths fall back to the per-clip mel chain with the
    same results (short clip zero-padded on the mel); fetch_dtype returns
    the pooled stack in the requested dtype (the D2H halving lever)."""
    import jax.numpy as jnp

    from whisper_at_tpu.research.feature_extract import (
        extract_features,
        extract_features_many,
    )

    model = Whisper(DIMS, seed=3)
    rng = np.random.default_rng(11)
    clips = [rng.standard_normal(16000 * 10).astype(np.float32) * 0.1,
             rng.standard_normal(16000 * 6).astype(np.float32) * 0.1]
    batched = np.asarray(
        extract_features_many(model, clips, n_frames=1000, fp16=False),
        np.float32,
    )
    for i, clip in enumerate(clips):
        solo = extract_features(model, clip, n_frames=1000, fp16=False)
        np.testing.assert_allclose(batched[i], solo, rtol=1e-5, atol=1e-6)

    out16 = extract_features_many(model, clips, n_frames=1000, fp16=False,
                                  fetch_dtype=jnp.bfloat16)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), batched, rtol=1e-2, atol=1e-3,
    )
