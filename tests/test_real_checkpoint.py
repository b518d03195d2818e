"""Real-checkpoint path validation.

The sandbox has zero egress, so these tests exercise the ENTIRE official
checkpoint path — registry name -> cached two-file download -> torch
deserialize -> convert -> transcribe+tag — on synthetic checkpoints written
in the exact on-disk format of the released files (OpenAI `.pt` with
dims + model_state_dict, TL-TR `.pth` with at_model.* keys). The moment real
weights are present in ~/.cache/whisper, `test_real_weights_when_cached`
and tools/validate_real_checkpoint.py run the real parity contract.
"""

import os
import sys
import wave

import numpy as np
import pytest

import whisper_at_tpu as wat
from whisper_at_tpu.checkpoint import export_torch_state_dict
from whisper_at_tpu.models.dims import ModelDimensions
from whisper_at_tpu.models.whisper import Whisper

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")

TINY_DIMS = dict(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
    n_text_state=64, n_text_layer=2,
)


def _write_official_pair(root, dims_dict, seed=3):
    """Write {root}/tiny.pt + {root}/tiny_ori.pth in the released format."""
    import torch

    model = Whisper(ModelDimensions(**dims_dict), seed=seed)
    sd = export_torch_state_dict(model.params)
    backbone = {k: v for k, v in sd.items() if not k.startswith("at_model.")}
    head = {k: v for k, v in sd.items() if k.startswith("at_model.")}
    os.makedirs(root, exist_ok=True)
    pt = os.path.join(root, "tiny.pt")
    pth = os.path.join(root, "tiny_ori.pth")
    torch.save({"dims": dims_dict, "model_state_dict": backbone}, pt)
    torch.save(head, pth)
    return model, pt, pth


def _write_wav(path, seconds=4.0, freq=440.0):
    t = np.arange(int(16000 * seconds)) / 16000.0
    x = (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    with wave.open(path, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes((x * 32767).astype(np.int16).tobytes())
    return x


def test_official_name_load_from_cache_and_transcribe(tmp_path):
    """load_model('tiny', download_root=...) must use cached files (no
    network) and run the full transcribe+tag pipeline — the exact code path
    real released checkpoints take."""
    import jax.numpy as jnp

    ref_model, _, _ = _write_official_pair(str(tmp_path), TINY_DIMS)
    model = wat.load_model("tiny", download_root=str(tmp_path),
                           dtype=jnp.float32)
    assert model.dims.n_audio_state == 64
    # weights round-tripped through the torch format exactly
    for section in ("encoder", "decoder", "at_model"):
        a = np.asarray(ref_model.params[section]["blocks"]["attn_ln"]["scale"]
                       if section != "at_model"
                       else ref_model.params[section]["mlp"]["w"], np.float32)
        b = np.asarray(model.params[section]["blocks"]["attn_ln"]["scale"]
                       if section != "at_model"
                       else model.params[section]["mlp"]["w"], np.float32)
        np.testing.assert_allclose(a, b, atol=1e-6)

    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(16000 * 4)).astype(np.float32)
    result = wat.transcribe(
        model, audio, language="en", fp16=False, temperature=0.0,
        sample_len=8, logprob_threshold=None,
        compression_ratio_threshold=None, no_speech_threshold=None,
    )
    assert "text" in result and len(result["audio_tag"]) >= 1


def test_vanilla_pt_without_head_warns(tmp_path):
    """A lone OpenAI .pt (no TL-TR head) loads for ASR with a random-head
    warning instead of crashing."""
    import jax.numpy as jnp
    import torch

    model = Whisper(ModelDimensions(**TINY_DIMS), seed=5)
    sd = export_torch_state_dict(model.params)
    backbone = {k: v for k, v in sd.items() if not k.startswith("at_model.")}
    pt = str(tmp_path / "vanilla.pt")
    torch.save({"dims": TINY_DIMS, "model_state_dict": backbone}, pt)

    with pytest.warns(UserWarning, match="RANDOM"):
        loaded = wat.load_model(pt, dtype=jnp.float32)
    assert loaded.dims.n_text_layer == 2


def test_local_pt_with_at_checkpoint_pair(tmp_path):
    """Local .pt + .pth pair (at_checkpoint kwarg) merges the head."""
    import jax.numpy as jnp

    ref_model, pt, pth = _write_official_pair(str(tmp_path), TINY_DIMS, seed=9)
    model = wat.load_model(pt, at_checkpoint=pth, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ref_model.params["at_model"]["mlp"]["w"], np.float32),
        np.asarray(model.params["at_model"]["mlp"]["w"], np.float32),
        atol=1e-6,
    )


def test_validate_tool_end_to_end_on_synthetic_pair(tmp_path):
    """Drive tools/validate_real_checkpoint.py through ALL stages (load,
    fp32 torch-oracle activations, sequential, batched, int8 parity,
    goldens) on a synthetic official-format pair."""
    sys.path.insert(0, TOOLS)
    try:
        import validate_real_checkpoint as vrc
    finally:
        sys.path.remove(TOOLS)

    _, pt, pth = _write_official_pair(str(tmp_path), TINY_DIMS, seed=7)
    wav = str(tmp_path / "clip.wav")
    _write_wav(wav)
    out = str(tmp_path / "goldens.npz")
    # --skip-quant: random weights give near-tied logits, so int8 token
    # flips are expected noise here; quant parity on structured test models
    # is covered by test_parallel/test_decoding, and on REAL weights by
    # test_real_weights_when_cached (stage 5 stays on there).
    rc = vrc.main([
        "--checkpoint", pt, "--at-checkpoint", pth, "--audio", wav,
        "--language", "en", "--fp32", "--out", out, "--skip-quant",
    ])
    assert rc == 0
    goldens = np.load(out, allow_pickle=True)
    assert goldens["audio_tag"].shape[-1] == 527
    assert str(goldens["model"]) == "tiny.pt"


def test_download_checksum_cache_mismatch_redownloads(tmp_path, monkeypatch):
    """A cached file whose sha256 differs from the URL's embedded digest is
    re-downloaded by default (corruption is the common cause — the reference
    ships this check commented out and fails later with an opaque torch
    deserialize error)."""
    import hashlib
    import io
    import urllib.request

    from whisper_at_tpu import _download

    payload = b"the released checkpoint bytes"
    url = ("https://example.invalid/"
           + hashlib.sha256(payload).hexdigest() + "/tiny.pt")

    class FakeResponse(io.BytesIO):
        def info(self):
            return {"Content-Length": str(len(payload))}

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(
        urllib.request, "urlopen", lambda u: FakeResponse(payload)
    )
    (tmp_path / "tiny.pt").write_bytes(b"corrupted bytes")
    with pytest.warns(UserWarning, match="re-downloading"):
        out = _download(url, str(tmp_path), in_memory=True)
    assert out == payload
    assert (tmp_path / "tiny.pt").read_bytes() == payload


def test_download_checksum_cache_mismatch_kept_when_opted_out(
        tmp_path, monkeypatch):
    """WHISPER_AT_TPU_KEEP_MISMATCHED_CACHE=1 keeps a mismatching cached file
    (an intentional local substitute under an official name) with a warning."""
    from whisper_at_tpu import _download
    from whisper_at_tpu.registry import _MODELS

    monkeypatch.setenv("WHISPER_AT_TPU_KEEP_MISMATCHED_CACHE", "1")
    (tmp_path / "tiny.pt").write_bytes(b"local substitute bytes")
    with pytest.warns(UserWarning, match="sha256"):
        out = _download(_MODELS["tiny"], str(tmp_path), in_memory=False)
    assert out == str(tmp_path / "tiny.pt")
    assert (tmp_path / "tiny.pt").read_bytes() == b"local substitute bytes"


def test_download_checksum_fresh_mismatch_raises(tmp_path, monkeypatch):
    """A FRESH download that fails the URL's sha256 is deleted and raises a
    clear corruption error (the reference ships this check commented out)."""
    import io
    import urllib.request

    from whisper_at_tpu import _download

    payload = b"not the released checkpoint"

    class FakeResponse(io.BytesIO):
        def info(self):
            return {"Content-Length": str(len(payload))}

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(
        urllib.request, "urlopen", lambda url: FakeResponse(payload)
    )
    url = ("https://example.invalid/" + "0" * 64 + "/tiny.pt")
    with pytest.raises(RuntimeError, match="corrupted"):
        _download(url, str(tmp_path), in_memory=False)
    assert not (tmp_path / "tiny.pt").exists()

    # matching digest succeeds and caches
    import hashlib

    good_url = (
        "https://example.invalid/"
        + hashlib.sha256(payload).hexdigest()
        + "/tiny.pt"
    )
    out = _download(good_url, str(tmp_path), in_memory=False)
    assert open(out, "rb").read() == payload


def test_download_no_checksum_url_skips_verification(tmp_path):
    """TL-TR head URLs (dropbox) carry no digest — cached files load
    without warnings."""
    import warnings as _warnings

    from whisper_at_tpu import _download
    from whisper_at_tpu.registry import _MODELS_AT

    (tmp_path / "tiny_ori.pth").write_bytes(b"head bytes")
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        out = _download(_MODELS_AT["tiny"], str(tmp_path), in_memory=True)
    assert out == b"head bytes"


REAL_TINY = os.path.expanduser("~/.cache/whisper/tiny.pt")
REAL_TINY_AT = os.path.expanduser("~/.cache/whisper/tiny_ori.pth")


@pytest.mark.skipif(
    not (os.path.isfile(REAL_TINY) and os.path.isfile(REAL_TINY_AT)),
    reason="real released checkpoints not cached (offline sandbox)",
)
def test_real_weights_when_cached(tmp_path):
    """The real parity contract — activates automatically once the released
    tiny checkpoints are present in ~/.cache/whisper."""
    sys.path.insert(0, TOOLS)
    try:
        import validate_real_checkpoint as vrc
    finally:
        sys.path.remove(TOOLS)

    wav = str(tmp_path / "clip.wav")
    _write_wav(wav, seconds=6.0)
    rc = vrc.main(["--model", "tiny", "--audio", wav, "--language", "en"])
    assert rc == 0
