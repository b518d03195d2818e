"""Literal-reference differential at PRODUCTION geometry (VERDICT r4 #6).

The main differential module (test_reference_differential.py) runs at toy
dims (n_state=64, head_dim=16, 2 layers). Tile-shape/layout logic that keys
on the production head_dim 64 or 128-lane packing — the fused cross-decode
layout's head folds, int8/int4 lane packing, the qkv fusion at 512-wide
states — is never differentially exercised there; a dim-dependent bug would
surface only on real weights on-chip. This module re-runs the core
differentials at base-model-class dims (n_state=512, head_dim 64, 4 layers
— seconds per forward on CPU) plus own-path lane-packing parity checks that
only have meaning at this geometry. Slow-marked: ~1-2 min total.

Reference anchors: model.py:224-318 (Whisper), decoding.py:672-703 (greedy),
decoding.py:295-398 (beam), model.py:156-177 (encoder taps).
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from refpkg import build_reference_model, load_reference, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference package tree not present", allow_module_level=True)

torch = pytest.importorskip("torch")

import whisper_at_tpu as wat
from whisper_at_tpu.checkpoint import export_torch_state_dict
from whisper_at_tpu.models.dims import ModelDimensions
from whisper_at_tpu.models.whisper import Whisper

# base-model-class geometry: the production head_dim (64), a full 128-lane
# multiple state width (512), heads 8; 4 layers keeps the module in the
# couple-minute class while exercising the layer-stacked weight scans
DIMS = dict(
    n_mels=80, n_audio_ctx=1500, n_audio_state=512, n_audio_head=8,
    n_audio_layer=4, n_vocab=51865, n_text_ctx=448, n_text_head=8,
    n_text_state=512, n_text_layer=4,
)
SEED = 11


@pytest.fixture(scope="module")
def pair():
    mine = Whisper(ModelDimensions(**DIMS), seed=SEED)
    sd = export_torch_state_dict(mine.params)
    ref = build_reference_model(DIMS, sd)
    return mine, ref, load_reference()


@pytest.fixture(scope="module")
def mel():
    rng = np.random.default_rng(2)
    return (0.5 * rng.standard_normal((80, 3000))).astype(np.float32)


def _decode_both(pair, mel, **opts):
    mine, ref, refmod = pair
    with torch.no_grad():
        rres = ref.decode(torch.from_numpy(mel),
                          refmod.DecodingOptions(**opts))
    mres = wat.decode(mine, np.asarray(mel), wat.DecodingOptions(**opts))
    return rres, mres


def test_strict_load_and_encoder_taps_base_geometry(pair, mel):
    """Strict state-dict round trip + encoder (x, all_x) taps at head_dim
    64 / 512 lanes (reference model.py:156-177)."""
    mine, ref, _ = pair
    with torch.no_grad():
        rx, rall = ref.embed_audio(torch.from_numpy(mel)[None].float())
    mx, mall = mine.embed_audio(mel, fp16=False)
    np.testing.assert_allclose(rx[0].numpy(), np.asarray(mx[0]), atol=5e-5)
    np.testing.assert_allclose(rall.numpy(), np.asarray(mall[0]), atol=5e-5)
    with torch.no_grad():
        rtag = ref.at_model(rall, time_resolution=10).numpy()
    mtag = np.asarray(mine.at_forward(np.asarray(mall[0]), 10))
    np.testing.assert_allclose(rtag, mtag, atol=5e-4)


def test_teacher_forced_decoder_logits_base_geometry(pair, mel):
    mine, ref, _ = pair
    tokens = np.array([[50258, 50259, 50359, 1770, 13, 2264, 346, 353]],
                      np.int64)
    with torch.no_grad():
        rx, _ = ref.embed_audio(torch.from_numpy(mel)[None].float())
        rlog = ref.logits(torch.from_numpy(tokens), rx).numpy()
    mx, _ = mine.embed_audio(mel, fp16=False)
    mlog = np.asarray(mine.logits(np.asarray(tokens, np.int32), mx,
                                  fp16=False))
    assert rlog.shape == mlog.shape
    np.testing.assert_allclose(rlog, mlog, atol=5e-3)


def test_greedy_tokens_base_geometry(pair, mel):
    rres, mres = _decode_both(
        pair, mel, language="en", fp16=False, temperature=0.0, sample_len=20
    )
    assert list(rres.tokens) == list(mres.tokens)
    assert rres.text == mres.text
    assert abs(rres.avg_logprob - mres.avg_logprob) < 1e-3


def test_beam_tokens_base_geometry(pair, mel):
    rres, mres = _decode_both(
        pair, mel, language="en", fp16=False, temperature=0.0,
        sample_len=12, beam_size=3,
    )
    assert list(rres.tokens) == list(mres.tokens)


def test_fused_cross_kv_lane_packing_base_geometry(pair, mel):
    """int8/int4 cross-KV through the fused kernel layout (interpret mode
    off-TPU) must decode the same tokens as the heads layout at head_dim
    64 — the lane-packing geometry the toy-dims differential never sees.
    Own-path parity (quantized decode legitimately differs from the
    reference's fp decode)."""
    mine, _, _ = pair
    for bits in (8, 4):
        heads = wat.decode(
            mine, np.asarray(mel),
            wat.DecodingOptions(language="en", fp16=False, temperature=0.0,
                                sample_len=12, kv_quant=True, kv_bits=bits,
                                kv_layout="heads"))
        fused = wat.decode(
            mine, np.asarray(mel),
            wat.DecodingOptions(language="en", fp16=False, temperature=0.0,
                                sample_len=12, kv_quant=True, kv_bits=bits,
                                kv_layout="fused"))
        assert heads.tokens == fused.tokens, f"bits={bits}"


def test_int4_weight_lanes_base_geometry(pair, mel):
    """Packed int4 weights at 512-wide matmuls must equal the dequantized
    oracle's tokens (the same invariant test_decoding pins at toy dims —
    here the pack spans 256 packed lanes per 512-out matmul)."""
    mine, _, _ = pair
    from test_decoding import _dequantize_tree

    r_q4 = wat.decode(
        mine, np.asarray(mel),
        wat.DecodingOptions(language="en", fp16=False, temperature=0.0,
                            sample_len=12, weight_quant=True, weight_bits=4))
    oracle = Whisper(ModelDimensions(**DIMS), seed=SEED)
    oracle._decoder_fused = _dequantize_tree(
        mine.decoder_params_decode(True, 4))
    r_oracle = wat.decode(
        oracle, np.asarray(mel),
        wat.DecodingOptions(language="en", fp16=False, temperature=0.0,
                            sample_len=12))
    assert r_q4.tokens == r_oracle.tokens


def test_find_alignment_base_geometry(pair):
    """find_alignment word boundaries vs the literal reference at head_dim
    64 — the QK-capture decoder forward (decoder_forward_with_qk) and the
    weight-processing chain at production lane geometry. Uses the DEFAULT
    alignment-head mask (all heads of the last half of layers), same as
    the toy-dims differential (reference timing.py:163-255)."""
    import sys

    from whisper_at_tpu.timing import find_alignment as my_find_alignment
    from whisper_at_tpu.tokenizer import get_tokenizer as my_get_tokenizer

    mine, ref, refmod = pair
    ref_fa = sys.modules["ref_whisper_at.timing"].find_alignment
    rtok = refmod.tokenizer.get_tokenizer(True, language="en",
                                          task="transcribe")
    mtok = my_get_tokenizer(True, language="en", task="transcribe")
    text_tokens = mtok.encode(" hello world this is a test")
    rng = np.random.default_rng(4)
    audio = (0.2 * rng.standard_normal(16000 * 8)).astype(np.float32)
    mel30 = refmod.pad_or_trim(
        refmod.log_mel_spectrogram(torch.from_numpy(audio)), 3000
    )
    with torch.no_grad():
        rw = ref_fa(ref, rtok, text_tokens, mel30, num_frames=800)
    mw = my_find_alignment(mine, mtok, text_tokens,
                           np.asarray(mel30.numpy()), num_frames=800)
    assert [w.word for w in rw] == [w.word for w in mw]
    for a, b in zip(rw, mw):
        assert abs(a.start - b.start) <= 0.02 + 1e-9
        assert abs(a.end - b.end) <= 0.02 + 1e-9
        assert abs(a.probability - b.probability) < 1e-3
