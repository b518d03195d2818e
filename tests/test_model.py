"""Model-core parity and consistency tests.

Numerical parity runs against the torch oracle (tests/oracle_torch.py), an
independent implementation of the reference math. Incremental decoding is
additionally checked for self-consistency against the full forward pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle_torch as oracle
from whisper_at_tpu.models.decoder import (
    decoder_forward,
    init_cache,
    precompute_cross_kv,
    project_logits,
)
from whisper_at_tpu.models.dims import ModelDimensions, dims_for
from whisper_at_tpu.models.whisper import Whisper, build_model

TINY_DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
    n_audio_layer=3, n_vocab=51865, n_text_ctx=448, n_text_head=4,
    n_text_state=64, n_text_layer=3,
)


@pytest.fixture(scope="module")
def model():
    return Whisper(TINY_DIMS, seed=1)


@pytest.fixture(scope="module")
def model_low():
    # low-compute variant needs rep_dim > 512 to be meaningful; use 520-ish small
    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
        n_text_state=64, n_text_layer=2,
    )
    return Whisper(dims, at_low_compute=True, seed=2)


@pytest.fixture(scope="module")
def mel():
    rng = np.random.default_rng(0)
    return rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.3


def test_encoder_matches_oracle(model, mel):
    x, all_x = model.embed_audio(jnp.asarray(mel), fp16=False)
    gx, gall = oracle.encoder(model.params["encoder"], mel, TINY_DIMS.n_audio_head)
    assert x.shape == (2, 1500, 64)
    assert all_x.shape == (2, 3, 75, 64)
    np.testing.assert_allclose(np.asarray(x), gx.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(all_x), gall.numpy(), atol=2e-4)


def test_decoder_matches_oracle(model, mel):
    x, _ = model.embed_audio(jnp.asarray(mel), fp16=False)
    tokens = np.array([[50258, 50259, 50359, 1770, 13], [50258, 50260, 50359, 2221, 11]])
    logits = model.logits(jnp.asarray(tokens, jnp.int32), x, fp16=False)
    golden = oracle.decoder_logits(
        model.params["decoder"], tokens, np.asarray(x), TINY_DIMS.n_text_head
    )
    np.testing.assert_allclose(np.asarray(logits), golden.numpy(), atol=3e-3)


@pytest.mark.parametrize("time_res", [10, 4, 2.4])
def test_at_head_matches_oracle(model, mel, time_res):
    _, all_x = model.embed_audio(jnp.asarray(mel), fp16=False)
    ours = model.at_forward(all_x[0], time_resolution=time_res)
    golden = oracle.at_head(
        model.params["at_model"], np.asarray(all_x[0]), model.at_mode, time_res
    )
    assert ours.shape == golden.shape
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(), atol=2e-4)


def test_at_head_low_compute(model_low, mel):
    _, all_x = model_low.embed_audio(jnp.asarray(mel), fp16=False)
    ours = model_low.at_forward(all_x[0], time_resolution=10)
    golden = oracle.at_head(
        model_low.params["at_model"], np.asarray(all_x[0]), model_low.at_mode, 10
    )
    assert ours.shape == (3, 527)
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(), atol=2e-4)


def test_at_head_window_offset(model, mel):
    # slicing at_start frames then tagging must match the oracle on the slice
    _, all_x = model.embed_audio(jnp.asarray(mel), fp16=False)
    sliced = np.asarray(all_x[0])[:, 7:, :]
    ours = model.at_forward(jnp.asarray(sliced), time_resolution=4)
    golden = oracle.at_head(model.params["at_model"], sliced, model.at_mode, 4)
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(), atol=2e-4)


def test_incremental_decode_matches_full(model, mel):
    """prefill + single-token steps through the KV cache == full forward."""
    dims = model.dims
    x, _ = model.embed_audio(jnp.asarray(mel), fp16=False)
    tokens = np.array(
        [[50258, 50259, 50359, 1770, 13, 700], [50258, 50260, 50359, 2221, 11, 333]]
    )
    full_logits = np.asarray(model.logits(jnp.asarray(tokens, jnp.int32), x, fp16=False))

    dec = model.params["decoder"]
    ck, cv = precompute_cross_kv(dec, x, dims.n_text_head, jnp.float32)
    n_ctx = 32
    sk, sv = init_cache(dims.n_text_layer, 2, n_ctx, dims.n_text_state,
                        jnp.float32, dims.n_text_head)

    # prefill the first 3 tokens with a left pad of 2 (prompt-bucket semantics)
    pad = 2
    prefill = 5  # bucket size
    buf = np.zeros((2, prefill), np.int32)
    buf[:, pad:] = tokens[:, :3]
    h, sk, sv = decoder_forward(
        dec, jnp.asarray(buf), ck, cv, sk, sv,
        jnp.int32(0), jnp.int32(pad), dims.n_text_head, jnp.float32,
    )
    logits = np.asarray(project_logits(dec, h))
    np.testing.assert_allclose(logits[:, pad:], full_logits[:, :3], atol=3e-3)

    # then single-token steps
    for i in range(3, 6):
        h, sk, sv = decoder_forward(
            dec, jnp.asarray(tokens[:, i : i + 1], dtype=jnp.int32), ck, cv, sk, sv,
            jnp.int32(prefill + i - 3), jnp.int32(pad), dims.n_text_head, jnp.float32,
        )
        step_logits = np.asarray(project_logits(dec, h))[:, 0]
        np.testing.assert_allclose(step_logits, full_logits[:, i], atol=3e-3)


def test_bf16_encoder_close_to_fp32(model, mel):
    x32, _ = model.embed_audio(jnp.asarray(mel), fp16=False)
    x16, _ = model.embed_audio(jnp.asarray(mel), fp16=True)
    assert x16.dtype == jnp.bfloat16
    diff = np.abs(np.asarray(x16, np.float32) - np.asarray(x32)).mean()
    assert diff < 0.05


def test_dims_registry():
    d = dims_for("large-v1")
    assert (d.n_audio_state, d.n_audio_head, d.n_audio_layer) == (1280, 20, 32)
    assert dims_for("small.en").n_vocab == 51864
    assert dims_for("tiny").n_vocab == 51865
    with pytest.raises(ValueError):
        dims_for("huge")


def test_alignment_heads_default(model):
    assert model.alignment_heads.shape == (3, 4)
    assert model.alignment_heads[2].all()
    assert not model.alignment_heads[0].any()


def test_single_pass_encoder_attention_matches_reference():
    """Whisper-geometry single-pass attention kernel (ops/flash_enc.py,
    interpret mode): matches the einsum+fp32-softmax path, including the
    padded-key masking (T=300 pads to 384) and the block_q-tiled variant."""
    from whisper_at_tpu.models.layers import attention
    from whisper_at_tpu.ops.flash_enc import encoder_attention

    rng = np.random.default_rng(11)
    b, t, h, dh = 2, 300, 4, 64
    d = h * dh
    q, k, v = (jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
               for _ in range(3))
    ref, _ = attention(q, k, v, h)
    out = encoder_attention(q, k, v, h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    out_tiled = encoder_attention(q, k, v, h, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out_tiled), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)

    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    refb, _ = attention(qb, kb, vb, h)
    outb = encoder_attention(qb, kb, vb, h, interpret=True)
    diff = np.abs(np.asarray(outb, np.float32)
                  - np.asarray(refb, np.float32)).max()
    assert diff < 0.02


def test_kv_cache_session_matches_full_forward(model, mel):
    """install_kv_cache_hooks returns a functional incremental session whose
    stepwise logits match the full non-incremental forward (the reference's
    hook-cache contract, whisper_at/model.py:283-314)."""
    feats, _ = model.embed_audio(jnp.asarray(mel), fp16=False)
    feats = feats[:1]
    toks = jnp.asarray([[50258, 50259, 50359, 50364, 400, 500]], jnp.int32)

    full = np.asarray(model.logits(toks, feats, fp16=False))

    cache, hooks = model.install_kv_cache_hooks()
    assert hooks == []
    prompt = np.asarray(
        model.decoder_logits(toks[:, :4], feats, kv_cache=cache, fp16=False)
    )
    step1 = np.asarray(
        model.decoder_logits(toks[:, 4:5], feats, kv_cache=cache, fp16=False)
    )
    step2 = np.asarray(
        model.decoder_logits(toks[:, 5:6], feats, kv_cache=cache, fp16=False)
    )
    np.testing.assert_allclose(prompt, full[:, :4], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(step1, full[:, 4:5], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(step2, full[:, 5:6], atol=2e-4, rtol=2e-4)

    # cacheless call == plain full forward
    np.testing.assert_allclose(
        np.asarray(model.decoder_logits(toks, feats, fp16=False)), full,
        atol=0, rtol=0)


def test_fused_mlp_block_matches_reference():
    """Encoder fused MLP half-block kernel (ops/mlp_enc.py, interpret mode):
    LN -> fc1 -> gelu -> fc2 -> residual matches the layers.py composition,
    including ff-axis tiling (n_ff > 1) and the erf approximation."""
    from whisper_at_tpu.models.layers import (
        init_layer_norm,
        init_linear,
        layer_norm,
        mlp,
    )
    from whisper_at_tpu.ops.mlp_enc import mlp_block_fused

    rng = np.random.default_rng(3)
    b, t, d, dff = 2, 300, 128, 512
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    fc1 = init_linear(k1, d, dff)
    fc2 = init_linear(k2, dff, d)
    ln = init_layer_norm(d, jnp.float32)
    ln = {"scale": ln["scale"] * 1.3 + 0.1, "bias": ln["bias"] + 0.05}
    x = jnp.asarray(rng.standard_normal((b, t, d)) * 0.5, jnp.float32)

    ref = x + mlp({"fc1": fc1, "fc2": fc2}, layer_norm(ln, x))
    out = mlp_block_fused(x, ln, fc1, fc2, block_m=128, block_ff=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)

    xb = x.astype(jnp.bfloat16)
    fc1b = jax.tree.map(lambda v: v.astype(jnp.bfloat16), fc1)
    fc2b = jax.tree.map(lambda v: v.astype(jnp.bfloat16), fc2)
    refb = xb + mlp({"fc1": fc1b, "fc2": fc2b}, layer_norm(ln, xb))
    outb = mlp_block_fused(xb, ln, fc1b, fc2b, block_m=128, interpret=True)
    assert float(jnp.abs(outb.astype(jnp.float32)
                         - refb.astype(jnp.float32)).max()) < 0.05
