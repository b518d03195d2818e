"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_at_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_params,
    shard_batch,
    tltr_param_shardings,
)
from whisper_at_tpu.train.steps import make_optimizer, make_sharded_train_step
from whisper_at_tpu.train.tltr import init_tltr, tltr_apply


@pytest.fixture(scope="module")
def devices_ok():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def test_make_mesh_shapes(devices_ok):
    mesh = make_mesh(n_devices=8, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh_dp = make_mesh(n_devices=8)
    assert mesh_dp.shape == {"dp": 8, "tp": 1}
    with pytest.raises(AssertionError):
        make_mesh(n_devices=8, dp=3, tp=2)


def test_shard_batch_places_on_mesh(devices_ok):
    mesh = make_mesh(n_devices=8, tp=1)
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    sharded = shard_batch(mesh, x)
    assert sharded.sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(sharded), x)


def test_tltr_param_shardings_split_heads(devices_ok):
    mesh = make_mesh(n_devices=8, tp=2)
    params = init_tltr(jax.random.PRNGKey(0), label_dim=8, n_layer=2,
                       rep_dim=64, mode="lw_tr_1_4")
    shardings = tltr_param_shardings(mesh, params)
    # attention projections split over tp on the output dim
    qspec = shardings["time_tr"]["attn"]["query"]["w"].spec
    assert tuple(qspec) == (None, "tp")
    ospec = shardings["time_tr"]["attn"]["out"]["w"].spec
    assert tuple(ospec) == ("tp", None)
    # layer norms replicate
    assert tuple(shardings["time_tr"]["attn_ln"]["scale"].spec) == ()


def test_sharded_training_matches_single_device(devices_ok):
    """dp x tp sharded training must produce the same losses as one device."""
    mode = "lw_tr_1_4"
    params = init_tltr(jax.random.PRNGKey(1), label_dim=8, n_layer=2,
                       rep_dim=64, mode=mode)
    optimizer = make_optimizer(1e-3)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((8, 2, 25, 64)).astype(np.float32)
    labels = (rng.random((8, 8)) > 0.8).astype(np.float32)

    # single-device reference
    from whisper_at_tpu.train.steps import make_train_step

    step1 = make_train_step(mode, optimizer, compute_dtype=jnp.float32)
    p1, o1 = params, optimizer.init(params)
    losses1 = []
    for _ in range(3):
        p1, o1, loss = step1(p1, o1, jnp.asarray(feats), jnp.asarray(labels),
                             jnp.float32(1.0))
        losses1.append(float(loss))

    # sharded
    mesh = make_mesh(n_devices=8, tp=2)
    step2, p2, o2 = make_sharded_train_step(
        mesh, mode, optimizer, params, compute_dtype=jnp.float32
    )
    losses2 = []
    sf = shard_batch(mesh, feats)
    sl = shard_batch(mesh, labels)
    for _ in range(3):
        p2, o2, loss = step2(p2, o2, sf, sl, jnp.float32(1.0))
        losses2.append(float(loss))

    np.testing.assert_allclose(losses1, losses2, rtol=2e-4, atol=1e-5)


def test_replicate_params(devices_ok):
    mesh = make_mesh(n_devices=4)
    params = {"w": jnp.ones((4, 4))}
    rep = replicate_params(mesh, params)
    assert rep["w"].sharding.is_fully_replicated


def test_graft_dryrun_entrypoint(devices_ok):
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)
    graft.dryrun_multichip(4)


def test_batched_transcribe_on_mesh(devices_ok):
    """Multi-chip batched inference: dp-sharded windows must give the same
    result as single-device execution."""
    import whisper_at_tpu as wat
    from whisper_at_tpu.models.dims import ModelDimensions
    from whisper_at_tpu.models.whisper import Whisper

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
        n_text_state=64, n_text_layer=2,
    )
    model = Whisper(dims, seed=11)
    rng = np.random.default_rng(2)
    audio = (0.2 * rng.standard_normal(16000 * 65)).astype(np.float32)

    kwargs = dict(
        language="en", fp16=False, temperature=0.0,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    single = wat.transcribe_batched(model, audio, **kwargs)

    mesh = make_mesh(n_devices=4, tp=1)
    sharded = wat.transcribe_batched(model, audio, mesh=mesh, max_batch=4, **kwargs)

    assert sharded["text"] == single["text"]
    np.testing.assert_allclose(
        sharded["audio_tag"], single["audio_tag"], atol=1e-4
    )


def test_mesh_inference_with_quantization(devices_ok):
    """int8 KV + weight quantization under GSPMD on the mesh."""
    import whisper_at_tpu as wat
    from whisper_at_tpu.models.dims import ModelDimensions
    from whisper_at_tpu.models.whisper import Whisper

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
        n_text_state=64, n_text_layer=2,
    )
    model = Whisper(dims, seed=13)
    rng = np.random.default_rng(5)
    audio = (0.2 * rng.standard_normal(16000 * 35)).astype(np.float32)
    kwargs = dict(
        language="en", fp16=False, temperature=0.0,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, kv_quant=True, weight_quant=True,
    )
    single = wat.transcribe_batched(model, audio, **kwargs)
    mesh = make_mesh(n_devices=2, tp=1)
    sharded = wat.transcribe_batched(model, audio, mesh=mesh, max_batch=2, **kwargs)
    assert sharded["text"] == single["text"]


def test_tensor_parallel_decode_matches_single_device(devices_ok):
    """Megatron-split decoder over tp must reproduce the unsharded tokens:
    greedy and beam, fp and int8 weights. GSPMD propagates head-sharding
    into the KV caches from the placements alone."""
    from whisper_at_tpu.decoding import DecodingOptions, decode
    from whisper_at_tpu.models.dims import ModelDimensions
    from whisper_at_tpu.models.whisper import Whisper
    from whisper_at_tpu.parallel.inference import place_model_tp

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
        n_text_state=64, n_text_layer=2,
    )
    rng = np.random.default_rng(5)
    mel = jnp.asarray(
        rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.4)

    base = dict(language="en", fp16=False, sample_len=12)
    ref_model = Whisper(dims, seed=7)
    ref_g = decode(ref_model, mel[0], DecodingOptions(**base))
    ref_q = decode(ref_model, mel[0],
                   DecodingOptions(**base, weight_quant=True, kv_quant=True))
    ref_b = decode(ref_model, mel[0], DecodingOptions(**base, beam_size=2))

    mesh = make_mesh(n_devices=4, dp=2, tp=2)
    tp_model = place_model_tp(Whisper(dims, seed=7), mesh)
    # decoder placements: fused qkv column-split, out row-split, tied
    # embedding vocab-split
    qkv = tp_model.decoder_params_fused["blocks"]["attn"]["qkv"]["w"]
    assert tuple(qkv.sharding.spec) == (None, None, "tp")
    out_w = tp_model.decoder_params_fused["blocks"]["attn"]["out"]["w"]
    assert tuple(out_w.sharding.spec) == (None, "tp", None)
    # encoder blocks get the same Megatron split (col qkv/fc1, row out/fc2);
    # the conv stem replicates — and the sharded encoder must be numerically
    # identical to the single-device one (GSPMD psums, not approximations)
    enc = tp_model.params["encoder"]
    assert tuple(enc["blocks"]["attn"]["query"]["w"].sharding.spec) == \
        (None, None, "tp")
    assert tuple(enc["blocks"]["mlp"]["fc2"]["w"].sharding.spec) == \
        (None, "tp", None)
    assert tuple(enc["conv1"]["w"].sharding.spec) == (None, None, None) or \
        enc["conv1"]["w"].sharding.is_fully_replicated
    ref_feats, ref_at = ref_model.embed_audio(mel, fp16=False)
    tp_feats, tp_at = tp_model.embed_audio(mel, fp16=False)
    np.testing.assert_allclose(np.asarray(tp_feats), np.asarray(ref_feats),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(tp_at), np.asarray(ref_at),
                               rtol=2e-5, atol=2e-5)

    got_g = decode(tp_model, mel[0], DecodingOptions(**base))
    assert got_g.tokens == ref_g.tokens
    np.testing.assert_allclose(got_g.avg_logprob, ref_g.avg_logprob,
                               rtol=1e-4, atol=1e-4)

    got_q = decode(tp_model, mel[0],
                   DecodingOptions(**base, weight_quant=True, kv_quant=True))
    assert got_q.tokens == ref_q.tokens

    got_b = decode(tp_model, mel[0], DecodingOptions(**base, beam_size=2))
    assert got_b.tokens == ref_b.tokens


def test_pipeline_parallel_encoder_matches_single_device(devices_ok):
    """GPipe-scheduled encoder over a 4-stage 'pp' mesh returns the same
    hidden states and pooled taps as the single-device encoder (the
    schedule only moves WHICH device computes a block)."""
    from whisper_at_tpu.models.dims import ModelDimensions
    from whisper_at_tpu.models.encoder import encoder_apply, init_encoder
    from whisper_at_tpu.parallel.pipeline import (
        encoder_apply_pp,
        make_pp_mesh,
    )

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=4, n_vocab=100, n_text_ctx=448, n_text_head=4,
        n_text_state=64, n_text_layer=2,
    )
    params = init_encoder(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((4, 80, 3000)), jnp.float32)

    x0, taps0 = encoder_apply(params, mel, dims.n_audio_head,
                              attn_impl="off")
    mesh = make_pp_mesh(4)
    x1, taps1 = encoder_apply_pp(params, mel, mesh, dims.n_audio_head)
    assert x1.shape == x0.shape and taps1.shape == taps0.shape
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(taps1), np.asarray(taps0),
                               rtol=0, atol=1e-5)

    # fewer microbatches than stages still schedules correctly (bigger
    # bubble, same math)
    x2, taps2 = encoder_apply_pp(params, mel, mesh, dims.n_audio_head,
                                 n_micro=2)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x0),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(taps2), np.asarray(taps0),
                               rtol=0, atol=1e-5)


def test_sequence_parallel_encoder_matches_single_device(devices_ok):
    """Ring-attention encoder over a 4-shard 'sp' mesh matches the
    single-device encoder to online-softmax rounding. sp=4 gives 375-frame
    chunks, so the 20x pooled-tap windows straddle every chunk boundary —
    the psum-of-partial-windows path is exercised, not just the aligned
    case."""
    from whisper_at_tpu.models.dims import ModelDimensions
    from whisper_at_tpu.models.encoder import encoder_apply, init_encoder
    from whisper_at_tpu.parallel.sequence import (
        encoder_apply_sp,
        make_sp_mesh,
    )

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=4, n_vocab=100, n_text_ctx=448, n_text_head=4,
        n_text_state=64, n_text_layer=2,
    )
    params = init_encoder(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 80, 3000)), jnp.float32)

    x0, taps0 = encoder_apply(params, mel, dims.n_audio_head,
                              attn_impl="off")
    mesh = make_sp_mesh(4)
    x1, taps1 = encoder_apply_sp(params, mel, mesh, dims.n_audio_head)
    assert x1.shape == x0.shape and taps1.shape == taps0.shape
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(taps1), np.asarray(taps0),
                               rtol=1e-5, atol=1e-5)
