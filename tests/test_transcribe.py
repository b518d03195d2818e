"""Transcribe orchestrator tests: seek loop, AT stitching, writers, CLI paths."""

import numpy as np
import pytest

import whisper_at_tpu as wat
from whisper_at_tpu.models.dims import ModelDimensions
from whisper_at_tpu.models.whisper import Whisper

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
    n_text_state=64, n_text_layer=2,
)


@pytest.fixture(scope="module")
def model():
    return Whisper(DIMS, seed=5)


@pytest.fixture(scope="module")
def audio_45s():
    rng = np.random.default_rng(1)
    t = np.arange(16000 * 45) / 16000.0
    x = 0.3 * np.sin(2 * np.pi * 330 * t) + 0.02 * rng.standard_normal(len(t))
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def result(model, audio_45s):
    return model.transcribe(
        audio_45s,
        verbose=None,
        temperature=0.0,
        language="en",
        fp16=False,
        logprob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
    )


def test_result_structure(result):
    assert set(result.keys()) == {
        "text", "segments", "language", "at_time_res", "audio_tag"
    }
    assert result["language"] == "en"
    assert result["at_time_res"] == 10
    assert isinstance(result["text"], str)
    for seg in result["segments"]:
        for key in ("id", "seek", "start", "end", "text", "tokens", "temperature",
                    "avg_logprob", "compression_ratio", "no_speech_prob"):
            assert key in seg
        assert seg["end"] >= seg["start"]


def test_audio_tag_shape_45s(result):
    # 45 s -> ceil(4500 / 1000) = 5 decision windows of 10 s
    assert result["audio_tag"].shape == (5, 527)
    # every window was written (model produces nonzero logits)
    assert np.abs(result["audio_tag"]).sum(axis=1).min() > 0


def test_at_time_res_must_be_multiple_of_04(model, audio_45s):
    with pytest.raises(AssertionError):
        model.transcribe(audio_45s[:16000], at_time_res=0.5, language="en", fp16=False)


def test_at_time_res_2s(model, audio_45s):
    with pytest.warns(UserWarning):
        result = model.transcribe(
            audio_45s[: 16000 * 12],
            at_time_res=2,
            language="en",
            fp16=False,
            verbose=None,
            logprob_threshold=None,
            compression_ratio_threshold=None,
            no_speech_threshold=None,
        )
    # 12 s -> ceil(1200 / 200) = 6 windows of 2 s
    assert result["audio_tag"].shape == (6, 527)


def test_parse_at_label(result):
    parsed = wat.parse_at_label(result, top_k=5, p_threshold=-np.inf)
    assert len(parsed) == result["audio_tag"].shape[0]
    assert parsed[0]["time"] == {"start": 0, "end": 10}
    assert parsed[1]["time"] == {"start": 10, "end": 20}
    assert len(parsed[0]["audio tags"]) == 5
    name, logit = parsed[0]["audio tags"][0]
    assert isinstance(name, str) and isinstance(logit, float)
    # top entries sorted descending
    logits = [v for _, v in parsed[0]["audio tags"]]
    assert logits == sorted(logits, reverse=True)


def test_parse_at_label_language_fallback(result):
    with pytest.warns(UserWarning):
        parsed = wat.parse_at_label(result, language="xx")
    assert len(parsed) > 0


def test_parse_at_label_class_filter(result):
    parsed = wat.parse_at_label(
        result, top_k=527, p_threshold=-np.inf, include_class_list=[0, 1, 2]
    )
    assert all(len(p["audio tags"]) <= 3 for p in parsed)


def test_initial_prompt(model, audio_45s):
    result = model.transcribe(
        audio_45s[: 16000 * 5],
        initial_prompt="Glossary: JAX, XLA",
        language="en",
        fp16=False,
        verbose=None,
        temperature=0.0,
        logprob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    assert isinstance(result["text"], str)


def test_writers_roundtrip(result, tmp_path):
    import json

    writer = wat.utils.get_writer("all", str(tmp_path))
    writer(result, "sample.wav", {
        "max_line_width": None, "max_line_count": None, "highlight_words": False
    })
    for ext in ("txt", "vtt", "srt", "tsv", "json"):
        path = tmp_path / f"sample.{ext}"
        assert path.exists(), ext
        assert path.stat().st_size > 0
    data = json.loads((tmp_path / "sample.json").read_text())
    assert data["language"] == "en"
    assert len(data["audio_tag"]) == result["audio_tag"].shape[0]


def test_language_detection_path(model, audio_45s):
    result = model.transcribe(
        audio_45s[: 16000 * 3],
        language=None,
        fp16=False,
        verbose=None,
        temperature=0.0,
        logprob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    assert result["language"] in wat.tokenizer.LANGUAGES


def test_transcribe_batched_matches_structure(model, audio_45s):
    """The batched fast path must produce the same result schema and the
    same audio_tag grid as the sequential loop."""
    result = wat.transcribe_batched(
        model,
        audio_45s,
        language="en",
        fp16=False,
        temperature=0.0,
        logprob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
        max_batch=2,
    )
    assert set(result.keys()) == {
        "text", "segments", "language", "at_time_res", "audio_tag"
    }
    assert result["audio_tag"].shape == (5, 527)
    assert np.abs(result["audio_tag"]).sum(axis=1).min() > 0
    for seg in result["segments"]:
        assert seg["end"] >= seg["start"]


def test_transcribe_batched_tags_match_sequential(model, audio_45s, result):
    """Window-aligned tagging must be identical between the two paths when
    the sequential loop advances by full windows (greedy, no thresholds, and
    this synthetic audio yields full-window seeks for tag purposes)."""
    batched = wat.transcribe_batched(
        model,
        audio_45s,
        language="en",
        fp16=False,
        temperature=0.0,
        logprob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    # tag rows are computed from identical 30 s encoder windows in both paths
    # wherever the sequential loop's seek stayed on window boundaries; row 0
    # always is.
    np.testing.assert_allclose(
        batched["audio_tag"][0], result["audio_tag"][0], atol=2e-3
    )


def test_transcribe_batched_short_audio(model):
    """Sub-30s audio: single window, single tag row."""
    rng = np.random.default_rng(9)
    audio = (0.2 * rng.standard_normal(16000 * 5)).astype(np.float32)
    result = wat.transcribe_batched(
        model, audio, language="en", fp16=False, temperature=0.0,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    assert result["audio_tag"].shape == (1, 527)
    assert isinstance(result["text"], str)


def test_transcribe_batched_word_timestamps_and_prompt(model, audio_45s):
    result = wat.transcribe_batched(
        model, audio_45s[: 16000 * 8],
        language="en", fp16=False, temperature=0.0,
        word_timestamps=True, initial_prompt="context words",
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    assert all("words" in seg for seg in result["segments"])
    for seg in result["segments"]:
        for word in seg["words"]:
            assert word["end"] >= word["start"]


def test_transcribe_exactly_30s(model):
    """Window-boundary audio: exactly one full window, one tag grid row x3."""
    rng = np.random.default_rng(11)
    audio = (0.2 * rng.standard_normal(16000 * 30)).astype(np.float32)
    result = model.transcribe(
        audio, language="en", fp16=False, verbose=None, temperature=0.0,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    assert result["audio_tag"].shape == (3, 527)
    assert all(seg["seek"] < 3000 for seg in result["segments"])


def test_translate_task_with_timestamps(model, audio_45s):
    result = model.transcribe(
        audio_45s[: 16000 * 5], language="zh", task="translate",
        fp16=False, verbose=None, temperature=0.0,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    assert isinstance(result["text"], str)
    assert result["language"] == "zh"


def test_decode_sample_len_one(model):
    from whisper_at_tpu.decoding import DecodingOptions, decode

    rng = np.random.default_rng(12)
    mel = np.asarray(rng.standard_normal((80, 3000)), np.float32) * 0.3
    import jax.numpy as jnp

    r = decode(model, jnp.asarray(mel),
               DecodingOptions(language="en", fp16=False, sample_len=1))
    assert len(r.tokens) <= 1


def test_sequential_prompt_threading_across_windows(model):
    """condition_on_previous_text grows the prompt across windows, walking
    through prefill buckets (4 -> 8 -> 16 ...) without recompile blowups or
    shape errors; prompt resets after high-temperature windows are exercised
    by the ladder logic elsewhere."""
    rng = np.random.default_rng(21)
    t = np.arange(16000 * 95) / 16000.0  # 4 windows
    audio = (0.3 * np.sin(2 * np.pi * 280 * t)
             + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
    result = model.transcribe(
        audio, language="en", fp16=False, verbose=None, temperature=0.0,
        condition_on_previous_text=True,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    assert result["audio_tag"].shape == (10, 527)
    seeks = {seg["seek"] for seg in result["segments"]}
    assert len(seeks) >= 3  # decoded several distinct windows


def test_transcribe_many_matches_per_file(model):
    """Cross-file window packing (the serving fast path) must reproduce
    per-file transcribe_batched exactly: windows decode independently, so
    packing them into shared device batches cannot change any output."""
    import whisper_at_tpu as wat

    rng = np.random.default_rng(21)
    clips = [
        (0.2 * rng.standard_normal(16000 * secs)).astype(np.float32)
        for secs in (8, 35, 14)
    ]
    kwargs = dict(
        language="en", fp16=False, temperature=0.0, sample_len=12,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    singles = [wat.transcribe_batched(model, c, **kwargs) for c in clips]
    packed = wat.transcribe_many(model, clips, max_batch=4, **kwargs)

    assert len(packed) == len(singles)
    for got, want in zip(packed, singles):
        assert got["text"] == want["text"]
        assert got["language"] == want["language"]
        assert len(got["segments"]) == len(want["segments"])
        for gs, ws in zip(got["segments"], want["segments"]):
            assert gs["tokens"] == ws["tokens"]
            assert gs["start"] == ws["start"] and gs["end"] == ws["end"]
        np.testing.assert_allclose(got["audio_tag"], want["audio_tag"],
                                   atol=1e-4)


def test_transcribe_many_language_detection_grouping(model):
    """language=None: each file's language resolves independently (detection
    on the first window) and files group by language for packing."""
    import whisper_at_tpu as wat

    rng = np.random.default_rng(9)
    clips = [(0.2 * rng.standard_normal(16000 * s)).astype(np.float32)
             for s in (6, 9)]
    results = wat.transcribe_many(
        model, clips, temperature=0.0, sample_len=8, fp16=False,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, max_batch=4)
    assert len(results) == 2
    for r in results:
        assert isinstance(r["language"], str) and r["language"]
        assert r["audio_tag"].shape[-1] == 527


_STRESS_KWARGS = dict(
    language="en", fp16=False, temperature=0.0, sample_len=8,
    logprob_threshold=None, compression_ratio_threshold=None,
    no_speech_threshold=None,
)


def test_empty_audio_all_paths_agree(model):
    """Zero-sample audio: the reference's seek loop (while seek <
    content_frames) never enters, so every path must return zero segments
    and empty text — not a hallucinated decode of the all-padding window."""
    empty = np.zeros(0, np.float32)
    seq = wat.transcribe(model, empty, verbose=None, **_STRESS_KWARGS)
    bat = wat.transcribe_batched(model, empty, **_STRESS_KWARGS)
    many = wat.transcribe_many(model, [empty], **_STRESS_KWARGS)[0]
    for r in (seq, bat, many):
        assert r["segments"] == []
        assert r["text"] == ""
        assert np.asarray(r["audio_tag"]).shape == (1, 527)


def test_transcribe_many_stress_mixed_lengths(model):
    """Serving-path stress: sub-second clips, an empty clip, and a file
    with more windows than max_batch, all in one call — per-file results
    must still match transcribe_batched run file-by-file."""
    rng = np.random.default_rng(33)
    clips = [
        (0.2 * rng.standard_normal(int(16000 * 0.4))).astype(np.float32),
        np.zeros(0, np.float32),
        # 95 s = 4 windows > max_batch=2: one file spans several chunks
        (0.2 * rng.standard_normal(16000 * 95)).astype(np.float32),
        (0.2 * rng.standard_normal(16000 * 3)).astype(np.float32),
    ]
    singles = [wat.transcribe_batched(model, c, max_batch=2, **_STRESS_KWARGS)
               for c in clips]
    packed = wat.transcribe_many(model, clips, max_batch=2, **_STRESS_KWARGS)

    assert len(packed) == len(singles)
    for got, want in zip(packed, singles):
        assert got["text"] == want["text"]
        assert len(got["segments"]) == len(want["segments"])
        for gs, ws in zip(got["segments"], want["segments"]):
            assert gs["tokens"] == ws["tokens"]
        np.testing.assert_allclose(np.asarray(got["audio_tag"]),
                                   np.asarray(want["audio_tag"]), atol=1e-4)


def test_transcribe_many_int16_matches_float(model):
    """int16 PCM inputs (the half-bandwidth device-transfer path used by
    serving) must give bit-identical results to the same audio as float32."""
    rng = np.random.default_rng(7)
    f32 = np.clip(0.3 * rng.standard_normal(16000 * 12), -1, 1)
    i16 = (f32 * 32768.0).clip(-32768, 32767).astype(np.int16)
    f32 = i16.astype(np.float32) / 32768.0  # same grid as the int16 clip
    a = wat.transcribe_many(model, [i16], **_STRESS_KWARGS)[0]
    b = wat.transcribe_many(model, [f32], **_STRESS_KWARGS)[0]
    assert a["text"] == b["text"]
    np.testing.assert_array_equal(np.asarray(a["audio_tag"]),
                                  np.asarray(b["audio_tag"]))


def test_transcribe_batched_prefetched_audio_identical(model, audio_45s):
    from whisper_at_tpu.audio import prefetch_audio
    from whisper_at_tpu.transcribe import transcribe_batched

    kwargs = dict(
        temperature=0.0, language="en", fp16=False,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, sample_len=12,
    )
    plain = transcribe_batched(model, audio_45s, **kwargs)
    pre = prefetch_audio(audio_45s)
    prefetched = transcribe_batched(model, pre, **kwargs)
    assert prefetched["text"] == plain["text"]
    assert [s["tokens"] for s in prefetched["segments"]] == \
        [s["tokens"] for s in plain["segments"]]
    assert np.array_equal(prefetched["audio_tag"], plain["audio_tag"])


def test_transcribe_many_prefetched_matches_raw(model):
    """A list of PrefetchedAudio (the serving loop's pipelined-transfer
    inputs, as bench.py dispatches them) must produce identical results to
    the raw waveforms."""
    import whisper_at_tpu as wat
    from whisper_at_tpu.audio import prefetch_audio

    rng = np.random.default_rng(29)
    clips = [
        (0.2 * rng.standard_normal(16000 * secs)).astype(np.float32)
        for secs in (6, 33)
    ]
    kwargs = dict(
        language="en", fp16=False, temperature=0.0, sample_len=10,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    raw = wat.transcribe_many(model, clips, max_batch=4, **kwargs)
    pre = wat.transcribe_many(model, [prefetch_audio(c) for c in clips],
                              max_batch=4, **kwargs)
    for got, want in zip(pre, raw):
        assert got["text"] == want["text"]
        assert [s["tokens"] for s in got["segments"]] == \
            [s["tokens"] for s in want["segments"]]
        np.testing.assert_array_equal(got["audio_tag"], want["audio_tag"])


def test_prefetch_audio_many_matches_sequential(model, tmp_path):
    """The threaded serving helper must return PrefetchedAudio objects in
    input order, equivalent to sequential prefetch_audio calls — for both
    waveform and file-path inputs."""
    import wave

    import whisper_at_tpu as wat
    from whisper_at_tpu.audio import prefetch_audio, prefetch_audio_many

    rng = np.random.default_rng(31)
    clip = (0.2 * rng.standard_normal(16000 * 5)).astype(np.float32)
    path = str(tmp_path / "c.wav")
    pcm = (np.clip(clip, -1, 1) * 32767).astype(np.int16)
    with wave.open(path, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(pcm.tobytes())

    inputs = [clip, path, (0.1 * rng.standard_normal(16000 * 2))
              .astype(np.float32)]
    many = prefetch_audio_many(inputs, workers=3)
    seq = [prefetch_audio(a) for a in inputs]
    assert prefetch_audio_many([]) == []
    for m, s in zip(many, seq):
        assert m.n_frames == s.n_frames and m.padding == s.padding
        np.testing.assert_array_equal(np.asarray(m.sig), np.asarray(s.sig))

    kwargs = dict(language="en", fp16=False, temperature=0.0, sample_len=8,
                  logprob_threshold=None, compression_ratio_threshold=None,
                  no_speech_threshold=None)
    got = wat.transcribe_many(model, many, max_batch=4, **kwargs)
    want = wat.transcribe_many(model, inputs, max_batch=4, **kwargs)
    for g, w in zip(got, want):
        assert g["text"] == w["text"]


def test_batched_rejects_conditioning_kwarg(model, audio_45s):
    """condition_on_previous_text threads windows sequentially; the batched
    paths must reject True immediately (not crash mid-decode) and accept
    the harmless False."""
    with pytest.raises(ValueError, match="condition_on_previous_text"):
        wat.transcribe_batched(model, audio_45s,
                               condition_on_previous_text=True)
    with pytest.raises(ValueError, match="condition_on_previous_text"):
        wat.transcribe_many(model, [audio_45s],
                            condition_on_previous_text=True)
    out = wat.transcribe_batched(model, audio_45s,
                                 condition_on_previous_text=False,
                                 **_STRESS_KWARGS)
    assert "segments" in out


def test_batch_bucket_ladder():
    from whisper_at_tpu.transcribe import _batch_bucket

    assert [_batch_bucket(n, 24) for n in (1, 2, 3, 5, 9, 17, 24)] == \
        [1, 2, 4, 8, 16, 24, 24]
    assert _batch_bucket(1, 8) == 1 and _batch_bucket(7, 8) == 8
    # dp-divisibility: buckets round up to the mesh's dp
    assert _batch_bucket(1, 24, dp=8) == 8
    assert _batch_bucket(9, 24, dp=8) == 16


def test_batched_verbose_prints_segments(model, audio_45s, capsys):
    wat.transcribe_batched(model, audio_45s, verbose=True, **_STRESS_KWARGS)
    out = capsys.readouterr().out
    assert "-->" in out  # per-segment lines, like the sequential path


def test_sequential_progress_guard_on_degenerate_decode(model, audio_45s,
                                                        monkeypatch):
    """A decode whose closing timestamp pair sits at the window start parses
    to advance_frames == 0; the seek loop must advance a full window instead
    of re-decoding the identical window forever."""
    from whisper_at_tpu.decoding import DecodingResult
    from whisper_at_tpu.tokenizer import get_tokenizer

    tb = get_tokenizer(model.is_multilingual, language="en",
                       task="transcribe").timestamp_begin
    calls = {"n": 0}

    def fake_decode(self, mel, options=None, **kw):
        calls["n"] += 1
        assert calls["n"] < 10, "seek loop failed to make progress"
        feats, at_feats = self.embed_audio(mel[None], fp16=False)
        # <|0.00|> text <|0.00|><|0.00|>: pair closes at the window start
        return DecodingResult(
            audio_features=feats[0], audio_features_for_at=at_feats[0],
            language="en", tokens=[tb, 123, tb, tb], text="x",
            avg_logprob=-0.1, no_speech_prob=0.0, temperature=0.0,
            compression_ratio=1.0)

    monkeypatch.setattr(Whisper, "decode", fake_decode)
    out = wat.transcribe(
        model, audio_45s, language="en", fp16=False,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None)
    assert calls["n"] == 2  # one decode per 30 s window, no re-decode
    assert len(out["segments"]) == 2


def test_transcribe_many_word_timestamps_match_batched(model):
    """word_timestamps=True through the serving packer must carve the same
    per-word timings as per-file transcribe_batched (the QK capture and DTW
    run per window, so packing cannot change them)."""
    rng = np.random.default_rng(33)
    clips = [
        (0.2 * rng.standard_normal(16000 * secs)).astype(np.float32)
        for secs in (9, 32)
    ]
    kwargs = dict(
        language="en", fp16=False, temperature=0.0, sample_len=12,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, word_timestamps=True,
    )
    singles = [wat.transcribe_batched(model, c, **kwargs) for c in clips]
    packed = wat.transcribe_many(model, clips, max_batch=3, **kwargs)
    for got, want in zip(packed, singles):
        for gs, ws in zip(got["segments"], want["segments"]):
            assert [w["word"] for w in gs["words"]] == \
                [w["word"] for w in ws["words"]]
            np.testing.assert_allclose(
                [(w["start"], w["end"]) for w in gs["words"]],
                [(w["start"], w["end"]) for w in ws["words"]], atol=1e-6)


def test_parse_window_fuzz_vs_reference_oracle():
    """Seeded fuzz: parse_window must reproduce the reference's timestamp
    slicing (transcribe.py:283-332) for arbitrary token patterns — pairs,
    lone trailing timestamps, no timestamps, all-timestamp windows, and
    length-1 windows."""
    from whisper_at_tpu.segmentation import parse_window

    TSB = 50364  # timestamp_begin
    input_stride, time_precision = 2, 0.02
    seg_size, seg_dur, t_off = 3000, 30.0, 60.0

    def oracle(tokens):
        is_ts = tokens >= TSB
        single_ending = list(is_ts[-2:]) == [False, True]
        consecutive = (np.flatnonzero(is_ts[:-1] & is_ts[1:]) + 1).tolist()
        pieces = []
        if consecutive:
            slices = list(consecutive)
            if single_ending:
                slices.append(len(tokens))
            last = 0
            for cur in slices:
                st = tokens[last:cur]
                pieces.append((t_off + (int(st[0]) - TSB) * time_precision,
                               t_off + (int(st[-1]) - TSB) * time_precision,
                               list(st)))
                last = cur
            if single_ending:
                adv = seg_size
            else:
                adv = (int(tokens[last - 1]) - TSB) * input_stride
        else:
            duration = seg_dur
            ts = tokens[is_ts]
            if len(ts) > 0 and int(ts[-1]) != TSB:
                duration = (int(ts[-1]) - TSB) * time_precision
            pieces.append((t_off, t_off + duration, list(tokens)))
            adv = seg_size
        return pieces, adv

    rng = np.random.default_rng(123)
    cases = []
    for _ in range(400):
        n = int(rng.integers(1, 40))
        # ~40% timestamps so pairs/lone endings appear often
        toks = np.where(rng.random(n) < 0.4,
                        rng.integers(TSB, TSB + 1500, n),
                        rng.integers(300, 50000, n)).astype(np.int64)
        cases.append(toks)
    # adversarial shapes the sampler rarely hits
    cases += [np.array([TSB], np.int64),          # lone <|0.00|>
              np.array([TSB + 7], np.int64),      # lone nonzero ts
              np.array([500], np.int64),          # lone text token
              np.full(6, TSB + 3, np.int64),      # all timestamps
              np.array([400, TSB], np.int64)]     # text + lone trailing ts

    for toks in cases:
        want_pieces, want_adv = oracle(toks)
        got = parse_window(
            toks, timestamp_begin=TSB, time_offset=t_off,
            segment_size=seg_size, segment_duration=seg_dur,
            input_stride=input_stride, time_precision=time_precision,
        )
        assert got.advance_frames == want_adv, toks
        assert len(got.pieces) == len(want_pieces), toks
        for (gs, ge, gt), (ws, we, wt) in zip(got.pieces, want_pieces):
            assert abs(gs - ws) < 1e-9 and abs(ge - we) < 1e-9, toks
            assert list(gt) == wt, toks
