"""Streaming transcription session tests (whisper_at_tpu/streaming.py)."""

import numpy as np
import pytest

from whisper_at_tpu.audio import (
    N_FRAMES,
    N_SAMPLES,
    log_mel_spectrogram,
)
from whisper_at_tpu.models.dims import ModelDimensions
from whisper_at_tpu.models.whisper import Whisper
from whisper_at_tpu.streaming import StreamingTranscriber

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
    n_text_state=64, n_text_layer=2,
)

OPTS = dict(
    verbose=None,
    temperature=0.0,
    language="en",
    fp16=False,
    logprob_threshold=None,
    compression_ratio_threshold=None,
    no_speech_threshold=None,
)


@pytest.fixture(scope="module")
def model():
    return Whisper(DIMS, seed=5)


def _clicky_audio(seconds: float, seed: int = 1) -> np.ndarray:
    """Tone+noise with one full-scale click per 30 s window, so every
    window's log-mel max equals the recording's global max and the causal
    dynamic-range floor threshold is identical to the offline one. A low-
    frequency component keeps every mel bin well above the -8-decade floor:
    frames AT the floor are clamp-or-not by last-bit rounding, the one
    place where block layout legitimately shows (documented in
    streaming.py's module docstring)."""
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    t = np.arange(n) / 16000.0
    x = (0.3 * np.sin(2 * np.pi * 330 * t)
         + 0.08 * np.sin(2 * np.pi * 45 * t)
         + 0.02 * rng.standard_normal(n))
    for s in range(0, n, 30 * 16000):
        click = s + 16000
        # silence around the click so every STFT frame touching it sees
        # the identical sample pattern: window max == global max BITWISE,
        # making the causal floor exactly the offline one
        x[click - 600:click + 632] = 0.0
        x[click:click + 32] = 1.0
    return x.astype(np.float32)


def test_window_mel_matches_offline(model):
    """Every streamed window's interior frames must be bit-comparable to the
    offline full-file mel (same samples, same formula, same floor)."""
    audio = _clicky_audio(70)
    sess = StreamingTranscriber(model, **OPTS)
    sess._buf = audio
    sess._total_samples = len(audio)

    offline = np.asarray(log_mel_spectrogram(audio, padding=N_SAMPLES))
    for seek in (0, 1, 2, 500, 3000):
        sess._seek = seek
        got = np.asarray(sess._window_mel())
        want = offline[:, seek:seek + N_FRAMES]
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_streaming_matches_offline_transcribe(model):
    audio = _clicky_audio(70)
    offline = model.transcribe(audio, **OPTS)

    sess = StreamingTranscriber(model, **OPTS)
    emitted = []
    rng = np.random.default_rng(0)
    i = 0
    while i < len(audio):
        n = int(rng.integers(5000, 120000))  # ragged block sizes
        emitted.extend(sess.feed(audio[i:i + n]))
        i += n
    result = sess.finish()

    assert result["language"] == offline["language"]
    assert result["text"] == offline["text"]
    assert len(result["segments"]) == len(offline["segments"])
    for got, want in zip(result["segments"], offline["segments"]):
        assert (got["start"], got["end"]) == (want["start"], want["end"])
        assert got["tokens"] == want["tokens"]
        assert got["id"] == want["id"]
    np.testing.assert_allclose(
        result["audio_tag"], offline["audio_tag"], rtol=0, atol=2e-6
    )
    # everything emitted during feed() is a prefix of the final segments
    assert emitted == result["segments"][: len(emitted)]


def test_streaming_emits_before_finish(model):
    audio = _clicky_audio(66)
    sess = StreamingTranscriber(model, **OPTS)
    step = 5 * 16000
    seen_early = 0
    for i in range(0, len(audio), step):
        segs = sess.feed(audio[i:i + step])
        if i + step < len(audio):
            seen_early += len(segs)
    result = sess.finish()
    assert seen_early > 0, "no segments finalized before finish()"
    assert len(result["segments"]) >= seen_early
    ids = [s["id"] for s in result["segments"]]
    assert ids == list(range(len(ids)))


def test_streaming_empty_and_tiny_streams(model):
    empty = StreamingTranscriber(model, **OPTS).finish()
    assert empty["text"] == "" and empty["segments"] == []
    assert empty["audio_tag"].shape == (1, 527)
    assert empty["language"] == "en"

    short = StreamingTranscriber(model, **OPTS)
    assert short.feed(np.zeros(100, np.float32)) == []
    out = short.finish()
    assert out["audio_tag"].shape == (1, 527)


def test_streaming_subhop_language_matches_offline(model):
    """A stream too short to ever process a window (< 1 hop) must detect
    the SAME language as offline transcribe() on identical samples — i.e.
    from the received audio's padded first window, not from pure silence."""
    from whisper_at_tpu.transcribe import transcribe

    opts = dict(OPTS)
    opts.pop("language")
    audio = _clicky_audio(100 / 16000.0)[:100]
    off = transcribe(model, audio, **opts)
    sess = StreamingTranscriber(model, **opts)
    sess.feed(audio)
    out = sess.finish()
    assert out["language"] == off["language"]


def test_streaming_word_timestamps_match_offline_alignment(model, monkeypatch):
    """word_timestamps=True runs the offline `_attach_word_timings` per
    finalized window (the batched path's semantics — no seek refinement)
    against the right window mel and frame count.

    Record each attach call's pre-alignment segments, then independently
    replay the real alignment using a mel rebuilt through the session's
    own mel path at that seek — a wrong window/num_frames in the
    streaming integration would diverge here."""
    import copy
    import sys

    from whisper_at_tpu.segmentation import clear_degenerate
    from whisper_at_tpu.tokenizer import get_tokenizer

    transcribe_mod = sys.modules["whisper_at_tpu.transcribe"]

    audio = _clicky_audio(65, seed=8)
    recorded = []
    real_attach = transcribe_mod._attach_word_timings

    def recording(model_, tokenizer_, segments, window, num_frames,
                  prep, app):
        recorded.append((copy.deepcopy(segments), num_frames, prep, app))
        return real_attach(model_, tokenizer_, segments, window,
                           num_frames, prep, app)

    # streaming resolves it lazily from .transcribe inside _process_window
    monkeypatch.setattr(transcribe_mod, "_attach_word_timings", recording)

    wt_sess = StreamingTranscriber(model, word_timestamps=True,
                                   **_nocond(OPTS))
    wt_sess.feed(audio)
    got = wt_sess.finish()

    assert recorded, "no alignment calls were made"
    assert any(s.get("words") for s in got["segments"]), \
        "no words were attached"
    for seg in got["segments"]:
        for w in seg["words"]:
            assert w["start"] <= w["end"]

    # replay: the real alignment on the recorded pre-state with an
    # independently rebuilt window mel, then the same degenerate clear
    tokenizer = get_tokenizer(model.is_multilingual,
                              language=got["language"], task="transcribe")
    helper = StreamingTranscriber(model, **_nocond(OPTS))
    helper._buf = audio
    helper._total_samples = len(audio)
    expect = []
    for segs_pre, num_frames, prep, app in recorded:
        helper._seek = segs_pre[0]["seek"]
        window = helper._window_mel()
        real_attach(model, tokenizer, segs_pre, window, num_frames,
                    prep, app)
        clear_degenerate(segs_pre)
        expect.extend(segs_pre)
    got_no_ids = [{k: v for k, v in s.items() if k != "id"}
                  for s in got["segments"]]
    assert got_no_ids == expect


def test_streaming_service_session_word_timestamps(model):
    """A service session with word_timestamps=True matches the standalone
    session (the mel for such windows is computed in-session — alignment
    needs it — while the decode still batches across sessions)."""
    from whisper_at_tpu.streaming import StreamingService

    audio = _clicky_audio(35, seed=9)
    solo = StreamingTranscriber(model, word_timestamps=True, **_nocond(OPTS))
    solo.feed(audio)
    want = solo.finish()

    with StreamingService(model, max_wait_s=0.01) as service:
        sess = service.open(word_timestamps=True, **OPTS)
        sess.feed(audio)
        got = sess.finish()
        stats = service.stats()

    assert got["text"] == want["text"]
    assert got["segments"] == want["segments"]
    assert stats["mel_batched_windows"] == 0  # mels stayed in-session


def test_streaming_int16_feed_matches_float(model):
    audio = _clicky_audio(35, seed=3)
    pcm = (np.clip(audio, -1, 1) * 32767.0).astype(np.int16)
    f = StreamingTranscriber(model, **OPTS)
    f.feed(pcm.astype(np.float32) / 32768.0)
    a = f.finish()
    g = StreamingTranscriber(model, **OPTS)
    g.feed(pcm)
    b = g.finish()
    assert a["text"] == b["text"]
    np.testing.assert_array_equal(a["audio_tag"], b["audio_tag"])


def test_streaming_state_and_dtype_guards(model):
    sess = StreamingTranscriber(model, **OPTS)
    with pytest.raises(ValueError):
        sess.feed(np.zeros(100, np.int32))  # ambiguous PCM scale
    sess.finish()
    with pytest.raises(RuntimeError):
        sess.feed(np.zeros(100, np.float32))
    with pytest.raises(RuntimeError):
        sess.finish()


# --------------------------------------------------------------------------- #
# StreamingService: cross-session window batching
# --------------------------------------------------------------------------- #

def _nocond(opts):
    o = dict(opts)
    o["condition_on_previous_text"] = False
    return o


def test_streaming_service_parity_two_sessions(model):
    """Two concurrent sessions through the service produce exactly what two
    standalone conditioning-free sessions produce — batching never changes
    per-window decode."""
    import threading

    from whisper_at_tpu.streaming import StreamingService

    waves = [_clicky_audio(65, seed=3), _clicky_audio(65, seed=4)]

    solo = []
    for w in waves:
        sess = StreamingTranscriber(model, **_nocond(OPTS))
        sess.feed(w)
        solo.append(sess.finish())

    # generous fill window: the assertion below is that coalescing HAPPENED,
    # and a loaded CI machine can stall a thread's enqueue by hundreds of ms
    with StreamingService(model, max_wait_s=2.0) as service:
        sessions = [service.open(**OPTS) for _ in waves]
        results = [None, None]

        def run(i):
            # feed in two pieces so both sessions' window decodes queue
            # near-simultaneously and the scheduler can coalesce them
            mid = len(waves[i]) // 2
            sessions[i].feed(waves[i][:mid])
            sessions[i].feed(waves[i][mid:])
            results[i] = sessions[i].finish()

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(waves))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = service.stats()

    float_keys = ("avg_logprob", "no_speech_prob", "compression_ratio")
    for got, want in zip(results, solo):
        assert got["text"] == want["text"]
        assert len(got["segments"]) == len(want["segments"])
        for g, w in zip(got["segments"], want["segments"]):
            # decoding at a different batch size reassociates reductions:
            # token-identical, probability fields to float tolerance
            assert {k: v for k, v in g.items() if k not in float_keys} == \
                {k: v for k, v in w.items() if k not in float_keys}
            for k in float_keys:
                np.testing.assert_allclose(g[k], w[k], rtol=1e-4)
        np.testing.assert_allclose(got["audio_tag"], want["audio_tag"],
                                   atol=2e-6)
    assert stats["sessions"] == 2
    # 2 sessions x 3 windows each (65 s): 6 window decodes; concurrency
    # must have coalesced at least once
    assert stats["windows"] == 6
    assert stats["batches"] < 6
    assert stats["max_batch_windows"] >= 2
    # OPTS pins language="en", so EVERY window (first included — nothing
    # reads its mel in-session) ships its raw piece and gets its mel
    # computed batched in the scheduler (3 per session), and every
    # scheduled batch runs >= 1 grouped TL-TR tag dispatch
    assert stats["mel_batched_windows"] == 6
    assert stats["tag_groups"] >= stats["batches"]


def test_streaming_service_single_session_works(model):
    from whisper_at_tpu.streaming import StreamingService

    wave = _clicky_audio(35, seed=5)
    solo_sess = StreamingTranscriber(model, **_nocond(OPTS))
    solo_sess.feed(wave)
    want = solo_sess.finish()

    with StreamingService(model, max_wait_s=0.01) as service:
        sess = service.open(**OPTS)
        sess.feed(wave)
        got = sess.finish()

    assert got["text"] == want["text"]
    assert got["segments"] == want["segments"]


def test_streaming_service_rejects_conditioning(model):
    from whisper_at_tpu.streaming import StreamingService

    with StreamingService(model) as service:
        with pytest.raises(ValueError):
            service.open(condition_on_previous_text=True, **OPTS)


def test_streaming_service_close_fails_queued_windows(model):
    from whisper_at_tpu.streaming import StreamingService

    service = StreamingService(model)
    sess = service.open(**OPTS)
    service.close()
    with pytest.raises(RuntimeError):
        sess.feed(_clicky_audio(31, seed=6))
    service.close()  # idempotent


def test_streaming_service_top_level_export(model):
    import whisper_at_tpu as wat
    from whisper_at_tpu.streaming import StreamingService

    assert wat.StreamingService is StreamingService


def _fake_window_decoder(record):
    """Stand-in for transcribe._decode_windows_batched: instant, counts
    batch sizes, returns one opaque result per row."""
    def fake(model, windows, temperature, gate, options, max_batch, mesh):
        n = int(windows.shape[0])
        record.append(n)
        return [f"res{i}" for i in range(n)]
    return fake


def _drive_service_decodes(service, n, stagger):
    """Submit n window-decode requests, each `stagger` seconds after the
    previous, from their own threads (like n live sessions resubmitting
    after a shared batch); returns the per-request results."""
    import threading
    import time
    from types import SimpleNamespace

    gate = SimpleNamespace(compression_ratio=None, logprob=None,
                           no_speech=None)
    results = [None] * n
    start = threading.Barrier(n)

    def run(i):
        start.wait()
        time.sleep(i * stagger)
        results[i] = service._decode(
            np.zeros((2, 2), np.float32), {"language": "en"}, (0.0,), gate
        )

    threads = [threading.Thread(target=run, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return results


def test_streaming_service_rolling_fill_coalesces(model, monkeypatch):
    """Arrivals spaced within max_wait_s of EACH OTHER (but beyond the
    head's fixed window) coalesce into one batch under the rolling fill."""
    import sys

    from whisper_at_tpu.streaming import StreamingService
    transcribe_mod = sys.modules["whisper_at_tpu.transcribe"]

    batches = []
    monkeypatch.setattr(transcribe_mod, "_decode_windows_batched",
                        _fake_window_decoder(batches))

    with StreamingService(model, max_wait_s=0.6) as service:
        results = _drive_service_decodes(service, n=4, stagger=0.2)
        stats = service.stats()
    # one FIFO batch: request i sits at row i and gets row i's result
    assert results == [f"res{i}" for i in range(4)]
    assert stats["windows"] == 4
    assert stats["batches"] == 1, (stats, batches)


def test_streaming_service_rolling_fill_hard_cap(model, monkeypatch):
    """max_total_wait_s bounds the rolling extension: a continuing trickle
    cannot hold one batch open forever."""
    import sys

    from whisper_at_tpu.streaming import StreamingService
    transcribe_mod = sys.modules["whisper_at_tpu.transcribe"]

    batches = []
    monkeypatch.setattr(transcribe_mod, "_decode_windows_batched",
                        _fake_window_decoder(batches))

    # every gap (0.2 s) is well inside max_wait_s, so only the 0.5 s hard
    # cap can close the first batch before all 6 arrive
    with StreamingService(model, max_wait_s=5.0,
                          max_total_wait_s=0.5) as service:
        _drive_service_decodes(service, n=6, stagger=0.2)
        stats = service.stats()
    assert stats["windows"] == 6
    assert stats["batches"] >= 2, (stats, batches)


def test_streaming_service_batches_language_detection(model):
    """Sessions opened WITHOUT a language run their first-window language
    detection through the scheduler: concurrent session starts coalesce
    into one batched detect_language forward, and results match a
    standalone session's inline detection."""
    import threading

    from whisper_at_tpu.streaming import StreamingService

    opts = {k: v for k, v in OPTS.items() if k != "language"}
    waves = [_clicky_audio(35, seed=11), _clicky_audio(35, seed=12)]

    solo = []
    for w in waves:
        sess = StreamingTranscriber(model, **_nocond(opts))
        sess.feed(w)
        solo.append(sess.finish())

    # generous fill window, same rationale as the parity test above
    with StreamingService(model, max_wait_s=2.0) as service:
        sessions = [service.open(**opts) for _ in waves]
        results = [None, None]
        start = threading.Barrier(len(waves))

        def run(i):
            start.wait()
            sessions[i].feed(waves[i])
            results[i] = sessions[i].finish()

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(waves))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = service.stats()

    for got, want in zip(results, solo):
        assert got["language"] == want["language"]
        assert got["text"] == want["text"]
    assert stats["detect_windows"] == 2
    # both sessions' first windows arrived inside one fill window: ONE
    # batched detection forward
    assert stats["detect_batches"] == 1


def test_streaming_service_warmup(model):
    """warmup(n) drives n concurrent synthetic sessions through every
    cross-session batching surface and leaves the service usable."""
    from whisper_at_tpu.streaming import StreamingService

    with StreamingService(model, max_wait_s=0.05) as service:
        r = service.warmup(2, seconds=31.0, **OPTS)
        assert r["sessions"] == 2 and r["seconds"] > 0
        # the full batch-bucket ladder below n PLUS one rung above is
        # driven (straggler/catch-up batches can exceed n windows; one
        # cold bucket compile mid-drive costs tens of tunneled seconds)
        assert r["buckets"] == [4, 2, 1]
        stats = service.stats()
        assert stats["windows"] >= 7  # ladder: 4 + 2 + 1 first windows
        # the service still serves a real session afterwards
        sess = service.open(**OPTS)
        sess.feed(_clicky_audio(31, seed=9))
        result = sess.finish()
        assert result["language"] == "en"
        assert np.asarray(result["audio_tag"]).shape[1] == 527
