"""TranscriptionService: continuous batching parity, grouping, HTTP API.

The service must be a pure scheduler: every result identical to calling
transcribe_many / transcribe_batched directly with the same options
(window packing never changes per-window decode), with batching visible
only in the stats.
"""

import io
import json
import urllib.request
import wave

import numpy as np
import pytest

import whisper_at_tpu as wat
from whisper_at_tpu.models.dims import ModelDimensions
from whisper_at_tpu.models.whisper import Whisper
from whisper_at_tpu.serving import (
    TranscriptionService,
    _coerce_params,
    make_http_server,
)
from whisper_at_tpu.transcribe import transcribe_many

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
    n_text_state=64, n_text_layer=2,
)

OPTS = dict(
    language="en", temperature=0.0, fp16=False,
    logprob_threshold=None, compression_ratio_threshold=None,
    no_speech_threshold=None, sample_len=12,
)


@pytest.fixture(scope="module")
def model():
    return Whisper(DIMS, seed=5)


def clip(seconds, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000.0
    x = 0.3 * np.sin(2 * np.pi * (220 + 40 * seed) * t)
    x += 0.02 * rng.standard_normal(len(t))
    return x.astype(np.float32)


def strip_tags(result):
    r = dict(result)
    tags = np.asarray(r.pop("audio_tag"))
    return r, tags


def test_service_parity_and_coalescing(model):
    clips = [clip(2, 1), clip(5, 2), clip(35, 3), np.zeros(0, np.float32),
             clip(1, 4)]
    direct = transcribe_many(model, list(clips), **OPTS)

    with TranscriptionService(model, max_wait_s=0.5, **OPTS) as svc:
        futures = [svc.submit(c) for c in clips]
        results = [f.result(timeout=300) for f in futures]
        stats = svc.stats()

    for got, want in zip(results, direct):
        g, g_tags = strip_tags(got)
        w, w_tags = strip_tags(want)
        assert g["text"] == w["text"]
        assert g["segments"] == w["segments"]
        assert g["language"] == w["language"]
        np.testing.assert_allclose(g_tags, w_tags, atol=2e-6)

    assert stats["requests"] == len(clips)
    assert stats["completed"] == len(clips)
    # all five submitted inside one max_wait window -> far fewer batches
    # than requests (the 35 s clip contributes 2 windows, total 6 <= 24)
    assert stats["batches"] < len(clips)
    assert stats["max_batch_windows"] >= 2
    assert stats["audio_seconds"] > 40.0
    assert 0 < stats["latency_p50_s"] <= stats["latency_p95_s"] \
        <= stats["latency_max_s"]


def test_mixed_options_grouped_separately(model):
    c1, c2 = clip(2, 7), clip(2, 8)
    direct_en = transcribe_many(model, [c1], **OPTS)[0]
    direct_de = transcribe_many(model, [c2], **{**OPTS, "language": "de"})[0]

    with TranscriptionService(model, max_wait_s=0.3, **OPTS) as svc:
        f1 = svc.submit(c1)
        f2 = svc.submit(c2, language="de")
        r1, r2 = f1.result(timeout=300), f2.result(timeout=300)
        stats = svc.stats()

    assert r1["text"] == direct_en["text"]
    assert r2["text"] == direct_de["text"]
    assert r2["language"] == "de"
    assert stats["batches"] == 2  # incompatible options never share a batch


def test_prep_error_isolated(model):
    good = clip(2, 9)
    from whisper_at_tpu.audio import prefetch_audio

    with TranscriptionService(model, max_wait_s=0.2, **OPTS) as svc:
        bad = svc.submit("/nonexistent/file.wav")
        # invalid-for-the-batch inputs must fail in prep (isolated), never
        # inside the shared transcribe_many call: wrong prefetch padding
        # and a non-1-D array are the two accepted-type footguns
        bad_pad = svc.submit(prefetch_audio(clip(1, 9), padding=0))
        bad_shape = svc.submit(np.zeros((2, 100), np.float32))
        ok = svc.submit(good)
        assert isinstance(bad.exception(timeout=300), Exception)
        assert isinstance(bad_pad.exception(timeout=300), ValueError)
        assert isinstance(bad_shape.exception(timeout=300), ValueError)
        assert ok.result(timeout=300)["text"] == transcribe_many(
            model, [good], **OPTS
        )[0]["text"]
        stats = svc.stats()
    assert stats["failed"] == 3
    assert stats["completed"] == 1


def test_cancelled_future_does_not_kill_scheduler(model):
    good = clip(2, 15)
    with TranscriptionService(model, max_wait_s=0.2, **OPTS) as svc:
        victim = svc.submit(clip(2, 14))
        victim.cancel()  # may or may not win the race with the scheduler
        ok = svc.submit(good)
        assert ok.result(timeout=300)["text"] == transcribe_many(
            model, [good], **OPTS
        )[0]["text"]
        # a cancelled-and-lost future still resolved normally
        assert victim.cancelled() or victim.done()


def test_batch_failure_delivered_then_service_recovers(model, monkeypatch):
    """A transcribe_many failure (e.g. a transient backend error) must fail
    exactly the co-batched futures and leave the service serving."""
    import whisper_at_tpu.serving as serving_mod

    real = serving_mod.transcribe_many
    state = {"fail": True}

    def flaky(*a, **kw):
        if state["fail"]:
            state["fail"] = False
            raise RuntimeError("simulated backend FAILED_PRECONDITION")
        return real(*a, **kw)

    monkeypatch.setattr(serving_mod, "transcribe_many", flaky)
    good = clip(2, 16)
    with TranscriptionService(model, max_wait_s=0.3, **OPTS) as svc:
        doomed = [svc.submit(clip(1, 17)), svc.submit(clip(1, 18))]
        for f in doomed:
            assert "simulated backend" in str(f.exception(timeout=300))
        ok = svc.submit(good)
        assert ok.result(timeout=300)["text"] == transcribe_many(
            model, [good], **OPTS
        )[0]["text"]
        stats = svc.stats()
    assert stats["failed"] == 2
    assert stats["completed"] == 1


def test_close_semantics(model):
    svc = TranscriptionService(model, max_wait_s=0.05, **OPTS)
    fut = svc.submit(clip(1, 11))
    svc.close(wait=True)  # drains the backlog
    assert fut.result(timeout=10)["language"] == "en"
    with pytest.raises(RuntimeError):
        svc.submit(clip(1, 12))
    svc.close()  # idempotent


def test_rejects_conditioning(model):
    with pytest.raises(ValueError):
        TranscriptionService(model, condition_on_previous_text=True, **OPTS)
    with TranscriptionService(model, **OPTS) as svc:
        with pytest.raises(ValueError):
            svc.submit(clip(1, 13), condition_on_previous_text=True)


def test_concurrent_submitters_stress(model):
    """16 threads submitting simultaneously across two option groups: every
    request resolves, groups never mix, totals reconcile."""
    import threading

    short_opts = {**OPTS, "sample_len": 4}
    results = {}
    errors = []

    with TranscriptionService(model, max_wait_s=0.3, **short_opts) as svc:
        def worker(i):
            try:
                kw = {} if i % 2 == 0 else {"language": "de"}
                results[i] = svc.submit(clip(1, 40 + i), **kw).result(
                    timeout=600)
            except Exception as exc:  # noqa: BLE001 — collected for assert
                errors.append((i, exc))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = svc.stats()

    assert not errors
    assert len(results) == 16
    assert all(r["language"] == ("en" if i % 2 == 0 else "de")
               for i, r in results.items())
    assert stats["completed"] == 16
    # two incompatible option groups -> at least 2 batches, but far fewer
    # than 16 (the scheduler coalesced within each group)
    assert 2 <= stats["batches"] < 16


def test_coerce_params():
    options, http = _coerce_params(
        "language=en&beam_size=2&temperature=0,0.2&word_timestamps=true&tags=3"
    )
    assert options == dict(language="en", beam_size=2, temperature=(0.0, 0.2),
                           word_timestamps=True)
    assert http == dict(tags=3)
    with pytest.raises(ValueError):
        _coerce_params("bogus=1")
    with pytest.raises(ValueError):
        _coerce_params("beam_size=abc")
    with pytest.raises(ValueError):
        _coerce_params("temperature=")  # blank value must 400, not 500


def wav_bytes(x: np.ndarray) -> bytes:
    pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_http_server_end_to_end(model):
    import threading

    c = clip(2, 21)
    body = wav_bytes(c)
    # the server decodes the wav back to the same int16 grid the direct
    # call sees when fed the identical quantized waveform
    pcm = np.frombuffer(
        wav_bytes(c)[44:], np.int16
    )  # standard 44-byte PCM WAV header
    direct = transcribe_many(model, [pcm], **OPTS)[0]

    with TranscriptionService(model, max_wait_s=0.05, **OPTS) as svc:
        server = make_http_server(svc, "127.0.0.1", 0,
                                  max_body_bytes=len(body))
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            base = f"http://127.0.0.1:{port}"

            health = json.loads(urllib.request.urlopen(
                base + "/healthz", timeout=60).read())
            assert health["status"] == "ok"

            req = urllib.request.Request(
                base + "/v1/transcribe?tags=3", data=body,
                headers={"Content-Type": "audio/wav"},
            )
            resp = json.loads(urllib.request.urlopen(req, timeout=300).read())
            assert resp["text"] == direct["text"]
            assert resp["language"] == "en"
            assert np.asarray(resp["audio_tag"]).shape == \
                np.asarray(direct["audio_tag"]).shape
            assert resp["audio_tags"][0]["audio tags"]  # top-3 labels present

            bad = urllib.request.Request(
                base + "/v1/transcribe?bogus=1", data=body,
                headers={"Content-Type": "audio/wav"},
            )
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                urllib.request.urlopen(bad, timeout=60)
            assert exc_info.value.code == 400

            with pytest.raises(urllib.error.HTTPError) as exc_info:
                urllib.request.urlopen(base + "/nope", timeout=60)
            assert exc_info.value.code == 404

            too_big = urllib.request.Request(
                base + "/v1/transcribe", data=body + b"x",
                headers={"Content-Type": "audio/wav"},
            )
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                urllib.request.urlopen(too_big, timeout=60)
            assert exc_info.value.code == 413

            # path mode is disabled unless the server was started with a
            # path root — a network client must never read server paths
            path_req = urllib.request.Request(
                base + "/v1/transcribe",
                data=json.dumps({"path": "/etc/hostname"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                urllib.request.urlopen(path_req, timeout=60)
            assert exc_info.value.code == 403
        finally:
            server.shutdown()
            server.server_close()
            thread.join()


def test_service_on_dp_mesh(model):
    """dp-sharded serving: the service forwards its mesh to transcribe_many
    and results stay identical to the single-device run."""
    import jax

    from whisper_at_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    clips = [clip(2, 31), clip(5, 32), clip(1, 33)]
    direct = transcribe_many(model, list(clips), **OPTS)
    mesh = make_mesh(n_devices=8)
    with TranscriptionService(model, max_wait_s=0.5, mesh=mesh,
                              **OPTS) as svc:
        results = [f.result(timeout=300)
                   for f in [svc.submit(c) for c in clips]]
    float_keys = ("avg_logprob", "no_speech_prob", "compression_ratio")
    for got, want in zip(results, direct):
        assert got["text"] == want["text"]
        assert len(got["segments"]) == len(want["segments"])
        for g, w in zip(got["segments"], want["segments"]):
            # mesh compilation reassociates reductions: token-identical,
            # probability fields equal only to float tolerance
            assert {k: v for k, v in g.items() if k not in float_keys} == \
                {k: v for k, v in w.items() if k not in float_keys}
            for k in float_keys:
                np.testing.assert_allclose(g[k], w[k], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got["audio_tag"]),
                                   np.asarray(want["audio_tag"]), atol=2e-6)


def test_http_path_mode_confined(model, tmp_path):
    import threading

    c = clip(1, 50)
    wav_path = tmp_path / "inside.wav"
    wav_path.write_bytes(wav_bytes(c))
    direct = transcribe_many(model, [str(wav_path)], **OPTS)[0]

    with TranscriptionService(model, max_wait_s=0.05, **OPTS) as svc:
        server = make_http_server(svc, "127.0.0.1", 0,
                                  path_root=str(tmp_path))
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            base = f"http://127.0.0.1:{port}"

            def post_json(payload):
                return urllib.request.urlopen(urllib.request.Request(
                    base + "/v1/transcribe",
                    data=json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"},
                ), timeout=300)

            resp = json.loads(post_json({"path": "inside.wav"}).read())
            assert resp["text"] == direct["text"]

            for escape in ("../outside.wav", "/etc/hostname"):
                with pytest.raises(urllib.error.HTTPError) as exc_info:
                    post_json({"path": escape})
                assert exc_info.value.code == 403
        finally:
            server.shutdown()
            server.server_close()
            thread.join()


def test_close_abort_skips_queued_prep(model, tmp_path):
    """close(wait=False) must not decode every cancelled request's file.

    Asserts on the number of prep jobs that actually EXECUTED rather than
    wall-clock (a previous <90 s bound flaked twice on a heavily loaded
    host): with one prep worker and an immediate abort, nearly all of the
    64 queued preps must be cancelled before running.
    """
    wav_path = tmp_path / "c.wav"
    wav_path.write_bytes(wav_bytes(clip(1, 51)))
    svc = TranscriptionService(model, max_wait_s=5.0, prep_workers=1, **OPTS)
    ran = []
    orig_prep = svc._prep
    svc._prep = lambda audio: (ran.append(1), orig_prep(audio))[1]
    futs = [svc.submit(str(wav_path)) for _ in range(64)]
    svc.close(wait=False)
    # the scheduler may have started a handful before the abort landed;
    # decoding all 64 through one worker means the cancel didn't work
    assert len(ran) < 32, f"{len(ran)} preps ran despite close(wait=False)"
    # nothing hangs: every future is done one way or the other
    assert all(f.done() or f.cancelled() for f in futs)


def test_top_level_export():
    assert wat.TranscriptionService is TranscriptionService


def test_rolling_fill_coalesces_staggered_submits(model, monkeypatch):
    """The batch-fill window is ROLLING: each compatible arrival extends it
    by max_wait_s (capped at max_total_wait_s), so a saturated-load trickle
    of submits — each within max_wait_s of the PREVIOUS arrival but far past
    the head's fixed window — still lands in one batch."""
    import threading
    import whisper_at_tpu.serving as serving_mod

    calls = []

    def fake_transcribe_many(m, audios, max_batch=24, mesh=None, **options):
        calls.append(len(audios))
        return [dict(text="", segments=[], language="en",
                     audio_tag=np.zeros((1, 1), np.float32),
                     at_time_res=10.0) for _ in audios]

    monkeypatch.setattr(serving_mod, "transcribe_many", fake_transcribe_many)

    n, stagger = 4, 0.2
    # head's own window is 0.6 s; arrivals at 0.2/0.4/0.6/... each buy
    # another 0.6 s, so all n coalesce; a fixed window would split them
    svc = TranscriptionService(model, max_wait_s=0.6, **OPTS)
    try:
        futs = [None] * n
        start = threading.Barrier(n)

        def submit(i):
            start.wait()
            import time
            time.sleep(i * stagger)
            futs[i] = svc.submit(clip(0.5, seed=i))

        threads = [threading.Thread(target=submit, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for f in futs:
            f.result(timeout=30)
        stats = svc.stats()
    finally:
        svc.close()
    assert stats["completed"] == n
    assert stats["batches"] == 1, (stats, calls)
    assert calls == [n]


def test_http_stream_endpoint(model):
    """POST /v1/stream: chunked raw-PCM16 request in, NDJSON segments out
    the moment each 30 s window finalizes — driven over a real socket, with
    the first segment read back BEFORE the upload finishes (live emission),
    and results identical to a standalone conditioning-free session."""
    import http.client
    import threading

    from whisper_at_tpu.streaming import (
        StreamingService,
        StreamingTranscriber,
    )

    audio = clip(35, seed=13)
    pcm = (np.clip(audio, -1, 1) * 32767.0).astype(np.int16)

    solo = StreamingTranscriber(model, condition_on_previous_text=False,
                                **OPTS)
    solo.feed(pcm)
    want = solo.finish()
    assert want["segments"], "fixture produced no segments"

    with TranscriptionService(model, max_wait_s=0.02, **OPTS) as svc, \
            StreamingService(model, max_wait_s=0.02, **OPTS) as stream_svc:
        server = make_http_server(svc, "127.0.0.1", 0,
                                  stream_service=stream_svc)
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                              timeout=600)
            conn.putrequest("POST", "/v1/stream?tags=3")
            conn.putheader("Transfer-Encoding", "chunked")
            conn.putheader("Content-Type", "audio/pcm16")
            conn.endheaders()

            raw = pcm.tobytes()

            def send_chunk(data):
                conn.sock.sendall(b"%x\r\n" % len(data) + data + b"\r\n")

            # 32 s first: covers one full window (+ alignment margin), so
            # a segment must stream back while the upload is still open
            head = 32 * 16000 * 2
            for lo in range(0, head, 65536):
                send_chunk(raw[lo:lo + 65536])
            resp = conn.getresponse()
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "application/x-ndjson"
            first = json.loads(resp.readline())
            assert first["text"] == want["segments"][0]["text"]
            assert first["tokens"] == want["segments"][0]["tokens"]

            for lo in range(head, len(raw), 65536):
                send_chunk(raw[lo:lo + 65536])
            conn.sock.sendall(b"0\r\n\r\n")

            lines = [json.loads(ln) for ln in resp.read().split(b"\n") if ln]
            conn.close()
        finally:
            server.shutdown()
            server.server_close()
            thread.join()

    summary = lines[-1]
    segments = [first] + lines[:-1]
    assert summary["done"] is True
    assert summary["text"] == want["text"]
    assert summary["language"] == want["language"]
    assert summary["audio_tags"][0]["audio tags"]  # parsed top-3 labels
    assert [s["tokens"] for s in segments] == \
        [s["tokens"] for s in want["segments"]]
    assert [s["text"] for s in segments] == \
        [s["text"] for s in want["segments"]]
    np.testing.assert_allclose(
        [(s["start"], s["end"]) for s in segments],
        [(s["start"], s["end"]) for s in want["segments"]],
    )
    # the live sessions rode the shared batcher (decode + mel + tags)
    st = stream_svc.stats()
    assert st["windows"] >= 2 and st["mel_batched_windows"] >= 1


def test_http_early_errors_close_connection(model):
    """An error response sent BEFORE the request body is consumed must not
    keep the connection alive: under HTTP/1.1 the unread body bytes would
    be parsed as the next request's start line (reproduced as a 501 from
    leftover WAV bytes). Healthy responses still keep-alive."""
    import http.client
    import threading

    body = wav_bytes(clip(1, 52))
    with TranscriptionService(model, max_wait_s=0.02, **OPTS) as svc:
        server = make_http_server(svc, "127.0.0.1", 0)
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("POST", "/v1/transcribe?bogus=1", body=body,
                         headers={"Content-Type": "audio/wav"})
            resp = conn.getresponse()
            assert resp.status == 400
            assert resp.getheader("Connection") == "close"
            resp.read()
            conn.close()

            # keep-alive still works across healthy requests
            conn2 = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            for _ in range(2):
                conn2.request("GET", "/healthz")
                r = conn2.getresponse()
                assert r.status == 200
                r.read()
            conn2.close()
        finally:
            server.shutdown()
            server.server_close()
            thread.join()


def test_service_warmup_buckets(model):
    """warmup() precompiles every batch-bucket rung without touching the
    scheduler stats, and the service serves normally afterwards."""
    with TranscriptionService(model, max_batch=4, **OPTS) as svc:
        took = svc.warmup(clip_seconds=0.5)
        assert sorted(took) == [1, 2, 4]
        assert all(v >= 0 for v in took.values())
        assert svc.stats()["requests"] == 0  # bypasses the scheduler
        res = svc.transcribe(clip(2, 7))
        assert "segments" in res and "audio_tag" in res


def test_serve_prof_stage_accounting(model):
    """WHISPER_AT_TPU_SERVE_PROF instrumentation (tools/profile_serving.py)
    records every transcribe_many stage plus the scheduler's own stages,
    and stays a zero-overhead nullcontext when disabled."""
    from whisper_at_tpu.transcribe import _serve_prof as prof
    assert prof.snapshot() == {}  # disabled by default: nothing recorded

    was = prof.enabled
    prof.enabled = True
    try:
        with TranscriptionService(model, max_wait_s=0.05, **OPTS) as svc:
            svc.submit(clip(2, 7)).result()
        stages = prof.snapshot()
    finally:
        prof.enabled = was
        prof.snapshot()
    for key in ("frontend-mel", "decode", "tag-dispatch", "assembly",
                "tag-commit", "emit", "sched-fill", "sched-settle"):
        assert key in stages, key
        assert stages[key]["count"] >= 1
    assert stages["decode"]["wall_ms"] > 0
