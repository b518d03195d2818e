"""Continuous-batching transcription service — the production serving surface.

The reference serves requests strictly one at a time: the CLI loops over
files calling ``transcribe`` per path (reference
package/whisper-at/whisper_at/transcribe.py:461-489) and the Gradio demo
runs one call per interaction (reference app.py:9-58). On a TPU that wastes
the device: a single short clip leaves the batch dimension at 1-2 windows
while the chip's throughput sweet spot is ~24 windows per dispatch.

``TranscriptionService`` is the always-on equivalent: concurrent callers
``submit()`` audio and receive a ``concurrent.futures.Future``; a scheduler
thread coalesces compatible requests (same decode options) into shared
device batches through :func:`whisper_at_tpu.transcribe.transcribe_many`
(cross-file window packing), waiting at most ``max_wait_s`` to fill a batch.
Each request's host work (file decode, STFT prep) and its host->device
transfer run in a prep thread pool the moment it is submitted, so transfers
ride under the previous batch's compute exactly like the pipelined bench.

Results are identical to calling ``transcribe_batched`` per file — window
packing never changes per-window decode — which the tests pin.

A minimal stdlib HTTP front-end (``serve_http`` / ``python -m
whisper_at_tpu.serving``) exposes the service as a JSON API:

    POST /v1/transcribe?language=en&tags=5   (body: WAV bytes)
    GET  /healthz                            (service stats)

No third-party server dependency: ``http.server.ThreadingHTTPServer``
handles connections; every handler thread just blocks on its request's
Future while the scheduler batches across connections.
"""

from __future__ import annotations

import io
import json
import os
import threading
import time
from collections import deque
from concurrent.futures import Future, InvalidStateError, ThreadPoolExecutor
from typing import Optional

import numpy as np

from .audio import SAMPLE_RATE, prefetch_audio
from .ops.mel import N_FRAMES, PrefetchedAudio
from .transcribe import DEFAULT_MAX_BATCH, transcribe_many


def _canonical_options(options: dict) -> tuple:
    """Hashable identity of a decode-option set (the batching compatibility
    key): requests batch together only when every option matches, so a
    packed group shares one tokenizer/prompt/decode program."""
    items = []
    for k in sorted(options):
        v = options[k]
        if isinstance(v, (list, tuple)):
            v = tuple(v)
        items.append((k, v))
    return tuple(items)


def _scan_compatible(pending: deque, key, budget: int):
    """One forward pass over a pending deque: pull up to ``budget`` requests
    whose batching key matches, preserving order; returns (matches,
    rebuilt_deque). Shared by TranscriptionService and StreamingService —
    O(n) per batch-fill cycle, never a per-admission rescan."""
    cands, keep = [], deque()
    for r in pending:
        if r.key == key and len(cands) < budget:
            cands.append(r)
        else:
            keep.append(r)
    return cands, keep


def _settle(future: Future, *, result=None, exception=None) -> bool:
    """set_result/set_exception tolerant of a caller's concurrent cancel()
    (nothing marks these futures running, so cancel() can win any time
    before the result lands — that must not kill the scheduler thread)."""
    try:
        if exception is not None:
            future.set_exception(exception)
        else:
            future.set_result(result)
        return True
    except InvalidStateError:
        return False


class _Request:
    __slots__ = ("future", "prep", "key", "options", "submitted_at",
                 "windows", "audio")

    def __init__(self, future, prep, key, options):
        self.future = future
        self.prep = prep            # Future[PrefetchedAudio | np.ndarray]
        self.key = key
        self.options = options
        self.submitted_at = time.monotonic()
        self.windows = None         # resolved from prep when scheduled
        self.audio = None


def _window_count(prepped) -> int:
    """30 s windows a prepped input contributes to a packed batch (the same
    arithmetic transcribe_many uses: content frames beyond the 30 s padding
    tail, in N_FRAMES windows; zero-content clips decode nothing)."""
    if isinstance(prepped, PrefetchedAudio):
        content = prepped.n_frames - N_FRAMES
        return max(0, -(-content // N_FRAMES)) if content > 0 else 0
    n = int(np.asarray(prepped).size)
    return max(1, -(-n // (SAMPLE_RATE * 30))) if n else 0


class TranscriptionService:
    """Always-on batching scheduler around ``transcribe_many``.

    Parameters
    ----------
    model: a ``Whisper`` model (built or loaded).
    max_batch: device window budget per dispatch (the measured v5e sweet
        spot is 24; see bench.py).
    max_wait_s: how long the scheduler holds an under-full batch open for
        more compatible requests. The fill window is ROLLING: every
        compatible arrival extends it by another ``max_wait_s`` (so a
        trickle of resubmits — the saturated-load arrival pattern, spread
        by per-request host work — still coalesces), bounded by
        ``max_total_wait_s``. Latency floor for a lone request stays
        exactly ``max_wait_s``.
    max_total_wait_s: hard cap on one batch's total fill time under the
        rolling extension (default ``10 * max_wait_s``).
    prefetch: prep each request's audio (decode + STFT prep + async
        host->device transfer) in a thread pool at submit time. Disable
        only for debugging; results are identical either way.
    mesh: optional ``jax.sharding.Mesh`` forwarded to ``transcribe_many``
        (dp-sharded serving).
    default_options: decode options applied to every request (overridable
        per ``submit``), e.g. ``language="en", fp16=False``.
    """

    _CLOSED = object()

    def __init__(self, model, *, max_batch: int = DEFAULT_MAX_BATCH,
                 max_wait_s: float = 0.05, max_total_wait_s: float = None,
                 prefetch: bool = True,
                 prep_workers: int = 4, mesh=None, **default_options):
        if default_options.get("condition_on_previous_text"):
            raise ValueError(
                "condition_on_previous_text=True serializes windows and "
                "cannot ride the packed batch path; use transcribe() directly"
            )
        self.model = model
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_s)
        self.max_total_wait_s = (10.0 * self.max_wait_s
                                 if max_total_wait_s is None
                                 else float(max_total_wait_s))
        self.mesh = mesh
        self.default_options = dict(default_options)
        self._prefetch = prefetch
        self._pending: deque = deque()
        self._cv = threading.Condition()
        self._closed = False
        self._drain = True          # process backlog on close(wait=True)
        self._stats_lock = threading.Lock()
        self._stats = dict(requests=0, completed=0, failed=0, batches=0,
                           windows=0, audio_seconds=0.0, busy_s=0.0,
                           max_batch_windows=0)
        # submit->result latencies of the most recent completions (enough
        # for stable p50/p95 without unbounded memory)
        self._latencies: deque = deque(maxlen=1024)
        self._prep_pool = ThreadPoolExecutor(
            max_workers=max(1, prep_workers),
            thread_name_prefix="wat-serve-prep",
        )
        self._thread = threading.Thread(
            target=self._scheduler, name="wat-serve-scheduler", daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------------ #
    # client surface
    # ------------------------------------------------------------------ #

    def submit(self, audio, **overrides) -> Future:
        """Queue one recording (waveform, file path, or PrefetchedAudio);
        returns a Future resolving to the ``transcribe``-shaped dict."""
        with self._cv:
            if self._closed:
                raise RuntimeError("TranscriptionService is closed")
            options = dict(self.default_options)
            options.update(overrides)
            if options.get("condition_on_previous_text"):
                raise ValueError(
                    "condition_on_previous_text=True cannot be served "
                    "from the packed batch path"
                )
            fut: Future = Future()
            prep = self._prep_pool.submit(self._prep, audio)
            req = _Request(fut, prep, _canonical_options(options), options)
            self._pending.append(req)
            with self._stats_lock:
                self._stats["requests"] += 1
            self._cv.notify()
        return fut

    def transcribe(self, audio, **overrides) -> dict:
        """Synchronous convenience: ``submit(...).result()``."""
        return self.submit(audio, **overrides).result()

    def warmup(self, *, buckets=None, clip_seconds: float = 1.0,
               **overrides) -> dict:
        """Precompile the device programs production traffic will hit.

        A cold large-v1 decode program costs tens of seconds to compile
        (more over a tunneled backend); a deployment wants that paid at
        startup, not by its first requests. Drives ``transcribe_many``
        directly — the exact jitted programs the scheduler dispatches —
        with ``k`` one-window synthetic tone clips for every ``k`` in the
        decode path's batch-bucket ladder (or the given ``buckets``),
        under the service's default options (per-call ``overrides`` win,
        same as ``submit``). Bypasses the scheduler, so service stats are
        untouched. Returns ``{bucket: seconds}``.
        """
        from .transcribe import _batch_bucket

        if buckets is None:
            buckets = sorted({
                _batch_bucket(n, self.max_batch)
                for n in range(1, self.max_batch + 1)
            })
        options = dict(self.default_options)
        options.update(overrides)
        t = np.arange(int(SAMPLE_RATE * clip_seconds)) / SAMPLE_RATE
        took = {}
        for k in buckets:
            clips = [
                (0.3 * np.sin(2 * np.pi * (220.0 + 5 * i) * t))
                .astype(np.float32)
                for i in range(int(k))
            ]
            t0 = time.monotonic()
            transcribe_many(self.model, clips, max_batch=self.max_batch,
                            mesh=self.mesh, **options)
            took[int(k)] = round(time.monotonic() - t0, 3)
        return took

    def stats(self) -> dict:
        with self._stats_lock:
            s = dict(self._stats)
            lats = sorted(self._latencies)
        if lats:
            s["latency_p50_s"] = round(lats[len(lats) // 2], 4)
            s["latency_p95_s"] = round(lats[int(len(lats) * 0.95)
                                            if len(lats) > 1 else 0], 4)
            s["latency_max_s"] = round(lats[-1], 4)
        s["pending"] = len(self._pending)
        s["closed"] = self._closed
        return s

    def close(self, wait: bool = True):
        """Stop the service. ``wait=True`` processes the backlog first;
        ``wait=False`` cancels every request still queued."""
        with self._cv:
            if self._closed and not self._thread.is_alive():
                return
            self._closed = True
            self._drain = wait
            self._cv.notify_all()
        self._thread.join()
        # on abort (wait=False) drop prep jobs nobody will consume instead
        # of decoding every cancelled request's file to completion
        self._prep_pool.shutdown(wait=True, cancel_futures=not wait)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close(wait=not any(exc))

    # ------------------------------------------------------------------ #
    # scheduler
    # ------------------------------------------------------------------ #

    def _prep(self, audio):
        """Per-request host work. Anything that can make THIS request
        invalid must raise here (isolated, fails only its own future) —
        never inside the shared transcribe_many call, which would deliver
        the error to every co-batched request."""
        from .ops.mel import N_SAMPLES

        if isinstance(audio, PrefetchedAudio):
            if audio.padding != N_SAMPLES:
                raise ValueError(
                    f"PrefetchedAudio was prepared with padding="
                    f"{audio.padding}; the service needs {N_SAMPLES} "
                    "(the prefetch_audio default)"
                )
            return audio
        if isinstance(audio, str):
            if self._prefetch:
                return prefetch_audio(audio)
            from .audio import load_audio_pcm16

            return load_audio_pcm16(audio)
        audio = np.asarray(audio)
        if audio.ndim != 1 or not np.issubdtype(audio.dtype, np.number):
            raise ValueError(
                f"expected a 1-D numeric waveform, got shape {audio.shape} "
                f"dtype {audio.dtype}"
            )
        return prefetch_audio(audio) if self._prefetch else audio

    def _resolve(self, req: _Request) -> bool:
        """Wait for a request's prep; on prep failure fail its future.
        Returns True when the request is schedulable."""
        if req.audio is not None:
            return True
        try:
            req.audio = req.prep.result()
        except Exception as exc:  # noqa: BLE001 — forwarded to the caller
            _settle(req.future, exception=exc)
            with self._stats_lock:
                self._stats["failed"] += 1
            return False
        req.windows = _window_count(req.audio)
        return True

    def _take_batch(self):
        """Assemble the next batch under the condition variable.

        FIFO head defines the option group; later compatible requests join
        until the window budget fills or ``max_wait_s`` passes. Requests
        with different options stay queued, in order, for the next cycle.
        Returns (requests, key) or ``TranscriptionService._CLOSED``.
        """
        with self._cv:
            while not self._pending:
                if self._closed:
                    return self._CLOSED
                self._cv.wait()
            if self._closed and not self._drain:
                while self._pending:
                    self._pending.popleft().future.cancel()
                return self._CLOSED
            head = self._pending.popleft()
        if not self._resolve(head):
            return [], head.key
        batch, windows = [head], head.windows
        hard_deadline = time.monotonic() + self.max_total_wait_s
        deadline = time.monotonic() + self.max_wait_s
        while windows < self.max_batch:
            with self._cv:
                # budget bound: each live request is >=1 window,
                # zero-window empties are free riders
                cands, self._pending = _scan_compatible(
                    self._pending, head.key, self.max_batch - windows)
                if not cands:
                    if self._closed:
                        break
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(timeout=remaining)
                    continue
            # rolling fill window: an arrival buys the batch another
            # max_wait_s (capped), so saturated-load resubmit trickles
            # coalesce instead of closing the batch at head+max_wait_s
            deadline = min(hard_deadline,
                           time.monotonic() + self.max_wait_s)
            leftovers = []
            for i, nxt in enumerate(cands):
                if windows >= self.max_batch:
                    leftovers = cands[i:]
                    break
                if self._resolve(nxt):
                    batch.append(nxt)
                    windows += nxt.windows
            if leftovers:
                with self._cv:
                    self._pending.extendleft(reversed(leftovers))
        return batch, head.key

    def _scheduler(self):
        from .transcribe import _serve_prof as prof

        last_dispatch_end = None
        while True:
            t_fill = time.perf_counter()
            taken = self._take_batch()
            if taken is self._CLOSED:
                return
            batch, _ = taken
            if not batch:
                continue
            prof.add("sched-fill", time.perf_counter() - t_fill)
            if last_dispatch_end is not None:
                # device-idle surface between consecutive transcribe_many
                # calls: everything the scheduler did since the previous
                # batch's return (fill wait + futures settle + stats)
                prof.add("sched-gap",
                         time.perf_counter() - last_dispatch_end)
            options = dict(batch[0].options)
            t0 = time.monotonic()
            try:
                results = transcribe_many(
                    self.model, [r.audio for r in batch],
                    max_batch=self.max_batch, mesh=self.mesh, **options,
                )
            except Exception as exc:  # noqa: BLE001 — per-request delivery
                for r in batch:
                    _settle(r.future, exception=exc)
                with self._stats_lock:
                    self._stats["failed"] += len(batch)
                    self._stats["batches"] += 1
                continue
            done = time.monotonic()
            last_dispatch_end = time.perf_counter()
            n_windows = sum(r.windows for r in batch)
            with self._stats_lock:
                s = self._stats
                s["completed"] += len(batch)
                s["batches"] += 1
                s["windows"] += n_windows
                s["busy_s"] += done - t0
                s["max_batch_windows"] = max(s["max_batch_windows"], n_windows)
                for r, res in zip(batch, results):
                    s["audio_seconds"] += _audio_seconds(r.audio)
                    self._latencies.append(done - r.submitted_at)
            t_settle = time.perf_counter()
            for r, res in zip(batch, results):
                _settle(r.future, result=res)
            prof.add("sched-settle", time.perf_counter() - t_settle)


def _audio_seconds(prepped) -> float:
    if isinstance(prepped, PrefetchedAudio):
        from .ops.mel import HOP_LENGTH

        # n_frames counts the padded signal; remove the 30 s padding tail
        return max(0, prepped.n_frames - N_FRAMES) * HOP_LENGTH / SAMPLE_RATE
    return float(np.asarray(prepped).size) / SAMPLE_RATE


# -------------------------------------------------------------------------- #
# HTTP front-end (stdlib only)
# -------------------------------------------------------------------------- #

def _jsonable(obj):
    """Recursively convert numpy/jax leaves to JSON-serializable types."""
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.generic):
        return obj.item()
    if hasattr(obj, "tolist"):  # np.ndarray / jax.Array
        return np.asarray(obj).tolist()
    return obj


# query-parameter coercions the HTTP API accepts (a typed allowlist: an
# unknown or malformed parameter is a 400, never a silent default)
_PARAM_TYPES = {
    "language": str,
    "task": str,
    "beam_size": int,
    "best_of": int,
    "patience": float,
    "length_penalty": float,
    "sample_len": int,
    "at_time_res": float,
    "temperature": "floats",
    "word_timestamps": "bool",
    "without_timestamps": "bool",
    "initial_prompt": str,
    "tags": int,          # HTTP-level: include top-k parsed tag names
    "tag_language": str,  # HTTP-level: label language for tags
}
_BOOL_TRUE = {"1", "true", "yes", "on"}
_BOOL_FALSE = {"0", "false", "no", "off"}


def _coerce_params(query: str):
    """Parse a request query string into (decode_options, http_options)."""
    from urllib.parse import parse_qsl

    options, http = {}, {}
    for k, v in parse_qsl(query, keep_blank_values=True):
        spec = _PARAM_TYPES.get(k)
        if spec is None:
            raise ValueError(f"unknown parameter: {k}")
        try:
            if spec == "bool":
                lv = v.lower()
                if lv in _BOOL_TRUE:
                    val = True
                elif lv in _BOOL_FALSE:
                    val = False
                else:
                    raise ValueError(v)
            elif spec == "floats":
                parts = [float(p) for p in v.split(",") if p != ""]
                if not parts:
                    raise ValueError(v)
                val = parts[0] if len(parts) == 1 else tuple(parts)
            else:
                val = spec(v)
        except ValueError as exc:
            raise ValueError(f"bad value for {k}: {v!r}") from exc
        (http if k in ("tags", "tag_language") else options)[k] = val
    return options, http


def _decode_wav_bytes(body: bytes) -> np.ndarray:
    """Decode an in-memory WAV request body to int16/float32 mono at 16 kHz
    (same arithmetic as audio.load_audio_pcm16's built-in WAV path)."""
    import wave

    from .audio import _load_audio_wav

    with wave.open(io.BytesIO(body), "rb") as wf:
        if (wf.getsampwidth() == 2 and wf.getnchannels() == 1
                and wf.getframerate() == SAMPLE_RATE):
            return np.frombuffer(
                wf.readframes(wf.getnframes()), np.int16
            ).flatten()
    return _load_audio_wav(io.BytesIO(body), SAMPLE_RATE)


def make_http_server(service: TranscriptionService, host: str = "127.0.0.1",
                     port: int = 0, max_body_bytes: int = 512 << 20,
                     path_root: Optional[str] = None, stream_service=None):
    """Build (without starting) a ThreadingHTTPServer bound to the service.

    Routes:
      GET  /healthz          -> 200 service stats
      POST /v1/transcribe    -> 200 transcribe-result JSON
           body: WAV bytes, or JSON {"path": "/local/file"}; options via
           query string (see _PARAM_TYPES); ``tags=k`` adds top-k parsed
           label names per segment via parse_at_label.
      POST /v1/stream        -> 200 NDJSON live transcription (requires
           ``stream_service``, a streaming.StreamingService): the request
           body is raw mono 16 kHz int16 PCM ("audio/pcm16"), sent with
           Transfer-Encoding: chunked or a plain Content-Length; segments
           stream back the moment their 30 s window finalizes, one JSON
           object per line, ending with a {"done": true, ...} summary.
           Handler threads feed per-connection StreamingTranscriber
           sessions, so concurrent live connections batch their window
           decodes/mels/tags on the device.

    Bodies over ``max_body_bytes`` (default 512 MB ≈ 4.5 h of 16 kHz WAV)
    get 413 without being read. The JSON ``path`` mode reads server-local
    files, so it is DISABLED unless ``path_root`` names a directory;
    requests outside that directory get 403 (a network client must never
    choose arbitrary server paths).
    """
    root = os.path.realpath(path_root) if path_root else None
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1: required for chunked responses on /v1/stream (every
        # non-stream response carries Content-Length, so keep-alive works)
        protocol_version = "HTTP/1.1"

        def _send(self, code: int, payload: dict, close: bool = False):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if close:
                self.send_header("Connection", "close")
            self.end_headers()
            self.wfile.write(body)

        def _send_early_error(self, code: int, payload: dict):
            """Error response sent BEFORE the request body was consumed:
            under HTTP/1.1 keep-alive the unread body would be parsed as
            the NEXT request's start line (reproduced: a 400 followed by a
            pipelined GET returned 501 from leftover WAV bytes), so the
            connection must not be reused — close server-side AND tell
            the client with a Connection: close header."""
            self.close_connection = True
            self._send(code, payload, close=True)

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path.split("?")[0] == "/healthz":
                payload = dict(status="ok", **service.stats())
                if stream_service is not None:
                    payload["stream"] = stream_service.stats()
                self._send(200, payload)
            else:
                self._send(404, {"error": "not found"})

        # ------------------------- /v1/stream ------------------------- #

        def _iter_request_body(self):
            """Yield raw body pieces as they arrive (chunked or plain)."""
            te = (self.headers.get("Transfer-Encoding") or "").lower()
            total = 0
            if "chunked" in te:
                while True:
                    line = self.rfile.readline(1024)
                    if not line.endswith(b"\n"):
                        raise ValueError("chunk-size line too long")
                    size = int(line.strip().split(b";")[0], 16)
                    if size == 0:
                        while True:  # swallow trailers up to the blank line
                            tail = self.rfile.readline(1024)
                            if tail in (b"\r\n", b"\n", b""):
                                return
                    total += size
                    if total > max_body_bytes:
                        raise ValueError("body exceeds max_body_bytes")
                    data = self.rfile.read(size)
                    self.rfile.read(2)  # chunk-terminating CRLF
                    yield data
            else:
                remaining = int(self.headers.get("Content-Length", 0))
                if remaining > max_body_bytes:
                    raise ValueError("body exceeds max_body_bytes")
                while remaining > 0:
                    piece = self.rfile.read(min(65536, remaining))
                    if not piece:
                        return
                    remaining -= len(piece)
                    yield piece

        def _write_chunk(self, payload: dict):
            data = json.dumps(payload).encode() + b"\n"
            self.wfile.write(b"%x\r\n" % len(data) + data + b"\r\n")
            self.wfile.flush()

        def _do_stream(self, query: str):
            if stream_service is None:
                self._send_early_error(404, {"error": "streaming is not "
                                                      "enabled on this "
                                                      "server"})
                return
            try:
                options, http_opts = _coerce_params(query)
            except ValueError as exc:
                self._send_early_error(400, {"error": str(exc)})
                return
            ctype = (self.headers.get("Content-Type") or "").split(";")[0]
            if ctype not in ("", "audio/pcm16",
                             "application/octet-stream"):
                self._send_early_error(
                    415, {"error": "stream body must be raw mono 16 kHz "
                                   "int16 PCM (audio/pcm16)"})
                return
            try:
                sess = stream_service.open(**options)
            except (TypeError, ValueError, RuntimeError) as exc:
                self._send_early_error(400, {"error": str(exc)})
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            emitted = 0
            try:
                carry = b""
                for piece in self._iter_request_body():
                    carry += piece
                    usable = len(carry) & ~1  # int16 frames only
                    if not usable:
                        continue
                    pcm = np.frombuffer(carry[:usable], np.int16)
                    carry = carry[usable:]
                    for seg in sess.feed(pcm):
                        emitted += 1
                        self._write_chunk(_jsonable(seg))
                result = sess.finish()
                for seg in result["segments"][emitted:]:
                    self._write_chunk(_jsonable(seg))
                summary = dict(done=True, text=result["text"],
                               language=result["language"])
                if http_opts.get("tags"):
                    from .at_post_processing import parse_at_label

                    summary["audio_tags"] = _jsonable(parse_at_label(
                        result, top_k=http_opts["tags"],
                        language=http_opts.get("tag_language",
                                               "follow_asr"),
                    ))
                self._write_chunk(summary)
            except Exception as exc:  # noqa: BLE001 — headers already sent
                # request framing may be lost mid-body: never reuse the
                # connection after an error
                self.close_connection = True
                try:
                    self._write_chunk({"error": str(exc)})
                except OSError:
                    pass  # client already gone
            finally:
                try:
                    self.wfile.write(b"0\r\n\r\n")
                    self.wfile.flush()
                except OSError:
                    pass

        def do_POST(self):
            path, _, query = self.path.partition("?")
            if path == "/v1/stream":
                self._do_stream(query)
                return
            if path != "/v1/transcribe":
                self._send_early_error(404, {"error": "not found"})
                return
            try:
                options, http_opts = _coerce_params(query)
            except ValueError as exc:
                self._send_early_error(400, {"error": str(exc)})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length > max_body_bytes:
                self._send_early_error(
                    413, {"error": f"body exceeds {max_body_bytes} bytes"})
                return
            body = self.rfile.read(length)
            ctype = (self.headers.get("Content-Type") or "").split(";")[0]
            try:
                if ctype == "application/json":
                    audio = json.loads(body)["path"]
                    if root is None:
                        self._send(403, {"error": "path mode is disabled "
                                                  "(server started without "
                                                  "a path root)"})
                        return
                    real = os.path.realpath(os.path.join(root, audio))
                    if not (real == root
                            or real.startswith(root + os.sep)):
                        self._send(403, {"error": "path outside the "
                                                  "served root"})
                        return
                    audio = real
                else:
                    audio = _decode_wav_bytes(body)
            except Exception as exc:  # noqa: BLE001 — client error
                self._send(400, {"error": f"bad audio payload: {exc}"})
                return
            try:
                result = service.transcribe(audio, **options)
            except Exception as exc:  # noqa: BLE001 — surfaced as 500
                self._send(500, {"error": str(exc)})
                return
            payload = _jsonable(result)
            if http_opts.get("tags"):
                from .at_post_processing import parse_at_label

                payload["audio_tags"] = _jsonable(parse_at_label(
                    result, top_k=http_opts["tags"],
                    language=http_opts.get("tag_language", "follow_asr"),
                ))
            self._send(200, payload)

    return ThreadingHTTPServer((host, port), Handler)


def serve_http(service: TranscriptionService, host: str = "127.0.0.1",
               port: int = 8080, path_root: Optional[str] = None,
               stream_service=None):
    """Run the HTTP front-end until interrupted."""
    server = make_http_server(service, host, port, path_root=path_root,
                              stream_service=stream_service)
    try:
        server.serve_forever()
    finally:
        server.server_close()


def main(argv=None):
    import argparse

    from . import build_model, load_model

    parser = argparse.ArgumentParser(
        description="whisper-at-tpu batching transcription server"
    )
    parser.add_argument("--model", default="tiny")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--max-batch", type=int, default=DEFAULT_MAX_BATCH)
    parser.add_argument("--max-wait-ms", type=float, default=50.0)
    parser.add_argument("--max-total-wait-ms", type=float, default=None,
                        help="rolling batch-fill hard cap (default "
                             "10x --max-wait-ms)")
    parser.add_argument("--language", default=None)
    parser.add_argument("--random", action="store_true",
                        help="random weights (offline smoke serving)")
    parser.add_argument("--allow-paths", default=None, metavar="DIR",
                        help="enable the JSON {'path': ...} request mode, "
                             "confined to files under DIR (off by default: "
                             "a network client must never read arbitrary "
                             "server paths)")
    parser.add_argument("--warmup", type=int, default=0, metavar="N",
                        help="precompile before accepting traffic: the "
                             "batch service's bucket ladder plus N "
                             "concurrent streaming sessions (0 = off; "
                             "first requests then pay the compiles)")
    args = parser.parse_args(argv)

    model = (build_model(args.model, seed=0) if args.random
             else load_model(args.model))
    options = {}
    if args.language:
        options["language"] = args.language
    from .streaming import StreamingService

    with TranscriptionService(model, max_batch=args.max_batch,
                              max_wait_s=args.max_wait_ms / 1000.0,
                              max_total_wait_s=(
                                  None if args.max_total_wait_ms is None
                                  else args.max_total_wait_ms / 1000.0),
                              **options) as service, \
            StreamingService(model, max_batch=args.max_batch,
                             max_wait_s=args.max_wait_ms / 1000.0,
                             max_total_wait_s=(
                                 None if args.max_total_wait_ms is None
                                 else args.max_total_wait_ms / 1000.0),
                             **options) as stream_service:
        if args.warmup > 0:
            t0 = time.monotonic()
            took = service.warmup()
            stream_took = stream_service.warmup(args.warmup)
            print(f"warmup: batch buckets {took}, "
                  f"{stream_took['sessions']} streaming sessions in "
                  f"{stream_took['seconds']}s "
                  f"(total {time.monotonic() - t0:.1f}s)", flush=True)
        print(f"serving {args.model} on http://{args.host}:{args.port} "
              f"(max_batch={args.max_batch})", flush=True)
        serve_http(service, args.host, args.port,
                   path_root=args.allow_paths,
                   stream_service=stream_service)


if __name__ == "__main__":
    main()
