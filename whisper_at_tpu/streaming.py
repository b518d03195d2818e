"""Streaming transcription: incremental audio in, finalized segments out.

The reference has no streaming surface — its only live input is the Gradio
demo's record-then-transcribe flow (reference app.py:9-58). This session
object is the TPU-serving-native extension: a caller feeds arbitrary-size
waveform pieces as they arrive (a mic callback, a network stream) and
receives segments the moment the engine finalizes a 30 s window, with the
same seek-loop semantics as `transcribe` (quality-gated temperature ladder,
timestamp-token seek advance, prompt threading, TL-TR tag stitching).

Window mels are computed causally from the sample buffer with a two-frame
alignment margin, so every interior STFT frame is bit-identical to the
offline full-file mel. The one inherent difference from offline
`transcribe` is the dynamic-range floor of the log-mel (reference
audio.py:153: `max(log_spec, log_spec.max() - 8)`): offline the max is
global over the whole recording, while a causal engine can only know the
max of the window it is processing. Windows whose loudest frame reaches
within 8 decades of the recording's maximum produce bit-identical mels
(for typical speech this is every voiced window).
"""

import math
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .audio import (
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
)
from .ops.mel import _stft_host_prep, log_mel_spectrogram_jax
from .segmentation import (
    N_TAG_CLASSES,
    QualityGate,
    TagGrid,
    clear_degenerate,
    parse_window,
    segment_record,
)
from .tokenizer import get_tokenizer
from .transcribe import (
    _batch_bucket,
    _geometry,
    _resolve_language,
    _run_ladder,
    print_segment,
)

# alignment margin: 2 whole hops (>= the 200-sample STFT half-window, and a
# multiple of HOP_LENGTH so sliced frames stay on the recording's frame grid)
_MARGIN_FRAMES = 2
_MARGIN = _MARGIN_FRAMES * HOP_LENGTH  # 320 samples
assert _MARGIN >= N_FFT // 2

# ---- per-session host-work profiling (tools/profile_streaming.py) -------- #
# WHISPER_AT_TPU_STREAM_PROF=1 accumulates wall + CPU time per hot-path
# stage; the saturated multi-stream separator vs the offline packed path is
# per-session HOST work (STATUS.md), and this names its components. Off by
# default: each site costs one context-manager call per window when enabled,
# zero when not (a plain nullcontext).
import contextlib
import os as _os
import time as _time

_PROF_ENABLED = _os.environ.get("WHISPER_AT_TPU_STREAM_PROF") == "1"
_PROF: dict = {}  # name -> [wall_s, cpu_s, count]


@contextlib.contextmanager
def _prof_cm(name):
    w0 = _time.perf_counter()
    c0 = _time.thread_time()
    try:
        yield
    finally:
        rec = _PROF.setdefault(name, [0.0, 0.0, 0])
        rec[0] += _time.perf_counter() - w0
        rec[1] += _time.thread_time() - c0
        rec[2] += 1


def _prof(name):
    return _prof_cm(name) if _PROF_ENABLED else contextlib.nullcontext()


def prof_snapshot(reset: bool = True) -> dict:
    """{stage: {wall_ms_total, cpu_ms_total, count, wall_us_each}}."""
    out = {
        k: dict(wall_ms=round(v[0] * 1e3, 1), cpu_ms=round(v[1] * 1e3, 1),
                count=v[2], wall_us_each=round(v[0] / max(v[2], 1) * 1e6, 1))
        for k, v in _PROF.items()
    }
    if reset:
        _PROF.clear()
    return out


class _GrowingTagGrid(TagGrid):
    """TagGrid over a recording whose length is not known yet."""

    def __init__(self, at_time_res: float):
        super().__init__(content_frames=1, at_time_res=at_time_res)

    def write(self, seek: int, tags: np.ndarray) -> None:
        need = math.floor(seek / self.window) + tags.shape[0]
        if need > self.logits.shape[0]:
            grow = np.zeros((need - self.logits.shape[0], N_TAG_CLASSES),
                            np.float32)
            self.logits = np.concatenate([self.logits, grow], axis=0)
        super().write(seek, tags)

    def finalize(self, content_frames: int) -> np.ndarray:
        n = max(1, math.ceil(content_frames / self.window))
        if n > self.logits.shape[0]:
            grow = np.zeros((n - self.logits.shape[0], N_TAG_CLASSES),
                            np.float32)
            self.logits = np.concatenate([self.logits, grow], axis=0)
        return self.logits[:n]


class StreamingTranscriber:
    """Incremental transcribe+tag session over a live 16 kHz mono stream.

    >>> sess = StreamingTranscriber(model, language="en")
    >>> for block in microphone_blocks():        # any block sizes
    ...     for seg in sess.feed(block):         # finalized segments
    ...         print(seg["start"], seg["text"])
    >>> result = sess.finish()                   # same dict as transcribe()

    feed() processes every complete 30 s window the buffer covers and
    returns the segments it finalized (possibly []); finish() flushes the
    remaining tail (padded with silence, exactly like the offline seek
    loop's final window) and returns the full transcribe()-shaped result.

    ``word_timestamps=True`` attaches per-word timings to every segment
    with the BATCHED offline path's semantics (`transcribe_batched`): the
    window's text is aligned against its own mel (cross-attention DTW) the
    moment the window finalizes, but the seek is NOT refined to the last
    word's end — the sequential path's refinement can re-read frames a
    live stream has already discarded. Each finalized window pays one
    extra alignment forward (batch 1) in the session's thread.
    """

    def __init__(
        self,
        model,
        *,
        verbose: Optional[bool] = None,
        temperature: Union[float, Tuple[float, ...]] = (
            0.0, 0.2, 0.4, 0.6, 0.8, 1.0
        ),
        compression_ratio_threshold: Optional[float] = 2.4,
        logprob_threshold: Optional[float] = -1.0,
        no_speech_threshold: Optional[float] = 0.6,
        condition_on_previous_text: bool = True,
        initial_prompt: Optional[str] = None,
        at_time_res: float = 10,
        word_timestamps: bool = False,
        prepend_punctuations: str = "\"'“¿([{-",
        append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
        decode_executor=None,
        detect_executor=None,
        **decode_options,
    ):
        self.word_timestamps = word_timestamps
        self.prepend_punctuations = prepend_punctuations
        self.append_punctuations = append_punctuations
        if word_timestamps and decode_options.get("task") == "translate":
            import warnings

            warnings.warn(
                "Word-level timestamps on translations may not be "
                "reliable.", stacklevel=2,
            )
        # decode_executor: injected by StreamingService to route window
        # decodes (and the mel + TL-TR tag passes) through its
        # cross-session batcher — see StreamingService._decode for the
        # call protocol; None = decode inline (the default ladder)
        self._decode_executor = decode_executor
        # detect_executor: same idea for first-window language detection
        # ([80, N_FRAMES] mel -> {lang: prob}) — batched across sessions
        # by StreamingService._detect; None = model.detect_language inline
        self._detect_executor = detect_executor
        self.model = model
        self.verbose = verbose
        self.temperature = temperature
        self.at_time_res = at_time_res
        self.condition_on_previous_text = condition_on_previous_text
        self.decode_options = dict(decode_options)
        self.gate = QualityGate(compression_ratio_threshold,
                                logprob_threshold, no_speech_threshold)
        self.grid = _GrowingTagGrid(at_time_res)

        self._tokenizer = None
        self._language = decode_options.get("language")
        self._input_stride, self._time_precision = _geometry(model)

        self._initial_prompt = initial_prompt
        self._prompt_tokens: List[int] = []
        self._thread: List[int] = []
        self._thread_live_from = 0

        self._buf = np.zeros((0,), np.float32)
        self._pending: List[np.ndarray] = []  # fed, not yet joined to _buf
        # (seek, device tags) per processed window: the TL-TR pass is
        # dispatched async inside feed() and materialized only at finish()
        # (nothing reads the grid mid-session) — one blocking D2H per
        # window removed from the live path, same trick as the offline
        # batched path's _stitch_tags_dispatch
        self._tags_in_flight: List[Tuple[int, jnp.ndarray]] = []
        self._buf_start = 0          # absolute sample index of _buf[0]
        self._total_samples = 0      # absolute samples received
        self._seek = 0               # absolute mel-frame seek
        self.segments: List[dict] = []
        self._finished = False

    # ------------------------------------------------------------------ #
    # public API
    # ------------------------------------------------------------------ #

    def feed(self, waveform: np.ndarray) -> List[dict]:
        """Append a waveform piece; process every complete 30 s window."""
        if self._finished:
            raise RuntimeError("session already finished")
        with _prof("feed-normalize"):
            chunk = np.asarray(waveform)
            if chunk.ndim != 1:
                raise ValueError("expected mono 16 kHz waveform, got "
                                 f"shape {chunk.shape}")
            if chunk.dtype == np.int16:
                chunk = chunk.astype(np.float32) / 32768.0
            elif not np.issubdtype(chunk.dtype, np.floating):
                # int32/uint8/... PCM have different full-scale conventions;
                # a bare cast would silently feed +-2^31-range floats to the
                # mel
                raise ValueError(
                    f"unsupported waveform dtype {chunk.dtype}; feed float "
                    "waveforms in [-1, 1] or int16 PCM"
                )
            else:
                chunk = chunk.astype(np.float32)
            self._pending.append(chunk)
            self._total_samples += len(chunk)

        emitted: List[dict] = []
        # a non-final window needs samples through the end of the last STFT
        # frame it reads: (seek + N_FRAMES) * HOP + MARGIN
        while (self._total_samples
               >= (self._seek + N_FRAMES) * HOP_LENGTH + _MARGIN):
            emitted.extend(self._process_window(final=False))
        self._drop_consumed()
        return emitted

    def finish(self) -> dict:
        """Flush the buffered tail and return the transcribe()-shaped dict."""
        if self._finished:
            raise RuntimeError("session already finished")
        self._finished = True
        content_frames = self._total_samples // HOP_LENGTH
        while self._seek < content_frames:
            self.segments.extend(self._process_window(final=True))

        if self._tokenizer is None:
            # nothing was ever processed (empty / sub-hop stream): resolve
            # the language exactly as the offline path would — on the
            # first window of the RECEIVED samples padded with 30 s of
            # silence (a pure-silence window would ignore a sub-hop tail
            # and could detect a different language than transcribe())
            if self._pending:
                self._buf = np.concatenate([self._buf] + self._pending)
                self._pending = []
            first = log_mel_spectrogram_jax(
                self._buf if self._buf.size
                else np.zeros((1,), np.float32),
                padding=N_SAMPLES,
            )[:, :N_FRAMES]
            self._language = _resolve_language(
                self.model, first, self.decode_options, self.verbose,
                detect_fn=self._detect_executor,
            )
            text = ""
        else:
            text = self._tokenizer.decode(
                self._thread[len(self._prompt_tokens):]
            )
        for seek, tags in self._tags_in_flight:
            self.grid.write(seek, np.asarray(tags))
        self._tags_in_flight = []
        return dict(
            text=text,
            segments=self.segments,
            language=self._language,
            at_time_res=self.at_time_res,
            audio_tag=self.grid.finalize(content_frames),
        )

    # ------------------------------------------------------------------ #
    # internals
    # ------------------------------------------------------------------ #

    def _window_piece(self) -> Tuple[np.ndarray, int]:
        """(waveform piece, lead margin frames) for the window at the seek.

        Sliced with a two-frame margin so every frame the decoder sees is
        computed from true neighboring samples (bit-identical to the
        offline full-file mel, modulo the causal dynamic-range floor); the
        margin frames absorb the edge reflection and are discarded. The
        final windows read past the received samples into zero padding,
        exactly like transcribe()'s padding=N_SAMPLES.
        """
        if self._pending:  # join fed chunks at window boundaries only, so
            # each feed() stays O(chunk) instead of O(retained buffer)
            self._buf = np.concatenate([self._buf] + self._pending)
            self._pending = []
        s0 = self._seek * HOP_LENGTH
        lead_frames = min(_MARGIN_FRAMES, self._seek)
        start = s0 - lead_frames * HOP_LENGTH
        end = s0 + N_FRAMES * HOP_LENGTH + _MARGIN
        piece = self._buf[start - self._buf_start:end - self._buf_start]
        if len(piece) < end - start:  # tail windows: silence padding
            piece = np.concatenate([
                piece, np.zeros(end - start - len(piece), np.float32)
            ])
        return piece, lead_frames

    def _window_mel(self) -> jnp.ndarray:
        """[80, N_FRAMES] mel for the window at the current seek."""
        piece, lead_frames = self._window_piece()
        # exact=True: the ~3004-frame piece would otherwise bucket to a 60 s
        # mel — 2x the FLOPs for frames nothing reads. Two compiled programs
        # per session: the first window has no lead margin (lead_frames=0),
        # every later window has the full _MARGIN_FRAMES one
        mel = log_mel_spectrogram_jax(piece, padding=0, exact=True)
        return mel[:, lead_frames:lead_frames + N_FRAMES]

    def _process_window(self, final: bool) -> List[dict]:
        with _prof("window-join"):
            piece, lead_frames = self._window_piece()
        # the first window of a session needs its mel locally (language
        # detection below runs before the decode); steady-state windows
        # under a service ship the raw prepped piece instead so the
        # service computes the mel BATCHED across concurrent sessions
        window = None
        # the mel is needed in-session for: inline decode (no service),
        # word-timestamp alignment, and first-window language DETECTION —
        # but only when the language is actually unresolved (a pinned
        # language or a monolingual model never reads it), so service
        # sessions with language set batch even their first window's mel
        needs_lang_mel = (self._tokenizer is None and self._language is None
                          and self.model.is_multilingual)
        if (self._decode_executor is None or self.word_timestamps
                or needs_lang_mel):
            mel = log_mel_spectrogram_jax(piece, padding=0, exact=True)
            window = mel[:, lead_frames:lead_frames + N_FRAMES]
        content_frames = (self._total_samples // HOP_LENGTH if final
                          else self._seek + N_FRAMES)
        segment_size = min(N_FRAMES, content_frames - self._seek)
        time_offset = float(self._seek * HOP_LENGTH / SAMPLE_RATE)

        if self._tokenizer is None:
            self._language = _resolve_language(
                self.model, window, self.decode_options, self.verbose,
                detect_fn=self._detect_executor,
            )
            self._tokenizer = get_tokenizer(
                self.model.is_multilingual, language=self._language,
                task=self.decode_options.get("task", "transcribe"),
            )
            if self._initial_prompt is not None:
                self._prompt_tokens = self._tokenizer.encode(
                    " " + self._initial_prompt.strip()
                )
                self._thread = list(self._prompt_tokens)

        self.decode_options["prompt"] = self._thread[self._thread_live_from:]
        offset = self.grid.offset_in_window(self._seek)
        if self._decode_executor is not None:
            prepped = None
            if window is None:
                # host prep + async H2D dispatch from THIS (client) thread:
                # the scheduler thread only stacks device arrays
                with _prof("prep-h2d"):
                    sig_np, n_frames = _stft_host_prep(piece, 0, exact=True)
                    prepped = (jax.device_put(sig_np), n_frames, lead_frames)
            with _prof("decode-wait"):
                result, tags = self._decode_executor(
                    window, dict(self.decode_options), self.temperature,
                    self.gate, piece=prepped, at_offset=offset,
                    at_time_res=self.at_time_res,
                )
        else:
            with _prof("decode-wait"):
                result = _run_ladder(
                    lambda opts: self.model.decode(window, opts),
                    self.temperature, self.gate, self.decode_options,
                )
                tags = self.model.at_forward(
                    result.audio_features_for_at[:, offset:, :],
                    time_resolution=self.at_time_res,
                )
        self._tags_in_flight.append((self._seek, tags))

        if self.gate.is_silence(result):
            self._seek += segment_size
            return []

        window_start = self._seek
        with _prof("parse-segments"):
            parse = parse_window(
                np.asarray(result.tokens, np.int64),
                timestamp_begin=self._tokenizer.timestamp_begin,
                time_offset=time_offset,
                segment_size=segment_size,
                segment_duration=segment_size * HOP_LENGTH / SAMPLE_RATE,
                input_stride=self._input_stride,
                time_precision=self._time_precision,
            )
            # progress guard: a degenerate decode (closing timestamp pair
            # at <|0.00|>) parses to advance_frames == 0; offline that
            # re-decodes the same window once per call, but a live session
            # would spin forever — advance past the window instead
            self._seek += (parse.advance_frames if parse.advance_frames > 0
                           else segment_size)
            new_segments = [
                segment_record(
                    seek=window_start, start=start, end=end, tokens=toks,
                    result=result, eot=self._tokenizer.eot,
                    tokenizer=self._tokenizer,
                )
                for start, end, toks in parse.pieces
            ]
        if self.word_timestamps and new_segments:
            from .transcribe import _attach_word_timings

            _attach_word_timings(
                self.model, self._tokenizer, new_segments, window,
                segment_size, self.prepend_punctuations,
                self.append_punctuations,
            )
        clear_degenerate(new_segments)
        base_id = (self.segments[-1]["id"] + 1) if self.segments else 0
        for i, seg in enumerate(new_segments):
            seg["id"] = base_id + i
            self._thread.extend(seg["tokens"])
            if self.verbose:
                print_segment(seg)
        if not final:
            self.segments.extend(new_segments)
        if not self.condition_on_previous_text or result.temperature > 0.5:
            self._thread_live_from = len(self._thread)
        return new_segments

    def _drop_consumed(self) -> None:
        """Release buffer samples no window can read again."""
        with _prof("tags-drain"):
            self._drop_consumed_inner()

    def _drop_consumed_inner(self) -> None:
        keep_from = max(self._buf_start,
                        self._seek * HOP_LENGTH - _MARGIN)
        if keep_from > self._buf_start:
            self._buf = self._buf[keep_from - self._buf_start:]
            self._buf_start = keep_from
        # drain completed tag computations without blocking (writes must
        # stay in seek order, so only pop from the front): a multi-hour
        # session would otherwise hold one device buffer per 30 s window
        # and pay every D2H serialized at finish()
        while self._tags_in_flight:
            seek, tags = self._tags_in_flight[0]
            ready = getattr(tags, "is_ready", None)
            done = ready() if ready is not None else False
            if not done and len(self._tags_in_flight) <= 8:
                break  # still computing and the backlog is small: stay async
            self.grid.write(seek, np.asarray(tags))
            self._tags_in_flight.pop(0)


# -------------------------------------------------------------------------- #
# multi-stream service: batch window decodes across concurrent sessions
# -------------------------------------------------------------------------- #

class _DecodeRequest:
    __slots__ = ("window", "key", "options", "temperature", "gate", "future",
                 "piece", "at_offset", "at_time_res")

    def __init__(self, window, key, options, temperature, gate, future,
                 piece=None, at_offset=None, at_time_res=None):
        self.window = window          # [80, N_FRAMES] mel, or None when the
        self.piece = piece            # raw prepped piece rides instead:
        #                               (device sig, n_frames, lead_frames)
        self.key = key
        self.options = options
        self.temperature = temperature
        self.gate = gate
        self.future = future
        # when set, the scheduler also runs the TL-TR tag pass (batched
        # across the co-scheduled rows) and resolves (result, tags)
        self.at_offset = at_offset
        self.at_time_res = at_time_res


class _DetectRequest:
    """A first-window language-detection pass queued for cross-session
    batching. All detect requests share one key (the pass depends only on
    the model), so concurrent session starts coalesce into ONE batched
    `detect_language` forward instead of a batch-1 encoder pass each."""

    __slots__ = ("window", "key", "future")
    KEY = ("__detect_language__",)

    def __init__(self, window, future):
        self.window = window          # [80, N_FRAMES] mel
        self.key = _DetectRequest.KEY
        self.future = future


class StreamingService:
    """Serve MANY live streams at batch efficiency on one device.

    A lone `StreamingTranscriber` decodes each finalized 30 s window at
    batch 1 — the least efficient decode mode on a TPU, where the step cost
    is dominated by streaming the decoder weights/KV regardless of how many
    rows ride along. This service multiplexes concurrent sessions: when
    several streams finalize windows near-simultaneously (their `feed()`
    calls run in their own threads), the scheduler stacks the windows and
    decodes them as ONE batch through the same quality-ladder logic the
    offline batched path uses (`transcribe._decode_windows_batched`), so N
    live streams cost close to one stream's latency.

    Windows from different sessions are independent, so batching never
    changes results — but batching requires prompt-free windows, hence
    sessions are opened with ``condition_on_previous_text=False`` (the same
    trade the offline batched paths make). The window MEL, the TL-TR tag
    pass, AND first-window language detection batch across sessions too
    (steady-state windows ship the raw prepped piece; the scheduler
    computes mels in one dispatch per group, tag logits in one dispatch
    per offset/resolution group, and detection forwards in one
    `detect_language` per coalesced burst of session starts), so no
    steady-state device work is per-session. Segmentation and tag
    stitching stay per-session host work; word-timestamp alignment, when
    enabled, stays a per-window batch-1 forward (module docstring).

    >>> service = StreamingService(model)
    >>> sess = service.open(language="en")      # per client connection
    >>> segs = sess.feed(block)                 # from the client's thread
    >>> service.close()
    """

    _CLOSED = object()

    def __init__(self, model, *, max_batch: int = 24,
                 max_wait_s: float = 0.02, max_total_wait_s: float = None,
                 mesh=None, **session_defaults):
        import threading
        from collections import deque

        # default options applied to every open() (per-call kwargs win) —
        # the same server-level-defaults pattern as TranscriptionService
        self._session_defaults = dict(session_defaults)
        self.model = model
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_s)
        # rolling fill window cap (see _take_batch): saturated streams
        # resubmit spread over their per-window host work, so one fixed
        # max_wait_s from the head misses most of the burst
        self.max_total_wait_s = (10.0 * self.max_wait_s
                                 if max_total_wait_s is None
                                 else float(max_total_wait_s))
        self.mesh = mesh
        self._pending = deque()
        self._cv = threading.Condition()
        self._closed = False
        self._stats_lock = threading.Lock()
        self._stats = dict(sessions=0, windows=0, batches=0,
                           max_batch_windows=0, mel_batched_windows=0,
                           tag_groups=0, detect_windows=0, detect_batches=0)
        self._thread = threading.Thread(
            target=self._scheduler, name="wat-stream-scheduler", daemon=True
        )
        self._thread.start()

    def open(self, **session_options) -> StreamingTranscriber:
        """Create a session whose window decodes ride the shared batcher."""
        session_options = {**self._session_defaults, **session_options}
        if session_options.get("condition_on_previous_text"):
            raise ValueError(
                "condition_on_previous_text=True threads a per-stream "
                "prompt into every window and cannot be batched across "
                "sessions; use a standalone StreamingTranscriber for that"
            )
        session_options["condition_on_previous_text"] = False
        with self._cv:
            if self._closed:
                raise RuntimeError("StreamingService is closed")
        with self._stats_lock:
            self._stats["sessions"] += 1
        return StreamingTranscriber(
            self.model, decode_executor=self._decode,
            detect_executor=self._detect, **session_options
        )

    def warmup(self, n: int = 8, *, seconds: float = 32.0,
               **session_options) -> dict:
        """Precompile the programs ``n`` concurrent live streams will hit.

        Drives ``n`` short concurrent synthetic sessions to completion, so
        every batch-bucket shape a production load of up to ``n`` streams
        reaches — mel groups, decode rungs, tag groups, and (when the
        language is unpinned on a multilingual model) the batched
        language-detection forward — is compiled before real audio
        arrives. A cold large-v1 bucket compile costs tens of seconds on a
        tunneled backend, which would otherwise land on the first windows
        of real streams. ``session_options`` should match what production
        ``open()`` calls will use. Returns ``{"sessions": n,
        "seconds": wall}``; the driven windows stay in the service stats.
        """
        import threading as _threading
        import time as _time

        t = np.arange(int(SAMPLE_RATE * seconds)) / SAMPLE_RATE

        def drive_k(k):
            waves = [
                (0.3 * np.sin(2 * np.pi * (220.0 + 10 * i) * t))
                .astype(np.float32)
                for i in range(int(k))
            ]
            sessions = [self.open(**session_options) for _ in waves]

            def drive(i):
                sessions[i].feed(waves[i])
                sessions[i].finish()

            threads = [_threading.Thread(target=drive, args=(i,))
                       for i in range(len(waves))]
            for th in threads:
                th.start()
            for th in threads:
                th.join()

        # every bucket <= n PLUS one rung above, largest first: a
        # production drive mostly coalesces full batches, but
        # straggler/finish batches land on the smaller buckets, and when
        # sessions queue more than one window apiece (catch-up after a
        # stall, saturated feeds) a batch can exceed n windows and land
        # one bucket up (r5: a 12-stream drive produced 15-window
        # batches -> bucket 16). ONE cold large-v1 bucket compile
        # mid-drive (tens of seconds on a tunneled backend) wrecks p95
        # finalize — observed 2026-08-20: a single-wave warmup left
        # buckets {1,2,4} cold and a 3-min 8-stream drive measured
        # 22 audio-s/s with p95 25 s; full-ladder warmup restored the
        # steady state
        top = min(2 * _batch_bucket(int(n), self.max_batch),
                  self.max_batch)
        ladder = sorted({_batch_bucket(k, self.max_batch)
                         for k in list(range(1, int(n) + 1)) + [top]},
                        reverse=True)
        t0 = _time.monotonic()
        for k in ladder:
            drive_k(k)
        return {"sessions": int(n), "buckets": ladder,
                "seconds": round(_time.monotonic() - t0, 3)}

    def stats(self) -> dict:
        with self._stats_lock:
            s = dict(self._stats)
        s["pending"] = len(self._pending)
        s["closed"] = self._closed
        return s

    def close(self):
        """Stop the scheduler. In-flight decodes finish; sessions whose
        windows are still queued get a RuntimeError from feed()."""
        with self._cv:
            if self._closed and not self._thread.is_alive():
                return
            self._closed = True
            self._cv.notify_all()
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------------ #

    def _decode(self, window, options, temperature, gate, *,
                piece=None, at_offset=None, at_time_res=None):
        """The decode_executor injected into sessions: enqueue and wait.

        `window` is a ready [80, N_FRAMES] mel, or None with `piece` set to
        a `(device sig, n_frames, lead)` prepped waveform — the scheduler
        then computes the mel batched with every co-scheduled piece. When
        `at_offset` is given, the scheduler also runs the TL-TR tag pass
        (batched across rows sharing the offset/resolution) and the call
        returns `(result, tags)`; otherwise it returns the bare result.
        """
        from concurrent.futures import Future

        from .serving import _canonical_options

        temperature = (tuple(temperature)
                       if isinstance(temperature, (list, tuple))
                       else (temperature,))
        key = (_canonical_options(options), temperature,
               gate.compression_ratio, gate.logprob, gate.no_speech)
        fut = Future()
        req = _DecodeRequest(window, key, options, temperature, gate, fut,
                             piece=piece, at_offset=at_offset,
                             at_time_res=at_time_res)
        with self._cv:
            if self._closed:
                raise RuntimeError("StreamingService is closed")
            self._pending.append(req)
            self._cv.notify()
        return fut.result()

    def _detect(self, window):
        """The detect_executor injected into sessions: enqueue the
        first-window language-id pass and wait. Returns the {lang: prob}
        dict for this window; concurrent session starts coalesce into one
        batched `detect_language` forward (see _run_detect_batch)."""
        from concurrent.futures import Future

        fut = Future()
        req = _DetectRequest(window, fut)
        with self._cv:
            if self._closed:
                raise RuntimeError("StreamingService is closed")
            self._pending.append(req)
            self._cv.notify()
        return fut.result()

    def _run_detect_batch(self, batch):
        """One batched language-id forward for the co-scheduled first
        windows, padded up the batch-bucket ladder like every other
        cross-session dispatch (compile-count rationale in
        _materialize_windows)."""
        from .decoding import detect_language
        from .serving import _settle

        try:
            wins = jnp.stack([r.window for r in batch])
            bucket = _batch_bucket(len(batch), self.max_batch)
            if bucket > len(batch):
                wins = jnp.concatenate(
                    [wins, jnp.repeat(wins[-1:], bucket - len(batch), axis=0)]
                )
            _, probs = detect_language(self.model, wins)
        except Exception as exc:  # noqa: BLE001 — per-request delivery
            for r in batch:
                _settle(r.future, exception=exc)
            return
        with self._stats_lock:
            self._stats["detect_windows"] += len(batch)
            self._stats["detect_batches"] += 1
        for r, p in zip(batch, probs):
            _settle(r.future, result=p)

    def _take_batch(self):
        import time

        from .serving import _scan_compatible, _settle

        with self._cv:
            while not self._pending:
                if self._closed:
                    return self._CLOSED
                self._cv.wait()
            if self._closed:
                # fail queued windows instead of leaving their sessions
                # blocked forever on fut.result()
                while self._pending:
                    _settle(self._pending.popleft().future,
                            exception=RuntimeError(
                                "StreamingService closed while the window "
                                "was queued"))
                return self._CLOSED
            head = self._pending.popleft()
        batch = [head]
        hard_deadline = time.monotonic() + self.max_total_wait_s
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            with self._cv:
                cands, self._pending = _scan_compatible(
                    self._pending, head.key, self.max_batch - len(batch))
                if not cands:
                    if self._closed:
                        break
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(timeout=remaining)
                    continue
            batch.extend(cands)
            # rolling fill window: each arrival buys another max_wait_s
            # (capped) — a lone window still waits exactly max_wait_s,
            # but a saturated-load resubmit trickle coalesces
            deadline = min(hard_deadline,
                           time.monotonic() + self.max_wait_s)
        return batch

    def _materialize_windows(self, batch):
        """[N, 80, N_FRAMES] decode windows for one scheduled batch.

        Mel-carrying rows stack directly; piece-carrying rows (the steady
        state — every window after a session's first) compute their mels
        in ONE `mel_stream_pieces` dispatch per (length, lead) group,
        replacing N batch-1 mel chains. Group sizes are padded up the
        decode path's batch-bucket ladder (repeating the last row) so a
        fluctuating number of concurrent streams reuses a handful of
        compiled programs instead of compiling one per distinct count —
        a cold large-v1 compile over the tunnel costs tens of seconds."""
        from .ops.mel import mel_stream_pieces

        rows = [r.window for r in batch]
        groups = {}
        for i, r in enumerate(batch):
            if r.piece is not None:
                sig, _, lead = r.piece
                groups.setdefault((sig.shape[0], lead), []).append(i)
        for (_, lead), idxs in groups.items():
            bucket = _batch_bucket(len(idxs), self.max_batch)
            pad = [idxs[-1]] * (bucket - len(idxs))
            sigs = jnp.stack([batch[i].piece[0] for i in idxs + pad])
            n_valid = jnp.asarray(
                [batch[i].piece[1] for i in idxs + pad], jnp.int32)
            wins = mel_stream_pieces(sigs, n_valid, lead)
            for j, i in enumerate(idxs):
                rows[i] = wins[j]
        return jnp.stack(rows), sum(len(v) for v in groups.values())

    def _bucketed_at_forward(self, feats, offset, time_res):
        """at_forward over [G, L, T, D] with G padded up the batch-bucket
        ladder (same compile-count rationale as _materialize_windows)."""
        g = feats.shape[0]
        bucket = _batch_bucket(g, self.max_batch)
        if bucket > g:
            feats = jnp.concatenate(
                [feats, jnp.repeat(feats[-1:], bucket - g, axis=0)]
            )
        out = self.model.at_forward(
            feats[:, :, offset:, :], time_resolution=time_res
        )
        return out[:g]

    def _batched_tags(self, batch, results):
        """TL-TR tag logits for the rows that asked (at_offset set), one
        `at_forward` dispatch per (offset, resolution) group instead of
        one per session. Returns a per-row list (None where not asked);
        the device work is dispatched async — nothing here blocks."""
        tags = [None] * len(batch)
        groups = {}
        for i, r in enumerate(batch):
            if r.at_offset is not None:
                groups.setdefault((r.at_offset, r.at_time_res), []).append(i)
        for (offset, time_res), idxs in groups.items():
            feats = jnp.stack(
                [results[i].audio_features_for_at for i in idxs]
            )  # [G, L, T, D]
            out = self._bucketed_at_forward(feats, offset, time_res)
            for j, i in enumerate(idxs):
                tags[i] = out[j]
        return tags, len(groups)

    def _scheduler(self):
        from .serving import _settle
        from .transcribe import _decode_windows_batched

        while True:
            batch = self._take_batch()
            if batch is self._CLOSED:
                return
            head = batch[0]
            if isinstance(head, _DetectRequest):
                self._run_detect_batch(batch)
                continue
            try:
                with _prof("sched-materialize"):
                    windows, n_mel_batched = self._materialize_windows(batch)
                with _prof("sched-decode"):
                    results = _decode_windows_batched(
                        self.model, windows, head.temperature, head.gate,
                        head.options, self.max_batch, self.mesh,
                    )
                with _prof("sched-tags"):
                    tags, n_tag_groups = self._batched_tags(batch, results)
            except Exception as exc:  # noqa: BLE001 — per-request delivery
                for r in batch:
                    _settle(r.future, exception=exc)
                continue
            with self._stats_lock:
                s = self._stats
                s["windows"] += len(batch)
                s["batches"] += 1
                s["max_batch_windows"] = max(s["max_batch_windows"],
                                             len(batch))
                s["mel_batched_windows"] += n_mel_batched
                s["tag_groups"] += n_tag_groups
            for r, res, tg in zip(batch, results, tags):
                _settle(r.future,
                        result=(res, tg) if r.at_offset is not None else res)
