"""Long-audio transcription + tagging orchestrators.

Two paths over the same device programs and the same segmentation core
(`segmentation.py`):

  transcribe          reference-semantics sequential seek loop
                      (whisper_at/transcribe.py:38-403): timestamp-driven
                      seek refinement and prompt threading between windows.
                      Windows are sliced ON DEVICE from the resident mel —
                      the host never pulls the spectrogram.
  transcribe_batched  the TPU fast path: every 30 s window rides the batch
                      axis through one mel pass, one encoder+TL-TR pass and
                      one batched decode; the fallback ladder re-decodes
                      only failed windows. Fixed window stride, no prompt
                      threading (the natural mode when
                      condition_on_previous_text=False).

Device work (mel, encoder, decode loop, TL-TR head) happens inside jitted
programs; this module is host-side control only.
"""

from typing import List, Optional, Tuple, Union

import os

import jax
import jax.numpy as jnp
import numpy as np
import tqdm

from .audio import (
    PrefetchedAudio,
    FRAMES_PER_SECOND,
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
    pad_or_trim,
)
from .decoding import DecodingOptions, DecodingResult
from .segmentation import (
    QualityGate,
    TagGrid,
    clear_degenerate,
    parse_window,
    segment_record,
    temperature_schedule,
)
from .tokenizer import LANGUAGES, get_tokenizer
from .utils import exact_div, format_timestamp, make_safe
from .utils.profiling import StageProf

# WHISPER_AT_TPU_SERVE_PROF=1: per-stage wall+CPU accounting of every
# transcribe_many call (frontend mel / decode / tag dispatch / assembly /
# tag commit) — the serving-path analogue of the streaming host-work
# profiler; read via tools/profile_serving.py. Zero overhead when unset.
_serve_prof = StageProf("WHISPER_AT_TPU_SERVE_PROF")

_PUNCT_PREPEND = "\"'“¿([{-"
_PUNCT_APPEND = "\"'.。,，!！?？:：”)]}、"

# 30 s windows per device batch across all batched entry points
# (transcribe_batched, transcribe_many, bench.py). 24 is the measured v5e
# throughput sweet spot: weights/logits amortize across rows while M stays
# under the 128-row MXU tile; 32 regresses.
DEFAULT_MAX_BATCH = 24
# windows per batched word-timing alignment forward: the alignment runs
# the encoder in fp32 (parity path) and captures [B, n_sel, S, F] QK
# stacks, so its memory-optimal batch is smaller than the decode's
_ALIGN_BATCH = 8


# --------------------------------------------------------------------------- #
# shared helpers
# --------------------------------------------------------------------------- #


@jax.jit
def _slice_window(mel: jnp.ndarray, seek: jnp.ndarray) -> jnp.ndarray:
    """[80, T] resident mel -> one [80, N_FRAMES] window, on device."""
    return jax.lax.dynamic_slice(mel, (0, seek), (mel.shape[0], N_FRAMES))


def print_segment(seg: dict) -> None:
    """The reference's verbose per-segment line (transcribe.py:368-369)."""
    print(make_safe(
        f"[{format_timestamp(seg['start'])} --> "
        f"{format_timestamp(seg['end'])}] {seg['text']}"
    ))


def _resolve_language(model, mel_window, decode_options, verbose=None,
                      detect_fn=None) -> str:
    """Fill decode_options['language'] (detected from the first window if
    unset — reference transcribe.py:100-116). `detect_fn`, when given,
    replaces the inline `model.detect_language` pass with an injected one
    (StreamingService routes it through its cross-session batcher)."""
    if decode_options.get("language") is None:
        if not model.is_multilingual:
            decode_options["language"] = "en"
        else:
            if verbose:
                print(
                    "Detecting language using up to the first 30 seconds. "
                    "Use `--language` to specify the language"
                )
            if detect_fn is not None:
                probs = detect_fn(mel_window)
            else:
                _, probs = model.detect_language(mel_window)
            decode_options["language"] = max(probs, key=probs.get)
            if verbose is not None:
                print("Detected language: "
                      f"{LANGUAGES[decode_options['language']].title()}")
    return decode_options["language"]


def _geometry(model) -> Tuple[int, float]:
    """(mel frames per text token, seconds per timestamp token)."""
    input_stride = exact_div(N_FRAMES, model.dims.n_audio_ctx)
    return input_stride, input_stride * HOP_LENGTH / SAMPLE_RATE


def _run_ladder(decode_one, temperature, gate: QualityGate, decode_options):
    """Walk the temperature ladder until a window passes the quality gate."""
    result = None
    for t, kwargs in temperature_schedule(temperature, decode_options):
        result = decode_one(DecodingOptions(**kwargs, temperature=t))
        if not gate.needs_fallback(result):
            break
    return result


def _tag_window(model, grid: TagGrid, seek: int, result: DecodingResult,
                at_time_res: float) -> None:
    """One window's TL-TR logits, realigned and stitched into the grid."""
    offset = grid.offset_in_window(seek)
    tags = np.asarray(model.at_forward(
        result.audio_features_for_at[:, offset:, :],
        time_resolution=at_time_res,
    ))
    grid.write(seek, tags)


def _attach_word_timings(model, tokenizer, segments, mel_window, num_frames,
                         prepend_punctuations, append_punctuations,
                         audio_features=None) -> None:
    from .timing import add_word_timestamps

    add_word_timestamps(
        segments=segments,
        model=model,
        tokenizer=tokenizer,
        mel=mel_window,
        num_frames=num_frames,
        prepend_punctuations=prepend_punctuations,
        append_punctuations=append_punctuations,
        audio_features=audio_features,
    )


# --------------------------------------------------------------------------- #
# sequential path
# --------------------------------------------------------------------------- #


def transcribe(
    model,
    audio: Union[str, np.ndarray, PrefetchedAudio],
    *,
    verbose: Optional[bool] = None,
    temperature: Union[float, Tuple[float, ...]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    condition_on_previous_text: bool = True,
    initial_prompt: Optional[str] = None,
    word_timestamps: bool = False,
    prepend_punctuations: str = _PUNCT_PREPEND,
    append_punctuations: str = _PUNCT_APPEND,
    at_time_res: float = 10,
    **decode_options,
):
    """Transcribe audio and tag sound events (reference transcribe.py:38-403
    semantics).

    Returns dict(text, segments, language, at_time_res, audio_tag) where
    audio_tag is [ceil(frames / at_window), 527] segment logits.
    """
    # resident mel, padded with 30 s of silence for the final window
    # (transcribe.py:127); windows are sliced device-side from here on
    mel = log_mel_spectrogram(audio, padding=N_SAMPLES)
    content_frames = mel.shape[-1] - N_FRAMES
    # round the padded length up so _slice_window recompiles per ~30 s
    # length bucket, not per file; the tail is never read (seek < content)
    bucket_len = -(-mel.shape[-1] // N_FRAMES) * N_FRAMES
    mel = pad_or_trim(mel, bucket_len)

    grid = TagGrid(content_frames, at_time_res)
    gate = QualityGate(compression_ratio_threshold, logprob_threshold,
                       no_speech_threshold)
    language = _resolve_language(
        model, _slice_window(mel, jnp.int32(0)), decode_options, verbose
    )
    task = decode_options.get("task", "transcribe")
    tokenizer = get_tokenizer(model.is_multilingual, language=language,
                              task=task)
    if word_timestamps and task == "translate":
        import warnings

        warnings.warn(
            "Word-level timestamps on translations may not be reliable."
        )
    input_stride, time_precision = _geometry(model)

    prompt_tokens: List[int] = (
        tokenizer.encode(" " + initial_prompt.strip())
        if initial_prompt is not None else []
    )
    thread: List[int] = list(prompt_tokens)  # running token context
    thread_live_from = 0  # tokens before this index are not fed as prompt

    segments: List[dict] = []
    seek = 0

    pbar = tqdm.tqdm(total=content_frames, unit="frames",
                     disable=verbose is not False)
    with pbar:
        while seek < content_frames:
            window = _slice_window(mel, jnp.int32(seek))
            segment_size = min(N_FRAMES, content_frames - seek)
            time_offset = float(seek * HOP_LENGTH / SAMPLE_RATE)

            decode_options["prompt"] = thread[thread_live_from:]
            result = _run_ladder(
                lambda opts: model.decode(window, opts),
                temperature, gate, decode_options,
            )
            _tag_window(model, grid, seek, result, at_time_res)

            if gate.is_silence(result):
                # segment_size = min(N_FRAMES, content_frames - seek)
                # already caps the advance at content_frames
                seek += segment_size
                pbar.update(segment_size)
                continue

            window_start = seek
            parse = parse_window(
                np.asarray(result.tokens, np.int64),
                timestamp_begin=tokenizer.timestamp_begin,
                time_offset=time_offset,
                segment_size=segment_size,
                segment_duration=segment_size * HOP_LENGTH / SAMPLE_RATE,
                input_stride=input_stride,
                time_precision=time_precision,
            )
            # progress guard: a degenerate decode (closing timestamp pair
            # at the window start) parses to advance 0 — re-decoding the
            # identical window forever; advance past the window instead
            seek += (parse.advance_frames if parse.advance_frames > 0
                     else segment_size)
            new_segments = [
                segment_record(
                    seek=window_start, start=start, end=end, tokens=toks,
                    result=result, eot=tokenizer.eot, tokenizer=tokenizer,
                )
                for start, end, toks in parse.pieces
            ]

            if word_timestamps:
                # the decode pass already computed this window's encoder
                # output — reuse it for the alignment forward
                _attach_word_timings(
                    model, tokenizer, new_segments, window, segment_size,
                    prepend_punctuations, append_punctuations,
                    audio_features=result.audio_features,
                )
                # refine the seek to just past the last attributed word
                # (transcribe.py:356-365); only when the window did NOT end
                # cleanly at a lone trailing timestamp
                ends = [w["end"] for s in new_segments for w in s["words"]]
                tokens_arr = np.asarray(result.tokens, np.int64)
                lone_ts_end = (
                    len(tokens_arr) >= 2
                    and tokens_arr[-1] >= tokenizer.timestamp_begin
                    and tokens_arr[-2] < tokenizer.timestamp_begin
                )
                if ends and not lone_ts_end:
                    shift = round((ends[-1] - time_offset) * FRAMES_PER_SECOND)
                    if shift > 0:
                        seek = window_start + shift

            if verbose:
                for seg in new_segments:
                    print_segment(seg)

            clear_degenerate(new_segments)
            for seg in new_segments:
                seg["id"] = len(segments)
                segments.append(seg)
                thread.extend(seg["tokens"])
            if not condition_on_previous_text or result.temperature > 0.5:
                # hot-sampled text is unreliable context (transcribe.py:400)
                thread_live_from = len(thread)

            pbar.update(min(content_frames, seek) - window_start)

    return dict(
        text=tokenizer.decode(thread[len(prompt_tokens):]),
        segments=segments,
        language=language,
        at_time_res=at_time_res,
        audio_tag=grid.logits,
    )


# --------------------------------------------------------------------------- #
# batched TPU fast path
# --------------------------------------------------------------------------- #


def _mel_to_windows(mel):
    """[80, T] device mel -> ([n_win, 80, 3000] windows, content_frames).
    n_win is 0 for empty audio (no content beyond the 30 s padding)."""
    content_frames = mel.shape[-1] - N_FRAMES
    n_windows = -(-content_frames // N_FRAMES)
    if n_windows <= 0:
        return None, content_frames
    mel_padded = pad_or_trim(mel, n_windows * N_FRAMES)
    windows = mel_padded.T.reshape(n_windows, N_FRAMES, -1).transpose(0, 2, 1)
    return windows, content_frames


def _round_max_batch_for_mesh(max_batch: int, mesh) -> int:
    dp = mesh.shape.get("dp", 1)
    if max_batch % dp != 0:
        max_batch = max(dp, (max_batch // dp) * dp)
    return max_batch


def _batch_bucket(n: int, max_batch: int, dp: int = 1) -> int:
    """Smallest padded batch size for n rows, from a fixed ladder.

    Without bucketing every distinct pending-chunk size (the tail chunk,
    each fallback rung's reject count) compiles a fresh encoder+decoder
    program; the ladder bounds compiles to a handful of shapes."""
    ladder = [b for b in (1, 2, 4, 8, 16) if b < max_batch] + [max_batch]
    bucket = next(b for b in ladder if b >= n)
    if bucket % dp:
        bucket = -(-bucket // dp) * dp
    return bucket


def _reject_conditioning(decode_options):
    if decode_options.pop("condition_on_previous_text", False):
        raise ValueError(
            "condition_on_previous_text=True threads each window's output "
            "into the next and is inherently sequential — use transcribe(). "
            "The batched paths decode windows in parallel "
            "(condition_on_previous_text=False semantics)."
        )


def transcribe_batched(
    model,
    audio: Union[str, np.ndarray, PrefetchedAudio],
    *,
    temperature: Union[float, Tuple[float, ...]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    at_time_res: float = 10,
    max_batch: int = DEFAULT_MAX_BATCH,
    mesh=None,
    initial_prompt: Optional[str] = None,
    word_timestamps: bool = False,
    prepend_punctuations: str = _PUNCT_PREPEND,
    append_punctuations: str = _PUNCT_APPEND,
    verbose: Optional[bool] = None,
    **decode_options,
):
    """Batched long-audio transcription + tagging (the TPU fast path).

    mesh: optional jax.sharding.Mesh — shards the window batch over the
    mesh's 'dp' axis with replicated parameters (multi-chip scale-out; the
    per-call max_batch should be a multiple of the dp size).
    initial_prompt: prompt context applied to EVERY window (windows decode
    in parallel, so unlike the sequential path it cannot thread each
    window's output into the next).
    word_timestamps: add per-word timings to every segment via the
    cross-attention DTW alignment (one extra device pass per window).

    Packs ALL 30 s windows of the file across the batch dimension: one mel
    pass, one batched encoder+tagging pass, and batched decoding — windows
    decode in parallel instead of the reference's sequential seek loop.
    Semantics differences vs `transcribe`: fixed 30 s window stride (no
    timestamp-driven seek refinement) and no prompt threading — the natural
    mode when condition_on_previous_text=False (SURVEY §7.5). The
    temperature fallback ladder still applies, re-decoding only the windows
    that failed quality thresholds. Returns the same result dict.
    """
    _reject_conditioning(decode_options)
    # the mel stays ON DEVICE: windows are sliced device-side (D2H of the
    # full mel over a tunneled TPU measured ~25 MB/s — dominating the batch)
    mel_device = log_mel_spectrogram(audio, padding=N_SAMPLES)

    gate = QualityGate(compression_ratio_threshold, logprob_threshold,
                       no_speech_threshold)
    language = _resolve_language(
        model, pad_or_trim(mel_device, N_FRAMES), decode_options, verbose
    )
    task = decode_options.get("task", "transcribe")
    tokenizer = get_tokenizer(model.is_multilingual, language=language,
                              task=task)
    input_stride, time_precision = _geometry(model)

    # device-side windowing: [80, T] -> [W, 80, 3000] with zero tail padding
    windows, content_frames = _mel_to_windows(mel_device)
    grid = TagGrid(content_frames, at_time_res)
    if windows is None:
        # empty audio: the reference's seek loop never enters — zero
        # segments, zero tag logits, and no decode of the padding window
        return dict(text="", segments=[], language=language,
                    at_time_res=at_time_res, audio_tag=grid.logits)

    if mesh is not None:
        from .parallel.inference import place_model_on_mesh

        place_model_on_mesh(model, mesh)
        max_batch = _round_max_batch_for_mesh(max_batch, mesh)

    if initial_prompt is not None:
        decode_options["prompt"] = tokenizer.encode(
            " " + initial_prompt.strip()
        )

    results = _decode_windows_batched(
        model, windows, temperature, gate, decode_options, max_batch, mesh
    )

    entries = [(grid, w * N_FRAMES, r.audio_features_for_at)
               for w, r in enumerate(results)]
    # tagging passes run on device while the host assembles segments
    commit_tags = _stitch_tags_dispatch(model, entries, at_time_res, max_batch)

    all_tokens, all_segments = _assemble_windows(
        model, results, windows, content_frames, tokenizer, gate,
        input_stride, time_precision, word_timestamps,
        prepend_punctuations, append_punctuations, verbose,
    )
    commit_tags()

    return dict(
        text=tokenizer.decode(all_tokens),
        segments=all_segments,
        language=language,
        at_time_res=at_time_res,
        audio_tag=grid.logits,
    )


def _stitch_tags_dispatch(model, entries, at_time_res, max_batch: int):
    """Dispatch the batched TL-TR tagging passes; return a commit callback.

    entries: one (grid, seek, at_feat [L, 75, D]) per window. Windows group
    by their pooled-frame grid offset (a window whose seek lands mid-cell
    drops the pooled frames before the next boundary) and stack max_batch
    at a time through one at_forward call. The at_forward dispatches are
    asynchronous — the caller runs host-side segment assembly while the
    tagging passes execute on device, then calls the returned commit() to
    force the logits and stitch them into each recording's TagGrid.
    """
    groups = {}
    for i, (grid, seek, _) in enumerate(entries):
        groups.setdefault(grid.offset_in_window(seek), []).append(i)
    pending = []
    for offset, idxs in groups.items():
        for lo in range(0, len(idxs), max_batch):
            chunk = idxs[lo:lo + max_batch]
            feats = jnp.stack([entries[i][2] for i in chunk])
            pending.append(
                (chunk, model.at_forward(feats[:, :, offset:, :], at_time_res))
            )

    def commit():
        for chunk, dev_tags in pending:
            tags = np.asarray(dev_tags)
            for row, i in enumerate(chunk):
                grid, seek, _ = entries[i]
                grid.write(seek, tags[row])

    return commit


def _assemble_windows(model, results, windows, content_frames, tokenizer,
                      gate: QualityGate, input_stride, time_precision,
                      word_timestamps, prepend_punctuations,
                      append_punctuations, verbose):
    """Fixed-30s-stride window results -> (tokens, segments) for one file.

    Segment construction through the shared parser; the batched path drops
    degenerate pieces outright (no seek refinement needs their placeholders).
    """
    all_segments: List[dict] = []
    all_tokens: List[int] = []
    per_window: List[Tuple[List[dict], int, int]] = []  # (segs, w, size)
    for w, result in tqdm.tqdm(list(enumerate(results)), unit="win",
                               disable=verbose is not False):
        seek = w * N_FRAMES
        if seek >= content_frames:
            # empty audio: the reference's seek loop (while seek <
            # content_frames) never enters, so zero segments — not a
            # hallucinated decode of the all-padding window
            break
        if gate.is_silence(result):
            continue
        segment_size = min(N_FRAMES, content_frames - seek)
        parse = parse_window(
            np.asarray(result.tokens, np.int64),
            timestamp_begin=tokenizer.timestamp_begin,
            time_offset=float(seek * HOP_LENGTH / SAMPLE_RATE),
            segment_size=segment_size,
            segment_duration=segment_size * HOP_LENGTH / SAMPLE_RATE,
            input_stride=input_stride,
            time_precision=time_precision,
        )
        window_segments = []
        for start, end, toks in parse.pieces:
            seg = segment_record(
                seek=seek, start=start, end=end, tokens=toks,
                result=result, eot=tokenizer.eot, tokenizer=tokenizer,
            )
            if seg["start"] == seg["end"] or not seg["text"].strip():
                continue
            window_segments.append(seg)
            all_tokens.extend(seg["tokens"])
        per_window.append((window_segments, w, segment_size))

    if word_timestamps:
        # ONE batched alignment forward per chunk instead of a batch-1
        # encoder+decoder pair per window (timing.add_word_timestamps_many);
        # chunked to bound the alignment forward's memory. The decode
        # pass's encoder output rides along (4th element) so the batched
        # attach skips the encoder recompute entirely.
        # WHISPER_AT_TPU_ALIGN=solo reverts to the per-window path
        # (A/B lever + safety valve; read per call, never inside jit)
        jobs = [(segs, windows[w], seg_size, results[w].audio_features)
                for segs, w, seg_size in per_window if segs]
        if os.environ.get("WHISPER_AT_TPU_ALIGN") == "solo":
            for segs, mel_w, seg_size, _ in jobs:
                _attach_word_timings(
                    model, tokenizer, segs, mel_w, seg_size,
                    prepend_punctuations, append_punctuations,
                )
        else:
            from .timing import add_word_timestamps_many

            for lo in range(0, len(jobs), _ALIGN_BATCH):
                add_word_timestamps_many(
                    window_jobs=jobs[lo:lo + _ALIGN_BATCH], model=model,
                    tokenizer=tokenizer,
                    prepend_punctuations=prepend_punctuations,
                    append_punctuations=append_punctuations,
                )

    for window_segments, _, _ in per_window:
        for seg in window_segments:
            seg["id"] = len(all_segments)
            all_segments.append(seg)
            if verbose:
                print_segment(seg)

    return all_tokens, all_segments


def transcribe_many(
    model,
    audios,
    *,
    temperature: Union[float, Tuple[float, ...]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    at_time_res: float = 10,
    max_batch: int = DEFAULT_MAX_BATCH,
    mesh=None,
    initial_prompt: Optional[str] = None,
    word_timestamps: bool = False,
    prepend_punctuations: str = _PUNCT_PREPEND,
    append_punctuations: str = _PUNCT_APPEND,
    verbose: Optional[bool] = None,
    **decode_options,
):
    """Transcribe + tag MANY recordings through shared device batches.

    The serving fast path (the reference has no analogue): every file's
    30 s windows pack into max_batch groups, so a pile of short clips fills
    the device batch the way one long file does — per-clip overheads
    (encoder/decoder dispatches at tiny batch) amortize across the fleet.
    Files are grouped by resolved language so each packed group shares one
    tokenizer/prompt; windows decode independently, so per-file results are
    identical to `transcribe_batched` run file-by-file.

    audios: list of waveforms and/or file paths.
    Returns one `transcribe_batched`-shaped result dict per input, in order.
    """
    _reject_conditioning(decode_options)
    prof = _serve_prof
    gate = QualityGate(compression_ratio_threshold, logprob_threshold,
                       no_speech_threshold)
    input_stride, time_precision = _geometry(model)
    task = decode_options.get("task", "transcribe")

    needs_detect = (decode_options.get("language") is None
                    and model.is_multilingual)
    # language is per-call constant on the non-detect path (reference
    # transcribe.py:100-116 semantics without a mel in hand)
    fixed_language = (decode_options.get("language")
                      if model.is_multilingual else
                      (decode_options.get("language") or "en"))

    # grouped frontend: prep every signal host-side, group by bucketed
    # length (+ dtype), and run ONE jitted mel->windows program per group
    # (ops/mel.mel_windows_many) instead of a per-file dispatch chain —
    # on a tunneled device the per-file chains are the dominant serving
    # overhead beyond window padding
    from .audio import load_audio_pcm16
    from .ops.mel import _stft_host_prep, mel_windows_many

    import time as _time

    _t0 = _time.perf_counter()
    files = []
    groups = {}
    for audio in audios:
        if isinstance(audio, PrefetchedAudio):
            if audio.padding != N_SAMPLES:
                raise ValueError(
                    f"PrefetchedAudio was prepared with padding="
                    f"{audio.padding}; transcribe_many needs {N_SAMPLES}"
                )
            sig, n_frames = audio.sig, audio.n_frames
        else:
            if isinstance(audio, str):
                audio = load_audio_pcm16(audio)
            sig, n_frames = _stft_host_prep(np.asarray(audio), N_SAMPLES)
        content_frames = n_frames - N_FRAMES
        f = {"windows": None, "content": content_frames,
             "language": None if needs_detect else fixed_language,
             "first": None}
        if content_frames > 0:
            key = (sig.shape[0], np.dtype(sig.dtype).name)
            groups.setdefault(key, []).append((len(files), sig, n_frames))
        elif needs_detect:
            # zero-content files never reach the grouped mel, but detection
            # still needs their (all-padding) first window for exact parity
            # with the per-file path; computed eagerly so no raw waveforms
            # are retained across the decode phase
            mel = log_mel_spectrogram(audio, padding=N_SAMPLES)
            f["first"] = pad_or_trim(mel, N_FRAMES)
        files.append(f)

    for idxs in groups.values():
        host = [(i, s, nf) for i, s, nf in idxs
                if not isinstance(s, jax.Array)]
        dev = [(i, s, nf) for i, s, nf in idxs if isinstance(s, jax.Array)]
        parts, order = [], []
        if host:
            parts.append(jnp.asarray(np.stack([s for _, s, _ in host])))
            order += host
        if dev:
            parts.append(jnp.stack([s for _, s, _ in dev]))
            order += dev
        sigs = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        n_valid = jnp.asarray([nf for _, _, nf in order], jnp.int32)
        wins = mel_windows_many(sigs, n_valid)   # [N, W, 80, N_FRAMES]
        for row, (i, _, _) in enumerate(order):
            files[i]["windows"] = wins[row]
            files[i]["first"] = wins[row, 0]
    # release the prepped-signal references (O(total audio)) — the last
    # loop iteration's locals hold them too, not just `groups`
    groups = idxs = host = dev = parts = order = sigs = n_valid = wins = None
    del groups, idxs, host, dev, parts, order, sigs, n_valid, wins
    prof.add("frontend-mel", _time.perf_counter() - _t0)
    _t0 = _time.perf_counter()

    if needs_detect:
        # ONE batched language-id pass over every file's first window —
        # the serving analogue of the reference's per-file detection
        # (reference transcribe.py:100-116), without a device pass per file
        from .decoding import detect_language as _detect

        if verbose:
            print(
                "Detecting language using up to the first 30 seconds. "
                "Use `--language` to specify the language"
            )
        for lo in range(0, len(files), max_batch):
            chunk = files[lo:lo + max_batch]
            first = jnp.stack([f["first"] for f in chunk])
            _, probs = _detect(model, first)
            for f, p in zip(chunk, probs):
                f["language"] = max(p, key=p.get)
                if verbose is not None:
                    print("Detected language: "
                          f"{LANGUAGES[f['language']].title()}")

    if mesh is not None:
        from .parallel.inference import place_model_on_mesh

        place_model_on_mesh(model, mesh)
        max_batch = _round_max_batch_for_mesh(max_batch, mesh)

    prof.add("detect", _time.perf_counter() - _t0)
    _t0 = _time.perf_counter()
    by_lang = {}
    for i, f in enumerate(files):
        by_lang.setdefault(f["language"], []).append(i)

    results_per_file: List[Optional[list]] = [None] * len(files)
    for language, idxs in by_lang.items():
        tokenizer = get_tokenizer(model.is_multilingual, language=language,
                                  task=task)
        opts = dict(decode_options)
        opts["language"] = language
        if initial_prompt is not None:
            opts["prompt"] = tokenizer.encode(" " + initial_prompt.strip())
        for i in idxs:
            files[i]["tokenizer"] = tokenizer
        # empty recordings decode nothing (the reference's seek loop never
        # enters); their results stay []
        live = [i for i in idxs if files[i]["windows"] is not None]
        for i in idxs:
            results_per_file[i] = []
        if not live:
            continue
        packed = jnp.concatenate(
            [files[i]["windows"] for i in live], axis=0
        )
        res = _decode_windows_batched(
            model, packed, temperature, gate, opts, max_batch, mesh
        )
        pos = 0
        for i in live:
            n = files[i]["windows"].shape[0]
            results_per_file[i] = res[pos:pos + n]
            pos += n

    prof.add("decode", _time.perf_counter() - _t0)
    _t0 = _time.perf_counter()
    # one batched tag pass over every window of every file, dispatched
    # before the host-side assembly loop so the device work overlaps it
    entries = []
    for i, f in enumerate(files):
        f["grid"] = TagGrid(f["content"], at_time_res)
        for w, r in enumerate(results_per_file[i]):
            entries.append((f["grid"], w * N_FRAMES, r.audio_features_for_at))
    commit_tags = _stitch_tags_dispatch(model, entries, at_time_res, max_batch)
    prof.add("tag-dispatch", _time.perf_counter() - _t0)
    _t0 = _time.perf_counter()

    assembled = []
    for i, f in enumerate(files):
        toks, segs = _assemble_windows(
            model, results_per_file[i], f["windows"], f["content"],
            f["tokenizer"], gate, input_stride, time_precision,
            word_timestamps, prepend_punctuations, append_punctuations,
            verbose,
        )
        assembled.append((toks, segs))
    prof.add("assembly", _time.perf_counter() - _t0)
    _t0 = _time.perf_counter()
    commit_tags()  # grids must be written before audio_tag is read
    prof.add("tag-commit", _time.perf_counter() - _t0)
    _t0 = _time.perf_counter()
    out = [
        dict(
            text=f["tokenizer"].decode(toks),
            segments=segs,
            language=f["language"],
            at_time_res=at_time_res,
            audio_tag=f["grid"].logits,
        )
        for f, (toks, segs) in zip(files, assembled)
    ]
    prof.add("emit", _time.perf_counter() - _t0)
    return out


def _decode_windows_batched(model, windows, temperature, gate: QualityGate,
                            decode_options, max_batch: int, mesh):
    """Decode all windows in max_batch chunks; the fallback ladder re-decodes
    only the windows the quality gate rejected."""
    from .decoding import DecodingTask

    n_windows = windows.shape[0]
    results: List[Optional[DecodingResult]] = [None] * n_windows
    pending = list(range(n_windows))
    dp = mesh.shape.get("dp", 1) if mesh is not None else 1
    for t, kwargs in temperature_schedule(temperature, decode_options):
        if not pending:
            break
        dtask = DecodingTask(model, DecodingOptions(**kwargs, temperature=t))
        for lo in range(0, len(pending), max_batch):
            chunk = pending[lo:lo + max_batch]
            # pad to a bucketed batch size (repeating the last row; padded
            # rows are decoded and dropped) so tail chunks and fallback-rung
            # reject lists reuse a handful of compiled programs instead of
            # compiling one per distinct count
            bucket = _batch_bucket(len(chunk), max_batch, dp)
            batch_rows = list(chunk) + [chunk[-1]] * (bucket - len(chunk))
            chunk_windows = windows[jnp.asarray(batch_rows, jnp.int32)]
            if mesh is not None:
                from .parallel.inference import shard_windows

                chunk_windows = shard_windows(mesh, chunk_windows)
            for w, r in zip(chunk, dtask.run(chunk_windows)):
                results[w] = r
        pending = [w for w in pending if gate.needs_fallback(results[w])]
    return results


from .cli import cli  # noqa: E402  (re-export; implementation in cli.py)
