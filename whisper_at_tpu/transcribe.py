"""Transcription orchestrator: the 30 s seek loop with joint audio tagging.

Host-side control mirroring the reference (whisper_at/transcribe.py:38-403):
temperature-fallback ladder, no-speech gating, timestamp-token segmentation
with timestamp-driven seek advance, AT decision-window stitching, prompt
threading. Device work (mel, encoder, decode loop, TL-TR head) happens inside
the jitted functions invoked per window.
"""

import math
import warnings
from typing import List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np
import tqdm

from .audio import (
    FRAMES_PER_SECOND,
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
    pad_or_trim,
)
from .decoding import DecodingOptions, DecodingResult
from .tokenizer import LANGUAGES, get_tokenizer
from .utils import exact_div, format_timestamp, make_safe


def transcribe(
    model,
    audio: Union[str, np.ndarray],
    *,
    verbose: Optional[bool] = None,
    temperature: Union[float, Tuple[float, ...]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    condition_on_previous_text: bool = True,
    initial_prompt: Optional[str] = None,
    word_timestamps: bool = False,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    at_time_res: float = 10,
    **decode_options,
):
    """Transcribe audio and tag sound events (reference transcribe.py:38-403).

    Returns dict(text, segments, language, at_time_res, audio_tag) where
    audio_tag is [ceil(frames / at_window), 527] segment logits.
    """
    # pad a full 30 s of silence on the right for slicing (transcribe.py:127)
    mel_device = log_mel_spectrogram(audio, padding=N_SAMPLES)
    mel = np.asarray(mel_device, dtype=np.float32)
    content_frames = mel.shape[-1] - N_FRAMES

    at_decision_window = at_time_res * 100  # frames
    assert at_decision_window % 40 == 0, (
        "Audio tagging resolution at_time_res must be an integer multiple of "
        "0.4 second, e.g., 0.4, 0.8, 1.2, etc, current at_time_res={:.2f}.".format(
            at_time_res
        )
    )
    at_decision_window = int(at_decision_window)
    if at_decision_window != 1000:
        warnings.warn(
            "Current at_time_res is {:.2f} second, the audio tagging model is "
            "trained with time resolution of 10 seconds. Mismatch time resolution "
            "may cause an audio tagging performance drop, but won't impact ASR "
            "performance.".format(at_time_res),
            stacklevel=2,
        )

    if decode_options.get("language", None) is None:
        if not model.is_multilingual:
            decode_options["language"] = "en"
        else:
            if verbose:
                print(
                    "Detecting language using up to the first 30 seconds. "
                    "Use `--language` to specify the language"
                )
            mel_segment = pad_or_trim(mel, N_FRAMES)
            _, probs = model.detect_language(jnp.asarray(mel_segment))
            decode_options["language"] = max(probs, key=probs.get)
            if verbose is not None:
                print(
                    f"Detected language: {LANGUAGES[decode_options['language']].title()}"
                )

    language: str = decode_options["language"]
    task: str = decode_options.get("task", "transcribe")
    tokenizer = get_tokenizer(model.is_multilingual, language=language, task=task)

    if word_timestamps and task == "translate":
        warnings.warn("Word-level timestamps on translations may not be reliable.")

    def decode_with_fallback(segment: np.ndarray) -> DecodingResult:
        temperatures = (
            [temperature] if isinstance(temperature, (int, float)) else temperature
        )
        decode_result = None

        for t in temperatures:
            kwargs = {**decode_options}
            if t > 0:
                # disable beam_size and patience when t > 0
                kwargs.pop("beam_size", None)
                kwargs.pop("patience", None)
            else:
                # disable best_of when t == 0
                kwargs.pop("best_of", None)

            options = DecodingOptions(**kwargs, temperature=t)
            decode_result = model.decode(jnp.asarray(segment), options)

            needs_fallback = False
            if (
                compression_ratio_threshold is not None
                and decode_result.compression_ratio > compression_ratio_threshold
            ):
                needs_fallback = True  # too repetitive
            if (
                logprob_threshold is not None
                and decode_result.avg_logprob < logprob_threshold
            ):
                needs_fallback = True  # average log probability too low
            if (
                no_speech_threshold is not None
                and decode_result.no_speech_prob > no_speech_threshold
            ):
                needs_fallback = False  # silence
            if not needs_fallback:
                break

        return decode_result

    seek = 0
    input_stride = exact_div(N_FRAMES, model.dims.n_audio_ctx)  # 2 frames/token
    time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE  # 0.02 s/token
    all_tokens: List[int] = []
    all_segments: List[dict] = []
    all_audio_tags = np.zeros(
        (math.ceil(content_frames / at_decision_window), 527), np.float32
    )
    prompt_reset_since = 0

    if initial_prompt is not None:
        initial_prompt_tokens = tokenizer.encode(" " + initial_prompt.strip())
        all_tokens.extend(initial_prompt_tokens)
    else:
        initial_prompt_tokens = []

    def new_segment(*, start, end, tokens, result: DecodingResult):
        tokens = [int(t) for t in tokens]
        text_tokens = [token for token in tokens if token < tokenizer.eot]
        return {
            "seek": seek,
            "start": start,
            "end": end,
            "text": tokenizer.decode(text_tokens),
            "tokens": tokens,
            "temperature": result.temperature,
            "avg_logprob": result.avg_logprob,
            "compression_ratio": result.compression_ratio,
            "no_speech_prob": result.no_speech_prob,
        }

    with tqdm.tqdm(
        total=content_frames, unit="frames", disable=verbose is not False
    ) as pbar:
        while seek < content_frames:
            time_offset = float(seek * HOP_LENGTH / SAMPLE_RATE)
            mel_segment = mel[:, seek : seek + N_FRAMES]
            segment_size = min(N_FRAMES, content_frames - seek)
            segment_duration = segment_size * HOP_LENGTH / SAMPLE_RATE
            mel_segment = pad_or_trim(mel_segment, N_FRAMES)

            decode_options["prompt"] = all_tokens[prompt_reset_since:]
            result: DecodingResult = decode_with_fallback(mel_segment)

            # audio tagging: align pooled features to the decision grid
            # (transcribe.py:255-263); seek/40 is the pooled-frame index
            at_start = math.floor(seek % at_decision_window / 40)
            audio_tag = np.asarray(
                model.at_forward(
                    result.audio_features_for_at[:, at_start:, :],
                    time_resolution=at_time_res,
                )
            )
            cur_at_start = math.floor(seek / at_decision_window)
            cur_at_end = min(
                all_audio_tags.shape[0], cur_at_start + audio_tag.shape[0]
            )
            all_audio_tags[cur_at_start:cur_at_end, :] = audio_tag[
                0 : cur_at_end - cur_at_start, :
            ]

            tokens = np.asarray(result.tokens, dtype=np.int64)

            if no_speech_threshold is not None:
                # no voice activity check
                should_skip = result.no_speech_prob > no_speech_threshold
                if (
                    logprob_threshold is not None
                    and result.avg_logprob > logprob_threshold
                ):
                    # don't skip if the logprob is high enough
                    should_skip = False

                if should_skip:
                    seek += segment_size  # fast-forward to the next segment
                    pbar.update(min(content_frames, seek) - (seek - segment_size))
                    continue

            previous_seek = seek
            current_segments = []

            timestamp_tokens = tokens >= tokenizer.timestamp_begin
            single_timestamp_ending = timestamp_tokens[-2:].tolist() == [False, True]

            consecutive = np.where(timestamp_tokens[:-1] & timestamp_tokens[1:])[0] + 1
            if len(consecutive) > 0:
                # output contains two consecutive timestamp tokens
                slices = consecutive.tolist()
                if single_timestamp_ending:
                    slices.append(len(tokens))

                last_slice = 0
                for current_slice in slices:
                    sliced_tokens = tokens[last_slice:current_slice]
                    start_timestamp_pos = (
                        int(sliced_tokens[0]) - tokenizer.timestamp_begin
                    )
                    end_timestamp_pos = (
                        int(sliced_tokens[-1]) - tokenizer.timestamp_begin
                    )
                    current_segments.append(
                        new_segment(
                            start=time_offset + start_timestamp_pos * time_precision,
                            end=time_offset + end_timestamp_pos * time_precision,
                            tokens=sliced_tokens,
                            result=result,
                        )
                    )
                    last_slice = current_slice

                if single_timestamp_ending:
                    # no speech after the last timestamp
                    seek += segment_size
                else:
                    # ignore the unfinished segment; seek to the last timestamp
                    last_timestamp_pos = (
                        int(tokens[last_slice - 1]) - tokenizer.timestamp_begin
                    )
                    seek += last_timestamp_pos * input_stride
            else:
                duration = segment_duration
                timestamps = tokens[timestamp_tokens.nonzero()[0]]
                if (
                    len(timestamps) > 0
                    and int(timestamps[-1]) != tokenizer.timestamp_begin
                ):
                    # no consecutive timestamps but one exists: use the last
                    last_timestamp_pos = (
                        int(timestamps[-1]) - tokenizer.timestamp_begin
                    )
                    duration = last_timestamp_pos * time_precision

                current_segments.append(
                    new_segment(
                        start=time_offset,
                        end=time_offset + duration,
                        tokens=tokens,
                        result=result,
                    )
                )
                seek += segment_size

            if word_timestamps:
                from .timing import add_word_timestamps

                add_word_timestamps(
                    segments=current_segments,
                    model=model,
                    tokenizer=tokenizer,
                    mel=jnp.asarray(mel_segment),
                    num_frames=segment_size,
                    prepend_punctuations=prepend_punctuations,
                    append_punctuations=append_punctuations,
                )
                word_end_timestamps = [
                    w["end"] for s in current_segments for w in s["words"]
                ]
                if not single_timestamp_ending and len(word_end_timestamps) > 0:
                    seek_shift = round(
                        (word_end_timestamps[-1] - time_offset) * FRAMES_PER_SECOND
                    )
                    if seek_shift > 0:
                        seek = previous_seek + seek_shift

            if verbose:
                for segment in current_segments:
                    start, end, text = segment["start"], segment["end"], segment["text"]
                    line = f"[{format_timestamp(start)} --> {format_timestamp(end)}] {text}"
                    print(make_safe(line))

            # clear instantaneous or empty segments
            for i, segment in enumerate(current_segments):
                if segment["start"] == segment["end"] or segment["text"].strip() == "":
                    segment["text"] = ""
                    segment["tokens"] = []
                    segment["words"] = []

            all_segments.extend(
                [
                    {"id": i, **segment}
                    for i, segment in enumerate(
                        current_segments, start=len(all_segments)
                    )
                ]
            )
            all_tokens.extend(
                [token for segment in current_segments for token in segment["tokens"]]
            )

            if not condition_on_previous_text or result.temperature > 0.5:
                # don't feed prompt tokens if a high temperature was used
                prompt_reset_since = len(all_tokens)

            pbar.update(min(content_frames, seek) - previous_seek)

    return dict(
        text=tokenizer.decode(all_tokens[len(initial_prompt_tokens) :]),
        segments=all_segments,
        language=language,
        at_time_res=at_time_res,
        audio_tag=all_audio_tags,
    )


def transcribe_batched(
    model,
    audio: Union[str, np.ndarray],
    *,
    temperature: Union[float, Tuple[float, ...]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    at_time_res: float = 10,
    max_batch: int = 8,
    mesh=None,
    initial_prompt: Optional[str] = None,
    word_timestamps: bool = False,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
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
    decode in parallel instead of the reference's sequential seek loop
    (transcribe.py:239-395). Semantics differences vs `transcribe`:

    * fixed 30 s window stride (no timestamp-driven seek refinement), which is
      the natural mode when condition_on_previous_text=False (SURVEY §7.5);
    * no prompt threading between windows.

    The temperature fallback ladder still applies, re-decoding only the
    windows that failed quality thresholds. Returns the same result dict as
    `transcribe`.
    """
    # the mel stays ON DEVICE: windows are sliced device-side (D2H of the
    # full mel over a tunneled TPU measured ~25 MB/s — dominating the batch)
    mel_device = log_mel_spectrogram(audio, padding=N_SAMPLES)
    content_frames = mel_device.shape[-1] - N_FRAMES

    at_decision_window = at_time_res * 100
    assert at_decision_window % 40 == 0, (
        "at_time_res must be an integer multiple of 0.4 second, current "
        "at_time_res={:.2f}.".format(at_time_res)
    )
    at_decision_window = int(at_decision_window)
    if at_decision_window != 1000:
        warnings.warn(
            "at_time_res {:.2f} differs from the 10 s training resolution; "
            "tagging quality may drop (ASR unaffected).".format(at_time_res),
            stacklevel=2,
        )

    if decode_options.get("language", None) is None:
        if not model.is_multilingual:
            decode_options["language"] = "en"
        else:
            mel_segment = pad_or_trim(mel_device, N_FRAMES)
            _, probs = model.detect_language(mel_segment)
            decode_options["language"] = max(probs, key=probs.get)

    language: str = decode_options["language"]
    task: str = decode_options.get("task", "transcribe")
    tokenizer = get_tokenizer(model.is_multilingual, language=language, task=task)

    # device-side windowing: [80, T] -> [W, 80, 3000] with zero tail padding
    n_windows = max(1, -(-content_frames // N_FRAMES))
    total_needed = n_windows * N_FRAMES
    mel_padded = pad_or_trim(mel_device, total_needed)
    windows = mel_padded.T.reshape(n_windows, N_FRAMES, -1).transpose(0, 2, 1)

    if mesh is not None:
        from .parallel.inference import place_model_on_mesh

        place_model_on_mesh(model, mesh)
        dp = mesh.shape.get("dp", 1)
        if max_batch % dp != 0:
            max_batch = max(dp, (max_batch // dp) * dp)

    temperatures = (
        [temperature] if isinstance(temperature, (int, float)) else list(temperature)
    )

    from .decoding import DecodingOptions, DecodingTask

    if initial_prompt is not None:
        decode_options["prompt"] = tokenizer.encode(" " + initial_prompt.strip())

    results = [None] * n_windows
    pending = list(range(n_windows))
    for t in temperatures:
        if not pending:
            break
        kwargs = {**decode_options}
        if t > 0:
            kwargs.pop("beam_size", None)
            kwargs.pop("patience", None)
        else:
            kwargs.pop("best_of", None)
        options = DecodingOptions(**kwargs, temperature=t)
        dtask = DecodingTask(model, options)
        for start in range(0, len(pending), max_batch):
            chunk = pending[start : start + max_batch]
            padded_chunk = list(chunk)
            if mesh is not None:
                from .parallel.inference import shard_windows

                dp = mesh.shape.get("dp", 1)
                while len(padded_chunk) % dp != 0:
                    padded_chunk.append(chunk[-1])  # duplicate; extras dropped
                chunk_windows = shard_windows(
                    mesh, windows[jnp.asarray(padded_chunk, jnp.int32)]
                )
            else:
                chunk_windows = windows[jnp.asarray(padded_chunk, jnp.int32)]
            chunk_results = dtask.run(chunk_windows)
            for w, r in zip(chunk, chunk_results):
                results[w] = r

        still_pending = []
        for w in pending:
            r = results[w]
            needs_fallback = False
            if (
                compression_ratio_threshold is not None
                and r.compression_ratio > compression_ratio_threshold
            ):
                needs_fallback = True
            if logprob_threshold is not None and r.avg_logprob < logprob_threshold:
                needs_fallback = True
            if (
                no_speech_threshold is not None
                and r.no_speech_prob > no_speech_threshold
            ):
                needs_fallback = False
            if needs_fallback:
                still_pending.append(w)
        pending = still_pending

    # ---- audio tagging: one batched TL-TR pass over all windows ----
    all_audio_tags = np.zeros(
        (max(1, -(-content_frames // at_decision_window)), 527), np.float32
    )
    at_feats = jnp.stack([r.audio_features_for_at for r in results])
    # group windows by their alignment offset into the decision grid
    import math as _math

    groups = {}
    for w in range(n_windows):
        seek = w * N_FRAMES
        at_start = _math.floor(seek % at_decision_window / 40)
        groups.setdefault(at_start, []).append(w)
    for at_start, ws in groups.items():
        group_feats = at_feats[jnp.asarray(ws, dtype=jnp.int32)]
        tags = np.asarray(
            model.at_forward(group_feats[:, :, at_start:, :], at_time_res)
        )
        for row, w in enumerate(ws):
            seek = w * N_FRAMES
            cur_start = _math.floor(seek / at_decision_window)
            cur_end = min(all_audio_tags.shape[0], cur_start + tags.shape[1])
            all_audio_tags[cur_start:cur_end] = tags[row, : cur_end - cur_start]

    # ---- segment construction per window (fixed 30 s offsets) ----
    input_stride = exact_div(N_FRAMES, model.dims.n_audio_ctx)
    time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE
    all_segments: List[dict] = []
    all_tokens: List[int] = []
    window_iter = tqdm.tqdm(
        list(enumerate(results)), unit="win", disable=verbose is not False
    )
    for w, result in window_iter:
        seek = w * N_FRAMES
        time_offset = float(seek * HOP_LENGTH / SAMPLE_RATE)
        segment_size = min(N_FRAMES, content_frames - seek)
        segment_duration = segment_size * HOP_LENGTH / SAMPLE_RATE
        tokens = np.asarray(result.tokens, dtype=np.int64)

        if no_speech_threshold is not None:
            should_skip = result.no_speech_prob > no_speech_threshold
            if (
                logprob_threshold is not None
                and result.avg_logprob > logprob_threshold
            ):
                should_skip = False
            if should_skip:
                continue

        timestamp_tokens = tokens >= tokenizer.timestamp_begin
        consecutive = np.where(timestamp_tokens[:-1] & timestamp_tokens[1:])[0] + 1
        window_segments = []
        if len(consecutive) > 0:
            last_slice = 0
            slices = consecutive.tolist()
            single_timestamp_ending = timestamp_tokens[-2:].tolist() == [False, True]
            if single_timestamp_ending:
                slices.append(len(tokens))
            for current_slice in slices:
                sliced = tokens[last_slice:current_slice]
                start_pos = int(sliced[0]) - tokenizer.timestamp_begin
                end_pos = int(sliced[-1]) - tokenizer.timestamp_begin
                window_segments.append(
                    (time_offset + start_pos * time_precision,
                     time_offset + end_pos * time_precision, sliced)
                )
                last_slice = current_slice
        else:
            duration = segment_duration
            ts = tokens[timestamp_tokens.nonzero()[0]]
            if len(ts) > 0 and int(ts[-1]) != tokenizer.timestamp_begin:
                duration = (int(ts[-1]) - tokenizer.timestamp_begin) * time_precision
            window_segments.append(
                (time_offset, time_offset + duration, tokens)
            )

        current_segments = []
        for start, end, seg_tokens in window_segments:
            seg_tokens = [int(tk) for tk in seg_tokens]
            text_tokens = [tk for tk in seg_tokens if tk < tokenizer.eot]
            text = tokenizer.decode(text_tokens)
            if start == end or text.strip() == "":
                continue
            current_segments.append({
                "id": 0,  # renumbered below
                "seek": seek,
                "start": start,
                "end": end,
                "text": text,
                "tokens": seg_tokens,
                "temperature": result.temperature,
                "avg_logprob": result.avg_logprob,
                "compression_ratio": result.compression_ratio,
                "no_speech_prob": result.no_speech_prob,
            })
            all_tokens.extend(seg_tokens)

        if word_timestamps and current_segments:
            from .timing import add_word_timestamps

            add_word_timestamps(
                segments=current_segments,
                model=model,
                tokenizer=tokenizer,
                mel=windows[w],
                num_frames=segment_size,
                prepend_punctuations=prepend_punctuations,
                append_punctuations=append_punctuations,
            )

        for segment in current_segments:
            segment["id"] = len(all_segments)
            all_segments.append(segment)

    return dict(
        text=tokenizer.decode(all_tokens),
        segments=all_segments,
        language=language,
        at_time_res=at_time_res,
        audio_tag=all_audio_tags,
    )


from .cli import cli  # noqa: E402  (re-export; implementation in cli.py)
