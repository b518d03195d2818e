"""Word-level timestamps via cross-attention DTW alignment.

Parity with the reference (whisper_at/timing.py:163-352): forward the full
text with <|notimestamps|>, capture the alignment heads' cross-attention
(functionally, via decoder_forward_with_qk, instead of forward hooks),
softmax / z-norm / median-filter the weights, DTW the negative matrix, split
tokens into words, and distribute timings back into the segments with the
reference's duration-outlier heuristics.
"""

from dataclasses import dataclass
from typing import List

import jax.numpy as jnp
import numpy as np

from .audio import HOP_LENGTH, SAMPLE_RATE, TOKENS_PER_SECOND
from .models.decoder import decoder_forward_with_qk
from .ops.dtw_pallas import dtw_auto as dtw
from .ops.median import median_filter
from .tokenizer import Tokenizer


@dataclass
class WordTiming:
    word: str
    tokens: List[int]
    start: float
    end: float
    probability: float


def find_alignment(
    model,
    tokenizer: Tokenizer,
    text_tokens: List[int],
    mel: jnp.ndarray,
    num_frames: int,
    *,
    medfilt_width: int = 7,
    qk_scale: float = 1.0,
) -> List[WordTiming]:
    if len(text_tokens) == 0:
        return []

    tokens = np.asarray(
        [
            *tokenizer.sot_sequence,
            tokenizer.no_timestamps,
            *text_tokens,
            tokenizer.eot,
        ],
        np.int32,
    )

    # alignment-head slots: (layer, head) -> row in the captured qk stack
    head_mask = np.asarray(model.alignment_heads, bool)
    n_layer, n_head = head_mask.shape
    n_sel = int(head_mask.sum())
    sel_slot = np.full((n_layer, n_head), n_sel, np.int32)
    sel_slot[head_mask] = np.arange(n_sel)

    if mel.ndim == 2:
        mel = mel[None]
    audio_features, _ = model.embed_audio(mel, fp16=False)

    logits, qk = decoder_forward_with_qk(
        model.params["decoder"],
        jnp.asarray(tokens[None]),
        audio_features,
        jnp.asarray(sel_slot),
        model.dims.n_text_head,
        n_sel,
        jnp.float32,
    )
    logits = np.asarray(logits[0], np.float64)  # [S, V]

    sampled_logits = logits[len(tokenizer.sot_sequence) :, : tokenizer.eot]
    shifted = sampled_logits - sampled_logits.max(axis=-1, keepdims=True)
    token_probs = np.exp(shifted) / np.exp(shifted).sum(axis=-1, keepdims=True)
    text_token_probs = token_probs[np.arange(len(text_tokens)), text_tokens].tolist()

    # weight processing (timing.py:205-214): softmax over the valid frames,
    # per-head z-norm across tokens, median filter along frames
    weights = jnp.asarray(qk)[:, :, : num_frames // 2]  # [n_sel, S, F]
    weights = jnp.exp(
        weights * qk_scale
        - jnp.max(weights * qk_scale, axis=-1, keepdims=True)
    )
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    mean = jnp.mean(weights, axis=-2, keepdims=True)
    std = jnp.std(weights, axis=-2, keepdims=True)
    weights = (weights - mean) / std
    weights = median_filter(weights, medfilt_width)

    matrix = np.asarray(jnp.mean(weights, axis=0))
    matrix = matrix[len(tokenizer.sot_sequence) : -1]
    text_indices, time_indices = dtw(-matrix)

    words, word_tokens = tokenizer.split_to_word_tokens(
        text_tokens + [tokenizer.eot]
    )
    word_boundaries = np.pad(np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0))

    jumps = np.pad(np.diff(text_indices), (1, 0), constant_values=1).astype(bool)
    jump_times = time_indices[jumps] / TOKENS_PER_SECOND
    start_times = jump_times[word_boundaries[:-1]]
    end_times = jump_times[word_boundaries[1:]]
    word_probabilities = [
        np.mean(text_token_probs[i:j])
        for i, j in zip(word_boundaries[:-1], word_boundaries[1:])
    ]

    # duration-outlier heuristics (timing.py:229-248): truncate pathological
    # long words at window/sentence starts to twice the median duration
    word_durations = end_times - start_times
    word_durations = word_durations[word_durations.nonzero()]
    if len(word_durations) > 0:
        median_duration = np.median(word_durations)
        max_duration = median_duration * 2
        sentence_end_marks = ".。!！?？"
        for i in range(1, len(start_times)):
            if end_times[i] - start_times[i] > max_duration:
                if words[i] in sentence_end_marks:
                    end_times[i] = start_times[i] + max_duration
                elif words[i - 1] in sentence_end_marks:
                    start_times[i] = end_times[i] - max_duration
        if len(start_times) > 0 and end_times[0] - start_times[0] > max_duration:
            if len(start_times) > 1 and end_times[1] - start_times[1] > max_duration:
                boundary = max(end_times[1] / 2, end_times[1] - max_duration)
                end_times[0] = start_times[1] = boundary
            start_times[0] = max(0, end_times[0] - max_duration)

    return [
        WordTiming(word, tokens, start, end, probability)
        for word, tokens, start, end, probability in zip(
            words, word_tokens, start_times, end_times, word_probabilities
        )
    ]


def _glue(source: WordTiming, target: WordTiming, source_first: bool) -> None:
    """Move `source`'s text+tokens into `target`, emptying the source."""
    if source_first:
        target.word = source.word + target.word
        target.tokens = source.tokens + target.tokens
    else:
        target.word = target.word + source.word
        target.tokens = target.tokens + source.tokens
    source.word = ""
    source.tokens = []


def merge_punctuations(alignment: List[WordTiming], prepended: str,
                       appended: str) -> None:
    """Fold hanging punctuation into its neighbor word in place
    (reference behavior, timing.py:258-289).

    Opening marks ("¿", "(", …) that the tokenizer split off as their own
    space-prefixed words glue FORWARD onto the word that follows; scanning
    right-to-left lets chains collapse into one target. Closing marks
    (".", ",", …) glue BACKWARD onto the word before, scanning
    left-to-right, but never across an explicit trailing space. Emptied
    entries stay in the list (their token budget matters for segment
    attribution) with word == "".
    """
    anchor = len(alignment) - 1  # word currently absorbing opening marks
    for i in range(len(alignment) - 2, -1, -1):
        cur = alignment[i]
        if cur.word.startswith(" ") and cur.word.strip() in prepended:
            _glue(cur, alignment[anchor], source_first=True)
        else:
            anchor = i

    anchor = 0  # word currently absorbing closing marks
    for j in range(1, len(alignment)):
        cur = alignment[j]
        if not alignment[anchor].word.endswith(" ") and cur.word in appended:
            _glue(cur, alignment[anchor], source_first=False)
        else:
            anchor = j


def _words_per_segment(
    alignment: List[WordTiming],
    tokens_per_segment: List[List[int]],
    time_offset: float,
):
    """Walk the merged alignment once, carving word dicts out per segment
    by consuming each segment's token budget (empty glued entries spend
    budget but emit nothing)."""
    cursor = 0
    for seg_tokens in tokens_per_segment:
        budget = len(seg_tokens)
        words = []
        while cursor < len(alignment) and budget > 0:
            timing = alignment[cursor]
            if timing.word:
                words.append(dict(
                    word=timing.word,
                    start=round(time_offset + timing.start, 2),
                    end=round(time_offset + timing.end, 2),
                    probability=timing.probability,
                ))
            budget -= len(timing.tokens)
            cursor += 1
        yield words


def add_word_timestamps(
    *,
    segments: List[dict],
    model,
    tokenizer: Tokenizer,
    mel: jnp.ndarray,
    num_frames: int,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    **kwargs,
):
    """Attach per-word timings to every segment (reference semantics,
    whisper_at/timing.py:292-352): align the window's full text once, merge
    punctuation, then distribute words to segments by token count and snap
    segment boundaries to their first/last word."""
    if len(segments) == 0:
        return

    tokens_per_segment = [
        [token for token in segment["tokens"] if token < tokenizer.eot]
        for segment in segments
    ]
    alignment = find_alignment(
        model, tokenizer,
        [t for seg in tokens_per_segment for t in seg],
        mel, num_frames, **kwargs,
    )
    merge_punctuations(alignment, prepend_punctuations, append_punctuations)

    time_offset = segments[0]["seek"] * HOP_LENGTH / SAMPLE_RATE
    for segment, words in zip(
        segments,
        _words_per_segment(alignment, tokens_per_segment, time_offset),
    ):
        segment["words"] = words
        if not words:
            continue
        segment["start"] = words[0]["start"]
        last = words[-1]
        if segment["end"] > last["start"] and segment["end"] + 0.5 < last["end"]:
            # the aligned last word runs suspiciously long past the
            # timestamp-token end: trust the segment-level end instead
            last["end"] = segment["end"]
        else:
            segment["end"] = last["end"]
