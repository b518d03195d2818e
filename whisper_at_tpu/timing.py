"""Word-level timestamps via cross-attention DTW alignment.

Parity with the reference (whisper_at/timing.py:163-352): forward the full
text with <|notimestamps|>, capture the alignment heads' cross-attention
(functionally, via decoder_forward_with_qk, instead of forward hooks),
softmax / z-norm / median-filter the weights, DTW the negative matrix, split
tokens into words, and distribute timings back into the segments with the
reference's duration-outlier heuristics.
"""

import functools
from dataclasses import dataclass
from typing import List, Tuple

import jax
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


def _align_dtype(model):
    """Compute dtype for the alignment forward: the model's own half
    precision when its weights are half (the reference runs find_alignment
    in the model dtype — fp16 on GPU, whisper_at/timing.py:185-191 via
    model(mel, tokens) — not a widened fp32 pass), fp32 for fp32 weights
    (tests, CPU). WHISPER_AT_TPU_ALIGN_DTYPE={fp32,bf16} overrides (A/B
    lever; read per call, never inside jit). The QK capture buffer and the
    softmax/z-norm/median weight chain stay fp32 either way."""
    import os

    env = os.environ.get("WHISPER_AT_TPU_ALIGN_DTYPE")
    if env == "fp32":
        return jnp.float32
    if env == "bf16":
        return jnp.bfloat16
    return (jnp.bfloat16 if model.storage_dtype == jnp.bfloat16
            else jnp.float32)


def find_alignment(
    model,
    tokenizer: Tokenizer,
    text_tokens: List[int],
    mel: jnp.ndarray,
    num_frames: int,
    *,
    medfilt_width: int = 7,
    qk_scale: float = 1.0,
    audio_features=None,
) -> List[WordTiming]:
    """audio_features: optional [F, D] (or [1, F, D]) encoder output already
    computed by the decode pass (DecodingResult.audio_features) — skips the
    encoder recompute, same as the batched path."""
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

    dtype = _align_dtype(model)
    if audio_features is not None:
        audio_features = jnp.asarray(audio_features)
        if audio_features.ndim == 2:
            audio_features = audio_features[None]
    else:
        if mel.ndim == 2:
            mel = mel[None]
        audio_features, _ = model.embed_audio(
            mel, fp16=(dtype == jnp.bfloat16))

    logits, qk = decoder_forward_with_qk(
        model.params["decoder"],
        jnp.asarray(tokens[None]),
        audio_features,
        jnp.asarray(sel_slot),
        model.dims.n_text_head,
        n_sel,
        dtype,
    )
    logits = np.asarray(logits[0], np.float64)  # [S, V]

    sampled_logits = logits[len(tokenizer.sot_sequence) :, : tokenizer.eot]
    shifted = sampled_logits - sampled_logits.max(axis=-1, keepdims=True)
    token_probs = np.exp(shifted) / np.exp(shifted).sum(axis=-1, keepdims=True)
    text_token_probs = token_probs[np.arange(len(text_tokens)), text_tokens].tolist()

    # weight processing (timing.py:205-214): softmax over the valid frames,
    # per-head z-norm across tokens, median filter along frames
    weights = _process_qk_weights(
        jnp.asarray(qk)[0][None], num_frames, qk_scale, medfilt_width
    )[0]
    matrix = np.asarray(weights)
    matrix = matrix[len(tokenizer.sot_sequence) : -1]
    return _alignment_from_matrix(matrix, text_token_probs, tokenizer,
                                  text_tokens)


@functools.partial(
    jax.jit, static_argnames=("num_frames", "qk_scale", "medfilt_width")
)
def _process_qk_weights(qk, num_frames, qk_scale, medfilt_width, lens=None):
    """Reference weight chain on a [B, n_sel, S, F] qk stack (softmax over
    the valid frames, per-head z-norm across tokens, median filter along
    frames), head-averaged to [B, S, F'] — shared by the solo and batched
    alignment paths. Every row must share one num_frames.

    `lens` ([B] int32, batched path): per-row valid token counts — the
    z-norm statistics run over each row's valid positions only, matching
    what the solo path computes on its exact-length tensor (right-padded
    positions would otherwise pollute the per-head mean/std).

    jitted: the default alignment-head mask selects ALL heads of the last
    half of layers (320 for large-v1), so this chain's [B, n_sel, S, F]
    intermediates reach gigabytes — eager op-by-op execution materializes
    every step (measured RESOURCE_EXHAUSTED on a 16 GB chip at B=8);
    under jit XLA fuses the chain into a couple of live buffers.

    num_frames must be static (it sets the output shape), so each distinct
    valid-frame count compiles fresh. The batched path groups rows by
    num_frames; the solo path (WHISPER_AT_TPU_ALIGN=solo, streaming) pays
    one compile per distinct tail-window length — only final windows of a
    stream differ from 3000 frames, so churn is bounded at one compile per
    distinct recording length actually seen."""
    # the capture buffer may be bf16 (decoder_forward_with_qk stores in
    # the forward's precision class); the whole chain runs fp32 from here
    qk = qk.astype(jnp.float32)
    weights = qk[:, :, :, : num_frames // 2]
    weights = jnp.exp(
        weights * qk_scale
        - jnp.max(weights * qk_scale, axis=-1, keepdims=True)
    )
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    if lens is None:
        mean = jnp.mean(weights, axis=-2, keepdims=True)
        std = jnp.std(weights, axis=-2, keepdims=True)
    else:
        s = weights.shape[-2]
        valid = (jnp.arange(s)[None, :] < lens[:, None])[:, None, :, None]
        cnt = lens.astype(jnp.float32)[:, None, None, None]
        masked = jnp.where(valid, weights, 0.0)
        mean = jnp.sum(masked, axis=-2, keepdims=True) / cnt
        var = jnp.sum(
            jnp.where(valid, (weights - mean) ** 2, 0.0),
            axis=-2, keepdims=True,
        ) / cnt
        std = jnp.sqrt(var)
    weights = (weights - mean) / std
    weights = median_filter(weights, medfilt_width)
    return jnp.mean(weights, axis=1)


@functools.partial(jax.jit, static_argnames=("sl", "eot"))
def _token_probs_from_logits(logits, toks, sl, eot):
    """Per-position probability of the actually-sampled next token:
    exp(logit[target] - logsumexp(logits)) — identical math to softmax +
    gather, but fused so the [G, S, V] fp32 vocab axis reduces in one pass
    instead of materializing eager exp/sum/div copies (~750 MB each at
    large-v1 G=8). Position sl+i predicts text token i (solo path:
    sampled_logits = logits[sl:, :eot])."""
    lg = logits[:, sl:-1, :eot]
    tgt = jnp.minimum(toks[:, sl + 1:].astype(jnp.int32), eot - 1)
    tgt_logit = jnp.take_along_axis(lg, tgt[..., None], axis=-1)[..., 0]
    return jnp.exp(tgt_logit - jax.nn.logsumexp(lg, axis=-1))


def _alignment_from_matrix(matrix, text_token_probs, tokenizer, text_tokens):
    """DTW + word carving + duration heuristics on a processed
    [len(text)+1, F'] attention matrix — the host tail shared by
    find_alignment and find_alignment_batched."""
    text_indices, time_indices = dtw(-matrix)

    words, word_tokens = tokenizer.split_to_word_tokens(
        list(text_tokens) + [tokenizer.eot]
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


def find_alignment_batched(
    model,
    tokenizer: Tokenizer,
    text_tokens_list: List[List[int]],
    mels,
    num_frames_list: List[int],
    *,
    medfilt_width: int = 7,
    qk_scale: float = 1.0,
    audio_features=None,
) -> List[List[WordTiming]]:
    """Batched `find_alignment`: ONE encoder forward and ONE QK-capturing
    decoder forward for N windows (in the model's compute dtype — see
    _align_dtype), instead of a batch-1 pair (plus a full [S, V] logits
    pull) per window.

    Token rows are right-padded to a bucketed common length — exact for
    the valid positions under the causal mask (decoder_forward_with_qk
    docstring); the z-norm masks padding (``_process_qk_weights``). The
    per-token probabilities come from an on-device fp32 softmax where the
    solo path softmaxes float64 on host — ~1e-7-level differences, far
    below the 0.01 s rounding of the emitted word records (word TEXTS are
    unaffected: they derive from tokens, not the alignment). DTW and word
    carving stay per-window host work.

    mels: [N, 80, F_mel] stacked windows (array or list);
    num_frames_list: per-window valid frame counts. Empty token lists
    return [] rows without joining the device batch.

    audio_features: optional per-row encoder outputs ([N, F, D] array or
    list of [F, D] rows) already computed by the decode pass
    (DecodingResult.audio_features) — the SAME embed_audio output the
    alignment forward would recompute from `mels`, so passing it skips the
    whole encoder forward (the dominant cost of the words path). The
    reference has no batched analogue; its solo find_alignment likewise
    re-runs model(mel, tokens) per window (whisper_at/timing.py:185-191).
    """
    n = len(text_tokens_list)
    out: List[List[WordTiming]] = [[] for _ in range(n)]
    live = [i for i in range(n) if len(text_tokens_list[i]) > 0]
    if not live:
        return out

    sl = len(tokenizer.sot_sequence)
    head_mask = np.asarray(model.alignment_heads, bool)
    n_layer, n_head = head_mask.shape
    n_sel = int(head_mask.sum())
    sel_slot = np.full((n_layer, n_head), n_sel, np.int32)
    sel_slot[head_mask] = np.arange(n_sel)

    rows = [
        [*tokenizer.sot_sequence, tokenizer.no_timestamps,
         *text_tokens_list[i], tokenizer.eot]
        for i in live
    ]
    s_max = max(len(r) for r in rows)
    assert s_max <= model.dims.n_text_ctx, (
        f"window token sequence {s_max} exceeds n_text_ctx"
    )
    # bucket the padded length so fluctuating window texts reuse a few
    # compiled programs (the same ladder rationale as _batch_bucket)
    s_pad = min(-(-s_max // 64) * 64, model.dims.n_text_ctx)
    toks = np.full((len(live), s_pad), tokenizer.eot, np.int32)
    for j, r in enumerate(rows):
        toks[j, : len(r)] = r
    lens = np.asarray([len(r) for r in rows], np.int32)

    dtype = _align_dtype(model)
    if audio_features is not None:
        if isinstance(audio_features, (list, tuple)):
            audio_features = jnp.stack(
                [jnp.asarray(audio_features[i]) for i in live])
        else:
            audio_features = jnp.asarray(audio_features)[np.asarray(live)]
    else:
        mels = jnp.stack([jnp.asarray(m) for m in mels]) \
            if isinstance(mels, (list, tuple)) else jnp.asarray(mels)
        if mels.ndim == 2:
            mels = mels[None]
        audio_features, _ = model.embed_audio(
            mels[np.asarray(live)], fp16=(dtype == jnp.bfloat16))

    logits, qk = decoder_forward_with_qk(
        model.params["decoder"],
        jnp.asarray(toks),
        audio_features,
        jnp.asarray(sel_slot),
        model.dims.n_text_head,
        n_sel,
        dtype,
    )
    # per-token probabilities on device (fused gather + logsumexp); the
    # D2H pull is [G, S] instead of G x [S, V]
    text_probs = np.asarray(
        _token_probs_from_logits(logits, jnp.asarray(toks), sl,
                                 tokenizer.eot)
    )  # [G, s_pad - sl - 1]

    groups = {}
    for j, i in enumerate(live):
        groups.setdefault(int(num_frames_list[i]), []).append(j)
    for nf, idxs in groups.items():
        # all windows usually share one num_frames (full 30 s windows):
        # skip the gather copy of the multi-GB qk stack in that case
        sub = qk if len(idxs) == qk.shape[0] else qk[np.asarray(idxs)]
        w = np.asarray(_process_qk_weights(
            sub, nf, qk_scale, medfilt_width,
            lens=jnp.asarray(lens[np.asarray(idxs)]),
        ))  # [G, s_pad, F']
        for row, j in enumerate(idxs):
            i = live[j]
            text = text_tokens_list[i]
            matrix = w[row, sl : sl + len(text) + 1]
            out[i] = _alignment_from_matrix(
                matrix, text_probs[j, : len(text)].tolist(), tokenizer, text
            )
    return out


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
    _apply_alignment(segments, alignment, tokens_per_segment,
                     prepend_punctuations, append_punctuations)


def add_word_timestamps_many(
    *,
    window_jobs: List[Tuple[List[dict], "jnp.ndarray", int]],
    model,
    tokenizer: Tokenizer,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    **kwargs,
):
    """`add_word_timestamps` for MANY windows at once: one batched
    alignment forward (find_alignment_batched) replaces a batch-1 encoder
    + decoder pair per window; punctuation merge and word carving stay
    per window. window_jobs: (segments, mel_window [80, F], num_frames)
    triples — segments are modified in place — or 4-tuples with the
    window's decode-pass encoder features appended
    (DecodingResult.audio_features), which skip the encoder recompute
    entirely (see find_alignment_batched)."""
    jobs = [j for j in window_jobs if len(j[0]) > 0]
    if not jobs:
        return
    tok_lists = []
    seg_tok_lists = []
    for segments, *_ in jobs:
        per_seg = [
            [t for t in seg["tokens"] if t < tokenizer.eot]
            for seg in segments
        ]
        seg_tok_lists.append(per_seg)
        tok_lists.append([t for seg in per_seg for t in seg])

    # The QK capture is [G, n_sel, s_pad, n_audio_ctx] fp32. With the
    # DEFAULT alignment-head mask (all heads of the last half of layers —
    # 320 for large-v1) that is ~860 MB PER ROW at s_pad=448, so a fixed
    # G OOMs a 16 GB chip; real released masks select ~10-25 heads and
    # pack many rows per forward. Greedily pack rows under a byte budget.
    # find_alignment_batched pads every row in a chunk to the chunk-max
    # bucketed length, so the chunk is costed at max_bucket * n_rows (not
    # each row's own bucket), and rows are packed in bucketed-length order
    # so one long row doesn't inflate a chunk of short ones.
    sl = len(tokenizer.sot_sequence)
    n_sel = max(int(np.asarray(model.alignment_heads, bool).sum()), 1)
    per_s_bytes = n_sel * model.dims.n_audio_ctx * 4
    buckets = [
        min(-(-(len(t) + sl + 2) // 64) * 64, model.dims.n_text_ctx)
        for t in tok_lists
    ]
    budget = 1.2e9  # qk bytes; the jitted weight chain peaks at ~2-3x this
    order = sorted(range(len(buckets)), key=buckets.__getitem__)
    chunks, cur, cur_max = [], [], 0
    for i in order:
        new_max = max(cur_max, buckets[i])
        if cur and per_s_bytes * new_max * (len(cur) + 1) > budget:
            chunks.append(cur)
            cur, new_max = [], buckets[i]
        cur.append(i)
        cur_max = new_max
    if cur:
        chunks.append(cur)

    alignments = [None] * len(jobs)
    have_feats = all(len(j) >= 4 and j[3] is not None for j in jobs)
    for idxs in chunks:
        sub = find_alignment_batched(
            model, tokenizer, [tok_lists[i] for i in idxs],
            [jobs[i][1] for i in idxs],
            [jobs[i][2] for i in idxs],
            audio_features=(
                [jobs[i][3] for i in idxs] if have_feats else None),
            **kwargs,
        )
        for i, a in zip(idxs, sub):
            alignments[i] = a
    for (segments, *_), alignment, per_seg in zip(
        jobs, alignments, seg_tok_lists
    ):
        _apply_alignment(segments, alignment, per_seg,
                         prepend_punctuations, append_punctuations)


def _apply_alignment(segments, alignment, tokens_per_segment,
                     prepend_punctuations, append_punctuations):
    """Punctuation merge + per-segment word carving + boundary snapping
    (the host tail shared by the solo and batched attach paths)."""
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
