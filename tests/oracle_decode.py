"""Test-only greedy-decode oracle in plain numpy.

Re-derives the reference decode semantics (whisper_at/decoding.py:266-292
GreedyDecoder, 417-499 logit filters, 672-703 main loop) token-for-token,
using the model's full (non-incremental) forward for logits. The jitted
device loop must match this exactly at temperature 0.
"""

from typing import List, Optional

import jax.numpy as jnp
import numpy as np


def log_softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def apply_filters_np(
    logits: np.ndarray,  # [B, V]
    sampled: List[List[int]],  # sampled tokens per row
    tokenizer,
    suppress_tokens,
    max_initial_ts_index: Optional[int],
    suppress_blank: bool,
    with_ts_rules: bool,
    blank_token: int,
):
    eot = tokenizer.eot
    ts_begin = tokenizer.timestamp_begin

    if suppress_blank and len(sampled[0]) == 0:
        logits[:, [blank_token, eot]] = -np.inf

    logits[:, list(suppress_tokens)] = -np.inf

    if with_ts_rules:
        logits[:, tokenizer.no_timestamps] = -np.inf
        for k in range(logits.shape[0]):
            seq = sampled[k]
            last_was = len(seq) >= 1 and seq[-1] >= ts_begin
            penult_was = len(seq) < 2 or seq[-2] >= ts_begin
            if last_was:
                if penult_was:
                    logits[k, ts_begin:] = -np.inf
                else:
                    logits[k, :eot] = -np.inf
            timestamps = [t for t in seq if t >= ts_begin]
            if timestamps:
                if last_was and not penult_was:
                    timestamp_last = timestamps[-1]
                else:
                    timestamp_last = timestamps[-1] + 1
                logits[k, ts_begin:timestamp_last] = -np.inf

        if len(sampled[0]) == 0:
            logits[:, :ts_begin] = -np.inf
            if max_initial_ts_index is not None:
                logits[:, ts_begin + max_initial_ts_index + 1 :] = -np.inf

        logprobs = log_softmax(logits.astype(np.float64))
        for k in range(logits.shape[0]):
            ts_logprob = np.logaddexp.reduce(logprobs[k, ts_begin:])
            max_text = logprobs[k, :ts_begin].max()
            if ts_logprob > max_text:
                logits[k, :ts_begin] = -np.inf

    return logits


def greedy_decode_oracle(
    model,
    audio_features,
    initial_tokens,
    tokenizer,
    suppress_tokens,
    sample_len: int,
    max_initial_ts_index: Optional[int] = 50,
    suppress_blank: bool = True,
    with_ts_rules: bool = True,
):
    """Returns (tokens [list per row], sum_logprobs, no_speech_probs)."""
    b = audio_features.shape[0]
    eot = tokenizer.eot
    blank_token = tokenizer.encode(" ")[0]
    sample_begin = len(initial_tokens)
    sot_index = list(initial_tokens).index(tokenizer.sot)
    sum_logprobs = np.zeros(b)
    no_speech_probs = None
    n_ctx = model.dims.n_text_ctx

    # fixed-width buffer: causal logits at filled positions are unaffected by
    # the zero padding behind them, so one compiled shape serves every step
    buf_len = sample_begin + sample_len
    buf = np.zeros((b, buf_len), np.int64)
    buf[:, :sample_begin] = np.asarray(initial_tokens, np.int64)
    tokens = buf[:, :sample_begin]

    for i in range(sample_len):
        cur = sample_begin + i
        logits_all = np.asarray(
            model.logits(jnp.asarray(buf, jnp.int32), audio_features, fp16=False)
        ).astype(np.float64)
        if i == 0 and tokenizer.no_speech is not None:
            probs_at_sot = np.exp(log_softmax(logits_all[:, sot_index]))
            no_speech_probs = probs_at_sot[:, tokenizer.no_speech]

        logits = logits_all[:, cur - 1].copy()
        sampled = [row[sample_begin:].tolist() for row in tokens]
        logits = apply_filters_np(
            logits, sampled, tokenizer, suppress_tokens,
            max_initial_ts_index, suppress_blank, with_ts_rules, blank_token,
        )

        next_tokens = logits.argmax(axis=-1)
        logprobs = log_softmax(logits)
        current = logprobs[np.arange(b), next_tokens]
        prev = buf[:, cur - 1]
        not_finished = prev != eot if i > 0 else np.ones(b, bool)
        sum_logprobs += current * not_finished
        next_tokens[~not_finished] = eot
        buf[:, cur] = next_tokens
        tokens = buf[:, : cur + 1]
        if (tokens[:, -1] == eot).all() or tokens.shape[1] > n_ctx:
            break

    # finalize: pad one EOT, cut at first EOT after sample_begin
    tokens = np.concatenate(
        [tokens, np.full((b, 1), eot, np.int64)], axis=1
    )
    out = []
    for row in tokens:
        rest = row[sample_begin:]
        end = int(np.argmax(rest == eot))
        out.append(rest[:end].tolist())
    return out, sum_logprobs, no_speech_probs


def beam_decode_oracle(
    model,
    audio_features,  # [1, Ta, D] — single audio
    initial_tokens,
    tokenizer,
    suppress_tokens,
    sample_len: int,
    beam_size: int,
    patience: float = 1.0,
    max_initial_ts_index: Optional[int] = 50,
    with_ts_rules: bool = True,
):
    """Reference beam-search semantics (whisper_at/decoding.py:295-398) in
    numpy with dict bookkeeping, for a single audio. Returns the ranked
    candidate list [(tokens, sum_logprob)]."""
    eot = tokenizer.eot
    blank_token = tokenizer.encode(" ")[0]
    max_candidates = round(beam_size * patience)
    sample_begin = len(initial_tokens)
    tokens = np.tile(np.asarray(initial_tokens, np.int64), (beam_size, 1))
    sum_logprobs = np.zeros(beam_size)
    finished_sequences = {}
    feats = jnp.repeat(audio_features, beam_size, axis=0)
    buf_len = sample_begin + sample_len

    for i in range(sample_len):
        cur = tokens.shape[1]
        buf = np.zeros((beam_size, buf_len), np.int64)
        buf[:, :cur] = tokens
        logits_all = np.asarray(
            model.logits(jnp.asarray(buf, jnp.int32), feats, fp16=False)
        ).astype(np.float64)
        logits = logits_all[:, cur - 1].copy()
        sampled = [row[sample_begin:].tolist() for row in tokens]
        logits = apply_filters_np(
            logits, sampled, tokenizer, suppress_tokens,
            max_initial_ts_index if len(sampled[0]) == 0 else max_initial_ts_index,
            True, with_ts_rules, blank_token,
        )
        logprobs = log_softmax(logits)

        scores, sources = {}, {}
        finished_step = {}
        for j in range(beam_size):
            for k_idx in np.argsort(logprobs[j])[::-1][: beam_size + 1]:
                new_lp = sum_logprobs[j] + logprobs[j, k_idx]
                seq = tuple(tokens[j].tolist() + [int(k_idx)])
                scores[seq] = new_lp
                sources[seq] = j

        next_beams, new_lps = [], []
        for seq in sorted(scores, key=scores.get, reverse=True):
            if seq[-1] == eot:
                finished_step[seq] = scores[seq]
            else:
                new_lps.append(scores[seq])
                next_beams.append(seq)
                if len(next_beams) == beam_size:
                    break

        tokens = np.asarray(next_beams, np.int64)
        sum_logprobs = np.asarray(new_lps)
        for seq in sorted(finished_step, key=finished_step.get, reverse=True):
            if len(finished_sequences) >= max_candidates:
                break
            finished_sequences[seq] = finished_step[seq]

        if len(finished_sequences) >= max_candidates:
            break

    # finalize
    if len(finished_sequences) < beam_size:
        for j in np.argsort(sum_logprobs)[::-1]:
            seq = tuple(tokens[j].tolist() + [eot])
            finished_sequences[seq] = sum_logprobs[j]
            if len(finished_sequences) >= beam_size:
                break

    out = []
    for seq, lp in finished_sequences.items():
        rest = list(seq[sample_begin:])
        end = rest.index(eot) if eot in rest else len(rest)
        out.append((rest[:end], float(lp)))
    return out
