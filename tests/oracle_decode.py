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
    tokens = np.tile(np.asarray(initial_tokens, np.int64), (b, 1))
    sample_begin = len(initial_tokens)
    sot_index = list(initial_tokens).index(tokenizer.sot)
    sum_logprobs = np.zeros(b)
    no_speech_probs = None
    n_ctx = model.dims.n_text_ctx

    for i in range(sample_len):
        logits_all = np.asarray(
            model.logits(jnp.asarray(tokens, jnp.int32), audio_features, fp16=False)
        ).astype(np.float64)
        if i == 0 and tokenizer.no_speech is not None:
            probs_at_sot = np.exp(log_softmax(logits_all[:, sot_index]))
            no_speech_probs = probs_at_sot[:, tokenizer.no_speech]

        logits = logits_all[:, -1].copy()
        sampled = [row[sample_begin:].tolist() for row in tokens]
        logits = apply_filters_np(
            logits, sampled, tokenizer, suppress_tokens,
            max_initial_ts_index, suppress_blank, with_ts_rules, blank_token,
        )

        next_tokens = logits.argmax(axis=-1)
        logprobs = log_softmax(logits)
        current = logprobs[np.arange(b), next_tokens]
        not_finished = tokens[:, -1] != eot
        sum_logprobs += current * not_finished
        next_tokens[tokens[:, -1] == eot] = eot
        tokens = np.concatenate([tokens, next_tokens[:, None]], axis=1)
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
