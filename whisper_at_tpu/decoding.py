"""Decoding engine: options, vectorized logit filters, jitted sampling loops.

Re-design of the reference decoding stack (whisper_at/decoding.py) for XLA:

* the token-at-a-time Python loop with hook-based KV cache
  (decoding.py:672-703) becomes a `lax.while_loop` whose carry holds the
  token buffer, KV cache, and filter state — the whole 30 s decode is ONE
  device program with no host round-trips;
* the per-row Python timestamp rules (decoding.py:446-499) become pure
  tensor ops on [B, V] logits;
* variable-length prompts are bucketed into a fixed prefill size so prompt
  changes across transcribe windows never trigger recompilation;
* beams/best-of ride the batch axis.
"""

from dataclasses import dataclass, field, replace
from functools import lru_cache, partial
from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .audio import CHUNK_LENGTH
from .models.decoder import (
    cross_kv_payload,
    decoder_forward,
    decoder_forward_rows,
    init_cache,
    precompute_cross_kv,
    project_logits,
)
from .tokenizer import Tokenizer, get_tokenizer
from .utils import compression_ratio

NEG_INF = float("-inf")

# diagnostics from the most recent speculative decode in the CURRENT THREAD
# (tools/profile_spec.py, bench informational row). Thread-local so concurrent
# StreamingService worker decodes can't interleave each other's stats; module
# attribute access (`decoding._LAST_SPEC_STATS`) resolves through the PEP-562
# __getattr__ below, preserving the established read-site API.
import threading as _threading

_SPEC_STATS_TLS = _threading.local()


def _set_last_spec_stats(stats: dict) -> None:
    _SPEC_STATS_TLS.stats = stats


def __getattr__(name: str):
    if name == "_LAST_SPEC_STATS":
        return getattr(_SPEC_STATS_TLS, "stats", None)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


@dataclass(frozen=True)
class DecodingOptions:
    # whether to perform X->X "transcribe" or X->English "translate"
    task: str = "transcribe"
    # language that the audio is in; uses detected language if None
    language: Optional[str] = None

    # sampling-related options
    temperature: float = 0.0
    sample_len: Optional[int] = None  # maximum number of tokens to sample
    best_of: Optional[int] = None  # independent sample trajectories if t > 0
    beam_size: Optional[int] = None  # beams in beam search if t == 0
    patience: Optional[float] = None  # beam search patience (arxiv:2204.05424)

    # "alpha" in Google NMT, or None for length norm, when ranking generations
    length_penalty: Optional[float] = None

    # text or tokens to feed as the prompt or the prefix
    prompt: Optional[Union[str, List[int]]] = None
    prefix: Optional[Union[str, List[int]]] = None

    # token suppression; "-1" expands to the tokenizer's non-speech set
    suppress_tokens: Optional[Union[str, Iterable[int]]] = "-1"
    suppress_blank: bool = True

    # timestamp sampling options
    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0

    # half precision (bfloat16 on TPU); name kept for API parity
    fp16: bool = True

    # int8-quantize the cross-attention KV (halves the dominant decode-loop
    # HBM stream; per-position scales keep the attention math exact up to
    # int8 rounding of K/V). Off by default pending real-checkpoint parity.
    kv_quant: bool = False
    # int8-quantize the decoder matmul weights (per-output-channel scales);
    # halves the weight stream. Off by default pending real-checkpoint parity.
    weight_quant: bool = False
    # weight quantization width when weight_quant is on: 8 (int8) or 4
    # (+-7 levels packed two per byte along the out axis — halves the
    # weight stream AGAIN; parity budget via tools/quant_divergence.py).
    weight_bits: int = 8
    # int8-quantize the SELF-attention KV cache (per-slot scales). Matters
    # most in beam search, where the whole cache is re-gathered along the
    # beam axis every step. Off by default pending real-checkpoint parity.
    self_kv_quant: bool = False
    # self-KV quantization width when self_kv_quant is on: 8 or 4 (packed
    # two per byte along Dh — the beam permute re-streams the whole self
    # cache every step, so bytes are the cost).
    self_kv_bits: int = 8
    # cross-KV tensor layout: None = auto ("fused" pallas-kernel layout on
    # TPU when kv_quant, "heads" elsewhere); tests force "fused" on CPU to
    # exercise the kernel path (interpret mode) end to end.
    kv_layout: Optional[str] = None
    # cross-KV quantization width: 8 (int8) or 4 (two values per HBM byte,
    # halving the dominant decode stream again; coarser levels, parity
    # budget via tools/quant_divergence.py). With the fused layout the
    # pallas kernel unpacks Ta-halves nibbles in-VMEM (free: the kernel is
    # DMA-bound); the heads layout uses jnp.int4 via XLA.
    kv_bits: int = 8

    # speculative greedy decoding: a small Whisper model (e.g. tiny/base)
    # drafts `draft_lookahead` tokens per round and this model verifies the
    # whole run in ONE forward. T=0 EXACT — output tokens are identical to
    # plain greedy regardless of draft quality (spec_sample_loop); the
    # draft only sets the speed. Requires temperature 0, no beam/best_of.
    draft_model: Optional[object] = None
    draft_lookahead: int = 8


@dataclass(frozen=False)
class DecodingResult:
    audio_features: object
    audio_features_for_at: object  # stacked pooled encoder reps for tagging
    language: str
    language_probs: Optional[Dict[str, float]] = None
    tokens: List[int] = field(default_factory=list)
    text: str = ""
    avg_logprob: float = np.nan
    no_speech_prob: float = np.nan
    temperature: float = np.nan
    compression_ratio: float = np.nan


# --------------------------------------------------------------------------- #
# vectorized logit filters
# --------------------------------------------------------------------------- #


def apply_logit_filters(
    logits: jnp.ndarray,  # [B, V] fp32
    t: jnp.ndarray,  # scalar int32 (or per-row [B]): sampled tokens so far
    prev1: jnp.ndarray,  # [B] token at sampled position t-1 (undefined t<1)
    prev2: jnp.ndarray,  # [B] token at sampled position t-2 (undefined t<2)
    last_ts: jnp.ndarray,  # [B] most recent sampled timestamp token (or -1)
    suppress_mask: jnp.ndarray,  # [V] additive 0/-inf (SuppressTokens)
    *,
    eot: int,
    ts_begin: int,
    blank_token: int,
    max_initial_ts_index: Optional[int],
    suppress_blank: bool,
    with_ts_rules: bool,
) -> jnp.ndarray:
    """All reference logit filters as one pure tensor function.

    Order matches whisper_at/decoding.py:545-561: SuppressBlank,
    SuppressTokens, ApplyTimestampRules. `t` may be per-row ([B]) — the
    speculative loop's rows advance at different rates.
    """
    v = logits.shape[-1]
    idx = jnp.arange(v, dtype=jnp.int32)[None, :]  # [1, V]
    t = jnp.asarray(t)
    at_start = t == 0
    if at_start.ndim == 1:
        at_start = at_start[:, None]  # [B, 1], broadcasts against [1, V]

    if suppress_blank:
        blank = (idx == blank_token) | (idx == eot)
        logits = jnp.where(at_start & blank, NEG_INF, logits)

    logits = logits + suppress_mask[None, :]

    if with_ts_rules:
        # suppress <|notimestamps|> (always; whisper_at/decoding.py:447-449)
        logits = jnp.where(idx == ts_begin - 1, NEG_INF, logits)

        last_was = (t >= 1) & (prev1 >= ts_begin)
        penult_was = (t < 2) | (prev2 >= ts_begin)
        last_was = last_was[:, None]
        penult_was = penult_was[:, None]

        # timestamps appear in pairs, except directly before EOT
        logits = jnp.where(last_was & penult_was & (idx >= ts_begin), NEG_INF, logits)
        logits = jnp.where(last_was & ~penult_was & (idx < eot), NEG_INF, logits)

        # timestamps must be non-decreasing; forbid earlier timestamps
        have_ts = (last_ts >= 0)[:, None]
        cut = jnp.where(
            (last_was & ~penult_was)[:, 0], last_ts, last_ts + 1
        )[:, None]
        logits = jnp.where(
            have_ts & (idx >= ts_begin) & (idx < cut), NEG_INF, logits
        )

        # at the very beginning: only timestamps, bounded by max_initial
        logits = jnp.where(at_start & (idx < ts_begin), NEG_INF, logits)
        if max_initial_ts_index is not None:
            last_allowed = ts_begin + max_initial_ts_index
            logits = jnp.where(at_start & (idx > last_allowed), NEG_INF, logits)

        # if total timestamp probability beats any text token, force timestamp.
        # The reference compares log_softmax outputs (logsumexp of the ts
        # region vs max text logprob) — but the softmax normalizer cancels
        # from both sides, so the comparison runs on the raw logits: one
        # log_softmax materialization less per decode step.
        ts_logprob = jax.nn.logsumexp(
            jnp.where(idx >= ts_begin, logits, NEG_INF), axis=-1
        )
        max_text = jnp.max(
            jnp.where(idx < ts_begin, logits, NEG_INF), axis=-1
        )
        force_ts = (ts_logprob > max_text)[:, None]
        logits = jnp.where(force_ts & (idx < ts_begin), NEG_INF, logits)

    return logits


# --------------------------------------------------------------------------- #
# jitted greedy loop
# --------------------------------------------------------------------------- #


@partial(
    jax.jit,
    static_argnames=(
        "prefill",
        "total",
        "max_steps",
        "n_head",
        "compute_dtype",
        "eot",
        "ts_begin",
        "blank_token",
        "no_speech_id",
        "max_initial_ts_index",
        "suppress_blank",
        "with_ts_rules",
        "self_kv_quant",
        "self_kv_bits",
    ),
)
def greedy_sample_loop(
    dec_params: dict,
    cross_k: jnp.ndarray,
    cross_v: jnp.ndarray,
    buf_init: jnp.ndarray,  # [B, total] int32, initial tokens in [pad, prefill)
    pad: jnp.ndarray,  # scalar int32
    sot_slot: jnp.ndarray,  # scalar int32: buffer slot of <|sot|>
    suppress_mask: jnp.ndarray,  # [V] fp32 additive
    temperature: jnp.ndarray,  # scalar fp32 (0 => argmax)
    key: jnp.ndarray,  # PRNG key
    *,
    prefill: int,
    total: int,
    max_steps: int,
    n_head: int,
    compute_dtype,
    eot: int,
    ts_begin: int,
    blank_token: int,
    no_speech_id: Optional[int],
    max_initial_ts_index: Optional[int],
    suppress_blank: bool,
    with_ts_rules: bool,
    self_kv_quant: bool = False,
    self_kv_bits: int = 8,
):
    """Greedy / temperature sampling of up to max_steps tokens, fully on device.

    Returns (tokens [B, total], sum_logprobs [B], no_speech_probs [B], n_steps).
    Sampled tokens occupy slots [prefill, prefill + n_steps).
    """
    _ck_arr = cross_kv_payload(cross_k)
    n_layer, b = _ck_arr.shape[0], buf_init.shape[0]
    # rows per shared audio (best-of groups): cross tensors keep one row per
    # audio; the decoder folds grouped rows into the attention sequence axis
    group = b // _ck_arr.shape[1]
    # H*Dh: heads layout [L, A, H, Dh, Ta] vs fused [L, A, H*Dh, Ta_pad]
    d = (_ck_arr.shape[2] if _ck_arr.ndim == 4
         else _ck_arr.shape[2] * _ck_arr.shape[3])
    self_k, self_v = init_cache(n_layer, b, total, d, compute_dtype, n_head,
                            quantize=self_kv_quant, bits=self_kv_bits)

    hidden, self_k, self_v = decoder_forward(
        dec_params, buf_init[:, :prefill], cross_k, cross_v, self_k, self_v,
        jnp.int32(0), pad, n_head, compute_dtype, group=group,
    )

    if no_speech_id is not None:
        sot_hidden = jnp.take_along_axis(
            hidden, sot_slot[None, None, None].astype(jnp.int32) * jnp.ones(
                (b, 1, 1), jnp.int32
            ), axis=1,
        )
        sot_logits = project_logits(dec_params, sot_hidden)[:, 0]
        no_speech_probs = jax.nn.softmax(sot_logits, axis=-1)[:, no_speech_id]
    else:
        no_speech_probs = jnp.full((b,), jnp.nan, jnp.float32)

    logits0 = project_logits(dec_params, hidden[:, -1:])[:, 0]

    def cond(state):
        t, _, _, _, _, _, _, finished, _ = state
        return (t < max_steps) & ~jnp.all(finished)

    def body(state):
        t, buf, self_k, self_v, logits, sum_lp, last_ts, finished, key = state

        slot = prefill + t
        prev1 = buf[:, slot - 1] * (t >= 1)  # garbage when t<1, unused then
        prev2 = buf[:, jnp.maximum(slot - 2, 0)]
        filtered = apply_logit_filters(
            logits, t, prev1, prev2, last_ts, suppress_mask,
            eot=eot, ts_begin=ts_begin, blank_token=blank_token,
            max_initial_ts_index=max_initial_ts_index,
            suppress_blank=suppress_blank, with_ts_rules=with_ts_rules,
        )

        key, sub = jax.random.split(key)
        # gumbel sampling only runs when temperature > 0: lax.cond executes
        # one branch at runtime, so the greedy path (the common case, and
        # every fallback rung at T=0) skips the [B, V] PRNG + perturb + extra
        # reduction entirely
        next_tok = jax.lax.cond(
            temperature == 0.0,
            lambda: jnp.argmax(filtered, axis=-1).astype(jnp.int32),
            lambda: jax.random.categorical(
                sub, filtered / jnp.maximum(temperature, 1e-6)
            ).astype(jnp.int32),
        )

        # token logprob without materializing the [B, V] log_softmax:
        # lp[tok] = filtered[tok] - logsumexp(filtered)
        picked = jnp.take_along_axis(filtered, next_tok[:, None], axis=1)[:, 0]
        current_lp = picked - jax.nn.logsumexp(filtered, axis=-1)
        # accumulate while the *previous* token wasn't EOT (decoding.py:281)
        prev_is_eot = finished
        sum_lp = sum_lp + current_lp * (~prev_is_eot)
        next_tok = jnp.where(prev_is_eot, eot, next_tok)

        buf = jax.lax.dynamic_update_slice(buf, next_tok[:, None], (0, slot))
        is_ts = (next_tok >= ts_begin) & ~prev_is_eot
        last_ts = jnp.where(is_ts, next_tok, last_ts)
        finished = finished | (next_tok == eot)

        hidden, self_k, self_v = decoder_forward(
            dec_params, next_tok[:, None], cross_k, cross_v, self_k, self_v,
            slot, pad, n_head, compute_dtype, group=group,
        )
        logits = project_logits(dec_params, hidden)[:, 0]
        return (t + 1, buf, self_k, self_v, logits, sum_lp, last_ts, finished, key)

    init_state = (
        jnp.int32(0),
        buf_init,
        self_k,
        self_v,
        logits0,
        jnp.zeros((b,), jnp.float32),
        jnp.full((b,), -1, jnp.int32),
        jnp.zeros((b,), bool),
        key,
    )
    t, buf, _, _, _, sum_lp, _, finished, _ = jax.lax.while_loop(
        cond, body, init_state
    )
    return buf, sum_lp, no_speech_probs, t


# --------------------------------------------------------------------------- #
# speculative greedy decoding (draft-and-verify)
# --------------------------------------------------------------------------- #


@partial(
    jax.jit,
    static_argnames=(
        "prefill",
        "total",
        "max_steps",
        "lookahead",
        "n_head",
        "n_head_draft",
        "compute_dtype",
        "eot",
        "ts_begin",
        "blank_token",
        "no_speech_id",
        "max_initial_ts_index",
        "suppress_blank",
        "with_ts_rules",
    ),
)
def spec_sample_loop(
    dec_params: dict,
    cross_k,
    cross_v,
    draft_params: dict,
    draft_ck,
    draft_cv,
    buf_init: jnp.ndarray,  # [B, total] int32, initial tokens in [pad, prefill)
    pad: jnp.ndarray,  # scalar int32
    sot_slot: jnp.ndarray,  # scalar int32
    suppress_mask: jnp.ndarray,  # [V]
    *,
    prefill: int,
    total: int,
    max_steps: int,
    lookahead: int,  # draft proposals per round (L)
    n_head: int,
    n_head_draft: int,
    compute_dtype,
    eot: int,
    ts_begin: int,
    blank_token: int,
    no_speech_id: Optional[int],
    max_initial_ts_index: Optional[int],
    suppress_blank: bool,
    with_ts_rules: bool,
):
    """Greedy decoding via draft-and-verify speculation, fully on device.

    T=0 EXACT: every committed token is the verifier's filtered argmax given
    the committed prefix, so the output is token-identical to
    greedy_sample_loop regardless of draft quality (the draft only sets the
    SPEED — agreement lengthens the accepted run per verifier pass). The
    reference hot loop being replaced: whisper_at/decoding.py:672-703 (one
    verifier forward per token -> one verifier forward per accepted run).

    Rows advance at PER-ROW rates (each row accepts a different number of
    draft tokens per round), so all forwards go through
    decoder_forward_rows with per-row write positions.

    Round invariants (cp = next slot to commit, per row):
      - verifier cache valid over [pad, cp-1); the token at cp-1 (the last
        correction) is pending ingestion and leads the verify forward;
      - draft cache valid over [pad, cp-2]; the draft's first forward each
        round re-ingests slots {cp-2, cp-1} (identical recompute when the
        slot was valid, repair when the previous round ended in a full
        accept or correction).

    Returns (tokens [B, total], sum_logprobs [B], no_speech_probs [B],
    n_steps, n_rounds, n_commits).
    """
    b = buf_init.shape[0]
    L = lookahead
    cache_ctx = total + L + 1
    d_draft = draft_params["token_embedding"].shape[1]
    d_ver = dec_params["token_embedding"].shape[1]
    n_layer_v = cross_kv_payload(cross_k).shape[0]
    n_layer_d = cross_kv_payload(draft_ck).shape[0]

    v_self_k, v_self_v = init_cache(
        n_layer_v, b, cache_ctx, d_ver, compute_dtype, n_head
    )
    d_self_k, d_self_v = init_cache(
        n_layer_d, b, cache_ctx, d_draft, compute_dtype, n_head_draft
    )

    filt_kw = dict(
        eot=eot, ts_begin=ts_begin, blank_token=blank_token,
        max_initial_ts_index=max_initial_ts_index,
        suppress_blank=suppress_blank, with_ts_rules=with_ts_rules,
    )
    cols = jnp.arange(total, dtype=jnp.int32)[None, :]  # [1, total]

    # ---- prefills (uniform positions) --------------------------------- #
    hidden, v_self_k, v_self_v = decoder_forward(
        dec_params, buf_init[:, :prefill], cross_k, cross_v,
        v_self_k, v_self_v, jnp.int32(0), pad, n_head, compute_dtype,
    )
    if no_speech_id is not None:
        sot_hidden = jnp.take_along_axis(
            hidden, sot_slot[None, None, None].astype(jnp.int32) * jnp.ones(
                (b, 1, 1), jnp.int32
            ), axis=1,
        )
        sot_logits = project_logits(dec_params, sot_hidden)[:, 0]
        no_speech_probs = jax.nn.softmax(sot_logits, axis=-1)[:, no_speech_id]
    else:
        no_speech_probs = jnp.full((b,), jnp.nan, jnp.float32)
    logits0 = project_logits(dec_params, hidden[:, -1:])[:, 0]

    _, d_self_k, d_self_v = decoder_forward(
        draft_params, buf_init[:, :prefill], draft_ck, draft_cv,
        d_self_k, d_self_v, jnp.int32(0), pad, n_head_draft, compute_dtype,
    )

    if max_steps < 1:  # degenerate sample_len: nothing to sample
        return (buf_init, jnp.zeros((b,), jnp.float32), no_speech_probs,
                jnp.int32(0), jnp.int32(0), jnp.int32(0))

    # ---- first token: the verifier's own argmax (no draft involved) ---- #
    zeros_b = jnp.zeros((b,), jnp.int32)
    filtered0 = apply_logit_filters(
        logits0, zeros_b, zeros_b, zeros_b,
        jnp.full((b,), -1, jnp.int32), suppress_mask, **filt_kw,
    )
    c0 = jnp.argmax(filtered0, axis=-1).astype(jnp.int32)
    lp0 = (jnp.take_along_axis(filtered0, c0[:, None], axis=1)[:, 0]
           - jax.nn.logsumexp(filtered0, axis=-1))
    buf = jax.lax.dynamic_update_slice(buf_init, c0[:, None], (0, prefill))
    cp = jnp.full((b,), prefill + 1, jnp.int32)
    sum_lp = lp0
    last_ts = jnp.where(c0 >= ts_begin, c0, -1)
    finished = c0 == eot

    def cond(state):
        cp, _, _, _, finished = state[:5]
        return jnp.any(~finished & (cp - prefill < max_steps))

    def body(state):
        (cp, buf, sum_lp, last_ts, finished, v_self_k, v_self_v,
         d_self_k, d_self_v, rounds, commits) = state

        tminus1 = jnp.take_along_axis(buf, (cp - 1)[:, None], axis=1)[:, 0]
        tminus2 = jnp.take_along_axis(buf, (cp - 2)[:, None], axis=1)[:, 0]

        # ---- draft phase: propose L tokens ---------------------------- #
        ingest = jnp.stack([tminus2, tminus1], axis=1)  # [B, 2]
        dh, d_self_k2, d_self_v2 = decoder_forward_rows(
            draft_params, ingest, draft_ck, draft_cv, d_self_k, d_self_v,
            cp - 2, pad, n_head_draft, compute_dtype,
        )
        dlogits = project_logits(draft_params, dh[:, -1:])[:, 0]

        def draft_step(carry, i):
            dlogits, dsk, dsv, p1, p2, lts = carry
            f = apply_logit_filters(
                dlogits, cp - prefill + i, p1, p2, lts, suppress_mask,
                **filt_kw,
            )
            d = jnp.argmax(f, axis=-1).astype(jnp.int32)
            h, dsk, dsv = decoder_forward_rows(
                draft_params, d[:, None], draft_ck, draft_cv, dsk, dsv,
                cp + i, pad, n_head_draft, compute_dtype,
            )
            new_logits = project_logits(draft_params, h)[:, 0]
            lts = jnp.where(d >= ts_begin, d, lts)
            return (new_logits, dsk, dsv, d, p1, lts), d

        (_, d_self_k2, d_self_v2, _, _, _), drafts = jax.lax.scan(
            draft_step,
            (dlogits, d_self_k2, d_self_v2, tminus1, tminus2, last_ts),
            jnp.arange(L, dtype=jnp.int32),
        )
        drafts = drafts.T  # [B, L]

        # ---- verify phase: one forward over [c, d1..dL] --------------- #
        vtokens = jnp.concatenate([tminus1[:, None], drafts], axis=1)
        vh, v_self_k, v_self_v = decoder_forward_rows(
            dec_params, vtokens, cross_k, cross_v, v_self_k, v_self_v,
            cp - 1, pad, n_head, compute_dtype,
        )
        vlogits = project_logits(dec_params, vh)  # [B, L+1, V]

        # ---- acceptance: commit agreeing drafts + one correction ------ #
        remaining = max_steps - (cp - prefill)
        open_i = ~finished & (remaining > 0)
        p1, p2, lts = tminus1, tminus2, last_ts
        new_cp, new_sum, new_fin = cp, sum_lp, finished
        new_buf, ncommit = buf, jnp.zeros((b,), jnp.int32)
        for i in range(L + 1):
            f = apply_logit_filters(
                vlogits[:, i], cp - prefill + i, p1, p2, lts,
                suppress_mask, **filt_kw,
            )
            a = jnp.argmax(f, axis=-1).astype(jnp.int32)
            lp = (jnp.take_along_axis(f, a[:, None], axis=1)[:, 0]
                  - jax.nn.logsumexp(f, axis=-1))
            commit = open_i
            new_buf = jnp.where(
                commit[:, None] & (cols == (cp + i)[:, None]),
                a[:, None], new_buf,
            )
            new_sum = new_sum + lp * commit
            lts = jnp.where(commit & (a >= ts_begin), a, lts)
            new_fin = new_fin | (commit & (a == eot))
            ncommit = ncommit + commit
            p2, p1 = p1, a
            if i < L:
                open_i = (open_i & (drafts[:, i] == a) & (a != eot)
                          & (i + 1 < remaining))
        new_cp = cp + ncommit
        new_lts = lts  # only commit-masked updates were applied

        return (new_cp, new_buf, new_sum, new_lts, new_fin,
                v_self_k, v_self_v, d_self_k2, d_self_v2,
                rounds + 1, commits + jnp.sum(ncommit.astype(jnp.int32)))

    init_state = (cp, buf, sum_lp, last_ts, finished, v_self_k, v_self_v,
                  d_self_k, d_self_v, jnp.int32(0), jnp.int32(b))
    (cp, buf, sum_lp, _, finished, _, _, _, _, rounds, commits) = (
        jax.lax.while_loop(cond, body, init_state)
    )
    n_steps = jnp.max(cp) - prefill
    return buf, sum_lp, no_speech_probs, n_steps, rounds, commits


# ablation seams (tools/profile_beam_ablate.py): un-bucketed "matmul" is
# shipped; "take" is the jnp.take formulation it replaced, and bucketing
# (permute only the live-slot-prefix bucket) helped take but HURTS the
# matmul formulation (the lax.cond + dynamic_update_slice write-back costs
# more than the saved bytes: 23.96 vs 20.97 ms/step on v5e, large-v1)
_GATHER_IMPL = "matmul"
_GATHER_BUCKET = False


def _permute_rows_matmul(x, onehot):
    """Exact row permutation `x[flat_src]` along axis 1 as a one-hot matmul.

    XLA lowers a `jnp.take` over axis 1 of the [L, B, ...] KV cache to a
    TPU gather that measured ~36 GB/s effective on v5e — 27.35 of the beam
    step's 38.33 ms/step (71%, tools/profile_beam_ablate.py, large-v1,
    80 rows). The same permutation as `P @ X` rides the MXU's native
    s8 x s8 -> s32 path at streaming rates. Exactness for every dtype:
    the tensor is bitcast to int8 lanes (bf16/fp32 payloads are just
    bytes), each output element is one-hot-selected as exactly one byte's
    value in int32 (range [-128, 127], so the narrowing cast back is
    lossless), and the lanes are bitcast back — a pure byte shuffle, no
    arithmetic on the payload values, no bf16 conversion materialization.
    """
    orig = x.dtype
    v = x if orig == jnp.int8 else jax.lax.bitcast_convert_type(x, jnp.int8)
    # contract over axis 1 WITHOUT flattening the trailing dims: a reshape
    # to [L, B, N] pins a row-major layout, and when the surrounding loop
    # carries the cache in a different (attention-preferred) layout, XLA
    # brackets the dot with two full relayout copies — measured as most of
    # the remaining permute cost (HLO: copy{3,4,..} around the dot)
    rest = "".join(chr(ord("c") + i) for i in range(v.ndim - 2))
    y = jnp.einsum(
        f"ab,lb{rest}->la{rest}", onehot, v,
        preferred_element_type=jnp.int32,
    ).astype(jnp.int8)
    return y if orig == jnp.int8 else jax.lax.bitcast_convert_type(y, orig)


def _gather_beam_cache(cache, flat_src, live, total):
    """Reorder the self-KV cache along the beam axis.

    The cache reorder was the beam step's dominant cost — 27.35 of
    38.33 ms/step (71%) as an XLA gather (tools/profile_beam_ablate.py,
    v5e, large-v1, 80 rows). Shipped formulation: a full-cache one-hot
    MXU matmul (_permute_rows_matmul), 20.97 ms/step total. The previous
    live-prefix bucketing (slots >= live are identically zero in every
    row, so permuting them is the identity) helped the gather formulation
    but hurts the matmul one — its lax.cond + dynamic_update_slice
    write-back costs more than the saved bytes — so it stays behind the
    _GATHER_BUCKET ablation seam only. Token parity is pinned by the
    beam-vs-oracle tests and the reference-differential beam tests.
    """
    if _GATHER_IMPL == "matmul":
        b = int(flat_src.shape[0])
        iota = jnp.arange(b, dtype=flat_src.dtype)
        onehot = (flat_src[:, None] == iota[None, :]).astype(jnp.int8)
        permute = lambda x: _permute_rows_matmul(x, onehot)  # noqa: E731
    else:
        permute = lambda x: jnp.take(x, flat_src, axis=1)  # noqa: E731

    if not _GATHER_BUCKET:
        if _GATHER_IMPL != "matmul":
            return jax.tree.map(permute, cache)
        # identity steps are free: with trained weights beams frequently
        # keep their order (each beam's best continuation extends itself),
        # making flat_src the identity — the whole ~10 ms/step reorder is
        # then a no-op. Random-weight benches never hit this branch, so it
        # shows up only on real checkpoints; the reduce costs ~nothing.
        return jax.lax.cond(
            jnp.all(flat_src == iota),
            lambda: cache,
            lambda: jax.tree.map(permute, cache),
        )

    def take_prefix(w):
        def f(x):
            ctx_ax = x.ndim - 2  # values [L,B,H,ctx,Dh]; scales [L,B,ctx,H]
            if w >= x.shape[ctx_ax]:
                return permute(x)
            head = jax.lax.slice_in_dim(x, 0, w, axis=ctx_ax)
            head = permute(head)
            return jax.lax.dynamic_update_slice_in_dim(
                x, head, 0, axis=ctx_ax
            )
        return lambda: jax.tree.map(f, cache)

    w1, w2 = total // 4, total // 2
    if w1 < 8:  # tiny caches: bucketing is all overhead
        return jax.tree.map(permute, cache)
    return jax.lax.cond(
        live <= w1,
        take_prefix(w1),
        lambda: jax.lax.cond(
            live <= w2, take_prefix(w2), take_prefix(total)
        ),
    )


# --------------------------------------------------------------------------- #
# jitted beam search
# --------------------------------------------------------------------------- #


def _beam_topk(filtered: jnp.ndarray, k: int):
    """Exact top-k over [B, V] logits.

    Measured on v5e (tools/profile_beam_ablate.py, large-v1, 80 rows x
    51865 vocab): an iterated-argmax formulation is within noise of
    `lax.top_k` (+0.06 ms/step), so the library call stays. Kept as a
    seam so the ablation tool can patch variants in.
    """
    return jax.lax.top_k(filtered, k)


@partial(
    jax.jit,
    static_argnames=(
        "prefill",
        "total",
        "max_steps",
        "beam_size",
        "max_candidates",
        "n_head",
        "compute_dtype",
        "eot",
        "ts_begin",
        "blank_token",
        "no_speech_id",
        "max_initial_ts_index",
        "suppress_blank",
        "with_ts_rules",
        "self_kv_quant",
        "self_kv_bits",
    ),
)
def beam_sample_loop(
    dec_params: dict,
    cross_k: jnp.ndarray,  # [L, A*K, Ta, D]
    cross_v: jnp.ndarray,
    buf_init: jnp.ndarray,  # [A*K, total]
    pad: jnp.ndarray,
    sot_slot: jnp.ndarray,
    suppress_mask: jnp.ndarray,
    *,
    prefill: int,
    total: int,
    max_steps: int,
    beam_size: int,
    max_candidates: int,
    n_head: int,
    compute_dtype,
    eot: int,
    ts_begin: int,
    blank_token: int,
    no_speech_id: Optional[int],
    max_initial_ts_index: Optional[int],
    suppress_blank: bool,
    with_ts_rules: bool,
    self_kv_quant: bool = False,
    self_kv_bits: int = 8,
):
    """Beam search with patience, entirely on device.

    Tensorization of the reference's dict-based beam bookkeeping
    (whisper_at/decoding.py:295-398): per step, each beam proposes its top
    (K+1) continuations; candidates are globally sorted per audio; EOT
    candidates fill a fixed finished buffer (capacity max_candidates =
    round(K * patience)); the top K non-EOT candidates become the new beams,
    with the KV cache gathered along the batch axis. At step 0 only beam 0
    proposes (all beams share the same prefix — the reference's sequence-dict
    dedup collapses them identically).

    Returns (finished_tokens [A, C, total], finished_scores [A, C],
    finished_count [A], final_beams [A*K, total], final_sum_lp [A*K],
    no_speech_probs [A*K], n_steps).
    """
    k_beam = beam_size
    n_cand = k_beam * (k_beam + 1)
    _ck_arr = cross_kv_payload(cross_k)
    n_layer, bk = _ck_arr.shape[0], buf_init.shape[0]
    # beams share their window's audio: cross tensors carry one row per
    # audio (group = k_beam) — or bk rows if the caller pre-repeated them
    group = bk // _ck_arr.shape[1]
    a_audio = bk // k_beam
    # H*Dh: heads layout [L, A, H, Dh, Ta] vs fused [L, A, H*Dh, Ta_pad]
    d = (_ck_arr.shape[2] if _ck_arr.ndim == 4
         else _ck_arr.shape[2] * _ck_arr.shape[3])
    c_cap = max_candidates

    self_k, self_v = init_cache(n_layer, bk, total, d, compute_dtype, n_head,
                            quantize=self_kv_quant, bits=self_kv_bits)
    hidden, self_k, self_v = decoder_forward(
        dec_params, buf_init[:, :prefill], cross_k, cross_v, self_k, self_v,
        jnp.int32(0), pad, n_head, compute_dtype, group=group,
    )
    if no_speech_id is not None:
        sot_hidden = jnp.take_along_axis(
            hidden,
            sot_slot[None, None, None].astype(jnp.int32)
            * jnp.ones((bk, 1, 1), jnp.int32),
            axis=1,
        )
        sot_logits = project_logits(dec_params, sot_hidden)[:, 0]
        no_speech_probs = jax.nn.softmax(sot_logits, axis=-1)[:, no_speech_id]
    else:
        no_speech_probs = jnp.full((bk,), jnp.nan, jnp.float32)

    logits0 = project_logits(dec_params, hidden[:, -1:])[:, 0]

    fin_tokens = jnp.zeros((a_audio, c_cap, total), jnp.int32)
    fin_scores = jnp.full((a_audio, c_cap), -jnp.inf, jnp.float32)
    fin_count = jnp.zeros((a_audio,), jnp.int32)

    def cond(state):
        t = state[0]
        fin_count = state[9]
        return (t < max_steps) & ~jnp.all(fin_count >= c_cap)

    def body(state):
        (t, buf, self_k, self_v, logits, sum_lp, last_ts,
         fin_tokens, fin_scores, fin_count) = state

        slot = prefill + t
        prev1 = buf[:, slot - 1] * (t >= 1)
        prev2 = buf[:, jnp.maximum(slot - 2, 0)]
        filtered = apply_logit_filters(
            logits, t, prev1, prev2, last_ts, suppress_mask,
            eot=eot, ts_begin=ts_begin, blank_token=blank_token,
            max_initial_ts_index=max_initial_ts_index,
            suppress_blank=suppress_blank, with_ts_rules=with_ts_rules,
        )
        # top-k on the raw filtered logits (softmax is rank-preserving), then
        # normalize only the K+1 winners — skips materializing the [A*K, V]
        # log_softmax every step
        top_raw, top_tok = _beam_topk(filtered, k_beam + 1)  # [A*K, K+1]
        top_lp = top_raw - jax.nn.logsumexp(filtered, axis=-1)[:, None]
        cand = (sum_lp[:, None] + top_lp).reshape(a_audio, n_cand)
        cand_tok = top_tok.reshape(a_audio, n_cand)
        # step 0: all beams share a prefix; only beam 0's candidates count
        beam0_only = jnp.where(
            jnp.arange(n_cand) < (k_beam + 1), 0.0, NEG_INF
        )[None, :]
        cand = jnp.where(t == 0, cand + beam0_only, cand)

        order = jnp.argsort(-cand, axis=1)  # [A, N] score-descending
        s_scores = jnp.take_along_axis(cand, order, axis=1)
        s_toks = jnp.take_along_axis(cand_tok, order, axis=1)
        s_src = order // (k_beam + 1)  # source beam per candidate
        valid = jnp.isfinite(s_scores)
        is_eot = (s_toks == eot) & valid

        # --- new beams: first K non-EOT candidates in score order ---
        keep = valid & ~is_eot
        pos = jnp.broadcast_to(jnp.arange(n_cand)[None, :], keep.shape)
        sel = jnp.argsort(jnp.where(keep, pos, pos + n_cand), axis=1)[:, :k_beam]
        new_tok = jnp.take_along_axis(s_toks, sel, axis=1)  # [A, K]
        new_src = jnp.take_along_axis(s_src, sel, axis=1)
        new_score = jnp.take_along_axis(s_scores, sel, axis=1)

        audio_base = (jnp.arange(a_audio, dtype=jnp.int32) * k_beam)[:, None]
        flat_src = (audio_base + new_src).reshape(-1)  # [A*K]

        # --- finished buffer: EOT candidates appended until the cap ---
        # runs unconditionally every step: cond-gating it on any(is_eot)
        # measured +-0.06 ms/step on v5e (tools/profile_beam_ablate.py) —
        # the [A, N, total] row gather/scatter is small next to the KV work
        frank = jnp.cumsum(is_eot, axis=1)
        fpos = fin_count[:, None] + frank - 1
        fpos = jnp.where(is_eot & (fpos < c_cap), fpos, c_cap)  # C -> dropped
        # sequence rows: source beam's buffer with EOT written at `slot`
        src_rows = jnp.take_along_axis(
            buf.reshape(a_audio, k_beam, total),
            s_src[:, :, None].astype(jnp.int32), axis=1,
        )  # [A, N, total]
        eot_col = jnp.full((a_audio, n_cand, 1), eot, jnp.int32)
        src_rows = jax.lax.dynamic_update_slice(
            src_rows, eot_col, (0, 0, slot)
        )
        a_idx = jnp.broadcast_to(
            jnp.arange(a_audio)[:, None], (a_audio, n_cand)
        )
        fin_tokens = fin_tokens.at[a_idx, fpos].set(src_rows, mode="drop")
        fin_scores = fin_scores.at[a_idx, fpos].set(s_scores, mode="drop")
        fin_count = jnp.minimum(fin_count + jnp.sum(is_eot, axis=1), c_cap)

        # --- reorder state along the beam axis ---
        buf = jnp.take(buf, flat_src, axis=0)
        buf = jax.lax.dynamic_update_slice(
            buf, new_tok.reshape(-1, 1), (0, slot)
        )
        sum_lp = new_score.reshape(-1)
        last_ts = jnp.take(last_ts, flat_src, axis=0)
        ntok_flat = new_tok.reshape(-1)
        last_ts = jnp.where(ntok_flat >= ts_begin, ntok_flat, last_ts)
        self_k = _gather_beam_cache(self_k, flat_src, slot, total)
        self_v = _gather_beam_cache(self_v, flat_src, slot, total)

        hidden, self_k, self_v = decoder_forward(
            dec_params, ntok_flat[:, None], cross_k, cross_v, self_k, self_v,
            slot, pad, n_head, compute_dtype, group=group,
        )
        logits = project_logits(dec_params, hidden)[:, 0]
        return (t + 1, buf, self_k, self_v, logits, sum_lp, last_ts,
                fin_tokens, fin_scores, fin_count)

    init_state = (
        jnp.int32(0),
        buf_init,
        self_k,
        self_v,
        logits0,
        jnp.zeros((bk,), jnp.float32),
        jnp.full((bk,), -1, jnp.int32),
        fin_tokens,
        fin_scores,
        fin_count,
    )
    (t, buf, _, _, _, sum_lp, _, fin_tokens, fin_scores, fin_count) = (
        jax.lax.while_loop(cond, body, init_state)
    )
    return fin_tokens, fin_scores, fin_count, buf, sum_lp, no_speech_probs, t


# --------------------------------------------------------------------------- #
# host-side task orchestration
# --------------------------------------------------------------------------- #

_PREFILL_BUCKETS = (4, 8, 16, 32, 64, 128, 224, 256)


@jax.jit
def _pack_for_host(*arrays):
    """Flatten + bitcast f32->int32 + concat, so a result set of mixed
    int/float arrays becomes ONE device array (bit-exact).

    The carrier dtype is int32, NOT f32: int32 token ids bitcast to f32
    are denormals (any id < 2**23 has a zero exponent), and float-typed
    values can be flushed or canonicalized by resharding/broadcast passes
    — measured on the virtual CPU mesh, where an f32-carried scalar came
    back 0 and silently emptied every dp-sharded transcription. Integer
    lanes are never canonicalized, so f32 payloads ride int32 safely."""
    flats = []
    for a in arrays:
        flat = a.reshape(-1)
        if flat.dtype == jnp.float32:
            flat = jax.lax.bitcast_convert_type(flat, jnp.int32)
        elif flat.dtype != jnp.int32:
            raise TypeError(f"_device_get_packed: unsupported {flat.dtype}")
        flats.append(flat)
    return jnp.concatenate(flats)


def _device_get_packed(*arrays):
    """Fetch several device arrays in ONE host round trip.

    On the tunneled TPU every blocking D2H pays the link RTT (~25-30 ms),
    and sequential np.asarray calls serialize those round trips — the
    greedy result set is 4 pulls, beam is 7. Packing the flattened
    (f32 bitcast to int32) arrays into one device-side concatenation makes
    the whole set a single transfer; the host view()s the bits back.
    """
    packed = np.asarray(_pack_for_host(*arrays))
    out = []
    pos = 0
    for a in arrays:
        n = int(np.prod(a.shape)) if a.ndim else 1
        seg = packed[pos:pos + n]
        if a.dtype != jnp.int32:
            seg = seg.view(np.float32)
        out.append(seg.reshape(a.shape))
        pos += n
    return out


def _prefill_bucket(n: int) -> int:
    for b in _PREFILL_BUCKETS:
        if n <= b:
            return b
    return n


class MaximumLikelihoodRanker:
    """Highest logprob with length norm or GNMT penalty (decoding.py:184-207)."""

    def __init__(self, length_penalty: Optional[float]):
        self.length_penalty = length_penalty

    def rank(self, tokens: List[List[List[int]]], sum_logprobs: List[List[float]]):
        def scores(logprobs, lengths):
            result = []
            for logprob, length in zip(logprobs, lengths):
                if self.length_penalty is None:
                    penalty = length
                else:
                    penalty = ((5 + length) / 6) ** self.length_penalty
                # a zero-length sample (EOT at the first sampled step) has
                # penalty 0 under length norm; rank it below any non-empty
                # candidate instead of dividing by zero (the reference
                # crashes here — decoding.py:184-207 — on degenerate rows)
                result.append(logprob / penalty if penalty != 0 else -np.inf)
            return result

        lengths = [[len(t) for t in s] for s in tokens]
        return [int(np.argmax(scores(p, l))) for p, l in zip(sum_logprobs, lengths)]


class DecodingTask:
    def __init__(self, model, options: DecodingOptions):
        self.model = model

        language = options.language or "en"
        tokenizer = get_tokenizer(
            model.is_multilingual, language=language, task=options.task
        )
        self.tokenizer: Tokenizer = tokenizer
        self.options = self._verify_options(options)

        self.n_group: int = options.beam_size or options.best_of or 1
        self.n_ctx: int = model.dims.n_text_ctx
        self.sample_len: int = options.sample_len or model.dims.n_text_ctx // 2

        self.sot_sequence = tokenizer.sot_sequence
        if self.options.without_timestamps:
            self.sot_sequence = tokenizer.sot_sequence_including_notimestamps

        self.initial_tokens: Tuple[int, ...] = self._get_initial_tokens()
        self.sample_begin: int = len(self.initial_tokens)
        self.sot_index: int = self.initial_tokens.index(tokenizer.sot)

        self.sequence_ranker = MaximumLikelihoodRanker(options.length_penalty)

        # static filter config
        self.suppress_blank = bool(options.suppress_blank)
        self.with_ts_rules = not options.without_timestamps
        self.blank_token = tokenizer.encode(" ")[0]
        self.max_initial_ts_index = None
        if self.with_ts_rules and options.max_initial_timestamp:
            precision = CHUNK_LENGTH / model.dims.n_audio_ctx  # 0.02 s
            self.max_initial_ts_index = round(
                options.max_initial_timestamp / precision
            )

        mask = np.zeros((model.dims.n_vocab,), np.float32)
        if options.suppress_tokens:
            mask[list(self._get_suppress_tokens())] = NEG_INF
        self.suppress_mask = jnp.asarray(mask)

    def _verify_options(self, options: DecodingOptions) -> DecodingOptions:
        if options.beam_size is not None and options.best_of is not None:
            raise ValueError("beam_size and best_of can't be given together")
        if options.temperature == 0 and options.best_of is not None:
            raise ValueError("best_of with greedy sampling (T=0) is not compatible")
        if options.patience is not None and options.beam_size is None:
            raise ValueError("patience requires beam_size to be given")
        if options.length_penalty is not None and not (
            0 <= options.length_penalty <= 1
        ):
            raise ValueError("length_penalty (alpha) should be a value between 0 and 1")
        if options.kv_bits not in (8, 4):
            raise ValueError("kv_bits must be 8 or 4")
        if options.weight_bits not in (8, 4):
            raise ValueError("weight_bits must be 8 or 4")
        if options.self_kv_bits not in (8, 4):
            raise ValueError("self_kv_bits must be 8 or 4")
        if options.draft_model is not None:
            if options.temperature != 0:
                raise ValueError("draft_model requires temperature == 0 "
                                 "(speculative decoding is greedy-exact)")
            if options.beam_size is not None or options.best_of is not None:
                raise ValueError(
                    "draft_model is incompatible with beam_size/best_of"
                )
            if options.self_kv_quant:
                raise ValueError(
                    "draft_model is incompatible with self_kv_quant (the "
                    "per-row-position pass keeps a plain self cache)"
                )
            if options.draft_model.dims.n_vocab != self.model.dims.n_vocab:
                raise ValueError(
                    "draft model must share the verifier's vocabulary"
                )
            if options.draft_lookahead < 1:
                raise ValueError("draft_lookahead must be >= 1")
        return options

    def _get_initial_tokens(self) -> Tuple[int, ...]:
        tokens = list(self.sot_sequence)

        if prefix := self.options.prefix:
            prefix_tokens = (
                self.tokenizer.encode(" " + prefix.strip())
                if isinstance(prefix, str)
                else prefix
            )
            if self.sample_len is not None:
                max_prefix_len = self.n_ctx // 2 - self.sample_len
                prefix_tokens = prefix_tokens[-max_prefix_len:]
            tokens = tokens + prefix_tokens

        if prompt := self.options.prompt:
            prompt_tokens = (
                self.tokenizer.encode(" " + prompt.strip())
                if isinstance(prompt, str)
                else prompt
            )
            tokens = (
                [self.tokenizer.sot_prev]
                + prompt_tokens[-(self.n_ctx // 2 - 1) :]
                + tokens
            )

        return tuple(tokens)

    def _get_suppress_tokens(self) -> Tuple[int, ...]:
        suppress_tokens = self.options.suppress_tokens

        if isinstance(suppress_tokens, str):
            suppress_tokens = [int(t) for t in suppress_tokens.split(",")]

        if -1 in suppress_tokens:
            suppress_tokens = [t for t in suppress_tokens if t >= 0]
            suppress_tokens.extend(self.tokenizer.non_speech_tokens)
        elif suppress_tokens is None or len(suppress_tokens) == 0:
            suppress_tokens = []
        else:
            assert isinstance(suppress_tokens, list), "suppress_tokens must be a list"

        suppress_tokens.extend(
            [
                self.tokenizer.transcribe,
                self.tokenizer.translate,
                self.tokenizer.sot,
                self.tokenizer.sot_prev,
                self.tokenizer.sot_lm,
            ]
        )
        if self.tokenizer.no_speech is not None:
            suppress_tokens.append(self.tokenizer.no_speech)

        return tuple(sorted(set(suppress_tokens)))

    # ------------------------------------------------------------------ #

    def _detect_language(self, audio_features, buf, pad):
        languages = [self.options.language] * audio_features.shape[0]
        lang_probs = None

        if self.options.language is None or self.options.task == "lang_id":
            lang_tokens, lang_probs = detect_language_from_features(
                self.model, audio_features, self.tokenizer
            )
            languages = [max(probs, key=probs.get) for probs in lang_probs]
            if self.options.language is None:
                buf = buf.at[:, pad + self.sot_index + 1].set(lang_tokens)

        return languages, lang_probs, buf

    def run(self, mel) -> List[DecodingResult]:
        tokenizer = self.tokenizer
        n_audio = mel.shape[0]
        options = self.options
        compute_dtype = self.model.compute_dtype(options.fp16)

        audio_features, at_features = self.model.embed_audio(mel, options.fp16)

        prefill = _prefill_bucket(len(self.initial_tokens))
        total = min(prefill + self.sample_len, self.n_ctx + 1)
        max_steps = total - prefill
        pad = prefill - len(self.initial_tokens)

        buf = np.zeros((n_audio, total), np.int32)
        buf[:, pad:prefill] = np.asarray(self.initial_tokens, np.int32)
        buf = jnp.asarray(buf)

        languages, language_probs, buf = self._detect_language(
            audio_features, buf, pad
        )
        if options.task == "lang_id":
            return [
                DecodingResult(
                    audio_features=features,
                    audio_features_for_at=at_feat,
                    language=language,
                    language_probs=probs,
                )
                for features, at_feat, language, probs in zip(
                    audio_features, at_features, languages, language_probs
                )
            ]

        # groups (beams / best-of samples) repeat only the TOKEN rows; the
        # cross-attention KV keeps one row per audio — the decoder folds the
        # group into the attention sequence axis (decoder_forward group=...),
        # reading the dominant KV stream once per audio instead of per beam
        n_group = self.n_group
        if n_group > 1:
            buf = jnp.repeat(buf, n_group, axis=0)

        dec_params = self.model.decoder_params_decode(options.weight_quant,
                                                      options.weight_bits)
        # "fused" lays the int8 KV out for the pallas decode kernel
        # (ops/cross_decode.py) — the decode loop's dominant-stream fast path
        # on TPU; elsewhere the XLA einsum path keeps the head layout
        # the pallas decode kernel is a single-device Mosaic custom call with
        # no shard_map/partitioning rules; under ANY mesh (dp or tp) the XLA
        # heads layout partitions cleanly instead, so auto-select "fused"
        # only for unplaced models
        mesh = getattr(self.model, "_mesh", None)
        kv_layout = options.kv_layout or ("fused" if (
            options.kv_quant and mesh is None
            and options.kv_bits in (8, 4)
            and jax.default_backend() == "tpu"
        ) else "heads")
        cross_k, cross_v = precompute_cross_kv(
            dec_params, audio_features,
            self.model.dims.n_text_head, compute_dtype,
            quantize=options.kv_quant,
            layout=kv_layout,
            bits=options.kv_bits,
        )

        if options.beam_size is not None:
            return self._run_beam(
                mel, buf, pad, prefill, total, max_steps,
                cross_k, cross_v, compute_dtype,
                audio_features, at_features, languages, dec_params,
            )

        if options.draft_model is not None:
            return self._run_spec(
                mel, buf, pad, prefill, total, max_steps,
                cross_k, cross_v, compute_dtype,
                audio_features, at_features, languages, dec_params,
            )

        buf_out, sum_lp, no_speech_probs, n_steps = greedy_sample_loop(
            dec_params,
            cross_k,
            cross_v,
            buf,
            jnp.int32(pad),
            jnp.int32(pad + self.sot_index),
            self.suppress_mask,
            jnp.float32(options.temperature),
            jax.random.PRNGKey(np.random.randint(0, 2**31 - 1)),
            prefill=prefill,
            total=total,
            max_steps=max_steps,
            n_head=self.model.dims.n_text_head,
            compute_dtype=compute_dtype,
            eot=tokenizer.eot,
            ts_begin=tokenizer.timestamp_begin,
            blank_token=self.blank_token,
            no_speech_id=tokenizer.no_speech,
            max_initial_ts_index=self.max_initial_ts_index,
            suppress_blank=self.suppress_blank,
            with_ts_rules=self.with_ts_rules,
            self_kv_quant=self.options.self_kv_quant,
            self_kv_bits=self.options.self_kv_bits,
        )

        buf_out, sum_lp, no_speech_probs, n_steps = _device_get_packed(
            buf_out, sum_lp, no_speech_probs, n_steps)
        no_speech_probs = no_speech_probs[::n_group]
        n_steps = int(n_steps)

        # slice each row's sampled region up to (excluding) the first EOT
        sampled = buf_out[:, prefill : prefill + n_steps]
        eot_col = np.full((sampled.shape[0], 1), tokenizer.eot, np.int32)
        sampled = np.concatenate([sampled, eot_col], axis=1)

        tokens_grouped: List[List[List[int]]] = []
        logprobs_grouped: List[List[float]] = []
        for i in range(n_audio):
            group_tokens, group_lp = [], []
            for j in range(n_group):
                row = sampled[i * n_group + j]
                end = int(np.argmax(row == tokenizer.eot))
                group_tokens.append(row[:end].tolist())
                group_lp.append(float(sum_lp[i * n_group + j]))
            tokens_grouped.append(group_tokens)
            logprobs_grouped.append(group_lp)

        selected = self.sequence_ranker.rank(tokens_grouped, logprobs_grouped)
        tokens: List[List[int]] = [
            g[i] for i, g in zip(selected, tokens_grouped)
        ]
        texts = [tokenizer.decode(t).strip() for t in tokens]
        sum_logprobs = [lp[i] for i, lp in zip(selected, logprobs_grouped)]
        avg_logprobs = [lp / (len(t) + 1) for t, lp in zip(tokens, sum_logprobs)]

        return [
            DecodingResult(
                audio_features=audio_features[i],
                audio_features_for_at=at_features[i],
                language=languages[i],
                tokens=tokens[i],
                text=texts[i],
                avg_logprob=avg_logprobs[i],
                no_speech_prob=float(no_speech_probs[i]),
                temperature=options.temperature,
                compression_ratio=compression_ratio(texts[i]),
            )
            for i in range(n_audio)
        ]

    def _run_spec(
        self, mel, buf, pad, prefill, total, max_steps,
        cross_k, cross_v, compute_dtype,
        audio_features, at_features, languages, dec_params,
    ) -> List[DecodingResult]:
        """Speculative greedy decode: draft-and-verify (spec_sample_loop).

        Token-identical to the plain greedy path at T=0; the draft model
        runs its own encoder over the same mel (a few % of the verifier's
        encoder FLOPs for a tiny/base draft) and proposes lookahead-token
        runs that the verifier accepts or corrects in ONE forward each."""
        options = self.options
        tokenizer = self.tokenizer
        n_audio = mel.shape[0]
        draft = options.draft_model

        draft_features, _ = draft.embed_audio(mel, options.fp16)
        draft_dec = draft.decoder_params_fused
        draft_ck, draft_cv = precompute_cross_kv(
            draft_dec, draft_features, draft.dims.n_text_head, compute_dtype,
            quantize=False, layout="heads",
        )

        buf_out, sum_lp, no_speech_probs, n_steps, rounds, commits = (
            spec_sample_loop(
                dec_params,
                cross_k,
                cross_v,
                draft_dec,
                draft_ck,
                draft_cv,
                buf,
                jnp.int32(pad),
                jnp.int32(pad + self.sot_index),
                self.suppress_mask,
                prefill=prefill,
                total=total,
                max_steps=max_steps,
                lookahead=options.draft_lookahead,
                n_head=self.model.dims.n_text_head,
                n_head_draft=draft.dims.n_text_head,
                compute_dtype=compute_dtype,
                eot=tokenizer.eot,
                ts_begin=tokenizer.timestamp_begin,
                blank_token=self.blank_token,
                no_speech_id=tokenizer.no_speech,
                max_initial_ts_index=self.max_initial_ts_index,
                suppress_blank=self.suppress_blank,
                with_ts_rules=self.with_ts_rules,
            )
        )
        (buf_out, sum_lp, no_speech_probs, n_steps, rounds,
         commits) = _device_get_packed(
            buf_out, sum_lp, no_speech_probs, n_steps, rounds, commits)
        n_steps = int(n_steps)
        # draft efficiency diagnostics (read by tools/profile_spec.py and
        # the bench's informational row): verifier forwards per committed
        # token is the speedup lever
        self.spec_stats = {
            "rounds": int(rounds),
            "commits": int(commits),
            "tokens_per_round": (float(commits) / max(int(rounds), 1)),
        }
        _set_last_spec_stats(self.spec_stats)

        sampled = buf_out[:, prefill: prefill + n_steps]
        eot_col = np.full((sampled.shape[0], 1), tokenizer.eot, np.int32)
        sampled = np.concatenate([sampled, eot_col], axis=1)

        tokens: List[List[int]] = []
        sum_logprobs: List[float] = []
        for i in range(n_audio):
            row = sampled[i]
            end = int(np.argmax(row == tokenizer.eot))
            tokens.append(row[:end].tolist())
            sum_logprobs.append(float(sum_lp[i]))
        texts = [tokenizer.decode(t).strip() for t in tokens]
        avg_logprobs = [lp / (len(t) + 1)
                        for t, lp in zip(tokens, sum_logprobs)]

        return [
            DecodingResult(
                audio_features=audio_features[i],
                audio_features_for_at=at_features[i],
                language=languages[i],
                tokens=tokens[i],
                text=texts[i],
                avg_logprob=avg_logprobs[i],
                no_speech_prob=float(no_speech_probs[i]),
                temperature=options.temperature,
                compression_ratio=compression_ratio(texts[i]),
            )
            for i in range(n_audio)
        ]

    def _run_beam(
        self, mel, buf, pad, prefill, total, max_steps,
        cross_k, cross_v, compute_dtype,
        audio_features, at_features, languages, dec_params,
    ) -> List[DecodingResult]:
        options = self.options
        tokenizer = self.tokenizer
        n_audio = mel.shape[0]
        beam_size = options.beam_size
        patience = options.patience or 1.0
        max_candidates = round(beam_size * patience)
        assert max_candidates > 0, (
            f"Invalid beam size ({beam_size}) or patience ({patience})"
        )

        fin_tokens, fin_scores, fin_count, beams, beam_lp, nsp, n_steps = (
            beam_sample_loop(
                dec_params,
                cross_k,
                cross_v,
                buf,
                jnp.int32(pad),
                jnp.int32(pad + self.sot_index),
                self.suppress_mask,
                prefill=prefill,
                total=total,
                max_steps=max_steps,
                beam_size=beam_size,
                max_candidates=max_candidates,
                n_head=self.model.dims.n_text_head,
                compute_dtype=compute_dtype,
                eot=tokenizer.eot,
                ts_begin=tokenizer.timestamp_begin,
                blank_token=self.blank_token,
                no_speech_id=tokenizer.no_speech,
                max_initial_ts_index=self.max_initial_ts_index,
                suppress_blank=self.suppress_blank,
                with_ts_rules=self.with_ts_rules,
                self_kv_quant=self.options.self_kv_quant,
                self_kv_bits=self.options.self_kv_bits,
            )
        )
        (fin_tokens, fin_scores, fin_count, beams, beam_lp,
         no_speech_probs, n_steps) = _device_get_packed(
            fin_tokens, fin_scores, fin_count, beams, beam_lp, nsp, n_steps)
        no_speech_probs = no_speech_probs[::beam_size]
        n_steps = int(n_steps)
        eot = tokenizer.eot

        def slice_row(row) -> List[int]:
            # sampled window + sentinel EOT (covers unfinished beams)
            rest = np.append(row[prefill : prefill + n_steps], eot)
            end = int(np.argmax(rest == eot))
            return rest[:end].tolist()

        # finalize (decoding.py:378-398): if fewer than beam_size sequences
        # finished, fill from the final beams in sum-logprob order
        tokens_grouped: List[List[List[int]]] = []
        logprobs_grouped: List[List[float]] = []
        for i in range(n_audio):
            seqs = [slice_row(fin_tokens[i, c]) for c in range(int(fin_count[i]))]
            scores = [float(fin_scores[i, c]) for c in range(int(fin_count[i]))]
            if len(seqs) < beam_size:
                group_lp = beam_lp[i * beam_size : (i + 1) * beam_size]
                for j in np.argsort(group_lp)[::-1]:
                    seqs.append(slice_row(beams[i * beam_size + int(j)]))
                    scores.append(float(group_lp[int(j)]))
                    if len(seqs) >= beam_size:
                        break
            tokens_grouped.append(seqs)
            logprobs_grouped.append(scores)

        selected = self.sequence_ranker.rank(tokens_grouped, logprobs_grouped)
        tokens = [g[i] for i, g in zip(selected, tokens_grouped)]
        texts = [tokenizer.decode(t).strip() for t in tokens]
        sum_logprobs = [lp[i] for i, lp in zip(selected, logprobs_grouped)]
        avg_logprobs = [lp / (len(t) + 1) for t, lp in zip(tokens, sum_logprobs)]

        return [
            DecodingResult(
                audio_features=audio_features[i],
                audio_features_for_at=at_features[i],
                language=languages[i],
                tokens=tokens[i],
                text=texts[i],
                avg_logprob=avg_logprobs[i],
                no_speech_prob=float(no_speech_probs[i]),
                temperature=options.temperature,
                compression_ratio=compression_ratio(texts[i]),
            )
            for i in range(n_audio)
        ]


# --------------------------------------------------------------------------- #
# language detection
# --------------------------------------------------------------------------- #


@lru_cache(maxsize=None)
def _language_token_mask(n_vocab: int, language_tokens: Tuple[int, ...]):
    mask = np.full((n_vocab,), NEG_INF, np.float32)
    mask[list(language_tokens)] = 0.0
    return jnp.asarray(mask)


def detect_language_from_features(model, audio_features, tokenizer):
    """One SOT step over encoded features -> (lang_tokens [B], probs dicts)."""
    n_audio = audio_features.shape[0]
    sot = jnp.full((n_audio, 1), tokenizer.sot, jnp.int32)
    logits = model.logits(sot, audio_features)[:, 0]  # [B, V] fp32
    mask = _language_token_mask(model.dims.n_vocab, tokenizer.all_language_tokens)
    masked = logits + mask
    lang_tokens = jnp.argmax(masked, axis=-1)
    probs = np.asarray(jax.nn.softmax(masked, axis=-1))
    language_probs = [
        {
            c: float(probs[i, j])
            for j, c in zip(tokenizer.all_language_tokens, tokenizer.all_language_codes)
        }
        for i in range(n_audio)
    ]
    return lang_tokens, language_probs


def detect_language(model, mel, tokenizer: Tokenizer = None):
    """Detect the spoken language (whisper_at/decoding.py:18-75).

    mel: [80, 3000], [B, 80, 3000], or already-encoded features
    [B, 1500, D]. Returns (language_tokens, language_probs).
    """
    if tokenizer is None:
        tokenizer = get_tokenizer(model.is_multilingual)
    if (
        tokenizer.language is None
        or tokenizer.language_token not in tokenizer.sot_sequence
    ):
        raise ValueError(
            "This model doesn't have language tokens so it can't perform lang id"
        )

    single = mel.ndim == 2
    if single:
        mel = mel[None]

    if mel.shape[-2:] != (model.dims.n_audio_ctx, model.dims.n_audio_state):
        mel, _ = model.embed_audio(mel)

    lang_tokens, language_probs = detect_language_from_features(
        model, mel, tokenizer
    )
    if single:
        return lang_tokens[0], language_probs[0]
    return lang_tokens, language_probs


def decode(
    model,
    mel,
    options: DecodingOptions = DecodingOptions(),
    **kwargs,
) -> Union[DecodingResult, List[DecodingResult]]:
    """Decode 30-second mel segment(s): [80, 3000] or [B, 80, 3000]."""
    if single := mel.ndim == 2:
        mel = mel[None]

    if kwargs:
        options = replace(options, **kwargs)

    result = DecodingTask(model, options).run(mel)
    return result[0] if single else result
