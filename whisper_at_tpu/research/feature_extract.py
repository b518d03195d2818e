"""All-layer encoder feature extraction for TL-TR training.

Parity with the reference extraction pipeline
(noise_robust_asr/intermediate_feat_extract/as_full/extract_as_full_whisper_all.py
and the modified fork encoder, whisper_feat_extracrt/whisper/model.py:148-201):
mel is TRUNCATED (not padded) to 10 s (1000 frames, AudioSet) or 5 s
(ESC-50), the encoder runs with a truncated positional embedding, all-layer
taps (embedding output + every block) are collected, 20x time-pooled, the
embedding tap dropped, and saved as one compressed npz per clip.

TPU re-design: clips are processed in BATCHES through one jitted taps
encoder instead of one-clip-at-a-time; resume-by-skip is preserved.
"""

import functools
import json
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import load_audio, log_mel_spectrogram, pad_or_trim
from ..models.encoder import encoder_apply_taps


def _attn_impl(model) -> str:
    """Static attention impl for this extraction call: pallas kernels are
    single-device Mosaic calls, so mesh-placed models use the einsum path;
    env override read here, OUTSIDE jit (a traced read would be cached)."""
    import os

    if getattr(model, "_mesh", None) is not None:
        return "off"
    return os.environ.get("WHISPER_AT_TPU_ENC_ATTN", "single")

POOL = 20


def extract_features(
    model,
    audio,
    n_frames: int = 1000,
    pool: int = POOL,
    drop_embedding_layer: bool = True,
    fp16: bool = True,
) -> np.ndarray:
    """One clip -> [n_layer, n_frames/2/pool, D] pooled all-layer stack.

    n_frames: mel truncation length (1000 = 10 s AudioSet, 500 = 5 s ESC-50).
    """
    mel = log_mel_spectrogram(audio)
    mel = pad_or_trim(np.asarray(mel), n_frames)  # truncate/pad frames
    taps = encoder_apply_taps(
        model.params["encoder"],
        jnp.asarray(mel)[None],
        model.dims.n_audio_head,
        "all_nopool",
        model.compute_dtype(fp16),
        attn_impl=_attn_impl(model),
    )[0]  # [L+1, T', D]
    taps = np.asarray(taps, np.float32)
    n_layers, t, d = taps.shape
    pooled = taps[:, : (t // pool) * pool].reshape(
        n_layers, t // pool, pool, d
    ).mean(axis=2)
    if drop_embedding_layer:
        pooled = pooled[1:]  # drop the conv/embedding tap (extract_*.py:38)
    return pooled


def extract_features_padded(
    model,
    audio,
    n_tokens: int = 500,
    pool: int = POOL,
    fp16: bool = True,
) -> np.ndarray:
    """SONYC-style extraction (script/extract_sonyc_features.py:40-100):
    pad the clip to the full 30 s window, run the standard (full-pos-emb)
    encoder taps, keep the first n_tokens (500 = 10 s), then pool 20x."""
    from ..audio import N_FRAMES

    mel = log_mel_spectrogram(audio)
    mel = pad_or_trim(np.asarray(mel), N_FRAMES)
    taps = encoder_apply_taps(
        model.params["encoder"],
        jnp.asarray(mel)[None],
        model.dims.n_audio_head,
        "all_nopool",
        model.compute_dtype(fp16),
        attn_impl=_attn_impl(model),
    )[0]
    taps = np.asarray(taps, np.float32)[1:, :n_tokens]  # drop embedding tap
    n_layers, t, d = taps.shape
    return taps.reshape(n_layers, t // pool, pool, d).mean(axis=2)


@functools.partial(jax.jit, static_argnums=(1,))
def _pool_taps_device(taps: jnp.ndarray, pool: int) -> jnp.ndarray:
    """[B, L+1, T', D] taps -> fp32 [B, L, T'//pool, D] on DEVICE: 20x
    pooling + embedding-tap drop before the D2H pull, so the host fetch
    ships pool-times fewer bytes than pulling the raw taps (the fetch is
    the extraction loop's bandwidth term; reference pools on host with
    skimage block_reduce, extract_as_full_whisper_all.py:37)."""
    taps = taps.astype(jnp.float32)
    b, n_layers, t, d = taps.shape
    pooled = taps[:, :, : (t // pool) * pool].reshape(
        b, n_layers, t // pool, pool, d
    ).mean(axis=3)
    return pooled[:, 1:]


@functools.partial(jax.jit, static_argnames=("n_frames",))
def _mel_batch_same_len(sigs: jnp.ndarray, n_valid: jnp.ndarray,
                        n_frames: int) -> jnp.ndarray:
    """One batched mel dispatch for N equal-length host-prepped clips:
    [N, L] `_stft_host_prep(exact=True)` signals -> [N, 80, n_frames]
    truncated/zero-padded mels, each row identical to the per-clip
    `pad_or_trim(log_mel_spectrogram(a), n_frames)` chain (same _mel_power
    + _log_normalize math, vmapped — the extraction analogue of
    ops.mel.mel_windows_many)."""
    from ..ops.mel import HOP_LENGTH, _log_normalize, _mel_power

    bucket = sigs.shape[1] // HOP_LENGTH - 2
    mels = jax.vmap(lambda s: _mel_power(s, bucket))(sigs)   # [N, F, 80]
    logs = jax.vmap(_log_normalize)(mels, n_valid)           # [N, F, 80]
    out = logs.transpose(0, 2, 1)                            # [N, 80, F]
    f = out.shape[2]
    if f >= n_frames:
        return out[:, :, :n_frames]
    return jnp.pad(out, ((0, 0), (0, 0), (0, n_frames - f)))


def _mel_batch_for_clips(audios, n_frames: int):
    """[N, 80, n_frames] mel batch for a list of clips: ONE prepped-signal
    stack + ONE device dispatch when every clip shares a length (the
    AudioSet protocol — all 10 s), falling back to the per-clip mel chain
    for ragged input."""
    from ..ops.mel import _stft_host_prep

    arrs = [np.asarray(a).reshape(-1) for a in audios]
    if len({a.shape[0] for a in arrs}) == 1:
        preps = [_stft_host_prep(a, 0, exact=True) for a in arrs]
        if len({p[0].dtype for p in preps}) == 1:
            sigs = np.stack([p[0] for p in preps])
            n_valid = np.asarray([p[1] for p in preps], np.int32)
            return _mel_batch_same_len(jnp.asarray(sigs),
                                       jnp.asarray(n_valid), n_frames)
    mels = [pad_or_trim(log_mel_spectrogram(a), n_frames) for a in arrs]
    return jnp.stack([jnp.asarray(m) for m in mels])


def extract_features_many(
    model,
    audios,
    n_frames: int = 1000,
    pool: int = POOL,
    fp16: bool = True,
    fetch_dtype=None,
) -> jnp.ndarray:
    """Batched `extract_features`: one encoder-taps forward for a LIST of
    clips, pooling on device. Returns [B, n_layer, n_frames/2/pool, D]
    (a device array — np.asarray() it to fetch; the embedding tap is
    already dropped). Per-clip mels keep `extract_features`' exact
    truncation semantics (pad_or_trim on the MEL, zeros — not silence);
    equal-length clips share ONE batched mel dispatch.

    fetch_dtype: dtype of the returned device array. None keeps the fp32
    pooled values (exact). For a bf16 forward, bf16 ships HALF the D2H
    bytes for values whose information content is already bf16 (the taps) —
    widen to fp32 on host before writing npz (the written file keeps its
    fp32 format; only the pooled mean's sub-bf16 residual differs)."""
    mel_batch = _mel_batch_for_clips(audios, n_frames)
    taps = encoder_apply_taps(
        model.params["encoder"],
        mel_batch,
        model.dims.n_audio_head,
        "all_nopool",
        model.compute_dtype(fp16),
        attn_impl=_attn_impl(model),
    )
    pooled = _pool_taps_device(taps, pool)
    return pooled if fetch_dtype is None else pooled.astype(fetch_dtype)


def extract_feature_set(
    model,
    dataset_json_file: str,
    tar_path: str,
    n_frames: int = 1000,
    batch_size: int = 8,
    fp16: bool = True,
    limit: Optional[int] = None,
) -> List[str]:
    """Batched extraction over a {'data': [{'wav': ...}]} json with
    resume-by-skip (file-exists check, extract_as_full_whisper_all.py:33)."""
    os.makedirs(tar_path, exist_ok=True)
    with open(dataset_json_file, "r") as fp:
        data = json.load(fp)["data"]
    if limit is not None:
        data = data[:limit]

    def out_path(wav: str) -> str:
        stem = os.path.splitext(os.path.basename(wav))[0]
        return os.path.join(tar_path, stem + ".npz")

    todo = [e["wav"] for e in data if not os.path.exists(out_path(e["wav"]))]
    written = []

    # software pipeline: dispatch chunk i+1's forward (async) BEFORE fetching
    # chunk i, so the D2H pull and the npz writes of chunk i overlap chunk
    # i+1's device execution (the same overlap discipline as the bench's
    # H2D prefetch); bf16 fetch halves the pull bytes for a bf16 forward.
    fetch_dtype = jnp.bfloat16 if fp16 else None
    chunks = [todo[s:s + batch_size] for s in range(0, len(todo), batch_size)]
    pending = None  # (chunk, device array)
    for chunk in chunks + [None]:
        nxt = None
        if chunk is not None:
            nxt = (chunk, extract_features_many(
                model, [load_audio(w) for w in chunk], n_frames, fp16=fp16,
                fetch_dtype=fetch_dtype,
            ))
        if pending is not None:
            prev_chunk, dev = pending
            pooled = np.asarray(dev).astype(np.float32)
            for wav, feat in zip(prev_chunk, pooled):
                np.savez_compressed(out_path(wav), feat)
                written.append(out_path(wav))
        pending = nxt
    return written
