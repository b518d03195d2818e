"""TL-TR audio-tagging head (the Whisper-AT novel component).

Functional re-design of the reference ATModel (whisper_at/model.py:322-379):
a 1-head transformer over each decision window's time axis, mean-pooled, then
an 8-head transformer over the layer axis, mean-pooled, then LN+Linear to the
527 AudioSet classes. The low-compute variant ('tl_down_tr_512_1_8') first
projects representations to 512 dims in fp32.

Batched natively: input [B, L, T, D] (the reference operates on a single
window's [L, T, D]); the segment reshape folds into the batch axis so every
window and segment rides one MXU-friendly batch.
"""

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .layers import init_block, init_linear, linear, residual_block


def parse_mode(mode: str) -> dict:
    """Parse an ATModel mode string into its structural config."""
    if "tl_down_tr" in mode:
        parts = mode.split("_")
        return {
            "down": True,
            "inter_dim": int(parts[-3]),
            "n_tatt_head": int(parts[-2]),
            "n_latt_head": int(parts[-1]),
        }
    if "tl_tr" in mode:
        parts = mode.split("_")
        return {
            "down": False,
            "inter_dim": None,
            "n_tatt_head": int(parts[-2]),
            "n_latt_head": int(parts[-1]),
        }
    raise ValueError(f"Unsupported ATModel mode: {mode}")


def init_at_head(
    key, n_layer: int, rep_dim: int, mode: str, label_dim: int = 527, dtype=jnp.float32
) -> dict:
    cfg = parse_mode(mode)
    kd, kt, kl, km = jax.random.split(key, 4)
    d = cfg["inter_dim"] if cfg["down"] else rep_dim
    params = {
        "time_tr": init_block(kt, d, dtype=dtype),
        "layer_tr": init_block(kl, d, dtype=dtype),
        "mlp_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "mlp": init_linear(km, d, label_dim, dtype=dtype),
    }
    if cfg["down"]:
        params["down_ln"] = {
            "scale": jnp.ones((rep_dim,), dtype),
            "bias": jnp.zeros((rep_dim,), dtype),
        }
        params["down"] = init_linear(kd, rep_dim, cfg["inter_dim"], dtype=dtype)
    return params


def _plain_layer_norm(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    # fp32 LN without dtype round-trip (the head's LNs run in fp32 anyway)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * params["scale"].astype(
        x.dtype
    ) + params["bias"].astype(x.dtype)


@partial(jax.jit, static_argnames=("mode", "decision_window", "n_seg"))
def at_head_apply(
    params: dict,
    audio_rep: jnp.ndarray,  # [B, L, T, D]
    mode: str,
    decision_window: int,
    n_seg: int,
) -> jnp.ndarray:
    """Apply the TL-TR head. Returns [B, n_seg, label_dim] logits.

    T is zero-padded to n_seg * decision_window (mirrors the reference's
    constant pad at whisper_at/model.py:360-362). Shapes are static per
    (decision_window, n_seg) — one compiled program per tagging resolution.
    """
    cfg = parse_mode(mode)
    b, n_layer, t, d = audio_rep.shape
    target = n_seg * decision_window
    if t < target:
        audio_rep = jnp.pad(audio_rep, ((0, 0), (0, 0), (0, target - t), (0, 0)))
    else:
        audio_rep = audio_rep[:, :, :target]

    # [B, L, n_seg, W, D] -> [B, n_seg, L, W, D] -> [B*n_seg*L, W, D]
    x = audio_rep.reshape(b, n_layer, n_seg, decision_window, d)
    x = x.transpose(0, 2, 1, 3, 4).reshape(b * n_seg * n_layer, decision_window, d)

    if cfg["down"]:
        x = x.astype(jnp.float32)
        x = _plain_layer_norm(params["down_ln"], x)
        x = linear(params["down"], x)
        d = x.shape[-1]

    x = residual_block(params["time_tr"], x, cfg["n_tatt_head"])
    x = jnp.mean(x, axis=1)  # [B*n_seg*L, D']
    x = x.reshape(b * n_seg, n_layer, d)
    x = residual_block(params["layer_tr"], x, cfg["n_latt_head"])
    x = jnp.mean(x, axis=1)  # [B*n_seg, D']

    x = x.astype(jnp.float32)
    x = _plain_layer_norm(params["mlp_ln"], x)
    logits = linear(params["mlp"], x)
    return logits.reshape(b, n_seg, -1)


def at_window_geometry(audio_len: int, time_resolution: float) -> Tuple[int, int]:
    """(decision_window, n_seg) for a pooled-feature length and tag resolution.

    decision_window = time_resolution * 2.5 pooled frames
    (100 frames/s / 2 conv stride / 20x pooling — whisper_at/model.py:355-357).
    """
    decision_window = int(time_resolution * 2.5)
    n_seg = math.ceil(audio_len / decision_window)
    return decision_window, n_seg
