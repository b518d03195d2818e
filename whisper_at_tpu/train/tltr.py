"""TLTR research model: the 8 ablation modes of the training stack.

JAX re-design of the reference TLTR (whisper_at_train/models.py:49-192).
Batched input [B, n_layer, T, rep_dim] (T = 25 for the AudioSet features).
The shipped inference ATModel (models/at_head.py) is the production variant
of the `lw_tr` / `lw_down_tr` modes with segment reshaping; this module covers
the full research grid: mean_mlp, last_mlp, wa_mlp, mean_tr_N, last_tr_N,
wa_tr_N, wa_down_tr_D_N, lw_tr_T_L, lw_down_tr_D_T_L.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.layers import init_block, init_linear, residual_block


def parse_tltr_mode(mode: str) -> dict:
    cfg = {
        "mode": mode,
        "time_tr": False,
        "layer_tr": False,
        "layer_weight": False,
        "down": False,
        "inter_dim": None,
        "n_tatt_head": None,
        "n_latt_head": None,
    }
    parts = mode.split("_")
    if mode in ("mean_mlp", "last_mlp"):
        return cfg
    if mode == "wa_mlp":
        cfg["layer_weight"] = True
        return cfg
    if "lw_down_tr" in mode:
        cfg.update(
            time_tr=True, layer_tr=True, down=True,
            inter_dim=int(parts[-3]),
            n_tatt_head=int(parts[-2]), n_latt_head=int(parts[-1]),
        )
        return cfg
    if "lw_tr" in mode:
        cfg.update(
            time_tr=True, layer_tr=True,
            n_tatt_head=int(parts[-2]), n_latt_head=int(parts[-1]),
        )
        return cfg
    if "wa_down_tr" in mode:
        cfg.update(
            time_tr=True, layer_weight=True, down=True,
            inter_dim=int(parts[-2]), n_tatt_head=int(parts[-1]),
        )
        return cfg
    if "wa_tr" in mode:
        cfg.update(time_tr=True, layer_weight=True, n_tatt_head=int(parts[-1]))
        return cfg
    if "mean_tr" in mode or "last_tr" in mode:
        cfg.update(time_tr=True, n_tatt_head=int(parts[-1]))
        return cfg
    raise ValueError(f"Unsupported TLTR mode: {mode}")


def init_tltr(
    key, label_dim: int = 527, n_layer: int = 33, rep_dim: int = 1280,
    mode: str = "lw_tr_1_8", dtype=jnp.float32,
) -> dict:
    cfg = parse_tltr_mode(mode)
    kd, kt, kl, km = jax.random.split(key, 4)
    d = cfg["inter_dim"] if cfg["down"] else rep_dim

    params = {
        "mlp_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "mlp": init_linear(km, d, label_dim, dtype=dtype),
    }
    if cfg["layer_weight"]:
        params["layer_weight"] = jnp.full((n_layer,), 1.0 / n_layer, dtype)
    if cfg["down"]:
        params["down_ln"] = {
            "scale": jnp.ones((rep_dim,), dtype),
            "bias": jnp.zeros((rep_dim,), dtype),
        }
        params["down"] = init_linear(kd, rep_dim, cfg["inter_dim"], dtype=dtype)
    if cfg["time_tr"]:
        params["time_tr"] = init_block(kt, d, dtype=dtype)
    if cfg["layer_tr"]:
        params["layer_tr"] = init_block(kl, d, dtype=dtype)
    return params


def _ln(params, x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * params["scale"] + params["bias"]


def _mlp_head(params, x):
    x = _ln(params["mlp_ln"], x)
    return x @ params["mlp"]["w"] + params["mlp"]["b"]


def _weight_average(params, x):
    # x [..., L] contracted against layer weights, normalized by their sum
    w = params["layer_weight"]
    return (x @ w) / jnp.sum(w)


def tltr_apply(params: dict, audio_rep: jnp.ndarray, mode: str) -> jnp.ndarray:
    """audio_rep [B, L, T, D] -> [B, label_dim] clip-level logits."""
    cfg = parse_tltr_mode(mode)
    b, n_layer, t, d = audio_rep.shape

    if mode == "mean_mlp":
        x = audio_rep.mean(axis=1).mean(axis=1)
        return _mlp_head(params, x)

    if mode == "last_mlp":
        x = audio_rep[:, -1].mean(axis=1)
        return _mlp_head(params, x)

    if mode == "wa_mlp":
        x = audio_rep.mean(axis=2)  # [B, L, D]
        x = _weight_average(params, x.transpose(0, 2, 1))  # [B, D]
        return _mlp_head(params, x)

    if cfg["layer_tr"]:  # lw_tr / lw_down_tr (the proposed TL-TR)
        x = audio_rep
        if cfg["down"]:
            x = _ln(params["down_ln"], x)
            x = x @ params["down"]["w"] + params["down"]["b"]
        dd = x.shape[-1]
        x = x.reshape(b * n_layer, t, dd)
        x = residual_block(params["time_tr"], x, cfg["n_tatt_head"])
        x = x.mean(axis=1).reshape(b, n_layer, dd)
        x = residual_block(params["layer_tr"], x, cfg["n_latt_head"])
        x = x.mean(axis=1)
        return _mlp_head(params, x)

    # single-transformer baselines
    if "mean_tr" in mode:
        x = audio_rep.mean(axis=1)
    elif "last_tr" in mode:
        x = audio_rep[:, -1]
    else:  # wa_tr / wa_down_tr
        x = _weight_average(params, audio_rep.transpose(0, 2, 3, 1))  # [B, T, D]
        if cfg["down"]:
            x = _ln(params["down_ln"], x)
            x = x @ params["down"]["w"] + params["down"]["b"]
    x = residual_block(params["time_tr"], x, cfg["n_tatt_head"])
    x = x.mean(axis=1)
    return _mlp_head(params, x)


def count_parameters(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


# layer/dim lookup for feature sources (run.py:125-129)
MODEL_SHAPES = {
    "whisper-tiny": (5, 384),
    "whisper-base": (7, 512),
    "whisper-small": (13, 768),
    "whisper-medium": (25, 1024),
    "whisper-large": (33, 1280),
    "whisper-large-v1": (33, 1280),
    "whisper-large-v2": (33, 1280),
    "w2v": (13, 768),
    "hubert": (25, 1024),
    "hubert-xl": (49, 1280),
}


def tltr_shape_for(model_name: str) -> Tuple[int, int]:
    """(n_layer, rep_dim) of the feature source named in run.py configs."""
    for key, shape in MODEL_SHAPES.items():
        if model_name.startswith(key):
            return shape
    raise ValueError(f"Unknown feature source: {model_name}")
