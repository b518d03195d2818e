"""Test-only torch oracle implementing the reference Whisper-AT math.

Operates directly on the JAX param pytree (converted to torch tensors) so the
same parameters drive both implementations; discrepancies then isolate math
bugs rather than weight-conversion bugs. Formulas follow the reference
(whisper_at/model.py) as documented in SURVEY.md §2.1.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def layer_norm(p, x):
    return F.layer_norm(x, x.shape[-1:], t(p["scale"]), t(p["bias"]), eps=1e-5)


def linear(p, x):
    y = x @ t(p["w"])
    if "b" in p:
        y = y + t(p["b"])
    return y


def attention(p, x, n_head, xa=None, mask=None):
    src = x if xa is None else xa
    q = linear(p["query"], x)
    k = linear(p["key"], src)
    v = linear(p["value"], src)
    B, T, D = q.shape
    S = k.shape[1]
    scale = (D // n_head) ** -0.25
    q = q.view(B, T, n_head, -1).permute(0, 2, 1, 3) * scale
    k = k.view(B, S, n_head, -1).permute(0, 2, 3, 1) * scale
    v = v.view(B, S, n_head, -1).permute(0, 2, 1, 3)
    qk = q @ k
    if mask is not None:
        qk = qk + mask[:T, :S]
    w = F.softmax(qk.float(), dim=-1)
    out = (w @ v).permute(0, 2, 1, 3).flatten(start_dim=2)
    return linear(p["out"], out)


def block(p, x, n_head, xa=None, mask=None):
    x = x + attention(p["attn"], layer_norm(p["attn_ln"], x), n_head, mask=mask)
    if "cross_attn" in p and xa is not None:
        x = x + attention(p["cross_attn"], layer_norm(p["cross_attn_ln"], x), n_head, xa=xa)
    h = F.gelu(linear(p["mlp"]["fc1"], layer_norm(p["mlp_ln"], x)))
    return x + linear(p["mlp"]["fc2"], h)


def _unstack(stacked, i):
    import jax

    return jax.tree.map(lambda a: np.asarray(a)[i], stacked)


def encoder(params, mel, n_head):
    """mel [B, 80, 3000] -> (x [B,1500,D], all_x [B,L,75,D])"""
    x = t(mel)
    w1 = t(params["conv1"]["w"]).permute(2, 1, 0)  # WIO -> torch OIW
    x = F.gelu(F.conv1d(x, w1, t(params["conv1"]["b"]), padding=1))
    w2 = t(params["conv2"]["w"]).permute(2, 1, 0)
    x = F.gelu(F.conv1d(x, w2, t(params["conv2"]["b"]), stride=2, padding=1))
    x = x.permute(0, 2, 1)
    x = x + t(params["positional_embedding"])

    n_layer = np.asarray(params["blocks"]["attn_ln"]["scale"]).shape[0]
    all_x = []
    for i in range(n_layer):
        x = block(_unstack(params["blocks"], i), x, n_head)
        B, T, D = x.shape
        all_x.append(x.reshape(B, T // 20, 20, D).mean(dim=2))
    x = layer_norm(params["ln_post"], x)
    return x, torch.stack(all_x, dim=1)


def decoder_logits(params, tokens, xa, n_head):
    """tokens [B,S] int, xa [B,Ta,D] -> fp32 logits [B,S,V]"""
    tokens = torch.from_numpy(np.asarray(tokens, dtype=np.int64))
    emb = t(params["token_embedding"])
    x = emb[tokens] + t(params["positional_embedding"])[: tokens.shape[1]]
    S = tokens.shape[1]
    mask = torch.full((S, S), float("-inf")).triu_(1)
    n_layer = np.asarray(params["blocks"]["attn_ln"]["scale"]).shape[0]
    xa = t(xa)
    for i in range(n_layer):
        x = block(_unstack(params["blocks"], i), x, n_head, xa=xa, mask=mask)
    x = layer_norm(params["ln"], x)
    return x @ emb.T


def at_head(params, audio_rep, mode, time_resolution, label_dim=527):
    """audio_rep [L, T, D] -> [n_seg, label_dim] (reference unbatched path)"""
    x = t(audio_rep)
    L, T, D = x.shape
    window = int(time_resolution * 2.5)
    n_seg = math.ceil(T / window)
    target = n_seg * window
    if target != T:
        x = F.pad(x, (0, 0, 0, target - T))
    x = x.reshape(L, n_seg, window, D).permute(1, 0, 2, 3).reshape(n_seg * L, window, D)
    if "down" in params:
        x = layer_norm(params["down_ln"], x)
        x = linear(params["down"], x)
    x = block(params["time_tr"], x, n_head=_mode_heads(mode)[0])
    x = x.mean(dim=1).reshape(n_seg, L, -1)
    x = block(params["layer_tr"], x, n_head=_mode_heads(mode)[1])
    x = x.mean(dim=1)
    x = layer_norm(params["mlp_ln"], x)
    return linear(params["mlp"], x)


def _mode_heads(mode):
    parts = mode.split("_")
    return int(parts[-2]), int(parts[-1])
