"""Functional transformer primitives shared by the encoder, decoder, and TL-TR head.

Design: parameters are plain pytrees (nested dicts of jax arrays), apply
functions are pure. Block parameters are STACKED along a leading layer axis so
the whole stack runs as one `lax.scan` — one compiled layer body regardless of
depth (32 layers of large-v2 compile as fast as 4 layers of tiny).

Numerics mirror the reference's mixed-precision discipline
(whisper_at/model.py:29-49,104-107): layer norm in fp32, attention logits in
fp32, matmul weights cast to the activation dtype. On TPU "half precision"
means bfloat16.
"""

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def sinusoids(length: int, channels: int, max_timescale: float = 10000) -> np.ndarray:
    """Sinusoidal position embeddings (whisper_at/model.py:52-58)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate(
        [np.sin(scaled_time), np.cos(scaled_time)], axis=1
    ).astype(np.float32)


def matmul_precision(dtype) -> jax.lax.Precision:
    """fp32 activations get true-fp32 matmuls (JAX's DEFAULT downcasts to
    bf16 passes, fine for the production bf16 path but not for parity mode)."""
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def layer_norm(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """LayerNorm computed in fp32, result cast back to the input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    out = normed * params["scale"].astype(jnp.float32) + params["bias"].astype(
        jnp.float32
    )
    return out.astype(dtype)


def pack4_last(x: jnp.ndarray) -> jnp.ndarray:
    """int values in [-7, 7], last axis [..., N] -> HALVES-packed int8
    [..., N/2]: byte j holds position j (low nibble) and position N/2+j
    (high nibble) — the same Ta-halves convention the fused cross-decode
    kernel uses (ops/cross_decode.py), because Mosaic cannot lower the
    lane-interleaving reshape a pairwise packing would need, and the XLA
    unpack is a shift/concat with no interleave either. Stored as int8
    (an eager int4 array would trip the S4-layout device_put recursion
    bug — models/decoder._pack4)."""
    n = x.shape[-1] // 2
    lo = x[..., :n].astype(jnp.int32) & 0xF
    hi = x[..., n:].astype(jnp.int32) & 0xF
    return jax.lax.bitcast_convert_type(
        (lo | (hi << 4)).astype(jnp.uint8), jnp.int8
    )


def unpack4_last(p: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack4_last: halves-packed int8 [..., N/2] -> int8 values
    [..., N] in natural order (sign-extended nibbles, shift/concat only)."""
    p32 = p.astype(jnp.int32)
    low = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    high = jnp.right_shift(jnp.left_shift(p32, 24), 28)
    return jnp.concatenate([low, high], axis=-1).astype(jnp.int8)


def linear(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ w + b with w stored [in, out]; weights cast to x.dtype.

    Also accepts int-quantized weights (per-output-channel symmetric
    scales, the dequant folds into the matmul epilogue):
      {"w_q": int8 [in, out], "w_s": fp32 [1, out]}          — HBM reads /2
      {"w_q4": packed int8 [in, out/2], "w_s": fp32 [1, out]} — HBM reads /4
    """
    if "w_q4" in params:
        wp = params["w_q4"]
        lead, k = x.shape[:-1], x.shape[-1]
        m = 1
        for s in lead:
            m *= int(s)
        # pallas fused-unpack path (decode steps: small M, bf16, TPU):
        # streaming packed bytes + VPU nibble unpack in VMEM is the whole
        # point of int4 weights — the XLA fallback materializes the unpack
        # OUTSIDE the decode loop and streams full-width weights instead
        # (measured 1.5x slower than int8; ops/w4_matmul.py docstring)
        from ..ops.w4_matmul import HAVE_PALLAS, w4_matmul

        if (wp.ndim == 2 and m <= 256 and HAVE_PALLAS
                and x.dtype == jnp.bfloat16
                and jax.default_backend() == "tpu"
                and os.environ.get("WHISPER_AT_TPU_W4_MATMUL") != "off"):
            y = w4_matmul(x.reshape(m, k), wp).astype(x.dtype)
            y = y.reshape(*lead, y.shape[-1])
        else:
            w = unpack4_last(wp).astype(x.dtype)
            y = jnp.matmul(x, w, precision=matmul_precision(x.dtype))
        y = y * params["w_s"].astype(x.dtype)
    elif "w_q" in params:
        y = jnp.matmul(
            x, params["w_q"].astype(x.dtype), precision=matmul_precision(x.dtype)
        )
        y = y * params["w_s"].astype(x.dtype)
    else:
        w = params["w"].astype(x.dtype)
        y = jnp.matmul(x, w, precision=matmul_precision(x.dtype))
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


@functools.partial(jax.jit, static_argnames=("bits",))
def _quantize_w(w: jnp.ndarray, bits: int):
    """(payload, scale) of a symmetric per-output-channel quantization.

    Jitted so the large weight tensors quantize on device in one fused
    program (the bits=4 path never materializes an int4 array at all —
    halves nibbles are packed with integer shifts)."""
    w = w.astype(jnp.float32)
    qmax = {8: 127.0, 4: 7.0}[bits]
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    scale = amax / qmax + 1e-12
    q = jnp.clip(jnp.round(w / scale), -qmax, qmax)
    if bits == 4:
        return pack4_last(q.astype(jnp.int8)), scale
    return q.astype(jnp.int8), scale


def quantize_linear(params: dict, bits: int = 8) -> dict:
    """Symmetric per-output-channel int quantization of a linear layer.

    Works on both single [in, out] and layer-stacked [L, in, out] weights:
    the reduction is over the `in` axis (axis=-2), giving [.., 1, out] scales.
    bits=8 stores int8 (+-127 levels); bits=4 stores +-7 levels packed two
    per byte along the OUT axis (pack4_last) — a second halving of the
    decode loop's weight stream at a parity cost quantified by
    tools/quant_divergence.py.
    """
    payload, scale = _quantize_w(params["w"], bits)
    out = ({"w_q4": payload, "w_s": scale} if bits == 4
           else {"w_q": payload, "w_s": scale})
    if "b" in params:
        out["b"] = params["b"]
    return out


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_head: int,
    mask: Optional[jnp.ndarray] = None,
    return_qk: bool = False,
):
    """Scaled dot-product attention with fp32 logits.

    q/k/v: [B, T, D] / [B, S, D] / [B, S, D]. mask, if given, is an additive
    fp32 [.., T, S] bias (broadcastable over batch/heads). Returns [B, T, D]
    and optionally the pre-softmax fp32 logits [B, H, T, S] (used by word-level
    timing, mirroring the reference's qk output at whisper_at/model.py:107).
    """
    dtype = q.dtype
    d_head = q.shape[-1] // n_head
    scale = d_head**-0.5

    qh = _split_heads(q, n_head)
    kh = _split_heads(k, n_head)
    vh = _split_heads(v, n_head)

    prec = matmul_precision(dtype)
    qk = jnp.einsum(
        "bthd,bshd->bhts", qh, kh, preferred_element_type=jnp.float32, precision=prec
    ) * jnp.float32(scale)
    if mask is not None:
        qk = qk + mask
    w = jax.nn.softmax(qk, axis=-1).astype(dtype)
    out = jnp.einsum("bhts,bshd->bthd", w, vh, precision=prec)
    out = out.reshape(q.shape[0], q.shape[1], -1)
    return (out, qk) if return_qk else (out, None)


def mha_project_qkv(params: dict, x: jnp.ndarray, xa: Optional[jnp.ndarray] = None):
    """Project query from x and key/value from x (self) or xa (cross)."""
    src = x if xa is None else xa
    q = linear(params["query"], x)
    k = linear(params["key"], src)  # no bias, per Whisper
    v = linear(params["value"], src)
    return q, k, v


def mlp(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """4x GELU MLP (exact erf gelu, matching torch F.gelu)."""
    h = jax.nn.gelu(linear(params["fc1"], x), approximate=False)
    return linear(params["fc2"], h)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# initializers (for random models; real weights come from checkpoint conversion)
# ---------------------------------------------------------------------------


def init_linear(key, n_in: int, n_out: int, bias: bool = True, dtype=jnp.float32):
    std = 1.0 / math.sqrt(n_in)
    kw, kb = jax.random.split(key)
    params = {"w": jax.random.uniform(kw, (n_in, n_out), dtype, -std, std)}
    if bias:
        params["b"] = jax.random.uniform(kb, (n_out,), dtype, -std, std)
    return params


def init_layer_norm(n: int, dtype=jnp.float32):
    return {"scale": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}


def init_mha(key, n_state: int, dtype=jnp.float32):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "query": init_linear(kq, n_state, n_state, dtype=dtype),
        "key": init_linear(kk, n_state, n_state, bias=False, dtype=dtype),
        "value": init_linear(kv, n_state, n_state, dtype=dtype),
        "out": init_linear(ko, n_state, n_state, dtype=dtype),
    }


def init_block(key, n_state: int, cross_attention: bool = False, dtype=jnp.float32):
    ks, kc, k1, k2 = jax.random.split(key, 4)
    params = {
        "attn": init_mha(ks, n_state, dtype),
        "attn_ln": init_layer_norm(n_state, dtype),
        "mlp": {
            "fc1": init_linear(k1, n_state, 4 * n_state, dtype=dtype),
            "fc2": init_linear(k2, 4 * n_state, n_state, dtype=dtype),
        },
        "mlp_ln": init_layer_norm(n_state, dtype),
    }
    if cross_attention:
        params["cross_attn"] = init_mha(kc, n_state, dtype)
        params["cross_attn_ln"] = init_layer_norm(n_state, dtype)
    return params


def stack_blocks(block_params_list):
    """Stack per-layer param pytrees along a new leading axis for lax.scan."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *block_params_list)


def residual_block(
    params: dict,
    x: jnp.ndarray,
    n_head: int,
    xa: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pre-LN residual attention block (whisper_at/model.py:110-139), used
    standalone by the TL-TR head; the encoder/decoder use scanned variants
    with KV-cache plumbing in their own modules."""
    q, k, v = mha_project_qkv(params["attn"], layer_norm(params["attn_ln"], x))
    attn_out, _ = attention(q, k, v, n_head, mask=mask)
    x = x + linear(params["attn"]["out"], attn_out)
    if "cross_attn" in params and xa is not None:
        q, k, v = mha_project_qkv(
            params["cross_attn"], layer_norm(params["cross_attn_ln"], x), xa
        )
        attn_out, _ = attention(q, k, v, n_head)
        x = x + linear(params["cross_attn"]["out"], attn_out)
    x = x + mlp(params["mlp"], layer_norm(params["mlp_ln"], x))
    return x
