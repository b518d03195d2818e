"""Whisper-geometry encoder self-attention: single-pass softmax kernel.

The generic flash kernel (ops/flash.py -> jax.experimental.pallas flash)
tiles the key dimension and pays online-softmax bookkeeping per tile:
running-max corrections, accumulator rescaling, m/l scratch updates and
segment-id mask compares — all VPU work that competes with the softmax
itself. For Whisper's encoder the geometry is FIXED and small: T=1500
(padded to 1536), head_dim 64, non-causal, no masking except the 36
padding keys. The whole per-(batch, head) problem fits in VMEM
(scores fp32 [1536, 1536] = 9.4 MB of a v5e's 128 MiB), so this kernel
does the textbook three-step attention with NO tiling of the key axis:

    S = Q K^T          (one MXU matmul, fp32 accumulate)
    P = softmax(S)     (single pass: max, exp, sum — no corrections)
    O = P V / l        (one MXU matmul; 1/l folded as a [T, 1] column
                        scale on the output, not a [T, T] divide)

The 1/sqrt(d_head) scale is applied to Q by the caller: every Whisper
size has head_dim 64, so the scale 64**-0.5 = 0.125 = 2**-3 is EXACT in
bfloat16 (power of two — mantissa untouched) and fuses into the qkv
projection for free.

Padding keys are masked with a big-negative fill over the score columns
>= t_valid (matches the segment-id masking of the generic kernel; the
mask value follows the flash convention of a large finite negative, not
-inf, to keep exp() NaN-free).

Replaces the role of the reference's torch.scaled_dot_product_attention
in the encoder hot loop (reference: package/whisper-at/whisper_at/
model.py:85-100 qkv_attention).
"""

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS = False

_LANES = 128
_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_valid, t_pad):
    q = q_ref[0, 0]  # [block_q, d_head]
    k = k_ref[0, 0]  # [t_pad, d_head]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_q, t_pad]
    if t_valid < t_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < t_valid, s, _MASK_VALUE)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0, 0],
        preferred_element_type=jnp.float32,
    )  # [block_q, d_head]
    o_ref[0, 0] = (o * (1.0 / l)).astype(o_ref.dtype)


def _pad_len(t: int) -> int:
    return -(-t // _LANES) * _LANES


@partial(jax.jit, static_argnames=("n_head", "block_q", "interpret"))
def encoder_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_head: int,
    *,
    block_q: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Non-causal self-attention [B, T, D] -> [B, T, D].

    block_q: query rows per grid step (0 = the whole padded sequence; the
    scores tile is [block_q, T_pad] fp32 in VMEM).
    """
    b, t, d = q.shape
    d_head = d // n_head
    t_pad = _pad_len(t)
    if block_q <= 0:
        block_q = t_pad
    assert t_pad % block_q == 0

    # exact in bf16 whenever d_head is a power of 4 (Whisper: always 64)
    q = q * (d_head ** -0.5)

    def split(x):
        x = x.reshape(b, t, n_head, d_head).transpose(0, 2, 1, 3)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
        return x

    qh, kh, vh = split(q), split(k), split(v)

    out = pl.pallas_call(
        partial(_attn_kernel, t_valid=t, t_pad=t_pad),
        out_shape=jax.ShapeDtypeStruct((b, n_head, t_pad, d_head), q.dtype),
        grid=(b, n_head, t_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_head), lambda i, j, qi: (i, j, qi, 0)),
            pl.BlockSpec((1, 1, t_pad, d_head), lambda i, j, qi: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, t_pad, d_head), lambda i, j, qi: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d_head), lambda i, j, qi: (i, j, qi, 0)
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qh, kh, vh)

    return out[:, :, :t].transpose(0, 2, 1, 3).reshape(b, t, d)
