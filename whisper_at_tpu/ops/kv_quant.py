"""Fused cross-KV projection + int quantization for the decode precompute.

Before every decode, precompute_cross_kv projects the encoded audio through
each layer's key/value linears and quantizes the results to int8/int4
(models/decoder.py:243). As separate XLA ops that pass materializes, per
layer, two bf16 [B, Ta, D] projection outputs in HBM (~92 MB each at
large-v1 batch 24), re-reads them for the amax reduction, re-reads them
again for the round/clip quantize, and then pads — ~640 MB of avoidable HBM
traffic per layer, ~150 ms of the decode stage's ~400 ms fixed cost across
32 layers at the chip's measured effective bandwidth.

This kernel computes, for one layer and one [D, block_ta] tile of columns
(the TRANSPOSED layout — see below):

    k = x @ Wk            (bias-free, like the reference's key projection,
    v = x @ Wv + bv        /root/reference/package/whisper-at/whisper_at/
                           model.py:90-96)
    per-(position, head) symmetric scales over each Dh-wide group
    q = clip(round(y / scale))

entirely in VMEM: HBM sees only the xa read (needed anyway), one load of
the two weight matrices (their BlockSpec index is grid-invariant, so pallas
keeps them resident across all column tiles), and the int8 + fp32-scale
writes. The quantization math is the exact formula of
models/decoder._quantize_sym, so the emitted artifacts are the same
int8/scale tensors the XLA path produces (bitwise-identical in fp32
compute; on the bf16 MXU path accumulation order can differ at rounding
boundaries — parity budget: tools/quant_divergence.py).

Layout: everything is computed transposed — the caller passes xa as
[B, D, Ta_pad] and gets K/V back as [B, D, Ta_pad] with scales
[B, H, Ta_pad]. Two reasons: (a) K and the scales are consumed by the
fused decode kernel (ops/cross_decode.py) in exactly this layout, so only
V needs a (cheap, int8) transpose; (b) Mosaic cannot lower a lane-splitting
reshape (the first on-chip compile of the row-layout kernel died on
`vector<128x1280xf32> -> vector<128x20x64xf32>`), while in the transposed
layout each head is a static SUBLANE slice [Dh, block_ta] and the whole
kernel stays in 2D ops.
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


def _kernel(xt_ref, wk_ref, wv_ref, bv_ref, kq_ref, ks_ref, vq_ref, vs_ref,
            *, n_head, qmax, ta_valid, block_ta):
    f32 = jnp.float32
    xt = xt_ref[0]                             # [D, bt] bf16/f32
    d, bt = xt.shape
    dh = d // n_head
    prec = (jax.lax.Precision.HIGHEST if xt.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    # mirrors layers.linear: weights cast to x.dtype, MXU f32 accumulation,
    # result cast back to x.dtype before the fp32 quantize math (the XLA
    # path quantizes linear()'s x.dtype output). Transposed: y^T = W^T x^T,
    # expressed as dot_general contracting both operands' dim 0 so the
    # weight needs no in-kernel transpose.
    contract = (((0,), (0,)), ((), ()))

    def proj(w_ref):
        return jax.lax.dot_general(
            w_ref[...].astype(xt.dtype), xt, contract,
            preferred_element_type=f32, precision=prec).astype(xt.dtype)

    k = proj(wk_ref)                           # [D, bt]
    v = proj(wv_ref) + bv_ref[...].astype(xt.dtype)

    # columns past the valid Ta are zeroed, matching the XLA path's jnp.pad
    # (the value bias would otherwise leak into the padding columns)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1) \
        + pl.program_id(1) * block_ta
    valid = col < ta_valid

    def quant(y, q_ref, s_ref):
        # per-head static sublane slices keep every op 2D (Mosaic cannot
        # lower lane- or sublane-splitting 3D reshapes of a live vector)
        for h in range(n_head):
            yh = y[h * dh:(h + 1) * dh].astype(f32)     # [Dh, bt]
            amax = jnp.max(jnp.abs(yh), axis=0, keepdims=True)
            scale = amax / qmax + 1e-12                 # decoder._quantize_sym
            q = jnp.clip(jnp.round(yh / scale), -qmax, qmax).astype(jnp.int8)
            q_ref[0, h * dh:(h + 1) * dh] = jnp.where(valid, q, 0)
            s_ref[0, h:h + 1] = jnp.where(valid, scale, 0.0)

    quant(k, kq_ref, ks_ref)
    quant(v, vq_ref, vs_ref)


@partial(jax.jit, static_argnames=("n_head", "ta_valid", "bits", "block_ta",
                                   "interpret"))
def project_quantize_kv(
    xt: jnp.ndarray,   # [B, D, Ta_pad] bf16/f32, zero cols past ta_valid
    wk: jnp.ndarray,   # [D, D] key projection (no bias)
    wv: jnp.ndarray,   # [D, D] value projection
    bv: jnp.ndarray,   # [D] value bias
    n_head: int,
    ta_valid: int,
    bits: int = 8,
    block_ta: int = 256,
    interpret: bool = False,
):
    """One layer's cross-KV projection + quantize, fused, transposed layout.

    Returns (k_q int8 [B, D, Ta_pad], k_s f32 [B, H, Ta_pad],
             v_q int8 [B, D, Ta_pad], v_s f32 [B, H, Ta_pad]).
    int4 (bits=4) emits ±7-range values still stored as int8; the caller
    casts/packs (the nibble packing is a cheap XLA pass over int8).
    """
    b, d, ta_pad = xt.shape
    while ta_pad % block_ta:
        block_ta //= 2
    qmax = {8: 127.0, 4: 7.0}[bits]
    kernel = partial(_kernel, n_head=n_head, qmax=qmax, ta_valid=ta_valid,
                     block_ta=block_ta)
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        )
    grid = (b, ta_pad // block_ta)
    col_block = pl.BlockSpec((1, d, block_ta), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
    scale_block = pl.BlockSpec((1, n_head, block_ta), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=compiler_params,
        in_specs=[
            col_block,
            pl.BlockSpec((d, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[col_block, scale_block, col_block, scale_block],
        out_shape=[
            jax.ShapeDtypeStruct((b, d, ta_pad), jnp.int8),
            jax.ShapeDtypeStruct((b, n_head, ta_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, d, ta_pad), jnp.int8),
            jax.ShapeDtypeStruct((b, n_head, ta_pad), jnp.float32),
        ],
        interpret=interpret,
    )(xt, wk, wv, bv[:, None])
