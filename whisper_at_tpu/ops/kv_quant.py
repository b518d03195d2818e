"""Fused cross-KV projection + int quantization for the decode precompute.

Before every decode, precompute_cross_kv projects the encoded audio through
each layer's key/value linears and quantizes the results to int8/int4
(models/decoder.py:243). As separate XLA ops that pass materializes, per
layer, two bf16 [B, Ta, D] projection outputs in HBM (~92 MB each at
large-v1 batch 24), re-reads them for the amax reduction, re-reads them
again for the round/clip quantize, and then pads — ~640 MB of avoidable HBM
traffic per layer, ~150 ms of the decode stage's ~400 ms fixed cost across
32 layers at the chip's measured effective bandwidth.

This kernel computes, for one layer and one [block_ta, D] tile of rows:

    k = x @ Wk            (bias-free, like the reference's key projection,
    v = x @ Wv + bv        /root/reference/package/whisper-at/whisper_at/
                           model.py:90-96)
    per-(row, head) symmetric scales over each Dh-wide group
    q = clip(round(y / scale))

entirely in VMEM: HBM sees only the xa read (needed anyway), one load of
the two weight matrices (their BlockSpec index is grid-invariant, so pallas
keeps them resident across all row tiles), and the int8 + fp32-scale
writes. The quantization math is the exact formula of
models/decoder._quantize_sym, so the emitted artifacts are the same
int8/scale tensors the XLA path produces (bitwise-identical in fp32
compute; on the bf16 MXU path accumulation order can differ at rounding
boundaries — parity budget: tools/quant_divergence.py).

Outputs stay in the projections' natural [B, Ta_pad, D] row layout; the
caller does the cheap int8 K transpose / int4 packing exactly as it does
for the XLA path (decoder.precompute_cross_kv layout="fused").
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


def _kernel(xa_ref, wk_ref, wv_ref, bv_ref, kq_ref, ks_ref, vq_ref, vs_ref,
            *, n_head, qmax, ta_valid, block_ta):
    f32 = jnp.float32
    x = xa_ref[0]                              # [bt, D] bf16/f32
    bt, d = x.shape
    dh = d // n_head
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    # mirrors layers.linear: weights cast to x.dtype, MXU f32 accumulation,
    # result cast back to x.dtype before the fp32 quantize math (the XLA
    # path quantizes linear()'s x.dtype output)
    k = jnp.dot(x, wk_ref[...].astype(x.dtype),
                preferred_element_type=f32, precision=prec).astype(x.dtype)
    v = (jnp.dot(x, wv_ref[...].astype(x.dtype),
                 preferred_element_type=f32, precision=prec).astype(x.dtype)
         + bv_ref[0].astype(x.dtype))

    # rows past the valid Ta are zeroed, matching the XLA path's jnp.pad
    # (the value bias would otherwise leak into the padding rows)
    row = jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0) \
        + pl.program_id(1) * block_ta
    valid = row < ta_valid

    def quant(y, q_ref, s_ref):
        yf = y.astype(f32).reshape(bt, n_head, dh)
        amax = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)
        scale = amax / qmax + 1e-12             # decoder._quantize_sym
        q = jnp.clip(jnp.round(yf / scale), -qmax, qmax)
        q = q.reshape(bt, d).astype(jnp.int8)
        q_ref[0] = jnp.where(valid, q, 0)
        s_ref[0] = jnp.where(valid, scale[..., 0], 0.0)

    quant(k, kq_ref, ks_ref)
    quant(v, vq_ref, vs_ref)


@partial(jax.jit, static_argnames=("n_head", "ta_valid", "bits", "block_ta",
                                   "interpret"))
def project_quantize_kv(
    xa: jnp.ndarray,   # [B, Ta_pad, D] bf16/f32, zero rows past ta_valid
    wk: jnp.ndarray,   # [D, D] key projection (no bias)
    wv: jnp.ndarray,   # [D, D] value projection
    bv: jnp.ndarray,   # [D] value bias
    n_head: int,
    ta_valid: int,
    bits: int = 8,
    block_ta: int = 128,
    interpret: bool = False,
):
    """One layer's cross-KV projection + quantize, fused.

    Returns (k_q int8 [B, Ta_pad, D], k_s f32 [B, Ta_pad, H],
             v_q int8 [B, Ta_pad, D], v_s f32 [B, Ta_pad, H]).
    int4 (bits=4) emits ±7-range values still stored as int8; the caller
    casts/packs (the nibble packing is a cheap XLA pass over int8).
    """
    b, ta_pad, d = xa.shape
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
    row_block = pl.BlockSpec((1, block_ta, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    scale_block = pl.BlockSpec((1, block_ta, n_head), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=compiler_params,
        in_specs=[
            row_block,
            pl.BlockSpec((d, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row_block, scale_block, row_block, scale_block],
        out_shape=[
            jax.ShapeDtypeStruct((b, ta_pad, d), jnp.int8),
            jax.ShapeDtypeStruct((b, ta_pad, n_head), jnp.float32),
            jax.ShapeDtypeStruct((b, ta_pad, d), jnp.int8),
            jax.ShapeDtypeStruct((b, ta_pad, n_head), jnp.float32),
        ],
        interpret=interpret,
    )(xa, wk, wv, bv[None, :])
