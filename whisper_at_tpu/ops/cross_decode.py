"""Fused int8 cross-attention for the token-at-a-time decode loop.

The decode loop's dominant HBM stream is the per-layer cross-attention KV
(~31 MB int8 per layer for large-v1 batch 8; ~1 GB per token across 32
layers). The XLA formulation (`ck.astype(bf16)` einsums in
models/decoder.py) materializes dequantized bf16 copies of the KV,
tripling the traffic — measured 3.56 ms of the 5.99 ms decode step on v5e
at ~34% of the int8 byte bound.

This kernel streams the int8 KV through VMEM once and dequantizes in
registers. The key design point — and the fix for the earlier, slower
attempt in ops/flash_decode.py — is the *block-diagonal head fold*: instead
of H separate M=1 matvecs per batch row (each with ~0.2 us MXU issue
overhead, 960 per layer), the per-head queries are expanded into a
block-diagonal [H*G, H*Dh] matrix so the whole QK^T phase is ONE MXU matmul
against the [H*Dh, Ta] key block, and the PV phase is ONE [H*G, Ta] x
[Ta, H*Dh] matmul whose block diagonal is then extracted with H masked
lane-slice adds. Grid = (batch,); each step's ~4 MB KV block DMA is
double-buffered by pallas across grid steps.

Numerics match the XLA int8 path: int8 -> bf16 dequant (in-kernel), bf16
MXU matmuls with fp32 accumulation, fp32 softmax, per-key-position V scales
folded into the softmax weights. G query rows per audio (beam search /
prefill tokens) ride the M axis of the same two matmuls.

Layouts (prepared by models/decoder.precompute_cross_kv(layout="fused")):
  k_q [B, H*Dh, Ta_pad] int8     k_s [B, H, Ta_pad] fp32
  v_q [B, Ta_pad, H*Dh] int8     v_s [B, H, Ta_pad] fp32
  bias [1, Ta_pad] fp32          (0 on valid columns, -1e30 on padding)
Ta is padded to a lane multiple; padded columns carry zero scales and the
additive bias masks them out of the softmax.
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

LANE = 128
NEG_BIG = -1e30
_CHUNK = 512  # Ta positions dequantized/matmul'd per in-kernel slice
_VMEM_LIMIT = None  # bytes; None = Mosaic default


def pad_ta(ta: int) -> int:
    return -(-ta // LANE) * LANE


def _nibbles(p):
    """Packed int4 bytes -> (low, high) sign-extended int32 nibble planes."""
    p32 = p.astype(jnp.int32)
    low = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    high = jnp.right_shift(p32, 4)
    return low, high


def _unpack4_halves(p, axis):
    """Packed Ta-halves int4 (int8 bytes) -> int8 values, natural Ta order.

    Byte j holds position j (low nibble) and position n+j (high nibble),
    n = packed length — see precompute_cross_kv's bits=4 fused packing. The
    shifts sign-extend each nibble; concat along `axis` restores natural
    order with no lane interleave.
    """
    low, high = _nibbles(p)
    return jnp.concatenate([low, high], axis=axis)


def _q_block_diag(q, n_head, d_head, groups):
    """[HG, Dh] head-major queries -> [HG, H*Dh] block-diagonal matrix, so
    the per-head QK^T matvecs become ONE MXU matmul against [H*Dh, Ta]."""
    hg, hd = n_head * groups, n_head * d_head
    q_tiled = pltpu.repeat(q, n_head, axis=1)
    col_head = jax.lax.broadcasted_iota(jnp.int32, (hg, hd), 1) // d_head
    row_head = jax.lax.broadcasted_iota(jnp.int32, (hg, hd), 0) // groups
    return jnp.where(col_head == row_head, q_tiled, 0).astype(q.dtype)


def _fold_head_rows(x, n_head, groups):
    """[H, Ta] per-head vector -> [HG, Ta] in head-major query-row order."""
    if groups == 1:
        return x
    ta = x.shape[-1]
    x = pltpu.repeat(x, groups, axis=0).reshape(groups, n_head, ta)
    return x.transpose(1, 0, 2).reshape(n_head * groups, ta)


def _extract_head_diag(full, n_head, d_head, groups):
    """[HG, H*Dh] PV product -> [HG, Dh]: row h*G+g keeps block h."""
    hg = n_head * groups
    row_h = jax.lax.broadcasted_iota(jnp.int32, (hg, d_head), 0) // groups
    out = jnp.zeros((hg, d_head), jnp.float32)
    for h in range(n_head):
        blk = full[:, h * d_head:(h + 1) * d_head]
        out = out + jnp.where(row_h == h, blk, 0.0)
    return out


def _kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref, out_ref,
            *, n_head, d_head, groups, chunk, bits):
    ta = kq_ref.shape[-1] * (2 if bits == 4 else 1)
    f32 = jnp.float32

    if bits == 4:
        # the kernel is DMA-bound (a stream-only variant measures the same
        # time — see STATUS), so the VPU unpack here is free: int4 halves
        # the dominant HBM stream while compute stays hidden under the DMA
        k_vals = _unpack4_halves(kq_ref[0], axis=-1)   # [HD, Ta] int32
        v_vals = _unpack4_halves(vq_ref[0], axis=0)    # [Ta, HD] int32

        def k_chunk(c):
            return k_vals[:, c:c + chunk]

        def v_chunk(c):
            return v_vals[c:c + chunk, :]
    else:
        def k_chunk(c):
            return kq_ref[0, :, c:c + chunk]

        def v_chunk(c):
            return vq_ref[0, c:c + chunk, :]

    # ---- QK^T: one MXU matmul via the block-diagonal head fold ---------- #
    q = q_ref[0]  # [HG, Dh] bf16 (pre-scaled by dh^-0.5)
    q_diag = _q_block_diag(q, n_head, d_head, groups)

    # bf16 operands accumulate in f32 natively on the MXU (and Mosaic
    # rejects an explicit HIGHEST for them); fp32 operands — the CPU test
    # path — need HIGHEST to avoid bf16 truncation
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    raw = jnp.concatenate(
        [
            jnp.dot(q_diag, k_chunk(c).astype(q.dtype),
                    preferred_element_type=f32, precision=prec)
            for c in range(0, ta, chunk)
        ],
        axis=-1,
    )  # [HG, Ta] fp32

    # per-(head, position) K scales; padding masked by the additive bias
    k_s = _fold_head_rows(ks_ref[0], n_head, groups)  # [HG, Ta] fp32
    logits = raw * k_s + bias_ref[0][None, :]

    # ---- fp32 softmax over the full (in-VMEM) key axis ------------------ #
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [HG, Ta] fp32

    # fold per-position V scales into the weights (decoder.py int8 path)
    v_s = _fold_head_rows(vs_ref[0], n_head, groups)
    pw = (p * v_s).astype(q.dtype)  # [HG, Ta] bf16

    # ---- PV: one MXU matmul, then extract the block diagonal ------------ #
    full = None
    for c in range(0, ta, chunk):
        part = jnp.dot(pw[:, c:c + chunk],
                       v_chunk(c).astype(q.dtype),
                       preferred_element_type=f32, precision=prec)
        full = part if full is None else full + part  # [HG, H*Dh]

    out_ref[0] = _extract_head_diag(full, n_head, d_head, groups).astype(
        out_ref.dtype)


@partial(jax.jit, static_argnames=("n_head", "interpret", "chunk", "bits"))
def cross_attention_int8(
    q: jnp.ndarray,     # [B, H*G, Dh] bf16/f32, ALREADY scaled by dh**-0.5
    k_q: jnp.ndarray,   # [B, H*Dh, Ta_pad] int8 (bits=4: [B, H*Dh, Ta_pad/2])
    k_s: jnp.ndarray,   # [B, H, Ta_pad] fp32
    v_q: jnp.ndarray,   # [B, Ta_pad, H*Dh] int8 (bits=4: [B, Ta_pad/2, H*Dh])
    v_s: jnp.ndarray,   # [B, H, Ta_pad] fp32
    bias: jnp.ndarray,  # [1, Ta_pad] fp32 additive column mask
    n_head: int,
    interpret: bool = False,
    chunk: int = None,
    bits: int = 8,
) -> jnp.ndarray:
    """out [B, H*G, Dh] fp32 = softmax(q k^T + bias) v over int KV, per head.

    Query rows are ordered head-major: row h*G + g is head h, group row g
    (beam hypothesis / prefill token). G = q.shape[1] // n_head.
    bits=4 consumes the Ta-halves nibble packing of
    precompute_cross_kv(layout="fused", bits=4) — half the KV stream.
    """
    b, hg, dh = q.shape
    groups = hg // n_head
    assert hg == n_head * groups
    ta = k_q.shape[-1] * (2 if bits == 4 else 1)
    if chunk is None:
        chunk = _CHUNK
    kernel = partial(_kernel, n_head=n_head, d_head=dh, groups=groups,
                     chunk=chunk, bits=bits)
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((1, hg, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_q.shape[1], k_q.shape[2]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_head, ta), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v_q.shape[1], v_q.shape[2]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_head, ta), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ta), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hg, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hg, dh), jnp.float32),
        interpret=interpret,
    )(q, k_q, k_s, v_q, v_s, bias)
