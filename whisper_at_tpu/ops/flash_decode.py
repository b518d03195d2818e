"""Pallas flash-decode cross-attention: single-query attention over streamed
int8 KV tiles with online softmax.

The decode loop's dominant HBM stream is the cross-attention KV (~1 GB int8
per token for large-v1). This kernel streams K/V tiles through VMEM with the
online-softmax recurrence, dequantizing in-kernel. The grid tiles both the
fused batch*heads axis (sublane-sized blocks, limiting vector-register
pressure) and the key axis (s iterates fastest, so the per-bh-tile softmax
accumulators live across the inner s sweep).

Layout notes (hard-won): per-position scales must be [BH, 1, S] — a
[BH, S, 1] layout puts the scale on the lane axis and Mosaic pads it 128x
(80 MB of VMEM for a 0.3 MB tensor).

STATUS: measured 6.2 ms vs XLA's 2.67 ms for the 32-layer sweep on v5e —
XLA's fused int8 einsum path beats this kernel (the bh-tiled grid under-
utilizes; the larger single-grid variant OOMs VMEM via register spills).
Kept as a numerically-exact (fp32-accumulating) EXPERIMENTAL op and as the
starting point for a whole-layer fused kernel; the production decode path
stays on XLA (models/decoder.py).
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

TILE_S = 512  # key positions per streamed tile
TILE_BH = 16  # batch*head rows per block
NEG_BIG = -1e30


def _kernel(s_valid_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, out_ref,
            m_ref, l_ref, acc_ref):
    sj = pl.program_id(1)
    ns = pl.num_programs(1)

    @pl.when(sj == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_BIG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:].astype(jnp.float32)[:, None, :]  # [bh, 1, Dh]
    k = kq_ref[:].astype(jnp.float32)  # [bh, Dh, T]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]  # [bh, T]
    logits = logits * ks_ref[:][:, 0, :]

    tile = logits.shape[-1]
    cols = sj * tile + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(cols < s_valid_ref[0], logits, NEG_BIG)

    m_prev = m_ref[:]  # [bh, 1]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)  # [bh, T]
    # fold per-position V scales into the softmax weights
    p = p * vs_ref[:][:, 0, :]

    l_ref[:] = l_ref[:] * corr + jnp.sum(
        jnp.exp(logits - m_new), axis=-1, keepdims=True
    )
    m_ref[:] = m_new

    v = vq_ref[:].astype(jnp.float32)  # [bh, T, Dh]
    contrib = jax.lax.dot_general(
        p[:, None, :], v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]  # [bh, Dh]
    acc_ref[:] = acc_ref[:] * corr + contrib

    @pl.when(sj == ns - 1)
    def _():
        out_ref[:] = (acc_ref[:] / l_ref[:]).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def flash_decode_cross(
    q: jnp.ndarray,  # [BH, Dh]
    k_q: jnp.ndarray,  # [BH, Dh, S] int8
    k_s: jnp.ndarray,  # [BH, 1, S] fp32 (per key position)
    v_q: jnp.ndarray,  # [BH, S, Dh] int8
    v_s: jnp.ndarray,  # [BH, 1, S] fp32 (per key position)
    interpret: bool = False,
) -> jnp.ndarray:
    """out [BH, Dh] = softmax(q k / sqrt(Dh)) v over quantized KV.

    The 1/sqrt(Dh) scale is folded into q here. S may be any length (tail
    positions are masked); BH must be a multiple of TILE_BH.
    """
    bh, dh = q.shape
    s = k_q.shape[-1]
    assert bh % TILE_BH == 0, f"BH={bh} must be a multiple of {TILE_BH}"
    s_pad = -(-s // TILE_S) * TILE_S
    if s_pad != s:
        k_q = jnp.pad(k_q, ((0, 0), (0, 0), (0, s_pad - s)))
        k_s = jnp.pad(k_s, ((0, 0), (0, 0), (0, s_pad - s)))
        v_q = jnp.pad(v_q, ((0, 0), (0, s_pad - s), (0, 0)))
        v_s = jnp.pad(v_s, ((0, 0), (0, 0), (0, s_pad - s)))
    grid = (bh // TILE_BH, s_pad // TILE_S)
    q = (q.astype(jnp.float32) * (dh**-0.5)).astype(q.dtype)

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_BH, dh), lambda b, j: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_BH, dh, TILE_S), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_BH, 1, TILE_S), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_BH, TILE_S, dh), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_BH, 1, TILE_S), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_BH, dh), lambda b, j: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE_BH, 1), jnp.float32),
            pltpu.VMEM((TILE_BH, 1), jnp.float32),
            pltpu.VMEM((TILE_BH, dh), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.array([s], jnp.int32), q, k_q, k_s, v_q, v_s)
