"""Decode cross-attention with a manual N-deep DMA ring (experiment).

The shipped kernel (ops/cross_decode.py) is DMA-bound: a stream-only
variant times the same as the full kernel, and effective streaming
bandwidth on this chip measures 150-300 GB/s vs the 819 GB/s HBM spec.
Pallas's automatic grid pipelining keeps ~1 block in flight; if the gap is
outstanding-DMA depth (tools/probe_dma.py is the isolated probe), this
variant should close it: the int8/int4 KV streams stay in HBM (pl.ANY) and
the kernel drives its own ring of `nbuf` async copies over Ta chunks,
computing flash-style online softmax per chunk so K and V stream together
in one pass.

Math: identical operands and scale folding as cross_decode._kernel (int8
dequant in registers, bf16 MXU matmuls with f32 accumulation, f32 softmax,
per-position V scales folded into the weights), but the softmax is the
online/rescaled formulation — results match to f32 rounding, not bitwise.

int4 note: the Ta-halves nibble packing stores position j and position
Ta/2+j in one byte, so each DMA'd byte chunk carries TWO disjoint position
ranges; online softmax is order-free, so the kernel simply processes both
slabs per chunk (their scales/bias slices live fully in VMEM).

Ring scope: by default each grid step (= one batch element) runs its own
ring, which at bench geometry (Ta_pad=1536, chunk=512 -> 3 chunks/element)
can never sustain more than 3 outstanding copies before draining at the
grid boundary. WHISPER_AT_TPU_STREAM_GLOBAL=1 switches to ONE persistent
ring over all (batch x chunk) DMAs: scratch buffers and DMA semaphores
persist across sequential ("arbitrary") grid steps, so refills issued near
an element's tail target the next element's chunks and the ring holds its
depth for the whole kernel. In global mode the depth is pinned to
chunks-per-element (nbuf := Ta_bytes/chunk — sweep `chunk` to sweep depth):
that keeps every scratch read a static slice, which Mosaic requires here.

Selection: WHISPER_AT_TPU_CROSS_DECODE=stream (read at trace time in
models/decoder.py — set it before the first decode of the process).

MEASURED NEGATIVE RESULT (on-chip, 2026-08-18, large-v1 batch 24 x 96
steps): every ring geometry LOSES to the shipped auto-pipelined kernel —
per-element rings 0.87-0.96x (best: n4 c1536, 10.73 vs 10.33 ms/step),
global rings 0.75-0.92x. (Global depth is pinned to chunks-per-element,
so the measured global rows were depth 3 at chunk 512 — twice, 11.17 and
11.29 ms/step, a clean replicate — depth 6 at 256 = 12.05, and depth 12
at 128 = 13.86: deeper/finer is strictly worse.) The isolated probe
(tools/probe_dma.py) agrees: manual depth 2/4/8 and the auto grid stream
all measure the SAME bandwidth, so outstanding-DMA depth does not move
this chip's streaming ceiling and the manual ring only adds semaphore
overhead. The shipped kernel stays the default; this file is kept as the
documented experiment.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS = False

from .cross_decode import (
    _extract_head_diag,
    _fold_head_rows,
    _nibbles,
    _q_block_diag,
)

NEG_BIG = -1e30
# ring geometry (import-time env overrides for on-chip sweeps — see
# tools/profile_cross_stream.py)
_CHUNK = int(os.environ.get("WHISPER_AT_TPU_STREAM_CHUNK", "512"))
_NBUF_ENV = os.environ.get("WHISPER_AT_TPU_STREAM_NBUF")
_NBUF_DEFAULT = 4  # per-element rings only; the global ring derives depth
# one persistent ring across ALL (batch x chunk) DMAs instead of a ring
# per grid step: at bench geometry (Ta_pad=1536, chunk=512) each batch
# element has only 3 chunks, so a per-step ring drains at every grid
# boundary and never sustains its depth — the global ring issues the next
# element's copies while this element's tail chunks are still computing
_GLOBAL = os.environ.get("WHISPER_AT_TPU_STREAM_GLOBAL", "0") == "1"


def _kernel(ks_ref, vs_ref, bias_ref, q_ref, kq_hbm, vq_hbm, out_ref,
            kbuf, vbuf, ksem, vsem,
            *, n_head, d_head, groups, chunk, nbuf, bits, global_ring):
    hg = n_head * groups
    hd = n_head * d_head
    f32 = jnp.float32
    b = pl.program_id(0)
    n_batch = pl.num_programs(0)
    # bytes per slot along Ta (int4 packs two positions per byte)
    ta_bytes = kq_hbm.shape[-1]
    n_chunks = ta_bytes // chunk
    # global chunk ids: grid step b covers [b*n_chunks, (b+1)*n_chunks);
    # in global_ring mode slots/semaphores persist across grid steps
    # (dimension_semantics "arbitrary" executes the grid sequentially on
    # one core with one scratch allocation), so a refill issued here may
    # target a later grid step's chunk
    total_chunks = n_batch * n_chunks if global_ring else n_chunks

    # ring slots live in 2D scratch stacked along sublanes (slot s owns
    # rows [s*hd, (s+1)*hd) / [s*chunk, (s+1)*chunk)) and the slot index is
    # STATIC (the chunk loop is unrolled): Mosaic cannot lower a dynamic
    # leading-dim index of a 3D ref, and a traced pl.ds sublane slice only
    # lowers on exactly-128-lane vectors (wider becomes an unsupported
    # gather) — these buffers are 512/1280 lanes wide, so every consumer
    # read must be a static slice. DMA offsets may stay traced.
    def k_dma(slot, g):
        bb, cc = (g // n_chunks, g % n_chunks) if global_ring else (b, g)
        return pltpu.make_async_copy(
            kq_hbm.at[bb, :, pl.ds(cc * chunk, chunk)],
            kbuf.at[pl.ds(slot * hd, hd)], ksem.at[slot])

    def v_dma(slot, g):
        bb, cc = (g // n_chunks, g % n_chunks) if global_ring else (b, g)
        return pltpu.make_async_copy(
            vq_hbm.at[bb, pl.ds(cc * chunk, chunk), :],
            vbuf.at[pl.ds(slot * chunk, chunk)], vsem.at[slot])

    def initial_fill():
        for s in range(min(nbuf, total_chunks)):
            k_dma(s, s).start()
            v_dma(s, s).start()

    if global_ring:
        pl.when(b == 0)(initial_fill)
    else:
        initial_fill()

    # block-diagonal head fold + scale row folds shared with the shipped
    # kernel (ops/cross_decode.py) so a fix there cannot silently diverge
    q = q_ref[0]  # [HG, Dh], pre-scaled by dh^-0.5
    q_diag = _q_block_diag(q, n_head, d_head, groups)
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    k_s = _fold_head_rows(ks_ref[0], n_head, groups)   # [HG, Ta] f32
    v_s = _fold_head_rows(vs_ref[0], n_head, groups)
    bias = bias_ref[0]                # [Ta] f32

    def slabs(kc, vc, c):
        """One ring slot's int payload -> list of (k [HD,C], v [C,HD],
        position offset) slabs in natural Ta coordinates."""
        if bits == 8:
            return [(kc, vc, c * chunk)]
        # int4 Ta-halves: low nibble = position (c*chunk + i), high nibble
        # = position (ta_bytes + c*chunk + i); ta_bytes == Ta_pad // 2
        k_lo, k_hi = _nibbles(kc)
        v_lo, v_hi = _nibbles(vc)
        return [(k_lo, v_lo, c * chunk),
                (k_hi, v_hi, ta_bytes + c * chunk)]

    m0 = jnp.full((hg, 1), NEG_BIG, f32)
    l0 = jnp.zeros((hg, 1), f32)
    acc0 = jnp.zeros((hg, hd), f32)

    def body(c, carry):
        m, l, acc = carry
        g = b * n_chunks + c if global_ring else c
        # static slot: per-element rings cycle c % nbuf; the global ring
        # pins nbuf == n_chunks (enforced by the wrapper) so
        # (b*n_chunks + c) % nbuf == c for every b
        slot = c if global_ring else c % nbuf
        k_dma(slot, g).wait()
        v_dma(slot, g).wait()
        kc = kbuf[slot * hd:(slot + 1) * hd]
        vc = vbuf[slot * chunk:(slot + 1) * chunk]

        for k_vals, v_vals, off in slabs(kc, vc, c):
            raw = jnp.dot(q_diag, k_vals.astype(q.dtype),
                          preferred_element_type=f32, precision=prec)
            width = raw.shape[-1]
            # off/width are Python ints (unrolled loop): static slices —
            # Mosaic has no dynamic_slice lowering in this kernel type
            logits = (raw * k_s[:, off:off + width]
                      + bias[off:off + width][None])
            m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(logits - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pw = (p * v_s[:, off:off + width]).astype(q.dtype)
            acc = acc * alpha + jnp.dot(pw, v_vals.astype(q.dtype),
                                        preferred_element_type=f32,
                                        precision=prec)
            m = m_new

        # refill the slot only AFTER its data was consumed by the dots
        # above — chunk g+nbuf lands in the SAME slot as chunk g, so
        # starting the copy before the compute would race the MXU reads
        if global_ring:
            # traced condition (g depends on the grid step b)
            @pl.when(g + nbuf < total_chunks)
            def _():
                k_dma(slot, g + nbuf).start()
                v_dma(slot, g + nbuf).start()
        elif c + nbuf < n_chunks:  # static
            k_dma(slot, c + nbuf).start()
            v_dma(slot, c + nbuf).start()

        return m, l, acc

    # unrolled (n_chunks <= ~12) so `slot` is a Python int — see the
    # static-slot note above
    carry = (m0, l0, acc0)
    for c in range(n_chunks):
        carry = body(c, carry)
    _, l, acc = carry
    full = acc / l  # [HG, H*Dh]
    out_ref[0] = _extract_head_diag(full, n_head, d_head, groups).astype(
        out_ref.dtype)


@partial(jax.jit, static_argnames=("n_head", "interpret", "chunk", "nbuf",
                                   "bits", "global_ring"))
def cross_attention_int8_stream(
    q: jnp.ndarray,     # [B, H*G, Dh] bf16/f32, ALREADY scaled by dh**-0.5
    k_q: jnp.ndarray,   # [B, H*Dh, Ta_pad] int8 (bits=4: [B, H*Dh, Ta_pad/2])
    k_s: jnp.ndarray,   # [B, H, Ta_pad] fp32
    v_q: jnp.ndarray,   # [B, Ta_pad, H*Dh] int8 (bits=4: [B, Ta_pad/2, H*Dh])
    v_s: jnp.ndarray,   # [B, H, Ta_pad] fp32
    bias: jnp.ndarray,  # [1, Ta_pad] fp32 additive column mask
    n_head: int,
    interpret: bool = False,
    chunk: int = None,
    nbuf: int = None,
    bits: int = 8,
    global_ring: bool = None,
) -> jnp.ndarray:
    """Same contract as cross_decode.cross_attention_int8 (online softmax)."""
    b, hg, dh = q.shape
    groups = hg // n_head
    assert hg == n_head * groups
    ta = k_q.shape[-1] * (2 if bits == 4 else 1)
    hd = k_q.shape[1]
    if chunk is None:
        chunk = _CHUNK
    while k_q.shape[-1] % chunk:
        chunk //= 2
    if global_ring is None:
        global_ring = _GLOBAL
    requested = nbuf if nbuf is not None else (
        int(_NBUF_ENV) if _NBUF_ENV else None)
    if global_ring:
        # the ring depth must equal chunks-per-element so the static slot
        # assignment slot==c holds across grid steps (see _kernel); depth
        # is therefore swept via `chunk`, not `nbuf`, in global mode — a
        # conflicting explicit request would silently measure a different
        # depth than its label, so reject it
        pinned = k_q.shape[-1] // chunk
        if requested is not None and requested != pinned:
            raise ValueError(
                f"global_ring pins nbuf to chunks-per-element "
                f"({k_q.shape[-1]}//{chunk} = {pinned}); got nbuf="
                f"{requested}. Sweep depth via `chunk` in global mode.")
        nbuf = pinned
    else:
        nbuf = requested if requested is not None else _NBUF_DEFAULT
    kernel = partial(_kernel, n_head=n_head, d_head=dh, groups=groups,
                     chunk=chunk, nbuf=nbuf, bits=bits,
                     global_ring=global_ring)
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((1, n_head, ta), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_head, ta), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ta), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, hg, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hg, dh), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbuf * hd, chunk), jnp.int8),
            pltpu.VMEM((nbuf * chunk, hd), jnp.int8),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        interpret=interpret,
    )(k_s, v_s, bias, q, k_q, v_q)
