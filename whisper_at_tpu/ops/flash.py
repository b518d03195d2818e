"""Flash attention for the encoder's 1500-token self-attention.

The XLA formulation materializes the fp32 [B, H, 1500, 1500] logits in HBM
(~1.4 GB per layer at batch 8 for large-v1) — the encoder's dominant memory
traffic. The Pallas TPU flash kernel (jax.experimental.pallas.ops.tpu.
flash_attention) keeps the softmax streaming in VMEM with fp32 accumulators,
so numerics match the reference's fp32-softmax discipline while HBM traffic
drops to O(B * T * D).

Whisper's 1500-frame sequence is padded to 1536 (block multiple); padded
keys are masked out via segment ids.
"""

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    HAVE_FLASH = True
except ImportError:  # pragma: no cover
    HAVE_FLASH = False

_BLOCK = 512


def _pad_len(t: int) -> int:
    return -(-t // _BLOCK) * _BLOCK


def encoder_attention_tpu(q, k, v, n_head: int, impl: str = "single"):
    """Encoder attention dispatch for the TPU path.

    impl="single" (default): the whisper-geometry single-pass kernel
    (ops/flash_enc.py) — the whole per-(batch, head) problem fits in VMEM,
    so it skips the generic flash kernel's online-softmax bookkeeping.
    impl="flash": the generic pallas flash kernel. impl="xla": einsum.
    The choice must be threaded as a STATIC argument from outside any jit
    (Whisper.embed_audio reads the WHISPER_AT_TPU_ENC_ATTN env override per
    call) — an env read inside a traced function would be jit-cached.
    """
    choice = impl
    d_head = q.shape[-1] // n_head
    if choice == "single" and d_head % 64 == 0:
        from .flash_enc import HAVE_PALLAS, encoder_attention

        if HAVE_PALLAS:
            return encoder_attention(q, k, v, n_head)
    if choice != "xla" and HAVE_FLASH:
        return encoder_flash_attention(q, k, v, n_head)
    from ..models.layers import attention

    return attention(q, k, v, n_head)[0]


@partial(jax.jit, static_argnames=("n_head",))
def encoder_flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, n_head: int
) -> jnp.ndarray:
    """Non-causal self-attention [B, T, D] -> [B, T, D] via the flash kernel.

    Applies the 1/sqrt(d_head) scale inside the kernel; output matches the
    einsum+fp32-softmax reference path to bf16 tolerance.
    """
    b, t, d = q.shape
    d_head = d // n_head
    t_pad = _pad_len(t)

    def split(x):
        x = x.reshape(b, t, n_head, d_head).transpose(0, 2, 1, 3)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
        return x

    qh, kh, vh = split(q), split(k), split(v)

    seg = (jnp.arange(t_pad) < t).astype(jnp.int32)[None, :]
    seg = jnp.broadcast_to(seg, (b, t_pad))
    segment_ids = SegmentIds(q=seg, kv=seg)

    out = flash_attention(
        qh, kh, vh,
        segment_ids=segment_ids,
        causal=False,
        sm_scale=d_head**-0.5,
        # swept on v5e at [8,20,1536,64]: full-length q blocks with 512-key
        # tiles were fastest (3.34 ms vs 3.72 for 512/512)
        block_sizes=BlockSizes(
            block_q=t_pad, block_k_major=_BLOCK, block_k=_BLOCK, block_b=1,
        ),
    )
    out = out[:, :, :t].transpose(0, 2, 1, 3).reshape(b, t, d)
    return out
