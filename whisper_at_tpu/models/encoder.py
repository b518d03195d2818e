"""Audio encoder: conv stem + scanned transformer blocks + all-layer pooled taps.

The Whisper-AT modification (whisper_at/model.py:156-177): after every block,
average-pool the hidden states 20x along time and stack them — the TL-TR head
consumes this [n_layer, T/20, D] stack. Here the per-layer taps fall out of
`lax.scan`'s per-iteration outputs for free, batched as [B, L, T/20, D].

Layout is feature-last ([B, T, D]) throughout — the TPU-friendly layout for
both the conv stem (NWC) and the attention matmuls.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .layers import (
    attention,
    gelu,
    init_block,
    init_layer_norm,
    layer_norm,
    linear,
    mha_project_qkv,
    mlp,
    sinusoids,
    stack_blocks,
)

POOL = 20  # Whisper-AT 20x time pooling of encoder taps


def init_encoder(key, dims, dtype=jnp.float32) -> dict:
    k1, k2, kb = jax.random.split(key, 3)
    std1 = (dims.n_mels * 3) ** -0.5
    std2 = (dims.n_audio_state * 3) ** -0.5
    blocks = [
        init_block(k, dims.n_audio_state, cross_attention=False, dtype=dtype)
        for k in jax.random.split(kb, dims.n_audio_layer)
    ]
    return {
        # conv weights in WIO layout: [kernel, in, out]
        "conv1": {
            "w": jax.random.uniform(
                k1, (3, dims.n_mels, dims.n_audio_state), dtype, -std1, std1
            ),
            "b": jnp.zeros((dims.n_audio_state,), dtype),
        },
        "conv2": {
            "w": jax.random.uniform(
                k2, (3, dims.n_audio_state, dims.n_audio_state), dtype, -std2, std2
            ),
            "b": jnp.zeros((dims.n_audio_state,), dtype),
        },
        "positional_embedding": jnp.asarray(
            sinusoids(dims.n_audio_ctx, dims.n_audio_state), dtype
        ),
        "blocks": stack_blocks(blocks),
        "ln_post": init_layer_norm(dims.n_audio_state, dtype),
    }


def _conv1d(params: dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """1-D conv in NWC layout with torch-style symmetric padding of 1."""
    from .layers import matmul_precision

    w = params["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=matmul_precision(x.dtype),
    )
    return y + params["b"].astype(x.dtype)


@partial(jax.jit,
         static_argnames=("n_head", "compute_dtype", "attn_impl", "mlp_impl"))
def encoder_apply(
    params: dict,
    mel: jnp.ndarray,
    n_head: int,
    compute_dtype=jnp.float32,
    attn_impl: str = "single",
    mlp_impl: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the encoder.

    mel: [B, n_mels, 3000] (reference layout). Returns:
      x     : [B, 1500, D]  final hidden states (after ln_post)
      all_x : [B, L, 75, D] per-layer 20x-pooled taps (before ln_post)
    """
    from ..ops.flash import HAVE_FLASH, encoder_attention_tpu

    x = mel.astype(compute_dtype).transpose(0, 2, 1)  # [B, T, n_mels]
    x = gelu(_conv1d(params["conv1"], x, stride=1))
    x = gelu(_conv1d(params["conv2"], x, stride=2))  # [B, 1500, D]
    x = x + params["positional_embedding"].astype(compute_dtype)

    b, t, d = x.shape
    # kernel attention on TPU avoids materializing the fp32 [B,H,T,T] logits
    # (the encoder's dominant HBM traffic); fp32 parity mode, CPU, and
    # mesh-placed models (attn_impl="off") use the einsum path. The impls
    # are STATIC args resolved by the caller (e.g. Whisper.embed_audio reads
    # the env overrides per call) — never read from the environment inside
    # this traced function, where they would be silently jit-cached.
    use_flash = (
        attn_impl != "off"
        and HAVE_FLASH
        and compute_dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
    )
    use_fused_mlp = use_flash and mlp_impl == "fused"
    if use_fused_mlp:
        from ..ops.mlp_enc import mlp_block_fused

    def body(carry, block_params):
        h = carry
        q, k, v = mha_project_qkv(
            block_params["attn"], layer_norm(block_params["attn_ln"], h)
        )
        if use_flash:
            attn_out = encoder_attention_tpu(q, k, v, n_head, impl=attn_impl)
        else:
            attn_out, _ = attention(q, k, v, n_head)
        h = h + linear(block_params["attn"]["out"], attn_out)
        if use_fused_mlp:
            h = mlp_block_fused(h, block_params["mlp_ln"],
                                block_params["mlp"]["fc1"],
                                block_params["mlp"]["fc2"])
        else:
            h = h + mlp(block_params["mlp"],
                        layer_norm(block_params["mlp_ln"], h))
        pooled = h.reshape(b, t // POOL, POOL, d).mean(axis=2)
        return h, pooled

    x, all_x = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(params["ln_post"], x)
    return x, all_x.transpose(1, 0, 2, 3)  # [B, L, T/20, D]


@partial(jax.jit,
         static_argnames=("n_head", "tap_mode", "compute_dtype", "attn_impl"))
def encoder_apply_taps(
    params: dict,
    mel: jnp.ndarray,
    n_head: int,
    tap_mode: str = "all_nopool",
    compute_dtype=jnp.float32,
    attn_impl: str = "single",
) -> jnp.ndarray:
    """Feature-extraction encoder with truncated inputs and tap modes.

    Mirrors the research fork's modified encoder
    (whisper_feat_extracrt/whisper/model.py:148-201): the positional embedding
    is TRUNCATED to the actual token length (so 10 s / 1000-frame AudioSet and
    5 s / 500-frame ESC-50 inputs work without padding), ln_post is skipped,
    and the collected stack INCLUDES the conv/embedding output as layer 0.

    tap_mode:
      'last'       -> [B, T', D] final block output (no ln_post)
      'all_nopool' -> [B, L+1, T', D] embedding output + every block output
      'all_pool'   -> [B, L+1, D] time-mean of each tap
    """
    x = mel.astype(compute_dtype).transpose(0, 2, 1)
    x = gelu(_conv1d(params["conv1"], x, stride=1))
    x = gelu(_conv1d(params["conv2"], x, stride=2))
    t = x.shape[1]
    x = x + params["positional_embedding"][:t].astype(compute_dtype)

    from ..ops.flash import HAVE_FLASH, encoder_attention_tpu

    use_flash = (
        attn_impl != "off"
        and HAVE_FLASH
        and compute_dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
    )

    def body(carry, block_params):
        h = carry
        tap = h  # input of this block == output of the previous layer
        q, k, v = mha_project_qkv(
            block_params["attn"], layer_norm(block_params["attn_ln"], h)
        )
        if use_flash:
            attn_out = encoder_attention_tpu(q, k, v, n_head, impl=attn_impl)
        else:
            attn_out, _ = attention(q, k, v, n_head)
        h = h + linear(block_params["attn"]["out"], attn_out)
        h = h + mlp(block_params["mlp"], layer_norm(block_params["mlp_ln"], h))
        return h, tap

    x, taps = jax.lax.scan(body, x, params["blocks"])
    if tap_mode == "last":
        return x
    all_x = jnp.concatenate([taps, x[None]], axis=0)  # [L+1, B, T', D]
    all_x = all_x.transpose(1, 0, 2, 3)
    if tap_mode == "all_pool":
        return all_x.mean(axis=2)
    if tap_mode == "all_nopool":
        return all_x
    raise ValueError(f"Unknown tap_mode: {tap_mode}")
