"""Text decoder with a preallocated, functionally-threaded KV cache.

Replaces the reference's hook-mutated cache dict (whisper_at/model.py:283-314)
with explicit cache arrays [L, B, n_ctx, D] updated via dynamic_update_slice
inside a `lax.scan` over layers — XLA aliases the carried buffers so updates
are in place, and a single compiled layer body serves any depth.

Variable-length prompts are right-aligned into a fixed prefill bucket: slots
[0, pad) are masked out of attention and the position embedding is indexed by
(slot - pad), so one compiled program covers every prompt length in a bucket.
"""

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.cross_decode import cross_attention_int8, pad_ta
from ..ops.kv_quant import HAVE_PALLAS as HAVE_KV_KERNEL
from ..ops.kv_quant import project_quantize_kv
from .layers import (
    attention,
    init_block,
    init_layer_norm,
    layer_norm,
    linear,
    mlp,
    stack_blocks,
)

NEG_INF = float("-inf")

# WHISPER_AT_TPU_CROSS_DECODE=stream selects the manual-DMA-ring decode
# cross-attention experiment (ops/cross_decode_stream.py). Import-time
# constant: set it in the environment before importing whisper_at_tpu.
_CROSS_DECODE_IMPL = os.environ.get("WHISPER_AT_TPU_CROSS_DECODE", "")


def init_decoder(key, dims, dtype=jnp.float32) -> dict:
    ke, kp, kb = jax.random.split(key, 3)
    blocks = [
        init_block(k, dims.n_text_state, cross_attention=True, dtype=dtype)
        for k in jax.random.split(kb, dims.n_text_layer)
    ]
    return {
        "token_embedding": jax.random.normal(
            ke, (dims.n_vocab, dims.n_text_state), dtype
        )
        * 0.02,
        "positional_embedding": jax.random.normal(
            kp, (dims.n_text_ctx, dims.n_text_state), dtype
        )
        * 0.01,
        "blocks": stack_blocks(blocks),
        "ln": init_layer_norm(dims.n_text_state, dtype),
    }


def fuse_decoder_blocks(params: dict) -> dict:
    """Concatenate each layer's self-attention q/k/v projections into one
    [D, 3D] matmul (k's missing bias becomes zeros — numerically identical).

    One fused matmul replaces three per layer in the token-at-a-time decode
    loop, where per-op dispatch latency, not FLOPs, dominates. Done once at
    model build; costs +50%% self-attn weight memory.
    """
    blocks = params["blocks"]
    attn = blocks["attn"]
    qw, kw, vw = attn["query"]["w"], attn["key"]["w"], attn["value"]["w"]
    qb, vb = attn["query"]["b"], attn["value"]["b"]
    kb = jnp.zeros_like(qb)
    fused_attn = {
        "qkv": {
            "w": jnp.concatenate([qw, kw, vw], axis=-1),  # [L, D, 3D]
            "b": jnp.concatenate([qb, kb, vb], axis=-1),
        },
        "out": attn["out"],
    }
    new_blocks = dict(blocks)
    new_blocks["attn"] = fused_attn
    out = dict(params)
    out["blocks"] = new_blocks
    # pre-transposed embedding for the per-token vocab projection: without it
    # XLA re-transposes the [V, D] table every decode step
    out["token_embedding_t"] = jnp.transpose(params["token_embedding"])
    return out


def quantize_decoder_blocks(fused_params: dict, bits: int = 8) -> dict:
    """int-quantize the decoder block matmul weights (per-output-channel
    symmetric scales; see layers.quantize_linear). bits=8 halves the
    ~1.7 GB/token weight stream of large-v1's decode loop; bits=4 halves it
    again (packed two per byte, unpacked in the matmul operand read).
    Opt-in (DecodingOptions.weight_quant / weight_bits); cross-attn
    key/value projections stay full precision since their output feeds the
    (optionally separately quantized) KV cache."""
    from .layers import quantize_linear

    blocks = dict(fused_params["blocks"])
    attn = dict(blocks["attn"])
    attn["qkv"] = {**quantize_linear(attn["qkv"], bits),
                   "b": attn["qkv"]["b"]}
    attn["out"] = quantize_linear(attn["out"], bits)
    blocks["attn"] = attn
    cross = dict(blocks["cross_attn"])
    cross["query"] = quantize_linear(cross["query"], bits)
    cross["out"] = quantize_linear(cross["out"], bits)
    blocks["cross_attn"] = cross
    mlp_p = dict(blocks["mlp"])
    mlp_p["fc1"] = quantize_linear(mlp_p["fc1"], bits)
    mlp_p["fc2"] = quantize_linear(mlp_p["fc2"], bits)
    blocks["mlp"] = mlp_p

    out = dict(fused_params)
    out["blocks"] = blocks
    return out


def init_cache(
    n_layer: int, batch: int, n_ctx: int, n_state: int, dtype, n_head: int,
    quantize: bool = False, bits: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Self-attention KV cache in head-split row layout [L, B, H, ctx, Dh].

    Row layout keeps the per-token cache write a cheap contiguous
    dynamic-update-slice (a dynamic write on the lane-minor axis stalls the
    TPU); the self cache is small (~100 slots) so its per-step K transpose is
    noise. The STATIC cross-attention K, by contrast, is stored pre-transposed
    (precompute_cross_kv) — re-transposing 1.9 GB per token was the decode
    loop's dominant cost.

    quantize=True stores int values with per-(layer,row,head,slot) fp32
    scales — halves (bits=8: {"q": int8, "s": fp32[L,B,ctx,H]}) or quarters
    (bits=4: {"q4": packed int8 [.., Dh/2], "s"} — two +-7 nibbles per byte
    along Dh) the cache bytes, which matters most in beam search where the
    whole cache is re-streamed through the one-hot byte-shuffle permute
    along the beam axis every step (packed nibbles ride inside the bytes
    untouched — the permute contracts the B axis only).
    """
    d_head = n_state // n_head
    if quantize:
        # scales live as [L, B, ctx, H]: the per-step dynamic write lands on
        # the SUBLANE (ctx) axis — a dynamic write on the lane-minor axis
        # stalls the TPU (same rule that dictates the row layout above)
        scales = jnp.zeros((n_layer, batch, n_ctx, n_head), jnp.float32)
        if bits == 4:
            cache = {
                "q4": jnp.zeros(
                    (n_layer, batch, n_head, n_ctx, d_head // 2), jnp.int8),
                "s": scales,
            }
        else:
            cache = {
                "q": jnp.zeros(
                    (n_layer, batch, n_head, n_ctx, d_head), jnp.int8),
                "s": scales,
            }
        return cache, {k: v.copy() for k, v in cache.items()}
    shape = (n_layer, batch, n_head, n_ctx, d_head)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def _split_kt(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """[B, S, D] -> transposed key layout [B, H, Dh, S]."""
    b, s, d = x.shape
    return x.reshape(b, s, n_head, d // n_head).transpose(0, 2, 3, 1)


def _split_v(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """[B, S, D] -> value layout [B, H, S, Dh]."""
    b, s, d = x.shape
    return x.reshape(b, s, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, Dh] -> [B, S, D]."""
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def attention_decode(
    qh: jnp.ndarray,  # [B, H, T, Dh]
    k: jnp.ndarray,  # [B, H, Dh, S] if k_transposed else [B, H, S, Dh]
    vh: jnp.ndarray,  # [B, H, S, Dh]
    mask: Optional[jnp.ndarray] = None,
    k_transposed: bool = True,
) -> jnp.ndarray:
    """Attention on head-split layouts with fp32 logits."""
    dtype = qh.dtype
    scale = jnp.float32(qh.shape[-1] ** -0.5)
    pattern = "bhtd,bhds->bhts" if k_transposed else "bhtd,bhsd->bhts"
    qk = jnp.einsum(pattern, qh, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        qk = qk + mask
    w = jax.nn.softmax(qk, axis=-1).astype(dtype)
    return jnp.einsum("bhts,bhsd->bhtd", w, vh)


def _pack4(x: jnp.ndarray) -> jnp.ndarray:
    """int4 [..., N] -> int8-packed [..., N/2] (two nibbles per byte).

    jax int4 arrays crossing a jit boundary trip a device_put recursion bug
    (S4 layouts), so quantized tensors travel between the precompute jit and
    the decode-loop jit as packed int8 and unpack (a free bitcast) inside
    the consumer.
    """
    return jax.lax.bitcast_convert_type(
        x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2), jnp.int8
    )


def cross_kv_payload(x) -> jnp.ndarray:
    """The quantized (or plain) payload array of a cross-KV operand — the
    single place that knows the {"q", "q4"} key set (shape derivation in
    the sampling loops routes through here)."""
    if isinstance(x, dict):
        return x.get("q", x.get("q4"))
    return x


def _unpack4_halves_xla(p: jnp.ndarray, axis: int) -> jnp.ndarray:
    """XLA-side unpack of the fused layout's Ta-halves nibble packing for
    the wide-prefill einsum branch — the same shared nibble helper the
    pallas kernels use (ops/cross_decode), so a packing-convention change
    there cannot diverge from this branch."""
    from ..ops.cross_decode import _unpack4_halves

    return _unpack4_halves(p, axis).astype(jnp.int8)


def _unpack_q(d: dict) -> jnp.ndarray:
    """The quantized payload of {"q": int8} or {"q4": packed int4}."""
    if "q" in d:
        return d["q"]
    u = jax.lax.bitcast_convert_type(d["q4"], jnp.int4)
    return u.reshape(*u.shape[:-2], u.shape[-2] * 2)


def _quantize_sym(x: jnp.ndarray, axis: int, bits: int = 8) -> dict:
    """Symmetric int quantization with per-slice scales along `axis`.

    bits=8 stores int8 (+-127 levels); bits=4 stores jnp.int4 (+-7 levels,
    XLA packs two values per HBM byte on TPU) — halves the decode loop's
    dominant cross-KV stream again at a parity cost quantified by
    tools/quant_divergence.py.
    """
    qmax = {8: 127.0, 4: 7.0}[bits]
    dtype = {8: jnp.int8, 4: jnp.int4}[bits]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = amax / qmax + 1e-12
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -qmax, qmax).astype(
        dtype
    )
    return {"q": q, "s": scale}


def precompute_cross_kv(
    params: dict,
    xa: jnp.ndarray,
    n_head: int,
    compute_dtype=jnp.float32,
    quantize: bool = False,
    layout: str = "heads",
    bits: int = 8,
):
    """See _precompute_cross_kv. This wrapper resolves the fused-layout
    projection+quantize implementation OUTSIDE the jit trace so the env
    override participates in the compilation cache key:

      WHISPER_AT_TPU_KV_PRECOMPUTE=kernel|xla
        kernel (default on TPU): ops/kv_quant.py pallas kernel — projects
          and quantizes each layer's cross-KV in VMEM, never materializing
          the bf16 [B, Ta, D] projection outputs in HBM. Gate passed
          on-chip 2026-08-18 (tools/profile_kv_precompute.py): compiles
          under Mosaic, 1.58x faster than the XLA path at large-v1
          batch 24 (171 -> 108 ms), artifacts within the int8
          rounding-boundary budget (bf16 accumulation-order only; decode
          token parity pinned by tests).
        xla (default off-TPU): the einsum/quantize/pad formulation (always
          used for the non-fused layouts, where artifacts must be bitwise
          reproducible against the oracle quantizer).
    """
    impl = "xla"
    if quantize and layout == "fused" and HAVE_KV_KERNEL \
            and "w" in params["blocks"]["cross_attn"]["key"]:
        default = "kernel" if jax.default_backend() == "tpu" else "xla"
        impl = os.environ.get("WHISPER_AT_TPU_KV_PRECOMPUTE", default)
        if impl == "kernel" and jax.default_backend() != "tpu":
            impl = "kernel-interpret"
        if impl == "kernel" and compute_dtype == jnp.float32:
            # f32 weights would pin 2 x [D, D] x 4 B in VMEM (13 MB at
            # large-v1) on top of the row tiles; f32 is the parity mode
            # anyway, where the bitwise-reproducible XLA path is the point
            impl = "xla"
    return _precompute_cross_kv(
        params, xa, n_head, compute_dtype, quantize, layout, bits, impl
    )


@partial(
    jax.jit,
    static_argnames=("n_head", "compute_dtype", "quantize", "layout", "bits",
                     "impl"),
)
def _precompute_cross_kv(
    params: dict,
    xa: jnp.ndarray,
    n_head: int,
    compute_dtype=jnp.float32,
    quantize: bool = False,
    layout: str = "heads",
    bits: int = 8,
    impl: str = "xla",
):
    """Cross-attention keys/values for all layers, computed once per decode.

    xa: [B, Ta, D] encoded audio. Returns head-split, decode-layout tensors
    ck_t [L, B, H, Dh, Ta] and cv [L, B, H, Ta, Dh]. (The reference caches
    these through hooks on first use; here they are simply precomputed.)

    quantize=True stores both as symmetric int8 with per-key-position scales
    ({"q": int8, "s": fp32}) — the decode loop's dominant HBM stream halves,
    and the scales factor out of the attention matmuls exactly (K per
    position, V folded into the softmax weights).

    layout="fused" (requires quantize) lays the int8 tensors out for the
    fused pallas decode kernel (ops/cross_decode.py): K [L, B, H*Dh, Ta_pad]
    with Ta padded to a lane multiple, V [L, B, Ta_pad, H*Dh], scales
    [L, B, H, Ta_pad], plus an additive column bias "m" [L, 1, Ta_pad]
    masking the padding. The XLA einsum path consumes the same layout via
    reshape, so one precompute serves kernel steps and einsum prefills.
    """
    xa = xa.astype(compute_dtype)
    use_kernel = impl.startswith("kernel")
    if use_kernel:
        b0, ta0, _ = xa.shape
        # one bf16 pad + transpose shared by every layer's kernel call (the
        # XLA path instead pads each layer's four quantized artifacts); the
        # kernel computes in the transposed [B, D, Ta_pad] layout so K and
        # the scales come back already in the fused decode layout
        xa_kernel = jnp.pad(
            xa, ((0, 0), (0, pad_ta(ta0) - ta0), (0, 0))
        ).transpose(0, 2, 1)

    def body(_, block_params):
        ca = block_params["cross_attn"]
        if quantize and layout == "fused":
            if use_kernel:
                # fused projection+quantize (ops/kv_quant.py): the bf16
                # [B, Ta, D] projection outputs never touch HBM
                kq_n, ks_n, vq_n, vs_n = project_quantize_kv(
                    xa_kernel, ca["key"]["w"].astype(compute_dtype),
                    ca["value"]["w"].astype(compute_dtype),
                    ca["value"]["b"].astype(compute_dtype),
                    n_head, ta_valid=ta0, bits=bits,
                    interpret=impl == "kernel-interpret",
                )
                kf = kq_n                      # int8 [B, D, Ta_pad]
                ks = ks_n                      # f32  [B, H, Ta_pad]
                vf = vq_n.transpose(0, 2, 1)   # int8 [B, Ta_pad, D]
                vs = vs_n
                if bits == 4:
                    kf = kf.astype(jnp.int4)
                    vf = vf.astype(jnp.int4)
                ta, ta_pad = ta0, kf.shape[-1]
                pad = ta_pad - ta
            else:
                # quantize in the projections' natural [B, Ta, D] layout:
                # the per-position scale groups over Dh are the same 64
                # values either way (max is order-independent, so the int8
                # tensors are bitwise identical to the head-layout
                # quantization), but V's fused layout [B, Ta, H*Dh] falls
                # out with NO transpose and K transposes int8 instead of
                # bf16 — a third of the precompute pass's HBM traffic
                k_raw = linear(ca["key"], xa)    # [B, Ta, D]
                v_raw = linear(ca["value"], xa)  # [B, Ta, D]
                b, ta, d = k_raw.shape
                dh = d // n_head
                ta_pad = pad_ta(ta)
                pad = ta_pad - ta
                kq = _quantize_sym(
                    k_raw.reshape(b, ta, n_head, dh), axis=-1, bits=bits
                )
                vq = _quantize_sym(
                    v_raw.reshape(b, ta, n_head, dh), axis=-1, bits=bits
                )
                kf = jnp.pad(
                    kq["q"].reshape(b, ta, d).transpose(0, 2, 1),
                    ((0, 0), (0, 0), (0, pad)),
                )
                ks = jnp.pad(
                    kq["s"][..., 0].transpose(0, 2, 1),
                    ((0, 0), (0, 0), (0, pad))
                )
                vf = jnp.pad(
                    vq["q"].reshape(b, ta, d), ((0, 0), (0, pad), (0, 0))
                )
                vs = jnp.pad(
                    vq["s"][..., 0].transpose(0, 2, 1),
                    ((0, 0), (0, 0), (0, pad))
                )
            mask = jnp.concatenate(
                [jnp.zeros((1, ta), jnp.float32),
                 jnp.full((1, pad), -1e30, jnp.float32)], axis=1,
            )
            if bits == 4:
                # Ta-halves nibble packing: byte j holds position j in
                # the low nibble and position ta_pad/2 + j in the high
                # nibble, so the consumer's unpack is two shifts and a
                # concat along Ta — NO lane interleave (softmax order is
                # irrelevant as long as scales/bias/V share it, and the
                # halves concat preserves natural order outright).
                half = ta_pad // 2
                kp = jax.lax.bitcast_convert_type(
                    jnp.stack([kf[..., :half], kf[..., half:]], axis=-1),
                    jnp.int8,
                )
                vp = jax.lax.bitcast_convert_type(
                    jnp.stack([vf[:, :half], vf[:, half:]], axis=-1),
                    jnp.int8,
                )
                return None, (
                    {"q4": kp, "s": ks, "m": mask},
                    {"q4": vp, "s": vs},
                )
            return None, (
                {"q": kf, "s": ks, "m": mask},
                {"q": vf, "s": vs},
            )
        k = _split_kt(linear(ca["key"], xa), n_head)  # [B, H, Dh, Ta]
        v = _split_v(linear(ca["value"], xa), n_head)  # [B, H, Ta, Dh]
        if quantize:
            kq = _quantize_sym(k, axis=-2, bits=bits)
            vq = _quantize_sym(v, axis=-1, bits=bits)
            if bits == 4:
                # travel packed-int8 across the jit boundary (see _pack4);
                # K packs along Ta, V along Dh — both even
                kq = {"q4": _pack4(kq["q"]), "s": kq["s"]}
                vq = {"q4": _pack4(vq["q"]), "s": vq["s"]}
                return None, (kq, vq)
            return None, (kq, vq)
        return None, (k, v)

    _, (ck, cv) = jax.lax.scan(body, None, params["blocks"])
    return ck, cv


def _cross_attn_apply(
    block_params: dict,
    h: jnp.ndarray,  # [B, S, D]
    ck,  # cross-K: array / int8-dict / fused-layout dict
    cv,
    n_head: int,
    compute_dtype,
    group: int = 1,
) -> jnp.ndarray:
    """One layer's cross-attention over precomputed audio keys/values, with
    the residual added — shared by the uniform-position decoder_forward and
    the per-row-position decoder_forward_rows (speculative decoding).
    Grouped rows (beams) fold into the query sequence axis so the shared
    K/V stream is read once per audio row."""
    normed = layer_norm(block_params["cross_attn_ln"], h)
    q = linear(block_params["cross_attn"]["query"], normed)
    qh_c = _split_v(q, n_head)
    if group > 1:
        b_, h_heads, s_, dh_ = qh_c.shape
        qh_c = (
            qh_c.reshape(b_ // group, group, h_heads, s_, dh_)
            .transpose(0, 2, 1, 3, 4)
            .reshape(b_ // group, h_heads, group * s_, dh_)
        )
    if isinstance(ck, dict) and "m" in ck:  # fused int8/int4 layout
        a_, h_heads, t2_, dh_ = qh_c.shape
        scale = dh_ ** -0.5  # exact in bf16 for Dh=64 (power of two)
        kv_bits = 4 if "q4" in ck else 8
        if h_heads * t2_ <= 256:
            # decode steps / small prefills: one-matmul pallas kernel
            # reads the int KV stream directly (no bf16 materialization)
            q_rows = (qh_c * scale).reshape(a_, h_heads * t2_, dh_)
            # experiment flag, resolved ONCE at module import (decode
            # traces are jit-cached by shape, so a mid-process env flip
            # could never reliably switch kernels — an import-time
            # constant makes that explicit; A/B in fresh processes):
            # manual-DMA-ring streaming variant, cross_decode_stream.py
            if _CROSS_DECODE_IMPL == "stream":
                from ..ops.cross_decode_stream import (
                    cross_attention_int8_stream as _cross_fn,
                )
            else:
                _cross_fn = cross_attention_int8
            out = _cross_fn(
                q_rows.astype(compute_dtype),
                cross_kv_payload(ck), ck["s"],
                cross_kv_payload(cv), cv["s"], ck["m"],
                n_head=h_heads,
                interpret=jax.default_backend() != "tpu",
                bits=kv_bits,
            )
            attn_out = out.reshape(a_, h_heads, t2_, dh_).astype(
                compute_dtype
            )
        else:
            # wide prefills (beam x bucket rows): einsum on the same
            # layout; the additive bias masks the Ta padding
            if kv_bits == 4:
                ckq = _unpack4_halves_xla(ck["q4"], axis=-1)
                cvq = _unpack4_halves_xla(cv["q4"], axis=1)
            else:
                ckq, cvq = ck["q"], cv["q"]
            ta_pad = ckq.shape[-1]
            ck4 = ckq.reshape(a_, h_heads, dh_, ta_pad)
            qk = (
                jnp.einsum(
                    "bhtd,bhds->bhts", qh_c, ck4.astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                )
                * ck["s"][:, :, None, :]
                * jnp.float32(scale)
                + ck["m"][0]
            )
            w = jax.nn.softmax(qk, axis=-1)
            w = (w * cv["s"][:, :, None, :]).astype(compute_dtype)
            cv4 = cvq.reshape(a_, ta_pad, h_heads, dh_)
            attn_out = jnp.einsum(
                "bhts,bshd->bhtd", w, cv4.astype(compute_dtype)
            )
    elif isinstance(ck, dict):  # int8-quantized cross KV (head layout)
        scale = jnp.float32(qh_c.shape[-1] ** -0.5)
        qk = (
            jnp.einsum(
                "bhtd,bhds->bhts",
                qh_c,
                _unpack_q(ck).astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            * ck["s"][:, :, 0, :][:, :, None, :]  # per-key-position scale
            * scale
        )
        w = jax.nn.softmax(qk, axis=-1)
        # fold the V scales (per key position) into the softmax weights
        w = (w * cv["s"][..., 0][:, :, None, :]).astype(compute_dtype)
        attn_out = jnp.einsum(
            "bhts,bhsd->bhtd", w, _unpack_q(cv).astype(compute_dtype)
        )
    else:
        attn_out = attention_decode(
            qh_c, ck.astype(compute_dtype), cv.astype(compute_dtype)
        )
    if group > 1:
        a_, h_heads, gs_, dh_ = attn_out.shape
        attn_out = (
            attn_out.reshape(a_, h_heads, group, gs_ // group, dh_)
            .transpose(0, 2, 1, 3, 4)
            .reshape(a_ * group, h_heads, gs_ // group, dh_)
        )
    return h + linear(block_params["cross_attn"]["out"], _merge_heads(attn_out))


def decoder_forward(
    params: dict,
    tokens: jnp.ndarray,  # [B, S] int32
    cross_k: jnp.ndarray,  # [L, B/group, H, Dh, Ta] (pre-transposed layout)
    cross_v: jnp.ndarray,  # [L, B/group, H, Ta, Dh]
    self_k: jnp.ndarray,  # [L, B, H, n_ctx, Dh] cache (functionally updated)
    self_v: jnp.ndarray,  # [L, B, H, n_ctx, Dh]
    write_pos: jnp.ndarray,  # scalar int32: cache slot of tokens[:, 0]
    pad: jnp.ndarray,  # scalar int32: slots < pad are masked out
    n_head: int,
    compute_dtype=jnp.float32,
    group: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder pass over S tokens (prefill: S = bucket; step: S = 1).

    group: consecutive token rows per shared audio row. Beam search / best-of
    runs K hypotheses per window; their cross-attention keys/values are
    IDENTICAL (same encoder output), so the cross tensors keep one row per
    audio and the K query rows fold into the attention's sequence axis. This
    cuts the decode loop's dominant HBM stream (the cross-KV read) K-fold vs
    materializing repeated rows.

    Returns (hidden [B, S, D] after final LN, updated self_k, updated self_v).
    Project to vocabulary logits with `project_logits` on the positions you
    need — avoids materializing [B, S, V] during prefill.
    """
    n_ctx = (self_k.get("q", self_k.get("q4"))
             if isinstance(self_k, dict) else self_k).shape[-2]
    s = tokens.shape[1]

    pos = write_pos + jnp.arange(s, dtype=jnp.int32) - pad
    pos = jnp.maximum(pos, 0)
    x = (
        jnp.take(params["token_embedding"], tokens, axis=0)
        + jnp.take(params["positional_embedding"], pos, axis=0)
    ).astype(compute_dtype)

    # additive mask [S, n_ctx]: key slot j visible to query i iff
    # pad <= j <= write_pos + i (causal over slots, prompt-pad excluded)
    slots = jnp.arange(n_ctx, dtype=jnp.int32)[None, :]
    qpos = write_pos + jnp.arange(s, dtype=jnp.int32)[:, None]
    # `slots == qpos` keeps pad-garbage query rows from being fully masked:
    # a fully-masked softmax yields NaN which would poison the KV cache
    # (0 * NaN = NaN) even though those rows are never read as outputs.
    allowed = ((slots >= pad) & (slots <= qpos)) | (slots == qpos)
    mask = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)

    # note: routing the MLP through the fused pallas kernel (ops/fused_mlp)
    # inside this scan measured 6.83 ms/step vs 6.54 ms for plain XLA on v5e
    # (XLA already pipelines fc1/gelu/fc2 well) — kept as a standalone op
    use_fused_mlp = False

    def body(carry, xs):
        h, sk_all, sv_all = carry
        layer_idx, block_params, ck, cv = xs

        # self-attention with cache update (decode layouts: see init_cache)
        normed = layer_norm(block_params["attn_ln"], h)
        if "qkv" in block_params["attn"]:
            qkv = linear(block_params["attn"]["qkv"], normed)
            q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
        else:
            q = linear(block_params["attn"]["query"], normed)
            k_new = linear(block_params["attn"]["key"], normed)
            v_new = linear(block_params["attn"]["value"], normed)
        qh = _split_v(q, n_head)  # [B, H, S, Dh]
        kh_new = _split_v(k_new, n_head)
        vh_new = _split_v(v_new, n_head)
        if isinstance(sk_all, dict):  # int self cache (int8 or packed int4)
            packed = "q4" in sk_all
            qkey = "q4" if packed else "q"
            kq = _quantize_sym(kh_new, axis=-1, bits=4 if packed else 8)
            vq = _quantize_sym(vh_new, axis=-1, bits=4 if packed else 8)
            kq_pay = _pack4(kq["q"]) if packed else kq["q"]
            vq_pay = _pack4(vq["q"]) if packed else vq["q"]
            # scale updates: [B, H, S, 1] -> [B, S, H] (ctx-axis write)
            ks_new = kq["s"][..., 0].transpose(0, 2, 1)
            vs_new = vq["s"][..., 0].transpose(0, 2, 1)
            sk_all = {
                qkey: jax.lax.dynamic_update_slice(
                    sk_all[qkey], kq_pay[None], (layer_idx, 0, 0, write_pos, 0)
                ),
                "s": jax.lax.dynamic_update_slice(
                    sk_all["s"], ks_new[None], (layer_idx, 0, write_pos, 0)
                ),
            }
            sv_all = {
                qkey: jax.lax.dynamic_update_slice(
                    sv_all[qkey], vq_pay[None], (layer_idx, 0, 0, write_pos, 0)
                ),
                "s": jax.lax.dynamic_update_slice(
                    sv_all["s"], vs_new[None], (layer_idx, 0, write_pos, 0)
                ),
            }
            k_q = jax.lax.dynamic_index_in_dim(
                sk_all[qkey], layer_idx, 0, keepdims=False
            )
            k_s = jax.lax.dynamic_index_in_dim(
                sk_all["s"], layer_idx, 0, keepdims=False
            ).transpose(0, 2, 1)  # [B, ctx, H] -> [B, H, ctx]
            v_q = jax.lax.dynamic_index_in_dim(
                sv_all[qkey], layer_idx, 0, keepdims=False
            )
            v_s = jax.lax.dynamic_index_in_dim(
                sv_all["s"], layer_idx, 0, keepdims=False
            ).transpose(0, 2, 1)
            if packed:
                # nibble unpack fuses into the attention operand reads
                k_q = _unpack_q({"q4": k_q})
                v_q = _unpack_q({"q4": v_q})
            scale = jnp.float32(qh.shape[-1] ** -0.5)
            qk = (
                jnp.einsum(
                    "bhtd,bhsd->bhts", qh, k_q.astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                )
                * k_s[:, :, None, :]  # per-slot K scale
                * scale
            )
            qk = qk + mask
            w = jax.nn.softmax(qk, axis=-1)
            w = (w * v_s[:, :, None, :]).astype(compute_dtype)
            attn_out = jnp.einsum("bhts,bhsd->bhtd", w, v_q.astype(compute_dtype))
        else:
            sk_all = jax.lax.dynamic_update_slice(
                sk_all,
                kh_new[None].astype(sk_all.dtype),
                (layer_idx, 0, 0, write_pos, 0),
            )
            sv_all = jax.lax.dynamic_update_slice(
                sv_all,
                vh_new[None].astype(sv_all.dtype),
                (layer_idx, 0, 0, write_pos, 0),
            )
            k_full = jax.lax.dynamic_index_in_dim(
                sk_all, layer_idx, 0, keepdims=False
            )
            v_full = jax.lax.dynamic_index_in_dim(
                sv_all, layer_idx, 0, keepdims=False
            )
            attn_out = attention_decode(
                qh, k_full.astype(compute_dtype), v_full.astype(compute_dtype),
                mask=mask, k_transposed=False,
            )
        h = h + linear(block_params["attn"]["out"], _merge_heads(attn_out))

        h = _cross_attn_apply(block_params, h, ck, cv, n_head, compute_dtype,
                              group)

        normed = layer_norm(block_params["mlp_ln"], h)
        if use_fused_mlp:
            from ..ops.fused_mlp import fused_mlp

            h = h + fused_mlp(normed[:, 0], block_params["mlp"])[:, None].astype(
                h.dtype
            )
        else:
            h = h + mlp(block_params["mlp"], normed)
        return (h, sk_all, sv_all), None

    n_layer = cross_kv_payload(cross_k).shape[0]
    layer_ids = jnp.arange(n_layer, dtype=jnp.int32)
    # note: unrolling this scan was measured SLOWER on v5e (2.5 s vs 1.3 s
    # for a 96-token large-v1 decode) — the carried cache updates duplicate
    # buffers across unrolled iterations; keep unroll=1
    (x, self_k, self_v), _ = jax.lax.scan(
        body, (x, self_k, self_v), (layer_ids, params["blocks"], cross_k, cross_v)
    )

    x = layer_norm(params["ln"], x)
    return x, self_k, self_v


def decoder_forward_rows(
    params: dict,
    tokens: jnp.ndarray,  # [B, S] int32
    cross_k,  # [L, B, H, Dh, Ta] (or quantized dict layouts)
    cross_v,
    self_k: jnp.ndarray,  # [L, B, H, ctx, Dh] plain cache (no int8 variant)
    self_v: jnp.ndarray,
    write_pos: jnp.ndarray,  # [B] int32: PER-ROW cache slot of tokens[:, 0]
    pad: jnp.ndarray,  # scalar int32: slots < pad are masked out
    n_head: int,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`decoder_forward` with PER-ROW write positions — the speculative-
    decode verify/draft pass, where batch rows advance at different rates
    (each row's accepted-token count differs per round).

    Differences from the uniform pass: positional embeddings gather at
    per-row offsets, the causal slot mask is per-row [B, 1, S, ctx], and
    cache writes scatter at per-row context offsets (a vmapped
    dynamic-update-slice). The int8 self-cache layout is not supported
    here (speculative decoding rejects self_kv_quant in _verify_options).
    """
    assert not isinstance(self_k, dict), (
        "decoder_forward_rows does not support the int8 self-KV cache"
    )
    n_ctx = self_k.shape[-2]
    s = tokens.shape[1]
    n_pos = params["positional_embedding"].shape[0]

    pos = write_pos[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :] - pad
    # rows can overshoot their committed region by up to the lookahead;
    # clamped positions only ever produce outputs/cache entries that are
    # rewritten before being attended (see spec_sample_loop invariants)
    pos = jnp.clip(pos, 0, n_pos - 1)
    x = (
        jnp.take(params["token_embedding"], tokens, axis=0)
        + jnp.take(params["positional_embedding"], pos, axis=0)
    ).astype(compute_dtype)

    # additive mask [B, 1, S, ctx]: key slot j visible to row b's query i
    # iff pad <= j <= write_pos[b] + i; `slots == qpos` keeps fully-masked
    # rows NaN-free (same guard as decoder_forward)
    slots = jnp.arange(n_ctx, dtype=jnp.int32)[None, None, :]
    qpos = (write_pos[:, None]
            + jnp.arange(s, dtype=jnp.int32)[None, :])[:, :, None]
    allowed = ((slots >= pad) & (slots <= qpos)) | (slots == qpos)
    mask = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)[:, None]

    # Per-row cache write as GATHER + select, not scatter: a vmapped
    # dynamic_update_slice with traced per-row starts lowers to an XLA
    # scatter, which the TPU executes serially — measured ~360 us per
    # layer-tensor on v5e (the whole rows-forward ran 8x a uniform decode
    # step). Rewriting the full layer with take_along_axis + where moves
    # ctx/S more bytes but stays a dense vector op; at spec-decode batch
    # sizes that is ~1 ms per forward instead of ~23.
    ctx_ids = jnp.arange(n_ctx, dtype=jnp.int32)[None, :]  # [1, ctx]

    def row_write(cache_l, new_l, wp):
        rel = ctx_ids - wp[:, None]  # [B, ctx]
        in_win = (rel >= 0) & (rel < s)
        idx = jnp.clip(rel, 0, s - 1)
        gathered = jnp.take_along_axis(new_l, idx[:, None, :, None], axis=2)
        return jnp.where(in_win[:, None, :, None], gathered, cache_l)

    # the cache rides the scan as xs/ys (one layer in, one layer out per
    # iteration) instead of the uniform path's carry + dynamic_index +
    # full-layer dynamic_update_slice: the merged layer here is a freshly
    # computed tensor, and writing it back into the carried [L, ...] stack
    # defeated XLA's in-place aliasing — the first on-chip spec profile
    # measured T_verify(9 pos) = 22.8 ms = 7.79x a 1-token step, i.e. the
    # loop was copying cache stacks, not streaming layers
    def body(h, xs):
        block_params, ck, cv, k_layer, v_layer = xs

        normed = layer_norm(block_params["attn_ln"], h)
        if "qkv" in block_params["attn"]:
            qkv = linear(block_params["attn"]["qkv"], normed)
            q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
        else:
            q = linear(block_params["attn"]["query"], normed)
            k_new = linear(block_params["attn"]["key"], normed)
            v_new = linear(block_params["attn"]["value"], normed)
        qh = _split_v(q, n_head)
        kh_new = _split_v(k_new, n_head).astype(k_layer.dtype)
        vh_new = _split_v(v_new, n_head).astype(v_layer.dtype)

        k_layer = row_write(k_layer, kh_new, write_pos)
        v_layer = row_write(v_layer, vh_new, write_pos)
        attn_out = attention_decode(
            qh, k_layer.astype(compute_dtype), v_layer.astype(compute_dtype),
            mask=mask, k_transposed=False,
        )
        h = h + linear(block_params["attn"]["out"], _merge_heads(attn_out))

        h = _cross_attn_apply(block_params, h, ck, cv, n_head, compute_dtype)

        normed = layer_norm(block_params["mlp_ln"], h)
        h = h + mlp(block_params["mlp"], normed)
        return h, (k_layer, v_layer)

    x, (self_k, self_v) = jax.lax.scan(
        body, x,
        (params["blocks"], cross_k, cross_v, self_k, self_v),
    )

    x = layer_norm(params["ln"], x)
    return x, self_k, self_v


@partial(jax.jit, static_argnames=("n_head", "n_sel", "compute_dtype"))
def decoder_forward_with_qk(
    params: dict,
    tokens: jnp.ndarray,  # [B, S]
    xa: jnp.ndarray,  # [B, F, D] encoded audio
    sel_slot: jnp.ndarray,  # [L, H] int32: slot in [0, n_sel) or n_sel (drop)
    n_head: int,
    n_sel: int,
    compute_dtype=jnp.float32,
):
    """Full decoder forward that also captures cross-attention logits for the
    alignment heads (functional replacement for the reference's forward hooks,
    whisper_at/timing.py:185-191).

    Returns (logits [B, S, V] fp32, qk_sel [B, n_sel, S, F]) where
    qk_sel rows are the pre-softmax cross-attention logits of the selected
    (layer, head) pairs, already scaled by d_head**-0.5. The capture
    buffer matches the FORWARD's precision class — fp32 for an fp32
    compute (tests/CPU), bf16 for a bf16 compute (the reference's hooks
    likewise capture in the model dtype — fp16 on GPU): with the default
    alignment mask the buffer is the alignment pass's dominant HBM
    tensor (~gigabytes at large-v1), and storing fp32 logits computed in
    bf16 would double that traffic for no information. The weight chain
    (timing._process_qk_weights) upcasts to fp32 at its first read.
    Batched rows are independent (causal self-attention), so right-padded
    token rows give the same valid-position outputs as their exact-length
    solo forwards — the batched word-timing alignment
    (timing.find_alignment_batched) relies on this.
    """
    b, s = tokens.shape
    x = (
        jnp.take(params["token_embedding"], tokens, axis=0)
        + params["positional_embedding"][:s]
    ).astype(compute_dtype)

    causal = jnp.where(
        jnp.arange(s)[None, :] <= jnp.arange(s)[:, None], 0.0, NEG_INF
    ).astype(jnp.float32)

    xa = xa.astype(compute_dtype)
    f = xa.shape[1]
    # last slot row = drop
    buf_dtype = (jnp.float32 if compute_dtype == jnp.float32
                 else jnp.bfloat16)
    qk_buf = jnp.zeros((b, n_sel + 1, s, f), buf_dtype)

    def body(carry, xs):
        h, qk_buf = carry
        block_params, slot_row = xs

        normed = layer_norm(block_params["attn_ln"], h)
        if "qkv" in block_params["attn"]:
            q, k, v = jnp.split(
                linear(block_params["attn"]["qkv"], normed), 3, axis=-1
            )
        else:
            q = linear(block_params["attn"]["query"], normed)
            k = linear(block_params["attn"]["key"], normed)
            v = linear(block_params["attn"]["value"], normed)
        attn_out, _ = attention(q, k, v, n_head, mask=causal)
        h = h + linear(block_params["attn"]["out"], attn_out)

        normed = layer_norm(block_params["cross_attn_ln"], h)
        q = linear(block_params["cross_attn"]["query"], normed)
        ck = linear(block_params["cross_attn"]["key"], xa)
        cv = linear(block_params["cross_attn"]["value"], xa)
        attn_out, qk = attention(q, ck, cv, n_head, return_qk=True)
        h = h + linear(block_params["cross_attn"]["out"], attn_out)
        # qk [B, H, S, F] fp32; scatter this layer's selected heads
        qk_buf = qk_buf.at[:, slot_row].set(qk.astype(qk_buf.dtype))

        h = h + mlp(block_params["mlp"], layer_norm(block_params["mlp_ln"], h))
        return (h, qk_buf), None

    (x, qk_buf), _ = jax.lax.scan(
        body, (x, qk_buf), (params["blocks"], sel_slot)
    )
    x = layer_norm(params["ln"], x)
    logits = project_logits(params, x)
    return logits, qk_buf[:, :n_sel]


def project_logits(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """Tied-embedding output projection, in fp32 (whisper_at/model.py:218-220)."""
    from .layers import matmul_precision

    if "token_embedding_t" in params:
        # pre-transposed [D, V] (fuse_decoder_blocks): direct matmul
        emb_t = params["token_embedding_t"].astype(hidden.dtype)
        return jnp.einsum(
            "bsd,dv->bsv",
            hidden,
            emb_t,
            preferred_element_type=jnp.float32,
            precision=matmul_precision(hidden.dtype),
        )
    emb = params["token_embedding"].astype(hidden.dtype)
    return jnp.einsum(
        "bsd,vd->bsv",
        hidden,
        emb,
        preferred_element_type=jnp.float32,
        precision=matmul_precision(hidden.dtype),
    )
