"""The Whisper-AT model container: params pytree + dims + convenience API.

The reference's `Whisper(nn.Module)` (whisper_at/model.py:224-318) becomes a
thin host-side object owning the parameter pytree and the static config; all
compute goes through the pure jitted functions in encoder/decoder/at_head.
"""

import base64
import gzip
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .at_head import at_head_apply, at_window_geometry, init_at_head
from .decoder import (
    decoder_forward,
    fuse_decoder_blocks,
    quantize_decoder_blocks,
    init_cache,
    init_decoder,
    precompute_cross_kv,
    project_logits,
)
from .dims import ModelDimensions, dims_for
from .encoder import encoder_apply, init_encoder


def default_alignment_heads(dims: ModelDimensions) -> np.ndarray:
    """Use the last half of decoder layers by default (whisper_at/model.py:248-253)."""
    heads = np.zeros((dims.n_text_layer, dims.n_text_head), dtype=bool)
    heads[dims.n_text_layer // 2 :] = True
    return heads


def decode_alignment_heads(dump: bytes, dims: ModelDimensions) -> np.ndarray:
    """Decode the base85+gzip boolean alignment-head mask (whisper_at/model.py:255-262)."""
    array = np.frombuffer(gzip.decompress(base64.b85decode(dump)), dtype=bool).copy()
    return array.reshape(dims.n_text_layer, dims.n_text_head)


class Whisper:
    """Frozen Whisper backbone + TL-TR audio-tagging head, TPU-native."""

    def __init__(
        self,
        dims: ModelDimensions,
        at_low_compute: bool = False,
        params: Optional[dict] = None,
        storage_dtype=jnp.float32,
        seed: int = 0,
    ):
        self.dims = dims
        self.at_low_compute = at_low_compute
        self.at_mode = "tl_down_tr_512_1_8" if at_low_compute else "tl_tr_1_8"
        self.storage_dtype = storage_dtype
        self.alignment_heads = default_alignment_heads(dims)

        if params is None:
            ke, kd, ka = jax.random.split(jax.random.PRNGKey(seed), 3)
            params = {
                "encoder": init_encoder(ke, dims, storage_dtype),
                "decoder": init_decoder(kd, dims, storage_dtype),
                "at_model": init_at_head(
                    ka, dims.n_audio_layer, dims.n_audio_state, self.at_mode,
                    dtype=storage_dtype,
                ),
            }
        self.params = params
        self._decoder_fused = None
        self._decoder_fused_q = {}  # bits -> quantized fused params

    @property
    def decoder_params_fused(self) -> dict:
        """Decoder params with fused self-attn qkv projections (decode path).

        Built lazily — identical numerics, one matmul instead of three per
        layer per token in the latency-bound decode loop.
        """
        if self._decoder_fused is None:
            self._decoder_fused = fuse_decoder_blocks(self.params["decoder"])
        return self._decoder_fused

    def decoder_params_decode(self, weight_quant: bool = False,
                              weight_bits: int = 8) -> dict:
        """Decode-path decoder params: fused, optionally int8/int4-weight-
        quantized (one cached quantization per bit width)."""
        if not weight_quant:
            return self.decoder_params_fused
        if self._decoder_fused_q.get(weight_bits) is None:
            self._decoder_fused_q[weight_bits] = quantize_decoder_blocks(
                self.decoder_params_fused, weight_bits)
        return self._decoder_fused_q[weight_bits]

    # ------------------------------------------------------------------ #
    @property
    def is_multilingual(self) -> bool:
        return self.dims.n_vocab == 51865

    @property
    def device(self):
        return jax.tree.leaves(self.params)[0].devices()

    def set_alignment_heads(self, dump: bytes):
        self.alignment_heads = decode_alignment_heads(dump, self.dims)

    def compute_dtype(self, fp16: bool = True):
        """'half precision' means bfloat16 on TPU."""
        return jnp.bfloat16 if fp16 else jnp.float32

    # ------------------------------------------------------------------ #
    def embed_audio(
        self, mel: jnp.ndarray, fp16: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Encoder forward. mel [B, 80, 3000] (or unbatched [80, 3000]).

        Returns (audio_features [B, 1500, D], at_features [B, L, 75, D]) —
        the all-layer 20x-pooled stack that feeds the TL-TR head
        (whisper_at/model.py:156-177).
        """
        if mel.ndim == 2:
            mel = mel[None]
        # pallas kernels (incl. the generic flash kernel) are single-device
        # Mosaic calls with no partitioning rules; under a mesh the einsum
        # path partitions cleanly. Env overrides are read HERE, outside jit,
        # and passed as static args (reading them inside the traced function
        # would silently cache the first value).
        import os

        if getattr(self, "_mesh", None) is not None:
            attn_impl, mlp_impl = "off", "xla"
        else:
            attn_impl = os.environ.get("WHISPER_AT_TPU_ENC_ATTN", "single")
            # fused MLP half-block kernel default-on for the single-device
            # TPU bf16 path: 8.83 vs 11.75 ms/layer measured on-chip at
            # large-v1 batch 24 (ops/mlp_enc.py); encoder_apply still
            # gates it on TPU+bf16, and meshes take the XLA path above
            mlp_impl = os.environ.get("WHISPER_AT_TPU_ENC_MLP", "fused")
        return encoder_apply(
            self.params["encoder"],
            mel,
            self.dims.n_audio_head,
            self.compute_dtype(fp16),
            attn_impl=attn_impl,
            mlp_impl=mlp_impl,
        )

    def at_forward(
        self, audio_rep: jnp.ndarray, time_resolution: float = 10
    ) -> jnp.ndarray:
        """TL-TR head over a pooled-feature stack.

        audio_rep: [L, T, D] (reference layout) or batched [B, L, T, D].
        Returns [n_seg, 527] (resp. [B, n_seg, 527]) segment logits.
        """
        single = audio_rep.ndim == 3
        if single:
            audio_rep = audio_rep[None]
        window, n_seg = at_window_geometry(audio_rep.shape[2], time_resolution)
        out = at_head_apply(
            self.params["at_model"], audio_rep, self.at_mode, window, n_seg
        )
        return out[0] if single else out

    def logits(
        self, tokens: jnp.ndarray, audio_features: jnp.ndarray, fp16: bool = True
    ) -> jnp.ndarray:
        """Full (non-incremental) decoder forward -> fp32 logits [B, S, V]."""
        compute_dtype = self.compute_dtype(fp16)
        b, s = tokens.shape
        dec = self.decoder_params_fused
        cross_k, cross_v = precompute_cross_kv(
            dec, audio_features, self.dims.n_text_head, compute_dtype
        )
        self_k, self_v = init_cache(
            self.dims.n_text_layer, b, s, self.dims.n_text_state, compute_dtype,
            self.dims.n_text_head,
        )
        hidden, _, _ = decoder_forward(
            dec,
            tokens,
            cross_k,
            cross_v,
            self_k,
            self_v,
            jnp.int32(0),
            jnp.int32(0),
            self.dims.n_text_head,
            compute_dtype,
        )
        return project_logits(dec, hidden)

    def forward(self, mel: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
        audio_features, _ = self.embed_audio(mel)
        return self.logits(tokens, audio_features)

    def install_kv_cache_hooks(self, cache=None):
        """Functional analogue of the reference's hook-based cache
        (whisper_at/model.py:283-314).

        The reference registers forward hooks on the decoder's key/value
        projections and returns (cache, hooks); callers then run
        ``model.decoder(tokens, audio_features, kv_cache=cache)``
        token-by-token. Here the KV cache is threaded functionally, so this
        returns a `KVCacheSession` (plus an empty hook list — there is no
        mutable module state to unhook). Use it the same way:

            cache, hooks = model.install_kv_cache_hooks()
            logits = model.decoder_logits(tokens, audio_features,
                                          kv_cache=cache)   # prompt
            logits = model.decoder_logits(next_token, audio_features,
                                          kv_cache=cache)   # one step

        Passing an existing `KVCacheSession` returns it unchanged (the
        reference seeds its hook cache from the passed dict); a reference-
        style tensor dict cannot be adopted and raises instead of being
        silently discarded.
        """
        if cache is not None:
            if isinstance(cache, KVCacheSession):
                return cache, []
            raise TypeError(
                "install_kv_cache_hooks can only resume a KVCacheSession "
                "from this framework; reference-style tensor dicts are not "
                "adoptable (the cache layout is functional, not hooked)"
            )
        return KVCacheSession(self), []

    def decoder_logits(self, tokens, audio_features, kv_cache=None,
                       fp16: bool = True):
        """Decoder forward -> fp32 logits [B, S, V].

        kv_cache=None recomputes from scratch (the reference's hook-less
        path); passing a `KVCacheSession` appends `tokens` to the cached
        positions and returns logits for just those positions — the
        incremental decode API the reference builds from its hooks
        (whisper_at/decoding.py PyTorchInference.logits).
        """
        if kv_cache is None:
            return self.logits(tokens, audio_features, fp16=fp16)
        return kv_cache.logits(tokens, audio_features, fp16=fp16)

    # bound in __init__.py to avoid circular imports:
    #   detect_language / decode / transcribe


class KVCacheSession:
    """Incremental decoder state: the functional replacement for the
    reference's hook-populated cache dict (whisper_at/model.py:283-314).

    Holds the precomputed cross-attention KV (built lazily from the first
    call's audio_features, as the reference's first-use hook does) and the
    growing self-attention cache; each `logits` call appends its tokens.
    """

    def __init__(self, model: "Whisper"):
        self.model = model
        self._cross = None
        self._self_kv = None
        self._pos = 0
        self._dtype = None  # captured at first call; later fp16 flags ignored

    def logits(self, tokens, audio_features, fp16: bool = True):
        dims = self.model.dims
        if self._dtype is None:
            self._dtype = self.model.compute_dtype(fp16)
        compute_dtype = self._dtype  # caches are built in this dtype
        dec = self.model.decoder_params_fused
        if tokens.ndim == 1:
            tokens = tokens[None]
        if self._cross is None:
            self._cross = precompute_cross_kv(
                dec, audio_features, dims.n_text_head, compute_dtype
            )
            self._self_kv = init_cache(
                dims.n_text_layer, tokens.shape[0], dims.n_text_ctx,
                dims.n_text_state, compute_dtype, dims.n_text_head,
            )
        ck, cv = self._cross
        sk, sv = self._self_kv
        hidden, sk, sv = decoder_forward(
            dec, tokens, ck, cv, sk, sv, jnp.int32(self._pos), jnp.int32(0),
            dims.n_text_head, compute_dtype,
        )
        self._self_kv = (sk, sv)
        self._pos += tokens.shape[1]
        return project_logits(dec, hidden)


def build_model(
    name: str,
    at_low_compute: bool = False,
    storage_dtype=jnp.float32,
    seed: int = 0,
) -> Whisper:
    """Random-initialized model of an official size (for tests/benchmarks)."""
    return Whisper(
        dims_for(name),
        at_low_compute=at_low_compute,
        storage_dtype=storage_dtype,
        seed=seed,
    )
