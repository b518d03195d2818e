"""Sequence-parallel (context-parallel) encoder: ring attention over 'sp'.

The fourth parallelism axis this framework offers (after dp batch sharding,
Megatron tp in `inference.py`, and the GPipe pp schedule in `pipeline.py`):
the encoder's 1500-frame sequence is sharded across the mesh's 'sp' axis, so
per-chip ACTIVATION memory — the quadratic [B, H, T, T] attention logits and
the [B, T, 4D] MLP intermediate, the terms that dominate at large batch —
divides by S. Weights stay replicated (that is tp's/pp's job; the axes
compose by construction since sp shards a different dimension).

Everything position-wise (LayerNorm, QKV/out projections, the MLP) runs
unchanged on the local [B, T/S, D] chunk. Only attention mixes positions:
it runs as **ring attention** — queries stay resident, each device's K/V
chunk hops around an `lax.ppermute` ring, and a running online softmax
(max/denominator/numerator carried in fp32) folds each visiting chunk in,
so no device ever materializes a full-T attention row. S static ring steps,
neighbor-only ICI traffic of 2·[B, T/S, D] per block per step — the standard
TPU recipe for sequences that outgrow one chip's VMEM/HBM tile.

The Whisper-AT 20x pooled taps pool over windows that straddle chunk
boundaries whenever 20 does not divide T/S, so each device scatters its
positions into per-GLOBAL-window partial sums (a one-hot [T/S, T/20]
matmul — MXU-friendly, no gather) and one `psum` over 'sp' completes every
window exactly.

The reference (single-GPU torch, whole sequence resident) has no analogue;
SURVEY §2.6 maps its "None" row for SP/CP/ring-attention to exactly this
module. Expert parallelism remains inapplicable framework-wide: no model in
the Whisper/TL-TR family has mixture-of-experts layers (the TL-TR head is a
dense time/layer transformer, reference src/whisper_at_train/models.py) —
documented here so the dp/tp/pp/sp/ep inventory is complete.
"""

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.encoder import POOL, _conv1d
from ..models.layers import (
    gelu,
    layer_norm,
    linear,
    matmul_precision,
    mha_project_qkv,
    mlp,
)


def make_sp_mesh(n_shards: Optional[int] = None,
                 devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D ('sp',) mesh over the (first n_shards) available devices."""
    if devices is None:
        devices = jax.devices()
    if n_shards is not None:
        devices = devices[:n_shards]
    return Mesh(np.asarray(devices), axis_names=("sp",))


def _ring_attention(q, k, v, n_head, n_shards):
    """Full (non-causal) attention with q resident and k/v ring-rotating.

    q/k/v: local [B, C, D] chunks (C = T / n_shards). Runs the online
    softmax in fp32 — the same logit dtype as `layers.attention` — carrying
    (running max, denominator, numerator) across the n_shards ring steps.
    Returns the local [B, C, D] attention output.
    """
    dtype = q.dtype
    b, c, d = q.shape
    d_head = d // n_head
    scale = jnp.float32(d_head**-0.5)
    prec = matmul_precision(dtype)

    qh = q.reshape(b, c, n_head, d_head)
    kh = k.reshape(b, c, n_head, d_head)
    vh = v.reshape(b, c, n_head, d_head)

    ring = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    m = jnp.full((b, n_head, c, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, n_head, c, 1), jnp.float32)
    acc = jnp.zeros((b, n_head, c, d_head), jnp.float32)

    def step(carry, _):
        m, l, acc, kh_cur, vh_cur = carry
        logits = jnp.einsum(
            "bthd,bshd->bhts", qh, kh_cur,
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        m_new = jnp.maximum(m, logits.max(axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhts,bshd->bhtd", p, vh_cur.astype(jnp.float32), precision=prec
        )
        kh_cur = jax.lax.ppermute(kh_cur, "sp", ring)
        vh_cur = jax.lax.ppermute(vh_cur, "sp", ring)
        return (m_new, l, acc, kh_cur, vh_cur), None

    (m, l, acc, _, _), _ = jax.lax.scan(
        step, (m, l, acc, kh, vh), None, length=n_shards
    )
    out = (acc / l).astype(dtype)  # [B, H, C, Dh]
    return out.transpose(0, 2, 1, 3).reshape(b, c, d)


@partial(jax.jit, static_argnames=("mesh", "n_head", "compute_dtype"))
def _encoder_sp_jit(params, mel, mesh, n_head, compute_dtype):
    n_shards = mesh.shape["sp"]

    # conv stem + positional embedding: replicated (a fraction of one
    # block's FLOPs; sharding it would need k=3 halo exchanges for no
    # measurable win), then the sequence axis shards for the blocks
    x = mel.astype(compute_dtype).transpose(0, 2, 1)
    x = gelu(_conv1d(params["conv1"], x, stride=1))
    x = gelu(_conv1d(params["conv2"], x, stride=2))  # [B, T, D]
    x = x + params["positional_embedding"].astype(compute_dtype)

    b, t, d = x.shape
    assert t % n_shards == 0, (
        f"sequence length {t} not divisible by sp={n_shards}"
    )
    chunk = t // n_shards
    n_pool = t // POOL

    def sharded(x_local, blocks):
        # per-global-window scatter map for the pooled taps: position j of
        # this chunk belongs to window (chunk_start + j) // POOL
        start = jax.lax.axis_index("sp") * chunk
        win = (start + jnp.arange(chunk)) // POOL
        onehot = jax.nn.one_hot(win, n_pool, dtype=compute_dtype)

        def body(carry, block_params):
            h = carry
            q, k, v = mha_project_qkv(
                block_params["attn"], layer_norm(block_params["attn_ln"], h)
            )
            attn_out = _ring_attention(q, k, v, n_head, n_shards)
            h = h + linear(block_params["attn"]["out"], attn_out)
            h = h + mlp(block_params["mlp"],
                        layer_norm(block_params["mlp_ln"], h))
            partial_pool = jnp.einsum(
                "bcd,cw->bwd", h, onehot,
                precision=matmul_precision(compute_dtype),
            ) / POOL
            return h, partial_pool

        h, partials = jax.lax.scan(body, x_local, blocks)
        # each 20-frame window's sum is split across at most two chunks;
        # one psum over 'sp' completes every window exactly
        taps = jax.lax.psum(partials, "sp")  # [L, B, T/20, D]
        return h, taps

    x, taps = shard_map(
        sharded, mesh=mesh,
        in_specs=(P(None, "sp", None), P()),
        out_specs=(P(None, "sp", None), P()),
        check_vma=False,
    )(x, params["blocks"])

    x = layer_norm(params["ln_post"], x)
    return x, taps.transpose(1, 0, 2, 3)  # [B, L, T/20, D]


def encoder_apply_sp(
    params: dict,
    mel: jnp.ndarray,
    mesh: Mesh,
    n_head: int,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequence-parallel `encoder_apply` over the mesh's 'sp' axis.

    mel: [B, n_mels, 3000]. Returns the same (x [B, 1500, D],
    all_x [B, L, 75, D]) as the single-device encoder. Attention runs as
    ring attention with an fp32 online softmax, so outputs match the
    single-device encoder to accumulation-order rounding (the parity test
    pins ~1e-5 in fp32), not bit-exactly — the same numerics class as any
    flash-attention rewrite.

    Requires sp | 1500 (the post-conv sequence length): sp in
    {2, 3, 4, 5, 6, 10, 12, ...}.
    """
    first = jax.tree_util.tree_leaves(params)[0]
    sh = getattr(first, "sharding", None)
    if not (isinstance(sh, NamedSharding) and sh.spec == P()
            and tuple(sh.mesh.devices.flat) == tuple(mesh.devices.flat)):
        params = place_encoder_sp(params, mesh)
    return _encoder_sp_jit(params, mel, mesh, n_head, compute_dtype)


def place_encoder_sp(params: dict, mesh: Mesh) -> dict:
    """Replicate the encoder params over the sp mesh ONCE and return the
    committed tree (the sp analogue of `place_encoder_pp`): activations
    shard over 'sp', weights replicate."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, repl), params)
