"""Pipeline-parallel encoder: GPipe microbatch schedule over a 'pp' mesh axis.

The third parallelism axis this framework offers (after dp batch sharding
and Megatron tp in `inference.py` / `mesh.py`), for placements where the
encoder's weights or activations should not live on one chip: each pipeline
stage holds a contiguous slice of the transformer blocks, microbatches flow
stage-to-stage over ICI via `lax.ppermute`, and every stage computes a
different microbatch concurrently (the GPipe schedule: M microbatches
through P stages in M + P - 1 ticks, bubble fraction (P-1)/(M+P-1)).

The reference (single-GPU torch) has no analogue; SURVEY §2.6. For Whisper
production sizes dp-over-windows remains the throughput axis (large-v2 fits
one v5e chip in bf16) — pp is the scale-UP story: it divides per-chip
encoder weight memory by P with only ICI-neighbor traffic ([mb, 1500, D]
activations once per stage per microbatch), where tp instead pays two
all-reduces per block.

TPU-native notes: the whole schedule is one `lax.scan` of a static-shape
tick under `shard_map` (no data-dependent control flow); stage-local blocks
run the same scanned-body math as `encoder_apply`, so outputs are
numerically identical to the single-device encoder (same op order per
block); invalid bubble ticks compute on garbage and are masked at the
collection sites (branchless — cheaper than lax.cond on TPU where both
branches would be scheduled anyway).
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
    attention,
    gelu,
    layer_norm,
    linear,
    mha_project_qkv,
    mlp,
)


def make_pp_mesh(n_stages: Optional[int] = None,
                 devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D ('pp',) mesh over the (first n_stages) available devices."""
    if devices is None:
        devices = jax.devices()
    if n_stages is not None:
        devices = devices[:n_stages]
    return Mesh(np.asarray(devices), axis_names=("pp",))


def _block_body(h, block_params, n_head, use_flash):
    """One encoder block — the `encoder_apply` math. `use_flash` swaps in
    the single-device pallas attention kernel: legal inside shard_map here
    because every pipeline stage computes on a device-LOCAL [mb, T, D]
    activation (no sharded operands ever reach the kernel)."""
    q, k, v = mha_project_qkv(
        block_params["attn"], layer_norm(block_params["attn_ln"], h)
    )
    if use_flash:
        from ..ops.flash import encoder_attention_tpu

        attn_out = encoder_attention_tpu(q, k, v, n_head)
    else:
        attn_out, _ = attention(q, k, v, n_head)
    h = h + linear(block_params["attn"]["out"], attn_out)
    h = h + mlp(block_params["mlp"], layer_norm(block_params["mlp_ln"], h))
    return h


@partial(jax.jit, static_argnames=("mesh", "n_head", "n_micro",
                                   "compute_dtype", "use_flash"))
def _encoder_pp_jit(params, mel, mesh, n_head, n_micro, compute_dtype,
                    use_flash):
    n_stages = mesh.shape["pp"]
    blocks = params["blocks"]
    n_layer = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    assert n_layer % n_stages == 0, (
        f"n_audio_layer={n_layer} not divisible by pp={n_stages}"
    )
    per_stage = n_layer // n_stages

    # conv stem + positional embedding: replicated (identical on every
    # stage — a fraction of one block's FLOPs, and replicating it keeps
    # the schedule a pure ring over the blocks)
    x = mel.astype(compute_dtype).transpose(0, 2, 1)
    x = gelu(_conv1d(params["conv1"], x, stride=1))
    x = gelu(_conv1d(params["conv2"], x, stride=2))  # [B, T, D]
    x = x + params["positional_embedding"].astype(compute_dtype)

    b, t, d = x.shape
    assert b % n_micro == 0, f"batch {b} not divisible by n_micro={n_micro}"
    mb = b // n_micro
    xs = x.reshape(n_micro, mb, t, d)

    # stage-local parameter slices: [L, ...] -> [P, L/P, ...] sharded on pp
    stage_blocks = jax.tree.map(
        lambda a: a.reshape((n_stages, per_stage) + a.shape[1:]), blocks
    )

    def stage_fn(local_blocks, h):
        def body(carry, bp):
            h_out = _block_body(carry, bp, n_head, use_flash)
            pooled = h_out.reshape(mb, t // POOL, POOL, d).mean(axis=2)
            return h_out, pooled

        return jax.lax.scan(body, h, local_blocks)  # h, [L/P, mb, T/20, D]

    def pipelined(xs_rep, local_blocks):
        local_blocks = jax.tree.map(lambda a: a[0], local_blocks)
        stage = jax.lax.axis_index("pp")
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        state = jnp.zeros((mb, t, d), compute_dtype)
        outs = jnp.zeros((n_micro, mb, t, d), compute_dtype)
        taps = jnp.zeros((n_micro, per_stage, mb, t // POOL, d),
                         compute_dtype)

        def tick(carry, tk):
            state, outs, taps = carry
            micro = tk - stage  # the microbatch this stage works on now
            valid = (micro >= 0) & (micro < n_micro)
            slot = jnp.clip(micro, 0, n_micro - 1)
            inp = jnp.where(stage == 0, xs_rep[jnp.clip(tk, 0, n_micro - 1)],
                            state)
            h, stage_taps = stage_fn(local_blocks, inp)
            # masked collection: bubble ticks write their garbage back
            # on top of the value already there
            outs = jax.lax.dynamic_update_slice(
                outs,
                jnp.where(valid, h,
                          jax.lax.dynamic_slice_in_dim(outs, slot, 1)[0]
                          )[None],
                (slot, 0, 0, 0),
            )
            taps = jax.lax.dynamic_update_slice(
                taps,
                jnp.where(valid, stage_taps,
                          jax.lax.dynamic_slice_in_dim(taps, slot, 1)[0]
                          )[None],
                (slot, 0, 0, 0, 0),
            )
            state = jax.lax.ppermute(h, "pp", fwd)
            return (state, outs, taps), None

        (state, outs, taps), _ = jax.lax.scan(
            tick, (state, outs, taps),
            jnp.arange(n_micro + n_stages - 1),
        )
        # final hidden states live on the LAST stage; taps are stage-local
        # layer slices — one psum replicates the former, one all_gather
        # assembles the latter along the layer axis
        outs = jax.lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)),
            "pp",
        )
        all_taps = jax.lax.all_gather(taps, "pp", axis=0)  # [P, M, L/P, ...]
        return outs, all_taps

    outs, all_taps = shard_map(
        pipelined, mesh=mesh,
        in_specs=(P(), P("pp")),
        out_specs=(P(), P()),
        check_vma=False,
    )(xs, stage_blocks)

    x = outs.reshape(b, t, d)
    x = layer_norm(params["ln_post"], x)
    # [P, M, L/P, mb, T/20, D] -> [B, L, T/20, D]
    n_pool = t // POOL
    all_x = all_taps.transpose(1, 3, 0, 2, 4, 5).reshape(
        n_micro, mb, n_layer, n_pool, d
    ).reshape(b, n_layer, n_pool, d)
    return x, all_x


def encoder_apply_pp(
    params: dict,
    mel: jnp.ndarray,
    mesh: Mesh,
    n_head: int,
    compute_dtype=jnp.float32,
    n_micro: Optional[int] = None,
    attn_impl: str = "off",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pipeline-parallel `encoder_apply` over the mesh's 'pp' axis.

    mel: [B, n_mels, 3000]. Returns the same (x [B, 1500, D],
    all_x [B, L, 75, D]) as the single-device encoder, numerically
    identical (same per-block op order; the schedule only reorders WHICH
    device computes a block).

    n_micro: number of microbatches (defaults to the batch size, the
    minimum-bubble choice; must divide B). Requires pp | n_audio_layer.
    attn_impl: "off" = XLA einsum attention (exact single-device parity,
    works on any backend); any other value selects the pallas flash
    kernel per stage on a bf16 TPU backend (stage-local arrays — see
    _block_body).
    """
    if n_micro is None:
        n_micro = mel.shape[0]
    first = jax.tree_util.tree_leaves(params)[0]
    sh = getattr(first, "sharding", None)
    if not (isinstance(sh, NamedSharding) and sh.spec == P()
            and tuple(sh.mesh.devices.flat) == tuple(mesh.devices.flat)):
        params = place_encoder_pp(params, mesh)
    use_flash = (
        attn_impl != "off"
        and compute_dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
    )
    return _encoder_pp_jit(params, mel, mesh, n_head, n_micro,
                           compute_dtype, use_flash)


def place_encoder_pp(params: dict, mesh: Mesh) -> dict:
    """Replicate the encoder params over the pp mesh ONCE and return the
    committed tree. `encoder_apply_pp` places uncommitted params itself,
    but that re-transfers the full weight set on EVERY call when the
    caller keeps passing host arrays — for repeated forwards, place once
    and reuse (the pp analogue of `place_model_tp`)."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, repl), params)
