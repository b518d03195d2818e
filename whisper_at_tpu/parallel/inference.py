"""Multi-chip batched inference: shard the window batch over the mesh.

The reference has no multi-device inference at all (SURVEY §2.6); this is the
TPU-native scale-out path: model parameters replicate across the mesh, the
30 s-window batch shards over the 'dp' axis, and the SAME jitted programs
(encoder, TL-TR head, decode loops) partition via GSPMD — no code changes in
the compute path, no hand-written collectives. On an N-chip v5e slice the
batched-transcribe throughput scales ~linearly until the per-chip batch
drops below the latency-bound decode sweet spot.
"""

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def place_model_on_mesh(model, mesh: Mesh):
    """Replicate the model parameters (and the fused decode params) across
    the mesh. Idempotent; returns the model for chaining."""
    replicated = NamedSharding(mesh, P())
    model.params = jax.tree.map(
        lambda x: jax.device_put(x, replicated), model.params
    )
    model._decoder_fused = None  # rebuild from the replicated params
    model._mesh = mesh
    return model


def shard_windows(mesh: Mesh, windows):
    """Place a [W, 80, 3000] window batch with W sharded over dp."""
    return jax.device_put(windows, NamedSharding(mesh, P("dp")))


def infer_mesh(model) -> Optional[Mesh]:
    return getattr(model, "_mesh", None)


def auto_mesh_for_inference(n_devices: Optional[int] = None) -> Mesh:
    """All-devices dp mesh (the throughput default: even large-v2 fits a
    single v5e chip's HBM in bf16, so dp scales windows/sec linearly).
    For LATENCY, use a tp>1 mesh + place_model_tp instead: the decode loop
    is HBM-bound, and tensor parallelism divides its weight/KV stream."""
    return make_mesh(n_devices=n_devices, tp=1)


# ---------------------------------------------------------------------- #
# tensor-parallel decoder placement (latency-oriented serving)
# ---------------------------------------------------------------------- #

def _block_leaf_spec(key_str: str, ndim: int) -> P:
    """Megatron column/row PartitionSpec for one transformer-block param leaf.

    Column-parallel (output dim over tp): self qkv (fused or split q/k/v),
    cross q/k/v, MLP fc1 — their per-output-channel int8 scales (w_s) and
    biases shard with the outputs. Row-parallel (input dim over tp): the
    attention out and MLP fc2 projections; XLA inserts ONE psum after each,
    exactly the canonical two-collective-per-block Megatron split.
    Everything else (LNs, embeddings) replicates.
    """
    col = any(f"['{k}']" in key_str for k in
              ("query", "key", "value", "qkv", "fc1"))
    row = any(f"['{k}']" in key_str for k in ("out", "fc2"))
    leading = (None,) * (ndim - 1)
    if col:  # w [.., D, K] / w_q [.., D, K] / w_s [.., 1, K] / b [.., K]
        return P(*leading, "tp")
    if row and key_str.endswith(("['w']", "['w_q']")):
        return P(*leading[:-1], "tp", None)
    # the tied embedding stays replicated: 51865 is not divisible by any
    # practical tp, and sharding it would ripple padding into the logits
    return P()


def place_model_tp(model, mesh: Mesh):
    """Tensor-parallel placement of the model over the mesh's 'tp' axis
    (latency-oriented serving: one request, many chips).

    The decode loop streams ~1.7 GB of weights + KV per token (large-v1,
    int8): sharding it tp-ways divides the per-chip bytes and hence the
    per-token latency — the reference (single-GPU torch) has no analogue.
    The ENCODER blocks carry the FLOPs (SURVEY §6: the encoder is the
    reference's compute core) and use the same attention/MLP param names,
    so the identical Megatron column/row split applies: qkv column, out
    row, fc1 column, fc2 row, one psum per projection pair. The conv stem,
    positional embedding, LNs and the TL-TR head replicate (tiny).

    GSPMD derives everything downstream from these placements: the KV
    caches and cross-KV shard along the head axis, each attention runs on
    its local heads, and one psum per out/fc2 projection restores the
    replicated residual stream. Requires tp | n_text_head and
    tp | n_audio_head. The pallas decode/encoder kernels are
    single-device, so decoding selects the XLA 'heads' cross-KV layout
    and the encoder uses the XLA path when a mesh is set (decoding.py,
    encoder.py).
    """
    tp = mesh.shape.get("tp", 1)
    assert model.dims.n_text_head % tp == 0, (
        f"n_text_head={model.dims.n_text_head} not divisible by tp={tp}"
    )
    assert model.dims.n_audio_head % tp == 0, (
        f"n_audio_head={model.dims.n_audio_head} not divisible by tp={tp}"
    )
    repl = NamedSharding(mesh, P())
    model.params = {
        k: jax.tree.map(lambda x: jax.device_put(x, repl), v)
        for k, v in model.params.items() if k not in ("decoder", "encoder")
    } | {
        "decoder": _place_tree_tp(model.params["decoder"], mesh),
        "encoder": _place_tree_tp(model.params["encoder"], mesh),
    }
    # rebuild the fused/quantized decode params from the sharded tree and
    # re-place them (fusion concatenates [q|k|v] along the sharded dim,
    # which GSPMD would otherwise resolve with gathers at trace time)
    model._decoder_fused = None
    model._decoder_fused_q = {}
    model._decoder_fused = _place_tree_tp(model.decoder_params_fused, mesh)
    model._decoder_fused_q[8] = _place_tree_tp(
        model.decoder_params_decode(True), mesh
    )
    model._mesh = mesh
    return model


def _place_tree_tp(tree, mesh: Mesh):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    placed = [
        jax.device_put(
            leaf,
            NamedSharding(
                mesh,
                _block_leaf_spec(jax.tree_util.keystr(path), leaf.ndim),
            ),
        )
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, placed)
