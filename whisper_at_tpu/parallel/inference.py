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
    """All-devices dp mesh (tensor parallelism is unnecessary for inference:
    even large-v2 fits a single v5e chip's HBM in bf16)."""
    return make_mesh(n_devices=n_devices, tp=1)
