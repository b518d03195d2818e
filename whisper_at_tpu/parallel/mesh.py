"""Device mesh and sharding rules.

The reference's only parallelism is single-node torch DataParallel
(run.py:191-192) — replicate weights, scatter the batch. The TPU-native
equivalent is a `jax.sharding.Mesh` with named axes:

  dp — data parallel: batch sharding over ICI; covers (and exceeds) the
       reference's DataParallel.
  tp — tensor parallel: attention heads / MLP hidden sharding for the TL-TR
       head and (optionally) the backbone, for models or batch sizes where
       HBM or step-time benefits from it.

XLA inserts the collectives (psum for gradient/activation reductions,
all-gathers for tp remat) from the shardings alone; there is no hand-written
communication for the data path.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('dp', 'tp') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    device_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(device_array, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over dp, replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded over dp."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


# ---------------------------------------------------------------------- #
# parameter sharding rules
# ---------------------------------------------------------------------- #


def _tltr_param_spec(path_parts, leaf) -> P:
    """Tensor-parallel PartitionSpec for a TL-TR head parameter.

    Attention projections shard the head/hidden output dim over tp; output
    projections and MLP fc2 shard the input dim (so the pair forms the
    canonical Megatron column/row split and XLA inserts one psum per block).
    """
    path = "/".join(path_parts)
    if leaf.ndim == 2:
        if any(k in path for k in ("query/w", "key/w", "value/w", "fc1/w")):
            return P(None, "tp")
        if any(k in path for k in ("out/w", "fc2/w")):
            return P("tp", None)
    if leaf.ndim == 1:
        if any(k in path for k in ("query/b", "value/b", "fc1/b")):
            return P("tp")
    return P()


def tltr_param_shardings(mesh: Mesh, params) -> dict:
    """NamedShardings for a TL-TR/ATModel param pytree (Megatron-style tp)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = {}

    def spec_for(path, leaf):
        parts = [getattr(k, "key", str(k)) for k in path]
        return NamedSharding(mesh, _tltr_param_spec(parts, leaf))

    leaves, treedef = jax.tree_util.tree_flatten(params)
    paths = [p for p, _ in flat[0]]
    shardings = [spec_for(p, l) for p, l in zip(paths, leaves)]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def replicate_params(mesh: Mesh, params):
    """Fully replicate a param pytree over the mesh (frozen backbone case)."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), params)
