"""Training/eval steps for the TL-TR head: loss, optimizer, pjit sharding.

Replaces the reference's torch loop (whisper_at_train/traintest.py:20-202):
Adam(betas=(0.95, 0.999), weight_decay=5e-7 L2-style), BCE-with-logits or CE,
AMP -> bf16 compute with fp32 master weights. The step is one pjit program
over a ('dp','tp') mesh: batch sharded over dp, head weights (optionally)
Megatron-split over tp; XLA inserts the gradient psum from the shardings.
"""

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import batch_sharding, replicated, tltr_param_shardings
from .tltr import tltr_apply


def bce_with_logits_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, pos_weight: Optional[float] = None
) -> jnp.ndarray:
    """torch BCEWithLogitsLoss semantics (mean reduction, optional pos_weight)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    pw = 1.0 if pos_weight is None else pos_weight
    loss = -(pw * targets * log_p + (1.0 - targets) * log_not_p)
    return loss.mean()


def ce_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch CrossEntropyLoss with soft (probability) targets, mean reduction."""
    return -(targets * jax.nn.log_softmax(logits, axis=-1)).sum(axis=-1).mean()


def make_optimizer(lr: float, weight_decay: float = 5e-7) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay, betas=(0.95, 0.999)) equivalent.

    torch applies weight decay as L2 into the gradient *before* the moment
    updates, hence add_decayed_weights ahead of scale_by_adam.
    """
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.95, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(lr),
    )


def make_train_step(
    mode: str,
    optimizer: optax.GradientTransformation,
    loss_type: str = "BCE",
    pos_weight: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
) -> Callable:
    """Build the jitted (params, opt_state, feats, labels, lr) -> ... step.

    Mirrors traintest.py:101-109 (autocast forward + scaled backward): the
    forward runs in compute_dtype, loss and optimizer math in fp32. The
    learning rate rides as a dynamic scalar so host-side schedules
    (MultiStepLR / ReduceLROnPlateau) never retrigger compilation.
    """

    def loss_fn(params, feats, labels):
        cast = jax.tree.map(
            lambda p: p.astype(compute_dtype) if p.dtype == jnp.float32 else p, params
        )
        logits = tltr_apply(cast, feats.astype(compute_dtype), mode).astype(jnp.float32)
        if loss_type == "BCE":
            return bce_with_logits_loss(logits, labels, pos_weight)
        return ce_loss(logits, labels)

    @jax.jit
    def train_step(params, opt_state, feats, labels, lr_scale):
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_eval_step(mode: str, compute_dtype=jnp.bfloat16) -> Callable:
    @jax.jit
    def eval_step(params, feats):
        cast = jax.tree.map(
            lambda p: p.astype(compute_dtype) if p.dtype == jnp.float32 else p, params
        )
        return tltr_apply(cast, feats.astype(compute_dtype), mode).astype(jnp.float32)

    return eval_step


# --------------------------------------------------------------------------- #
# sharded (multi-chip) variants
# --------------------------------------------------------------------------- #


def make_sharded_train_step(
    mesh,
    mode: str,
    optimizer: optax.GradientTransformation,
    params,
    loss_type: str = "BCE",
    pos_weight: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[Callable, object, object]:
    """pjit train step over a ('dp','tp') mesh.

    Returns (step, sharded_params, sharded_opt_state). Batch dims shard over
    dp; head weights Megatron-split over tp (parallel/mesh.py rules). This is
    the TPU-native superset of the reference's single-node DataParallel
    (run.py:191-192).
    """
    param_shardings = tltr_param_shardings(mesh, params)
    params = jax.tree.map(jax.device_put, params, param_shardings)
    # optax moments are zeros_like(params) so they inherit the param shardings
    opt_state = optimizer.init(params)
    data_sharding = batch_sharding(mesh)
    repl = replicated(mesh)

    def loss_fn(p, feats, labels):
        cast = jax.tree.map(
            lambda x: x.astype(compute_dtype) if x.dtype == jnp.float32 else x, p
        )
        logits = tltr_apply(cast, feats.astype(compute_dtype), mode).astype(jnp.float32)
        if loss_type == "BCE":
            return bce_with_logits_loss(logits, labels, pos_weight)
        return ce_loss(logits, labels)

    @partial(
        jax.jit,
        in_shardings=(param_shardings, None, data_sharding, data_sharding, repl),
        out_shardings=(param_shardings, None, repl),
        donate_argnums=(0, 1),
    )
    def train_step(p, opt_state, feats, labels, lr_scale):
        loss, grads = jax.value_and_grad(loss_fn)(p, feats, labels)
        updates, opt_state = optimizer.update(grads, opt_state, p)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        p = optax.apply_updates(p, updates)
        return p, opt_state, loss

    return train_step, params, opt_state
