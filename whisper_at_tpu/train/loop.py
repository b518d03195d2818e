"""Train/validate loops for the TL-TR head, with schedulers, meters, and
checkpoint weight averaging.

Host-side control mirroring the reference (whisper_at_train/traintest.py,
run.py:213-245): per-step timing meters, NaN divergence abort, the AudioSet-
full 10%-of-epoch early break, per-epoch validation with mAP/AUC/d-prime,
result.csv + per-epoch stats pickles + progress.pkl, MultiStepLR /
ReduceLROnPlateau schedules (as dynamic lr scales — no recompilation), and
post-training epoch-checkpoint weight averaging.

The device work is one jitted train step (train/steps.py); batches stream
from the thread-prefetched loader so disk IO overlaps the TPU step.
"""

import os
import pickle
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import load_params, save_params
from .stats import calculate_stats, d_prime, mean_auc, mean_average_precision
from .steps import make_eval_step, make_optimizer, make_train_step
from .tltr import count_parameters


class AverageMeter:
    """Running value/average meter (utilities/util.py:238-253)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count if self.count else 0.0


class MultiStepLR:
    """gamma decay at milestones start, start+step, ... (traintest.py:59)."""

    def __init__(self, start: int, step: int, gamma: float):
        self.milestones = set(range(start, 1000, step))
        self.gamma = gamma
        self.scale = 1.0
        self.epoch = 0

    def step(self, metric: Optional[float] = None):
        self.epoch += 1
        if self.epoch in self.milestones:
            self.scale *= self.gamma


class ReduceLROnPlateau:
    """Halve the lr when the metric stops improving (mode='max')."""

    def __init__(self, factor: float = 0.5, patience: int = 2):
        self.factor = factor
        self.patience = patience
        self.best = -np.inf
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float):
        if metric > self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0


def validate(eval_step, params, val_loader, loss_fn=None):
    """Batched inference + metric computation (traintest.py:204-267)."""
    predictions, targets, losses = [], [], []
    for feats, labels in val_loader:
        logits = np.asarray(eval_step(params, jnp.asarray(feats)))
        predictions.append(logits)
        targets.append(labels)
        if loss_fn is not None:
            losses.append(float(loss_fn(jnp.asarray(logits), jnp.asarray(labels))))

    output = np.concatenate(predictions)
    target = np.concatenate(targets)
    stats = calculate_stats(output, target)
    loss = float(np.mean(losses)) if losses else np.nan
    return stats, loss


def _save_train_state(path: str, opt_state, scheduler_scale: float, epoch: int):
    """Serialize the optimizer pytree + scheduler scale for mid-run resume
    (the reference has no resume at all — SURVEY §5)."""
    leaves = jax.tree.leaves(opt_state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__scale__"] = np.asarray(scheduler_scale)
    arrays["__epoch__"] = np.asarray(epoch)
    np.savez(path, **arrays)


def _load_train_state(path: str, opt_state_template):
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(jax.tree.leaves(opt_state_template)))]
        scale = float(data["__scale__"])
        epoch = int(data["__epoch__"])
    treedef = jax.tree.structure(opt_state_template)
    opt_state = jax.tree.unflatten(
        treedef, [jnp.asarray(x) for x in leaves]
    )
    return opt_state, scale, epoch


def latest_resumable_epoch(exp_dir: str) -> int:
    """Highest epoch with both a model checkpoint and a train-state file."""
    epoch = 0
    models_dir = os.path.join(exp_dir, "models")
    if not os.path.isdir(models_dir):
        return 0
    for name in os.listdir(models_dir):
        if name.startswith("train_state.") and name.endswith(".npz"):
            n = int(name.split(".")[1])
            if os.path.exists(os.path.join(models_dir, f"audio_model.{n}.npz")):
                epoch = max(epoch, n)
    return epoch


def train(
    params: dict,
    mode: str,
    train_loader,
    val_loader,
    *,
    exp_dir: str,
    lr: float = 1e-4,
    n_epochs: int = 30,
    loss_type: str = "BCE",
    pos_weight: Optional[float] = None,
    metrics_name: str = "mAP",
    lr_adapt: bool = False,
    lr_patience: int = 2,
    lrscheduler_start: int = 15,
    lrscheduler_step: int = 5,
    lrscheduler_decay: float = 0.75,
    dataset: str = "as-full",
    save_model: bool = True,
    n_print_steps: int = 100,
    compute_dtype=jnp.bfloat16,
    n_class_sonyc: Optional[int] = None,
    resume: bool = False,
    mesh=None,
) -> dict:
    """Train the TL-TR head; returns the final params.

    Epoch semantics mirror the reference: for 'as-full', each epoch breaks at
    10% of the loader (traintest.py:136-139), so 30 epochs == 3 full passes.

    mesh: optional jax.sharding.Mesh ('dp','tp') — runs the pjit sharded
    step (batch over dp, Megatron-split head over tp) instead of the
    single-device step; every train batch size must be divisible by the dp
    size. The TPU-native superset of the reference's DataParallel
    (run.py:191-192).
    """
    os.makedirs(os.path.join(exp_dir, "models"), exist_ok=True)

    optimizer = make_optimizer(lr)
    if mesh is not None:
        from ..parallel.mesh import shard_batch
        from .steps import make_sharded_train_step

        dp = mesh.shape.get("dp", 1)
        train_step, params, opt_state = make_sharded_train_step(
            mesh, mode, optimizer, params, loss_type, pos_weight,
            compute_dtype,
        )

        def _prepare(x):
            x = jnp.asarray(x)
            if x.shape[0] % dp != 0:
                raise ValueError(
                    f"batch size {x.shape[0]} not divisible by dp={dp}; "
                    "use a DataLoader batch_size that is a multiple of the "
                    "mesh's dp axis"
                )
            return shard_batch(mesh, x)
    else:
        opt_state = optimizer.init(params)
        train_step = make_train_step(
            mode, optimizer, loss_type, pos_weight, compute_dtype
        )
        _prepare = jnp.asarray
    eval_step = make_eval_step(mode, compute_dtype)

    from .steps import bce_with_logits_loss, ce_loss

    def loss_fn(logits, labels):
        if loss_type == "BCE":
            return bce_with_logits_loss(logits, labels, pos_weight)
        return ce_loss(logits, labels)

    if lr_adapt:
        scheduler = ReduceLROnPlateau(factor=0.5, patience=lr_patience)
        print("Override to use adaptive learning rate scheduler.")
    else:
        scheduler = MultiStepLR(lrscheduler_start, lrscheduler_step, lrscheduler_decay)
        print(
            "The learning rate scheduler starts at {:d} epoch with decay rate "
            "of {:.3f} every {:d} epochs".format(
                lrscheduler_start, lrscheduler_decay, lrscheduler_step
            )
        )

    print(
        "Total trainable parameter number is : {:.3f} million".format(
            count_parameters(params) / 1e6
        )
    )

    loss_meter = AverageMeter()
    per_sample_time = AverageMeter()
    per_sample_data_time = AverageMeter()
    per_sample_dnn_time = AverageMeter()
    progress: List[list] = []
    best_mAP, best_acc, best_epoch = -np.inf, -np.inf, 0
    global_step = 0
    start_time = time.time()
    result = np.zeros([n_epochs, 4])

    start_epoch = 1
    if resume:
        last = latest_resumable_epoch(exp_dir)
        if last > 0:
            _, params = load_params(
                os.path.join(exp_dir, "models", f"audio_model.{last}.npz")
            )
            import jax as _jax

            params = _jax.tree.map(jnp.asarray, params)
            opt_state, scheduler.scale, _ = _load_train_state(
                os.path.join(exp_dir, "models", f"train_state.{last}.npz"),
                opt_state,
            )
            if mesh is not None:
                from ..parallel.mesh import tltr_param_shardings

                shardings = tltr_param_shardings(mesh, params)
                params = _jax.tree.map(_jax.device_put, params, shardings)
                # optax moments are zeros_like(params), so a freshly-init
                # state on the sharded params is a sharding template for
                # the restored one
                template = optimizer.init(params)
                opt_state = _jax.tree.map(
                    lambda x, t: _jax.device_put(jnp.asarray(x), t.sharding),
                    opt_state, template,
                )
            if hasattr(scheduler, "epoch"):
                scheduler.epoch = last
            start_epoch = last + 1
            prev = np.loadtxt(os.path.join(exp_dir, "result.csv"), delimiter=",")
            result[: min(last, n_epochs)] = np.atleast_2d(prev)[: min(last, n_epochs)]
            print(f"resuming from epoch {last}")

    for epoch in range(start_epoch, n_epochs + 1):
        begin_time = time.time()
        end_time = time.time()
        n_batches = len(train_loader)

        # one-step-delayed loss materialization: step i's loss is only
        # float()ed after step i+1 has been DISPATCHED, so the host never
        # blocks on the in-flight step (the reference's pin_memory /
        # non_blocking H2D overlap, applied to the output side — on a
        # tunneled device each forced sync costs a full RTT). Device
        # execution is in-order, so the committed loss is already done by
        # the time the next step is dispatched; meters lag one step.
        pending = None

        def _commit(p):
            # only the LOSS is one step delayed; timing meters are exact
            # per-iteration intervals measured at each body's end below
            loss_meter.update(float(p[0]), p[1])

        for i, (feats, labels) in enumerate(train_loader):
            data_t = time.time() - end_time
            params, opt_state, loss = train_step(
                params, opt_state, _prepare(feats), _prepare(labels),
                jnp.float32(scheduler.scale),
            )
            b = feats.shape[0]
            if pending is not None:
                _commit(pending)
            pending = (loss, b)
            # each iteration's meters cover exactly its own wall interval
            # [end of body i-1, end of body i]: its data load, dispatch,
            # and the (amortized, steady-state) previous-loss fetch — never
            # the NEXT step's data load, which the delayed-commit variant
            # of this accounting used to absorb into "dnn time"
            body_end = time.time()
            per_sample_data_time.update(data_t / b)
            per_sample_time.update((body_end - end_time) / b)
            per_sample_dnn_time.update((body_end - end_time - data_t) / b)

            if global_step % n_print_steps == 0 and global_step != 0:
                print(
                    "Epoch: [{0}][{1}/{2}]\t"
                    "Per Sample Total Time {3:.5f}\t"
                    "Per Sample Data Time {4:.5f}\t"
                    "Per Sample DNN Time {5:.5f}\t"
                    "Train Loss {6:.4f}".format(
                        epoch, i, n_batches, per_sample_time.avg,
                        per_sample_data_time.avg, per_sample_dnn_time.avg,
                        loss_meter.val,
                    ),
                    flush=True,
                )
                if np.isnan(loss_meter.avg):
                    print("training diverged...")
                    return params

            end_time = time.time()
            global_step += 1

            # as-full: 10% of iterations per epoch (traintest.py:136-139)
            if dataset == "as-full" and i > 0.1 * n_batches:
                break

        if pending is not None:
            _commit(pending)

        print("start validation")
        stats, valid_loss = validate(eval_step, params, val_loader, loss_fn)
        mAP = mean_average_precision(stats)
        mAUC = mean_auc(stats)
        acc = stats[0]["acc"]

        print("mAP: {:.6f}".format(mAP) if metrics_name == "mAP"
              else "acc: {:.6f}".format(acc))
        print("AUC: {:.6f}".format(mAUC))
        print("d_prime: {:.6f}".format(d_prime(mAUC)))
        print("train_loss: {:.6f}".format(loss_meter.avg))
        print("valid_loss: {:.6f}".format(valid_loss))

        if n_class_sonyc is not None and n_class_sonyc > 527:
            sonyc_mAP = float(np.mean([s["AP"] for s in stats[527:n_class_sonyc]]))
            original_mAP = float(np.mean([s["AP"] for s in stats[:527]]))
            print(f"Original AudioSet classes mAP: {original_mAP:.6f}")
            print(f"SONYC classes mAP: {sonyc_mAP:.6f}")

        result[epoch - 1, :] = [acc, mAP, mAUC, lr * scheduler.scale]
        np.savetxt(os.path.join(exp_dir, "result.csv"), result, delimiter=",")

        if mAP > best_mAP:
            best_mAP = mAP
            if metrics_name == "mAP":
                best_epoch = epoch
        if acc > best_acc:
            best_acc = acc
            if metrics_name == "acc":
                best_epoch = epoch

        if save_model:
            save_params(
                os.path.join(exp_dir, "models", f"audio_model.{epoch}.npz"), params
            )
            _save_train_state(
                os.path.join(exp_dir, "models", f"train_state.{epoch}.npz"),
                opt_state, scheduler.scale, epoch,
            )

        scheduler.step(mAP if metrics_name == "mAP" else acc)

        with open(os.path.join(exp_dir, f"stats_{epoch}.pickle"), "wb") as handle:
            pickle.dump(stats, handle, protocol=pickle.HIGHEST_PROTOCOL)
        progress.append(
            [epoch, global_step, best_epoch, best_mAP, time.time() - start_time]
        )
        with open(os.path.join(exp_dir, "progress.pkl"), "wb") as f:
            pickle.dump(progress, f)

        print("epoch {:d} training time: {:.3f}".format(epoch, time.time() - begin_time))
        loss_meter.reset()
        per_sample_time.reset()
        per_sample_data_time.reset()
        per_sample_dnn_time.reset()

    return params


def wa_model(exp_dir: str, start_epoch: int = 16, end_epoch: int = 30) -> dict:
    """Average epoch checkpoints start..end (run.py:213-227)."""
    _, summed = load_params(
        os.path.join(exp_dir, "models", f"audio_model.{start_epoch}.npz")
    )
    summed = jax.tree.map(lambda a: a.astype(np.float64), summed)
    model_cnt = 1
    for epoch in range(start_epoch + 1, end_epoch + 1):
        path = os.path.join(exp_dir, "models", f"audio_model.{epoch}.npz")
        if os.path.exists(path):
            _, other = load_params(path)
            summed = jax.tree.map(lambda a, b: a + b, summed, other)
            model_cnt += 1
    print("wa {:d} models from {:d} to {:d}".format(model_cnt, start_epoch, end_epoch))
    averaged = jax.tree.map(
        lambda a: (a / float(model_cnt)).astype(np.float32), summed
    )
    save_params(os.path.join(exp_dir, "models", "audio_model_wa.npz"), averaged)
    return averaged
