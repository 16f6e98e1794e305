"""The jitted training / evaluation step.

One fused XLA program per step: BERT -> multimodal Swin -> decoder ->
corner-aligned resize -> loss -> grads -> AdamW update (the reference runs
these as separate CUDA launches plus a DDP all-reduce; here XLA fuses and
inserts the gradient psum over the 'data' mesh axis automatically).

Activation dtype comes from ModelConfig.dtype (bf16 recommended on TPU —
the reference's AMP equivalent, train.py:452-459); params and the optimizer
stay float32, and no loss scaling is needed with bf16.
"""

from __future__ import annotations

import dataclasses

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax


from ..config import ModelConfig
from ..losses import get_loss
from ..metrics import batch_iou
from ..ops.norm import maybe_normalize_image
from .optim import TrainConfig, build_optimizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, variables, tcfg: TrainConfig) -> Tuple[TrainState, optax.GradientTransformation]:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(params, tcfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    ), tx


def make_train_step(model_train, tx, tcfg: TrainConfig) -> Callable:
    """Returns step(state, batch, dropout_rng) -> (state, metrics).

    `model_train` must be built with train=True (BatchNorm uses batch
    stats; under a data-sharded jit the stats are global = SyncBN).
    batch: {'image': (B,H,W,3), 'ids': (B,N), 'mask': (B,N),
            'target': (B,H,W) int}
    """
    loss_fn = get_loss(tcfg.loss, tcfg.focal_rate, tcfg.dice_rate,
                       tcfg.boundary_rate)

    def compute_loss(params, batch_stats, batch, rng):
        out, mutated = model_train.apply(
            {"params": params, "batch_stats": batch_stats},
            maybe_normalize_image(batch["image"]),
            batch["ids"], batch["mask"],
            deterministic=False, rngs={"dropout": rng},
            mutable=["batch_stats"])
        loss = loss_fn(out, batch["target"])
        return loss, (mutated["batch_stats"], out)

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, (new_stats, out)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(
                state.params, state.batch_stats, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        inter, union = batch_iou(out, batch["target"])
        metrics = {
            "loss": loss,
            # train-time signal only: mean per-image IoU with union-0 -> 0,
            # exactly the reference's in-train IoU (train.py:64-76).
            # Eval-grade numbers (cum_I/cum_U oIoU + P@K) come from
            # SegMetrics in the eval loops.
            "iou": jnp.mean(jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)),
            "lr": _current_lr(state.step, tcfg),
        }
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt), metrics

    return step


def _current_lr(step, tcfg: TrainConfig):
    if tcfg.fix_lr:
        return jnp.asarray(tcfg.lr)
    frac = 1.0 - step / tcfg.total_iters
    return tcfg.lr * jnp.maximum(frac, 0.0) ** tcfg.poly_power


def make_video_train_step(model_train, tx, tcfg: TrainConfig) -> Callable:
    """Video train step: the loss is computed on the annotated frame only
    (the reference index-selects valid frames before the loss,
    train.py:280-285).

    batch: {'video': (B,T,H,W,3), 'ids', 'mask', 'target': (B,H,W),
            'valid_index': (B,) int — annotated frame position in clip}
    """
    loss_fn = get_loss(tcfg.loss, tcfg.focal_rate, tcfg.dice_rate,
                       tcfg.boundary_rate)

    def compute_loss(params, batch_stats, batch, rng):
        out, mutated = model_train.apply(
            {"params": params, "batch_stats": batch_stats},
            maybe_normalize_image(batch["video"]),
            batch["ids"], batch["mask"],
            deterministic=False, rngs={"dropout": rng},
            mutable=["batch_stats"])
        b, t = batch["video"].shape[:2]
        out = out.reshape(b, t, *out.shape[1:])
        frame = jnp.take_along_axis(
            out, batch["valid_index"][:, None, None, None, None], axis=1
        )[:, 0]
        loss = loss_fn(frame, batch["target"])
        return loss, (mutated["batch_stats"], frame)

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, (new_stats, frame)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(
                state.params, state.batch_stats, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        inter, union = batch_iou(frame, batch["target"])
        metrics = {
            "loss": loss,
            "iou": jnp.mean(jnp.where(union > 0,
                                      inter / jnp.maximum(union, 1.0), 0.0)),
            "lr": _current_lr(state.step, tcfg),
        }
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt), metrics

    return step


def make_eval_step(model_eval) -> Callable:
    """Returns eval_step(variables, batch) -> (logits, inter, union)."""

    def eval_step(variables, batch):
        out = model_eval.apply(variables, maybe_normalize_image(batch["image"]),
                               batch["ids"], batch["mask"])
        inter, union = batch_iou(out, batch["target"])
        return out, inter, union

    return eval_step
