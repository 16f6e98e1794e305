"""Optimizer & LR schedule with the reference's param-group semantics.

Behavioral contract (reference train.py:615-700):
  * AdamW, lr 5e-5, weight_decay 1e-2 (torch defaults b1=0.9 b2=0.999
    eps=1e-8, decoupled decay), optional amsgrad.
  * Backbone params whose name contains 'norm', 'absolute_pos_embed' or
    'relative_position_bias_table' get weight_decay 0 (classifier and BERT
    groups keep the default decay — including decoder BN scales, as in the
    reference).
  * BERT subsetting via `lang_enc_params` (train.py:634-686): params not in
    any optimizer group are FROZEN (receive no updates):
      - encoder-10 (default): only encoder layers 0-9 train; embeddings and
        layers 10-11 frozen.
      - encoder-all: all encoder layers; embeddings frozen.
      - embeddings+encoder-10 / embeddings+encoder-all: as named.
  * Poly LR per *iteration*: lr * (1 - it / total_iters)^0.9
    (train.py:699-700), or constant with fix_lr.

Implemented as one optax.multi_transform over three labels:
  'decay' / 'no_decay' / 'frozen'.
"""

from __future__ import annotations

import dataclasses
import re
from typing import NamedTuple, Optional

import jax
import optax


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 5e-5
    weight_decay: float = 1e-2
    epochs: int = 40
    iters_per_epoch: int = 1000
    lang_enc_params: str = "encoder-10"
    bert_trainable_layers: int = 10
    loss: str = "cross_entropy"  # see losses.LOSSES
    # loss-mix rates (reference args.py:82-84)
    focal_rate: float = 3.0
    dice_rate: float = 1.0
    boundary_rate: float = 0.05
    amsgrad: bool = False
    fix_lr: bool = False
    poly_power: float = 0.9
    batch_size: int = 8  # global
    grad_clip: Optional[float] = None

    @property
    def total_iters(self) -> int:
        return self.epochs * self.iters_per_epoch


_NO_DECAY_RE = re.compile(
    r"norm|absolute_pos_embed|relative_position_bias_table")
# 'text_encoder' = integrated BERT (lavt_one etc.); 'bert_model' = the
# two-model `lavt` variant's external BERT (reference train.py:634-686
# applies the same lang_enc_params rules to both).
_BERT_LAYER_RE = re.compile(r"(?:text_encoder|bert_model)/layer_(\d+)/")


def label_param(path: str, cfg: TrainConfig) -> str:
    """Assign 'decay' / 'no_decay' / 'frozen' to a flat param path like
    'backbone/layers_0/blocks_0/norm1/scale'."""
    if path.startswith(("text_encoder/", "bert_model/")):
        enc = cfg.lang_enc_params
        m = _BERT_LAYER_RE.search(path)
        if m is not None:
            layer = int(m.group(1))
            if enc in ("encoder-10", "embeddings+encoder-10") and \
                    layer >= cfg.bert_trainable_layers:
                return "frozen"
            return "decay"
        # embeddings (+ their layernorm)
        if enc.startswith("embeddings+"):
            return "decay"
        return "frozen"
    # 'backbone/' may be nested under 'model/' for the two-model lavt
    if "backbone/" in path and _NO_DECAY_RE.search(path):
        return "no_decay"
    return "decay"


def _flatten_labels(params, cfg: TrainConfig):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)

    labels = jax.tree_util.tree_map_with_path(
        lambda kp, _: label_param(path_str(kp), cfg), params)
    return labels


def poly_schedule(cfg: TrainConfig):
    if cfg.fix_lr:
        return cfg.lr

    def sched(step):
        import jax.numpy as jnp

        frac = 1.0 - step / cfg.total_iters
        return cfg.lr * jnp.maximum(frac, 0.0) ** cfg.poly_power

    return sched


class _AmsgradState(NamedTuple):
    count: "jax.Array"
    mu: "object"
    nu: "object"
    nu_max: "object"


def scale_by_amsgrad_torch(b1: float = 0.9, b2: float = 0.999,
                           eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.AdamW(amsgrad=True) semantics exactly: the running max is
    taken over the RAW second moment and bias-corrected afterwards
    (optax.scale_by_amsgrad corrects first, then maxes — transiently
    different updates)."""
    import jax.numpy as jnp

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return _AmsgradState(count=jnp.zeros([], jnp.int32), mu=zeros,
                             nu=jax.tree.map(jnp.zeros_like, params),
                             nu_max=jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        t = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        nu_max = jax.tree.map(jnp.maximum, state.nu_max, nu)
        bc1 = 1 - b1 ** t.astype(jnp.float32)
        bc2 = 1 - b2 ** t.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, vm: (m / bc1) / (jnp.sqrt(vm) / jnp.sqrt(bc2) + eps),
            mu, nu_max)
        return out, _AmsgradState(count=t, mu=mu, nu=nu, nu_max=nu_max)

    return optax.GradientTransformation(init, update)


def build_optimizer(params, cfg: TrainConfig) -> optax.GradientTransformation:
    sched = poly_schedule(cfg)

    def adamw(wd):
        if cfg.amsgrad:
            # torch AdamW(amsgrad=True) equivalent (reference train.py:692):
            # max-of-raw-v second moment + decoupled weight decay.
            tx = optax.chain(
                scale_by_amsgrad_torch(b1=0.9, b2=0.999, eps=1e-8),
                optax.add_decayed_weights(wd),
                optax.scale_by_learning_rate(sched))
        else:
            tx = optax.adamw(learning_rate=sched, b1=0.9, b2=0.999,
                             eps=1e-8, weight_decay=wd, nesterov=False)
        if cfg.grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
        return tx

    labels = _flatten_labels(params, cfg)
    return optax.multi_transform(
        {"decay": adamw(cfg.weight_decay), "no_decay": adamw(0.0),
         "frozen": optax.set_to_zero()},
        labels)
