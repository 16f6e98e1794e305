"""Segmentation losses — behavioral contract: reference losses.py:7-243.

All take NHWC logits (B, H, W, C) and integer targets (B, H, W); the
reference uses NCHW but the math is identical.  The reference's quirks are
reproduced deliberately (and documented) so training dynamics match:
  * cross_entropy uses per-class weights [0.9, 1.1] (losses.py:7-11).
  * MultiClassDiceLoss's cardinality is sum(p^2 + t), not sum(p + t)
    (losses.py:69) — kept as-is for parity.
  * DiceFocal: alpha 0.25, gamma 2, focal_rate 3 (losses.py:80-139).
  * DiceBoundary: max-pool boundary F1 with theta0=3, theta=5
    (losses.py:142-243).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_CE_WEIGHTS = (0.9, 1.1)


def cross_entropy_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Class-weighted CE, mean-reduced with weight-sum normalization
    (torch F.cross_entropy(weight=...) semantics)."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
    w = jnp.asarray(_CE_WEIGHTS, jnp.float32)[:num_classes]
    per_pix = -(onehot * logp).sum(-1)
    pix_w = w[target]
    return (per_pix * pix_w).sum() / pix_w.sum()


def _dice_terms(logits, target):
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
    dims = (1, 2)
    inter = (probs * onehot).sum(dims)  # (B, C)
    # Reference quirk: probs^2 in the cardinality (losses.py:69).
    card = (probs * probs + onehot).sum(dims)
    return probs, onehot, inter, card


def multiclass_dice_loss(logits, target, eps: float = 1e-6):
    _, _, inter, card = _dice_terms(logits, target)
    dice = 2.0 * inter / (card + eps)  # (B, C)
    loss_c = (1.0 - dice).mean(0)  # (C,)
    return (loss_c[1] + loss_c[0]) / 2.0


def dice_focal_loss(logits, target, focal_rate: float = 3.0,
                    dice_rate: float = 1.0, alpha: float = 0.25,
                    gamma: float = 2.0, eps: float = 1e-5):
    probs, onehot, inter, card = _dice_terms(logits, target)
    dice = 2.0 * inter / (card + 1e-6)
    loss_c = (1.0 - dice).mean(0)
    dice_loss = (loss_c[1] + loss_c[0]) / 2.0

    pt = probs * onehot + (1.0 - probs) * (1.0 - onehot)
    focal_w = alpha * jnp.power(1.0 - pt, gamma)
    focal = -focal_w * (onehot * jnp.log(pt + eps)
                        + (1.0 - onehot) * jnp.log(1.0 - pt + eps))
    return dice_loss * dice_rate + focal.mean() * focal_rate


def _max_pool_2d(x, k: int):
    """(B, H, W) max pool, stride 1, same padding — the reference's
    boundary extractor (losses.py:175-200 uses F.max_pool2d)."""
    pad = (k - 1) // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1),
        ((0, 0), (pad, pad), (pad, pad)))


def boundary_loss(logits, target, theta0: int = 3, theta: int = 5):
    """Boundary F1 loss (Bokhovkin & Burnaev), reference losses.py:175-230."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1]
    gt = target.astype(jnp.float32)

    # boundary = maxpool(1 - x) - (1 - x)  ==  dilation of complement
    gt_b = _max_pool_2d(1.0 - gt, theta0) - (1.0 - gt)
    pr_b = _max_pool_2d(1.0 - probs, theta0) - (1.0 - probs)

    # extended boundaries
    gt_b_ext = _max_pool_2d(gt_b, theta)
    pr_b_ext = _max_pool_2d(pr_b, theta)

    b, h, w = gt.shape
    gt_b = gt_b.reshape(b, -1)
    pr_b = pr_b.reshape(b, -1)
    gt_b_ext = gt_b_ext.reshape(b, -1)
    pr_b_ext = pr_b_ext.reshape(b, -1)

    p = (pr_b * gt_b_ext).sum(-1) / (pr_b.sum(-1) + 1e-7)
    r = (gt_b * pr_b_ext).sum(-1) / (gt_b.sum(-1) + 1e-7)
    bf1 = 2.0 * p * r / (p + r + 1e-7)
    return jnp.mean(1.0 - bf1)


def dice_boundary_loss(logits, target, boundary_rate: float = 1.0,
                       dice_rate: float = 1.0):
    return (multiclass_dice_loss(logits, target) * dice_rate
            + boundary_loss(logits, target) * boundary_rate)


LOSSES = {
    "cross_entropy": cross_entropy_loss,
    "dice": multiclass_dice_loss,
    "dice_focal": dice_focal_loss,
    "dice_boundary": dice_boundary_loss,
}


def get_loss(name: str, focal_rate: float = 3.0, dice_rate: float = 1.0,
             boundary_rate: float = 0.05):
    """Loss by name; the rate knobs mirror the reference's
    --loss_focal_rate / --loss_dice_rate / --loss_boundary_rate
    (args.py:82-84, used at train.py:703-714)."""
    if name == "dice_focal":
        return functools.partial(dice_focal_loss, focal_rate=focal_rate,
                                 dice_rate=dice_rate)
    if name == "dice_boundary":
        return functools.partial(dice_boundary_loss,
                                 boundary_rate=boundary_rate,
                                 dice_rate=dice_rate)
    return LOSSES[name]
