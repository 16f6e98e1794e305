"""RefCOCO evaluation loop — behavioral contract: reference test.py:53-109.

Per image, per sentence j: forward -> argmax -> IoU against the 480² target;
accumulate cum_I/cum_U (oIoU), per-prediction IoU list (mIoU), and P@K.
The reference evaluates every sentence of every ref object (eval_mode
datasets stack all sentences).

TPU-native twist: sentences are batched per ref (one forward over the S
sentences with the image broadcast), and refs can be processed in a fixed
padded batch for jit stability.
"""

from __future__ import annotations

import sys
import time
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..data.refcoco import ReferDataset
from ..metrics import SegMetrics


def evaluate(model_apply: Callable, variables, ds: ReferDataset,
             log_every: int = 100, max_items: Optional[int] = None,
             out_stream=sys.stderr) -> dict:
    """model_apply(variables, image, ids, mask) -> NHWC logits."""
    metrics = SegMetrics()

    @jax.jit
    def fwd_iou(variables, image, ids, mask, target):
        logits = model_apply(variables, image, ids, mask)
        pred = jnp.argmax(logits, axis=-1)
        gt = target.astype(jnp.float32)
        predf = pred.astype(jnp.float32)
        inter = jnp.sum(predf * gt, axis=(1, 2))
        union = jnp.sum(jnp.maximum(predf, gt), axis=(1, 2))
        return inter, union

    n = len(ds) if max_items is None else min(len(ds), max_items)
    t0 = time.time()
    for i in range(n):
        ex = ds[i]
        s = ex.ids.shape[0]  # sentences for this ref
        image = jnp.asarray(np.repeat(ex.image[None], s, axis=0))
        target = jnp.asarray(np.repeat(ex.target[None], s, axis=0))
        inter, union = fwd_iou(variables, image,
                               jnp.asarray(ex.ids.astype(np.int32)),
                               jnp.asarray(ex.mask.astype(np.int32)),
                               target)
        metrics.update(np.asarray(inter), np.asarray(union))
        if log_every and (i + 1) % log_every == 0:
            el = time.time() - t0
            print(f"eval [{i + 1}/{n}] {el:.1f}s "
                  f"({metrics.n / el:.2f} sent/s)", file=out_stream)

    summary = metrics.summary()
    prec = " ".join(f"P@{t}={summary[f'P@{t}']:.2f}"
                    for t in (0.5, 0.6, 0.7, 0.8, 0.9))
    print(f"Final: mIoU={summary['mIoU']:.2f} oIoU={summary['oIoU']:.2f} "
          f"{prec} (n={metrics.n})", file=out_stream)
    return summary
