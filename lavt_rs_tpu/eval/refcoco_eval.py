"""RefCOCO evaluation loop — behavioral contract: reference test.py:53-109.

Per image, per sentence j: forward -> argmax -> IoU against the 480² target;
accumulate cum_I/cum_U (oIoU), per-prediction IoU list (mIoU), and P@K.
The reference evaluates every sentence of every ref object (eval_mode
datasets stack all sentences).

TPU-native twists over the reference's per-sentence python loop:
  * sentences are PADDED to one fixed S so the whole eval runs through a
    single compiled program (RefCOCO refs carry 1-3+ sentences; jitting per
    count caused a compile per distinct S and batch-1-style utilization);
  * the jitted forward is cached per model_apply object, so per-epoch eval
    during training does not recompile.
"""

from __future__ import annotations

import sys
import time
import weakref
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..data.refcoco import ReferDataset
from ..metrics import SegMetrics

_FWD_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _fwd_iou_for(model_apply: Callable):
    fn = _FWD_CACHE.get(model_apply)
    if fn is None:
        @jax.jit
        def fwd_iou(variables, image, ids, mask, target):
            logits = model_apply(variables, image, ids, mask)
            pred = jnp.argmax(logits, axis=-1)
            gt = target.astype(jnp.float32)
            predf = pred.astype(jnp.float32)
            inter = jnp.sum(predf * gt, axis=(1, 2))
            union = jnp.sum(jnp.maximum(predf, gt), axis=(1, 2))
            return inter, union

        _FWD_CACHE[model_apply] = fwd_iou
        fn = fwd_iou
    return fn


def evaluate(model_apply: Callable, variables, ds: ReferDataset,
             log_every: int = 100, max_items: Optional[int] = None,
             pad_sentences: Optional[int] = None,
             out_stream=None) -> dict:
    """model_apply(variables, image, ids, mask) -> NHWC logits."""
    if out_stream is None:  # resolve at call time, not import time
        out_stream = sys.stderr
    metrics = SegMetrics()
    fwd_iou = _fwd_iou_for(model_apply)

    # one fixed sentence count -> one compile for the whole eval
    smax = pad_sentences
    if smax is None and hasattr(ds, "input_ids"):
        smax = max(len(x) for x in ds.input_ids)

    n = len(ds) if max_items is None else min(len(ds), max_items)
    t0 = time.time()
    for i in range(n):
        ex = ds[i]
        s = ex.ids.shape[0]  # sentences for this ref
        ids = ex.ids.astype(np.int32)
        mask = ex.mask.astype(np.int32)
        sp = max(smax or s, s)
        if sp > s:
            pad = ((0, sp - s), (0, 0))
            ids = np.pad(ids, pad)
            mask = np.pad(mask, pad)
        image = jnp.asarray(np.broadcast_to(ex.image[None],
                                            (sp,) + ex.image.shape))
        target = jnp.asarray(np.broadcast_to(ex.target[None],
                                             (sp,) + ex.target.shape))
        inter, union = fwd_iou(variables, image, jnp.asarray(ids),
                               jnp.asarray(mask), target)
        metrics.update(np.asarray(inter)[:s], np.asarray(union)[:s])
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
