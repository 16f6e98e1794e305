"""Video evaluation loops.

Behavioral contract:
  * evaluate_a2d — reference train.py:332-395 / test.py:121-230: per clip,
    forward the model, take the annotated frame's logits (valid_index),
    IoU vs the single annotated mask; report mIoU/oIoU/P@K.
  * evaluate_ytvos_train_split — local J&F on labeled data (the actual
    competition split is server-scored; reference uploads PNGs).
"""

from __future__ import annotations

import sys
import weakref
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..metrics import SegMetrics
from ..metrics_video import JFMetrics
from ..ops.norm import maybe_normalize_image

# jitted forward cached per model_apply object so per-epoch eval during
# training does not recompile
_FWD_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _fwd_for(model_apply: Callable):
    fn = _FWD_CACHE.get(model_apply)
    if fn is None:
        fn = jax.jit(lambda variables, video, ids, mask:
                     model_apply(variables, maybe_normalize_image(video),
                                 ids, mask))
        _FWD_CACHE[model_apply] = fn
    return fn


def evaluate_a2d(model_apply: Callable, variables, ds,
                 max_items: Optional[int] = None,
                 out_stream=None, pipeline_depth: int = 2) -> dict:
    """ds yields VideoExample with (T, H, W, 3) clips; the loss/metric is
    computed on the annotated frame only (valid_index).

    Pipelined (eval/pipeline.py): clip decode + host->device transfer run
    in a producer thread while up to pipeline_depth forwards stay in
    flight — the loop is decode/transfer-bound on a remote-attached TPU.
    """
    from .pipeline import run_pipelined

    if out_stream is None:  # resolve at call time, not import time
        out_stream = sys.stderr
    metrics = SegMetrics()
    fwd = _fwd_for(model_apply)

    n = len(ds) if max_items is None else min(len(ds), max_items)

    def produce():
        for i in range(n):
            ex = ds[i]
            yield (ex, jnp.asarray(ex.video[None]),
                   jnp.asarray(ex.ids[None].astype(np.int32)),
                   jnp.asarray(ex.mask[None].astype(np.int32)))

    def dispatch(item):
        ex, video, ids, mask = item
        return fwd(variables, video, ids, mask)

    def sink(item, logits):
        ex = item[0]
        pred = np.asarray(logits)[ex.valid_index].argmax(-1)  # (H, W)
        inter = np.logical_and(pred, ex.target).sum()
        union = np.logical_or(pred, ex.target).sum()
        metrics.update(np.asarray([inter]), np.asarray([union]))

    run_pipelined(produce, dispatch, sink, depth=pipeline_depth)

    summary = metrics.summary()
    prec = " ".join(f"P@{t}={summary[f'P@{t}']:.2f}"
                    for t in (0.5, 0.6, 0.7, 0.8, 0.9))
    print(f"A2D: mIoU={summary['mIoU']:.2f} oIoU={summary['oIoU']:.2f} "
          f"{prec} (n={metrics.n})", file=out_stream)
    return summary


def evaluate_ytvos_jf(model_apply: Callable, variables, ds,
                      max_items: Optional[int] = None,
                      out_stream=None, pipeline_depth: int = 2) -> dict:
    """Local J&F over a labeled YTVOS-style dataset (all clip frames that
    have ground truth; here the annotated frame per meta). Pipelined like
    evaluate_a2d."""
    from .pipeline import run_pipelined

    if out_stream is None:
        out_stream = sys.stderr
    jf = JFMetrics()
    fwd = _fwd_for(model_apply)

    n = len(ds) if max_items is None else min(len(ds), max_items)

    def produce():
        for i in range(n):
            ex = ds[i]
            yield (ex, jnp.asarray(ex.video[None]),
                   jnp.asarray(ex.ids[None].astype(np.int32)),
                   jnp.asarray(ex.mask[None].astype(np.int32)))

    def dispatch(item):
        ex, video, ids, mask = item
        return fwd(variables, video, ids, mask)

    def sink(item, logits):
        ex = item[0]
        pred = np.asarray(logits)[ex.valid_index].argmax(-1)
        jf.update(pred.astype(np.uint8), ex.target.astype(np.uint8))

    run_pipelined(produce, dispatch, sink, depth=pipeline_depth)

    summary = jf.summary()
    print(f"YTVOS(train-split) J={summary['J']:.2f} F={summary['F']:.2f} "
          f"J&F={summary['J&F']:.2f}", file=out_stream)
    return summary
