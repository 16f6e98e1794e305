"""IoU / precision@K metrics — behavioral contract: reference train.py:64-131,
test.py:242-262.

`batch_iou` is jit-friendly (returns per-sample I and U); the accumulators
mirror the reference's oIoU (cum_I/cum_U), mIoU (per-sample mean), and
P@{0.5..0.9} counters.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp
import numpy as np

PR_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


def batch_iou(logits: jnp.ndarray, target: jnp.ndarray):
    """Per-sample intersection and union from NHWC logits.

    Matches reference IoU (train.py:64-76): pred = argmax over classes,
    I = sum(pred * gt), U = sum(pred + gt) - I.
    """
    pred = jnp.argmax(logits, axis=-1)
    pred = pred.reshape(pred.shape[0], -1).astype(jnp.float64 if False else jnp.float32)
    gt = target.reshape(target.shape[0], -1).astype(jnp.float32)
    inter = jnp.sum(pred * gt, axis=1)
    union = jnp.sum(pred + gt, axis=1) - inter
    return inter, union


@dataclasses.dataclass
class SegMetrics:
    """Accumulates oIoU / mIoU / P@K exactly like the reference eval loops."""

    cum_i: float = 0.0
    cum_u: float = 0.0
    iou_list: list = dataclasses.field(default_factory=list)
    pr_count: Dict[float, int] = dataclasses.field(
        default_factory=lambda: {t: 0 for t in PR_THRESHOLDS})

    def update(self, inter, union):
        inter = np.atleast_1d(np.asarray(inter, np.float64))
        union = np.atleast_1d(np.asarray(union, np.float64))
        for i, u in zip(inter, union):
            # zero-guard like reference train.py:72-74
            iou = 0.0 if u == 0 else float(i / u)
            self.cum_i += float(i)
            self.cum_u += float(u)
            self.iou_list.append(iou)
            for t in PR_THRESHOLDS:
                if iou >= t:
                    self.pr_count[t] += 1

    @property
    def n(self) -> int:
        return len(self.iou_list)

    def summary(self) -> Dict[str, float]:
        n = max(self.n, 1)
        sum_iou = float(np.sum(self.iou_list)) if self.iou_list else 0.0
        out = {
            "mIoU": 100.0 * sum_iou / n if self.iou_list else 0.0,
            "oIoU": 100.0 * self.cum_i / max(self.cum_u, 1e-12),
        }
        for t in PR_THRESHOLDS:
            out[f"P@{t}"] = 100.0 * self.pr_count[t] / n
        return out

    def merge_stats(self, stats: np.ndarray) -> None:
        """Fold all-gathered per-host stat rows (see stats_row) into this
        accumulator — the multi-host reduction for a process-sharded eval
        (the reference all-reduces via torch.distributed,
        train.py:321-327; here hosts exchange the sufficient statistics:
        mIoU is sum(iou)/n, so the per-item list itself never crosses
        hosts)."""
        for row in np.atleast_2d(np.asarray(stats, np.float64)):
            self.cum_i += float(row[0])
            self.cum_u += float(row[1])
            # represent the foreign items' ious as (n-1) zeros + the
            # remainder so len() and sum() are both exact
            n_f, sum_f = int(row[3]), float(row[2])
            if n_f > 0:
                self.iou_list.extend([0.0] * (n_f - 1) + [sum_f])
            for t, v in zip(PR_THRESHOLDS, row[4:]):
                self.pr_count[t] += int(v)

    def stats_row(self) -> np.ndarray:
        """This host's sufficient statistics for merge_stats."""
        return np.asarray(
            [self.cum_i, self.cum_u, float(np.sum(self.iou_list)),
             float(self.n)] + [float(self.pr_count[t])
                               for t in PR_THRESHOLDS], np.float64)
