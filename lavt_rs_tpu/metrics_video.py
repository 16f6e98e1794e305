"""Video segmentation metrics: A2D precision@K / oIoU / mIoU and
DAVIS-style J&F (region similarity + boundary F-measure).

Behavioral contract:
  * A2D metrics — reference data/a2d_eval.py:12-45 (P@[0.5..0.9],
    overall/mean IoU over annotated frames) via the shared SegMetrics
    accumulators.
  * J&F — the Ref-YouTube-VOS competition server metric (the reference
    uploads masks, README.md:24-27); implemented here so training can track
    it locally on the labeled train split: J = IoU per frame; F = boundary
    F-measure with a morphological-dilation bipartite match (DAVIS
    convention, bound_th=0.008 of the diagonal).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def j_measure(pred: np.ndarray, gt: np.ndarray) -> float:
    """Region similarity: IoU of binary masks."""
    inter = np.logical_and(pred, gt).sum()
    union = np.logical_or(pred, gt).sum()
    if union == 0:
        return 1.0 if inter == 0 else 0.0
    return float(inter) / float(union)


def _mask_boundary(mask: np.ndarray) -> np.ndarray:
    """1-pixel-wide boundary of a binary mask."""
    m = mask.astype(bool)
    pad = np.pad(m, 1, mode="edge")
    eroded = (pad[1:-1, 1:-1] & pad[:-2, 1:-1] & pad[2:, 1:-1]
              & pad[1:-1, :-2] & pad[1:-1, 2:])
    return m & ~eroded


def f_measure(pred: np.ndarray, gt: np.ndarray,
              bound_th: float = 0.008) -> float:
    """Boundary F-measure with dilation-based matching (DAVIS)."""
    import cv2

    fg = _mask_boundary(pred.astype(bool)).astype(np.uint8)
    gb = _mask_boundary(gt.astype(bool)).astype(np.uint8)
    if fg.sum() == 0 and gb.sum() == 0:
        return 1.0
    if fg.sum() == 0 or gb.sum() == 0:
        return 0.0

    diag = np.sqrt(pred.shape[0] ** 2 + pred.shape[1] ** 2)
    radius = max(int(np.ceil(bound_th * diag)), 1)
    kernel = cv2.getStructuringElement(
        cv2.MORPH_ELLIPSE, (2 * radius + 1, 2 * radius + 1))
    fg_dil = cv2.dilate(fg, kernel)
    gb_dil = cv2.dilate(gb, kernel)

    precision = (fg & gb_dil).sum() / fg.sum()
    recall = (gb & fg_dil).sum() / gb.sum()
    if precision + recall == 0:
        return 0.0
    return float(2 * precision * recall / (precision + recall))


class JFMetrics:
    """Accumulates per-frame J, F over a set of (video, expression) preds."""

    def __init__(self):
        self.j: List[float] = []
        self.f: List[float] = []

    def update(self, pred: np.ndarray, gt: np.ndarray):
        """pred, gt: (H, W) binary or (T, H, W) stacks."""
        if pred.ndim == 3:
            for p, g in zip(pred, gt):
                self.update(p, g)
            return
        self.j.append(j_measure(pred, gt))
        self.f.append(f_measure(pred, gt))

    def summary(self) -> Dict[str, float]:
        j = 100.0 * float(np.mean(self.j)) if self.j else 0.0
        f = 100.0 * float(np.mean(self.f)) if self.f else 0.0
        return {"J": j, "F": f, "J&F": (j + f) / 2.0}
