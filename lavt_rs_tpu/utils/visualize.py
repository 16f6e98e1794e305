"""Visualization helpers: Detectron-style colormap and mask overlays.

Behavioral contract: reference colormap.py:1-91 (the 74-color palette) and
test_ytvos.py:524-533 (vis_add_mask overlay: img * (1-a) + color * a on
mask pixels); test.py --save_feats feature-map dumps are served by
`save_feature_grid`.
"""

from __future__ import annotations

import numpy as np

# Detectron2 colormap (RGB in [0,1]), reference colormap.py.
_COLORS = np.array([
    0.000, 0.447, 0.741, 0.850, 0.325, 0.098, 0.929, 0.694, 0.125,
    0.494, 0.184, 0.556, 0.466, 0.674, 0.188, 0.301, 0.745, 0.933,
    0.635, 0.078, 0.184, 0.300, 0.300, 0.300, 0.600, 0.600, 0.600,
    1.000, 0.000, 0.000, 1.000, 0.500, 0.000, 0.749, 0.749, 0.000,
    0.000, 1.000, 0.000, 0.000, 0.000, 1.000, 0.667, 0.000, 1.000,
    0.333, 0.333, 0.000, 0.333, 0.667, 0.000, 0.333, 1.000, 0.000,
    0.667, 0.333, 0.000, 0.667, 0.667, 0.000, 0.667, 1.000, 0.000,
    1.000, 0.333, 0.000, 1.000, 0.667, 0.000, 1.000, 1.000, 0.000,
]).astype(np.float32).reshape(-1, 3)


def colormap(rgb: bool = True, maximum: int = 255) -> np.ndarray:
    c = _COLORS * maximum
    return c if rgb else c[:, ::-1]


def vis_add_mask(img: np.ndarray, mask: np.ndarray, color_idx: int = 0,
                 alpha: float = 0.5) -> np.ndarray:
    """Overlay a binary mask on an RGB uint8 image."""
    color = colormap()[color_idx % len(_COLORS)]
    out = img.astype(np.float32).copy()
    m = mask.astype(bool)
    out[m] = out[m] * (1 - alpha) + color[None] * alpha
    return out.clip(0, 255).astype(np.uint8)


def save_feature_grid(path: str, feats: np.ndarray, max_channels: int = 16):
    """Dump the first channels of a (H, W, C) feature map as an image grid
    (the --save_feats analogue, reference test.py:121-230)."""
    from PIL import Image

    c = min(feats.shape[-1], max_channels)
    cols = int(np.ceil(np.sqrt(c)))
    rows = int(np.ceil(c / cols))
    h, w = feats.shape[:2]
    grid = np.zeros((rows * h, cols * w), np.float32)
    for i in range(c):
        f = feats[..., i]
        lo, hi = float(f.min()), float(f.max())
        f = (f - lo) / (hi - lo + 1e-8)
        r, cc = divmod(i, cols)
        grid[r * h:(r + 1) * h, cc * w:(cc + 1) * w] = f
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)
