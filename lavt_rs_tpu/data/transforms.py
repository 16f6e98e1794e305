"""Paired image/mask transforms.

Behavioral contract: reference transforms.py:10-114 + train.py:54-60 —
the default pipeline is exactly Resize(480, bilinear image / NEAREST mask)
-> ToTensor -> Normalize(ImageNet mean/std); the random aug classes exist
but are NOT on the default path (SURVEY.md §2.2).

Pure numpy/PIL (host-side); outputs NHWC float32 image and int32 mask.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def resize_pair(img: Image.Image, mask: Optional[Image.Image],
                size: Tuple[int, int]):
    """Bilinear image / NEAREST mask resize to (h, w) — no aspect
    preservation, like the reference (480x480)."""
    img = img.resize((size[1], size[0]), Image.BILINEAR)
    if mask is not None:
        mask = mask.resize((size[1], size[0]), Image.NEAREST)
    return img, mask


def normalize(img: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 HWC normalized by ImageNet stats."""
    x = img.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def preprocess(img: Image.Image, mask: Optional[Image.Image],
               size: int = 480):
    """The full default pipeline: resize -> normalize (+ int mask)."""
    img, mask = resize_pair(img.convert("RGB"), mask, (size, size))
    x = normalize(np.asarray(img))
    t = None
    if mask is not None:
        t = np.asarray(mask).astype(np.int32)
    return x, t


def random_hflip_pair(img: Image.Image, mask: Image.Image, rng) -> tuple:
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
    return img, mask
