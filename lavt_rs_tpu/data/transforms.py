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
               size: int = 480, host_normalize: bool = True):
    """The full default pipeline: resize -> normalize (+ int mask).

    host_normalize=False returns the resized image as uint8 HWC instead;
    the jitted step normalizes it ON DEVICE (ops/norm.py
    `maybe_normalize_image`) — same math in f32, but the host skips the
    float conversion (measured ~12 ms/img on one core, more than the JPEG
    decode itself) and the host->device transfer shrinks 4x.
    """
    img, mask = resize_pair(img.convert("RGB"), mask, (size, size))
    arr = np.asarray(img)
    x = normalize(arr) if host_normalize else arr
    t = None
    if mask is not None:
        t = np.asarray(mask).astype(np.int32)
    return x, t


def load_image_resized(path: str, size: int,
                       host_normalize: bool = True) -> np.ndarray:
    """Decode + resize an on-disk image through the native C++ loader
    (libjpeg + Pillow-parity triangle resize, lavt_rs_tpu/native) when
    available, PIL otherwise.  The two paths agree within 1 uint8 LSB
    (tests/test_native_loader.py); the native one runs with the GIL
    released, so the threaded PrefetchLoader scales across host cores.
    """
    arr = None
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        data = None
    if data is not None and data[:2] == b"\xff\xd8":  # JPEG magic
        from .. import native

        arr = native.decode_resize_jpeg(data, size, size)
    if arr is None:
        img = Image.open(path).convert("RGB")
        arr = np.asarray(img.resize((size, size), Image.BILINEAR))
    return normalize(arr) if host_normalize else arr


def resize_rgb_np(arr: np.ndarray, size: int) -> np.ndarray:
    """Resize an in-memory uint8 HWC RGB frame (native fast path, PIL
    fallback) — used by the video datasets, whose decode is cv2/h5."""
    from .. import native

    out = native.resize_rgb(arr, size, size)
    if out is None:
        out = np.asarray(Image.fromarray(arr).convert("RGB")
                         .resize((size, size), Image.BILINEAR))
    return out


def random_hflip_pair(img: Image.Image, mask: Image.Image, rng) -> tuple:
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
    return img, mask
