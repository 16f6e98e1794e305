"""Sequence-level (clip) paired transforms: images + boxes + masks.

Behavioral contract: reference data/transforms_video.py:20-565 (MTTR-style
video augmentations).  In the reference these are vestigial — every import
site is commented out and the shipped datasets use the per-frame
SimpleTransforms path (see data/transforms.py here) — but the full surface
is provided for users driving the MTTR-style pipelines.

Pure numpy/cv2 host-side code (data pipeline, never jitted):

- a clip is a list of HWC uint8 RGB numpy frames (all the same size);
- a target is a dict of numpy arrays: "boxes" (N, 4) float32 xyxy,
  "masks" (N, H, W) uint8/bool (one mask per frame for referring tasks),
  "labels" (N,), optional "caption" str, "area", "valid", "size".

Faithful quirks kept: Check's ``boxes //= 1000`` invalid-box squash
(reference :38-41), the caption left/right swap on horizontal flip
(:461-463), Expand's mean-fill (:424-451), Normalize converting boxes to
normalized cxcywh (:529-547), nearest-neighbour >0.5 mask resize (:201-204).
Deviation: MinIoURandomCrop's ``while True`` is bounded (50 outer tries,
like the repo's other bounded resample loops) and returns the clip
unchanged when no patch qualifies.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:  # cv2 is available in this image; degrade loudly if not
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from .transforms import IMAGENET_MEAN, IMAGENET_STD


def _rng(rng):
    return rng if rng is not None else np.random.default_rng()


def box_xyxy_to_cxcywh(boxes: np.ndarray) -> np.ndarray:
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    return np.stack([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=1)


def bbox_overlaps(bboxes1: np.ndarray, bboxes2: np.ndarray,
                  mode: str = "iou", eps: float = 1e-6) -> np.ndarray:
    """Pairwise IoU / IoF between two xyxy box sets (vectorized)."""
    assert mode in ("iou", "iof")
    b1 = np.asarray(bboxes1, np.float32).reshape(-1, 4)
    b2 = np.asarray(bboxes2, np.float32).reshape(-1, 4)
    if b1.shape[0] * b2.shape[0] == 0:
        return np.zeros((b1.shape[0], b2.shape[0]), np.float32)
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]
    if mode == "iou":
        union = area1[:, None] + area2[None, :] - overlap
    else:
        union = np.broadcast_to(area1[:, None], overlap.shape)
    return overlap / np.maximum(union, eps)


class Check:
    """Mark boxes/masks that survived the geometric transforms.

    Sets target["valid"] (int32 per instance); degenerate boxes are
    squashed via the reference's ``box // 1000`` quirk."""

    def __call__(self, clip, target):
        if "boxes" in target:
            b = np.asarray(target["boxes"], np.float32).reshape(-1, 2, 2)
            keep = np.all(b[:, 1, :] > b[:, 0, :], axis=1)
            if not keep.all():
                boxes = np.asarray(target["boxes"], np.float32).copy()
                boxes[~keep] = np.floor_divide(boxes[~keep], 1000.0)
                target["boxes"] = boxes
        elif "masks" in target:
            keep = np.asarray(target["masks"]).reshape(
                len(target["masks"]), -1).any(axis=1)
        else:
            keep = np.ones((len(target.get("labels", ())),), bool)
        target["valid"] = keep.astype(np.int32)
        return clip, target


def crop(clip, target, region):
    """region = (top, left, h, w); crops every frame + boxes + masks."""
    i, j, h, w = region
    clip = [f[i:i + h, j:j + w] for f in clip]
    target = dict(target)
    target["size"] = np.array([h, w])
    if "boxes" in target:
        boxes = np.asarray(target["boxes"], np.float32)
        cropped = boxes - np.array([j, i, j, i], np.float32)
        cropped = np.minimum(cropped.reshape(-1, 2, 2),
                             np.array([w, h], np.float32))
        cropped = np.clip(cropped, 0, None)
        target["area"] = (cropped[:, 1, :] - cropped[:, 0, :]).prod(axis=1)
        target["boxes"] = cropped.reshape(-1, 4)
    if "masks" in target:
        target["masks"] = np.asarray(target["masks"])[:, i:i + h, j:j + w]
    return clip, target


def hflip(clip, target):
    h, w = clip[0].shape[:2]
    clip = [np.ascontiguousarray(f[:, ::-1]) for f in clip]
    target = dict(target)
    if "boxes" in target:
        b = np.asarray(target["boxes"], np.float32)
        target["boxes"] = (b[:, [2, 1, 0, 3]]
                           * np.array([-1, 1, -1, 1], np.float32)
                           + np.array([w, 0, w, 0], np.float32))
    if "masks" in target:
        target["masks"] = np.asarray(target["masks"])[:, :, ::-1].copy()
    return clip, target


def vflip(clip, target):
    h, w = clip[0].shape[:2]
    clip = [np.ascontiguousarray(f[::-1]) for f in clip]
    target = dict(target)
    if "boxes" in target:
        b = np.asarray(target["boxes"], np.float32)
        target["boxes"] = (b[:, [0, 3, 2, 1]]
                           * np.array([1, -1, 1, -1], np.float32)
                           + np.array([0, h, 0, h], np.float32))
    if "masks" in target:
        target["masks"] = np.asarray(target["masks"])[:, ::-1].copy()
    return clip, target


def _size_with_aspect_ratio(hw, size, max_size=None):
    h, w = hw
    if max_size is not None:
        mn, mx = float(min(h, w)), float(max(h, w))
        if mx / mn * size > max_size:
            size = int(round(max_size * mn / mx))
    if (w <= h and w == size) or (h <= w and h == size):
        return (h, w)
    if w < h:
        return (int(size * h / w), size)
    return (size, int(size * w / h))


def resize(clip, target, size, max_size=None):
    """size: scalar short side (aspect kept, capped by max_size) or (w, h)."""
    if isinstance(size, (list, tuple)):
        oh, ow = size[1], size[0]
    else:
        oh, ow = _size_with_aspect_ratio(clip[0].shape[:2], size, max_size)
    h, w = clip[0].shape[:2]
    clip = [cv2.resize(f, (ow, oh), interpolation=cv2.INTER_LINEAR)
            for f in clip]
    if target is None:
        return clip, None
    rw, rh = ow / w, oh / h
    target = dict(target)
    if "boxes" in target:
        target["boxes"] = (np.asarray(target["boxes"], np.float32)
                           * np.array([rw, rh, rw, rh], np.float32))
    if "area" in target:
        target["area"] = np.asarray(target["area"], np.float32) * (rw * rh)
    target["size"] = np.array([oh, ow])
    if "masks" in target:
        m = np.asarray(target["masks"])
        if m.shape[0] > 0:
            target["masks"] = np.stack([
                cv2.resize(x.astype(np.uint8), (ow, oh),
                           interpolation=cv2.INTER_NEAREST) > 0.5
                for x in m])
        else:
            target["masks"] = np.zeros((0, oh, ow), m.dtype)
    return clip, target


def pad(clip, target, padding):
    """Bottom/right zero-pad by (pad_x, pad_y)."""
    px, py = padding
    clip = [np.pad(f, ((0, py), (0, px), (0, 0))) for f in clip]
    if target is None:
        return clip, None
    target = dict(target)
    target["size"] = np.array(clip[0].shape[:2])
    if "masks" in target:
        target["masks"] = np.pad(np.asarray(target["masks"]),
                                 ((0, 0), (0, py), (0, px)))
    return clip, target


class RandomCrop:
    def __init__(self, size, rng=None):
        self.size = size
        self.rng = _rng(rng)

    def __call__(self, clip, target):
        th, tw = self.size
        h, w = clip[0].shape[:2]
        i = int(self.rng.integers(0, max(h - th, 0) + 1))
        j = int(self.rng.integers(0, max(w - tw, 0) + 1))
        return crop(clip, target, (i, j, th, tw))


class RandomSizeCrop:
    def __init__(self, min_size: int, max_size: int, rng=None):
        self.min_size = min_size
        self.max_size = max_size
        self.rng = _rng(rng)

    def __call__(self, clip, target):
        h, w = clip[0].shape[:2]
        tw = int(self.rng.integers(self.min_size, min(w, self.max_size) + 1))
        th = int(self.rng.integers(self.min_size, min(h, self.max_size) + 1))
        i = int(self.rng.integers(0, max(h - th, 0) + 1))
        j = int(self.rng.integers(0, max(w - tw, 0) + 1))
        return crop(clip, target, (i, j, th, tw))


class CenterCrop:
    def __init__(self, size):
        self.size = size

    def __call__(self, clip, target):
        th, tw = self.size
        h, w = clip[0].shape[:2]
        i = int(round((h - th) / 2.0))
        j = int(round((w - tw) / 2.0))
        return crop(clip, target, (i, j, th, tw))


class MinIoURandomCrop:
    """Random crop keeping min IoU with all boxes (SSD-style).

    Reference :259-313.  Masks are intentionally untouched (reference quirk
    — its version crops only image+boxes); the outer retry loop is bounded.
    """

    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
                 min_crop_size=0.3, rng=None):
        self.sample_mode = (1, *min_ious, 0)
        self.min_crop_size = min_crop_size
        self.rng = _rng(rng)

    def __call__(self, clip, target):
        h, w = clip[0].shape[:2]
        for _ in range(50):
            mode = self.sample_mode[int(self.rng.integers(
                len(self.sample_mode)))]
            if mode == 1:
                return clip, target
            min_iou = mode
            boxes = np.asarray(target["boxes"], np.float32)
            for _ in range(50):
                nw = self.rng.uniform(self.min_crop_size * w, w)
                nh = self.rng.uniform(self.min_crop_size * h, h)
                if nh / nw < 0.5 or nh / nw > 2:
                    continue
                left = self.rng.uniform(0, w - nw)
                top = self.rng.uniform(0, h - nh)
                patch = np.array([int(left), int(top),
                                  int(left + nw), int(top + nh)])
                if patch[2] == patch[0] or patch[3] == patch[1]:
                    continue
                overlaps = bbox_overlaps(patch[None], boxes).reshape(-1)
                if overlaps.size and overlaps.min() < min_iou:
                    continue
                if overlaps.size:
                    center = (boxes[:, :2] + boxes[:, 2:]) / 2
                    inside = ((center[:, 0] > patch[0])
                              & (center[:, 1] > patch[1])
                              & (center[:, 0] < patch[2])
                              & (center[:, 1] < patch[3]))
                    if not inside.all():
                        continue
                    nb = boxes.copy()
                    nb[:, 2:] = nb[:, 2:].clip(max=patch[2:])
                    nb[:, :2] = nb[:, :2].clip(min=patch[:2])
                    nb -= np.tile(patch[:2], 2)
                    target = dict(target)
                    target["boxes"] = nb
                clip = [f[patch[1]:patch[3], patch[0]:patch[2]]
                        for f in clip]
                hh, ww = clip[0].shape[:2]
                target["orig_size"] = np.array([hh, ww])
                target["size"] = np.array([hh, ww])
                return clip, target
        return clip, target


class RandomContrast:
    def __init__(self, lower=0.5, upper=1.5, rng=None):
        assert 0 <= lower <= upper
        self.lower, self.upper = lower, upper
        self.rng = _rng(rng)

    def __call__(self, image, target):
        if self.rng.integers(2):
            image = image * self.rng.uniform(self.lower, self.upper)
        return image, target


class RandomBrightness:
    def __init__(self, delta=32, rng=None):
        assert 0.0 <= delta <= 255.0
        self.delta = delta
        self.rng = _rng(rng)

    def __call__(self, image, target):
        if self.rng.integers(2):
            image = image + self.rng.uniform(-self.delta, self.delta)
        return image, target


class RandomSaturation:
    def __init__(self, lower=0.5, upper=1.5, rng=None):
        assert 0 <= lower <= upper
        self.lower, self.upper = lower, upper
        self.rng = _rng(rng)

    def __call__(self, image, target):
        if self.rng.integers(2):
            image = image.copy()
            image[:, :, 1] *= self.rng.uniform(self.lower, self.upper)
        return image, target


class RandomHue:
    def __init__(self, delta=18.0, rng=None):
        assert 0.0 <= delta <= 360.0
        self.delta = delta
        self.rng = _rng(rng)

    def __call__(self, image, target):
        if self.rng.integers(2):
            image = image.copy()
            image[:, :, 0] += self.rng.uniform(-self.delta, self.delta)
            image[:, :, 0][image[:, :, 0] > 360.0] -= 360.0
            image[:, :, 0][image[:, :, 0] < 0.0] += 360.0
        return image, target


class RandomLightingNoise:
    PERMS = ((0, 1, 2), (0, 2, 1), (1, 0, 2),
             (1, 2, 0), (2, 0, 1), (2, 1, 0))

    def __init__(self, rng=None):
        self.rng = _rng(rng)

    def __call__(self, image, target):
        if self.rng.integers(2):
            swap = self.PERMS[int(self.rng.integers(len(self.PERMS)))]
            image = image[:, :, swap]
        return image, target


class ConvertColor:
    def __init__(self, current="BGR", transform="HSV"):
        self.current, self.transform = current, transform

    def __call__(self, image, target):
        if self.current == "BGR" and self.transform == "HSV":
            image = cv2.cvtColor(image, cv2.COLOR_BGR2HSV)
        elif self.current == "HSV" and self.transform == "BGR":
            image = cv2.cvtColor(image, cv2.COLOR_HSV2BGR)
        else:
            raise NotImplementedError(
                f"{self.current} -> {self.transform}")
        return image, target


class PhotometricDistort:
    """Per-frame SSD photometric pipeline (float32 in, uint8 out)."""

    def __init__(self, rng=None):
        rng = _rng(rng)
        self.rng = rng
        self.pd = [
            RandomContrast(rng=rng),
            ConvertColor(transform="HSV"),
            RandomSaturation(rng=rng),
            RandomHue(rng=rng),
            ConvertColor(current="HSV", transform="BGR"),
            RandomContrast(rng=rng),
        ]
        self.rand_brightness = RandomBrightness(rng=rng)
        self.rand_light_noise = RandomLightingNoise(rng=rng)

    def __call__(self, clip, target):
        out = []
        for frame in clip:
            img = np.asarray(frame, np.float32)
            img, target = self.rand_brightness(img, target)
            chain = self.pd[:-1] if self.rng.integers(2) else self.pd[1:]
            for t in chain:
                img, target = t(img, target)
            img, target = self.rand_light_noise(img, target)
            out.append(np.clip(img, 0, 255).astype(np.uint8))
        return out, target


class Expand:
    """Paste the clip into a larger mean-filled canvas (zoom-out aug)."""

    def __init__(self, mean: Sequence[float], rng=None):
        self.mean = np.asarray(mean, np.float32)
        self.rng = _rng(rng)

    def __call__(self, clip, target):
        if self.rng.integers(2):
            return clip, target
        h, w, depth = clip[0].shape
        ratio = self.rng.uniform(1, 4)
        left = int(self.rng.uniform(0, w * ratio - w))
        top = int(self.rng.uniform(0, h * ratio - h))
        eh, ew = int(h * ratio), int(w * ratio)
        imgs, masks = [], []
        target = dict(target)
        old_masks = np.asarray(target["masks"]) if "masks" in target else None
        for i, frame in enumerate(clip):
            canvas = np.empty((eh, ew, depth), np.float32)
            canvas[...] = self.mean
            canvas[top:top + h, left:left + w] = frame
            imgs.append(canvas.astype(np.uint8))
            if old_masks is not None:
                m = np.zeros((eh, ew), np.uint8)
                m[top:top + h, left:left + w] = old_masks[i]
                masks.append(m)
        if "boxes" in target:
            boxes = np.asarray(target["boxes"], np.float32).copy()
            boxes[:, :2] += (left, top)
            boxes[:, 2:] += (left, top)
            target["boxes"] = boxes
        if old_masks is not None:
            target["masks"] = np.stack(masks)
        return imgs, target


class RandomHorizontalFlip:
    def __init__(self, p=0.5, rng=None):
        self.p = p
        self.rng = _rng(rng)

    def __call__(self, clip, target):
        if self.rng.random() < self.p:
            if "caption" in target:
                target = dict(target)
                target["caption"] = (target["caption"]
                                     .replace("left", "@")
                                     .replace("right", "left")
                                     .replace("@", "right"))
            return hflip(clip, target)
        return clip, target


class RandomVerticalFlip:
    def __init__(self, p=0.5, rng=None):
        self.p = p
        self.rng = _rng(rng)

    def __call__(self, clip, target):
        if self.rng.random() < self.p:
            return vflip(clip, target)
        return clip, target


class RandomResize:
    def __init__(self, sizes, max_size=None, rng=None):
        assert isinstance(sizes, (list, tuple))
        self.sizes = sizes
        self.max_size = max_size
        self.rng = _rng(rng)

    def __call__(self, clip, target=None):
        size = self.sizes[int(self.rng.integers(len(self.sizes)))]
        return resize(clip, target, size, self.max_size)


class RandomPad:
    def __init__(self, max_pad, rng=None):
        self.max_pad = max_pad
        self.rng = _rng(rng)

    def __call__(self, clip, target):
        px = int(self.rng.integers(0, self.max_pad + 1))
        py = int(self.rng.integers(0, self.max_pad + 1))
        return pad(clip, target, (px, py))


class RandomSelect:
    """transforms1 with probability p, else transforms2."""

    def __init__(self, transforms1, transforms2, p=0.5, rng=None):
        self.transforms1 = transforms1
        self.transforms2 = transforms2
        self.p = p
        self.rng = _rng(rng)

    def __call__(self, clip, target):
        if self.rng.random() < self.p:
            return self.transforms1(clip, target)
        return self.transforms2(clip, target)


class ToTensor:
    """uint8 HWC frames -> float32 [0, 1] HWC (NHWC is the TPU layout —
    the reference's CHW tensors are a torch convention, not kept)."""

    def __call__(self, clip, target):
        return [np.asarray(f, np.float32) / 255.0 for f in clip], target


class RandomErasing:
    """Blank a random rectangle (torchvision RandomErasing semantics)."""

    def __init__(self, p=0.5, scale=(0.02, 0.33), ratio=(0.3, 3.3),
                 value=0.0, rng=None):
        self.p, self.scale, self.ratio, self.value = p, scale, ratio, value
        self.rng = _rng(rng)

    def __call__(self, clip, target):
        if self.rng.random() >= self.p:
            return clip, target
        h, w = clip[0].shape[:2]
        area = h * w
        for _ in range(10):
            a = self.rng.uniform(*self.scale) * area
            r = np.exp(self.rng.uniform(np.log(self.ratio[0]),
                                        np.log(self.ratio[1])))
            eh, ew = int(round(np.sqrt(a * r))), int(round(np.sqrt(a / r)))
            if eh < h and ew < w:
                i = int(self.rng.integers(0, h - eh + 1))
                j = int(self.rng.integers(0, w - ew + 1))
                out = []
                for f in clip:
                    f = f.copy()
                    f[i:i + eh, j:j + ew] = self.value
                    out.append(f)
                return out, target
        return clip, target


class Normalize:
    """ImageNet-normalize frames; boxes -> normalized cxcywh."""

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, clip, target=None):
        clip = [(np.asarray(f, np.float32) - self.mean) / self.std
                for f in clip]
        if target is None:
            return clip, None
        target = dict(target)
        h, w = clip[0].shape[:2]
        if "boxes" in target:
            boxes = box_xyxy_to_cxcywh(
                np.asarray(target["boxes"], np.float32))
            target["boxes"] = boxes / np.array([w, h, w, h], np.float32)
        return clip, target


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, clip, target):
        for t in self.transforms:
            clip, target = t(clip, target)
        return clip, target

    def __repr__(self):
        inner = "\n".join(f"    {t}" for t in self.transforms)
        return f"{type(self).__name__}(\n{inner}\n)"
