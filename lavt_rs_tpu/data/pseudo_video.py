"""Pseudo-video pretraining datasets.

Behavioral contract:
  * ReferPseudoVideos (reference data/refer_video.py:25-138): each RefCOCO
    image duplicated num_frames times into a static clip for 3D-backbone
    pretraining; mask annotated on every frame (valid index = middle).
  * ImageToSeqAugmenter (reference data/image_to_seq_augmenter.py:18-98,
    imgaug-based) -> reimplemented on cv2: per synthetic frame, a random
    perspective + affine (rotation/shear/translate) + optional motion blur
    applied consistently to image and mask.
  * ModulatedDetection / refexp2seq (reference data/refexp2seq.py:28-298):
    COCO-format refexp items turned into augmented pseudo-clips with a
    random sequence shuffle.
  * build_joint_dataset (reference data/concat_dataset.py:17-33): simple
    concatenation of datasets.
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..text.tokenizer import WordPieceTokenizer
from .a2d import VideoExample
from .refer import REFER
from .transforms import normalize, resize_rgb_np


class ImageToSeqAugmenter:
    """Single image+mask -> synthetic clip via random geometric jitter."""

    def __init__(self, perspective: bool = True, affine: bool = True,
                 motion_blur: bool = True, rotation_range: float = 3.0,
                 perspective_magnitude: float = 0.08,
                 translate_range: float = 0.02,
                 motion_blur_kernel_sizes: Sequence[int] = (3, 5),
                 motion_blur_prob: float = 0.5, seed: int = 0):
        self.perspective = perspective
        self.affine = affine
        self.motion_blur = motion_blur
        self.rotation_range = rotation_range
        self.perspective_magnitude = perspective_magnitude
        self.translate_range = translate_range
        self.mb_kernels = list(motion_blur_kernel_sizes)
        self.mb_prob = motion_blur_prob
        self.rng = random.Random(seed)

    def _transform_matrix(self, h: int, w: int) -> np.ndarray:
        import cv2

        src = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
        dst = src.copy()
        if self.perspective:
            mag = self.perspective_magnitude
            jitter = np.float32(
                [[self.rng.uniform(-mag, mag) * w,
                  self.rng.uniform(-mag, mag) * h] for _ in range(4)])
            dst = src + jitter
        m = cv2.getPerspectiveTransform(src, dst)
        if self.affine:
            ang = self.rng.uniform(-self.rotation_range, self.rotation_range)
            tx = self.rng.uniform(-self.translate_range,
                                  self.translate_range) * w
            ty = self.rng.uniform(-self.translate_range,
                                  self.translate_range) * h
            rot = cv2.getRotationMatrix2D((w / 2, h / 2), ang, 1.0)
            rot = np.vstack([rot, [0, 0, 1]]).astype(np.float32)
            rot[0, 2] += tx
            rot[1, 2] += ty
            m = rot @ m
        return m

    def __call__(self, image: np.ndarray, mask: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
        import cv2

        h, w = image.shape[:2]
        m = self._transform_matrix(h, w)
        img_t = cv2.warpPerspective(image, m, (w, h),
                                    flags=cv2.INTER_LINEAR,
                                    borderMode=cv2.BORDER_REPLICATE)
        mask_t = cv2.warpPerspective(mask.astype(np.uint8), m, (w, h),
                                     flags=cv2.INTER_NEAREST)
        if self.motion_blur and self.rng.random() < self.mb_prob:
            k = self.rng.choice(self.mb_kernels)
            kernel = np.zeros((k, k), np.float32)
            if self.rng.random() < 0.5:
                kernel[k // 2, :] = 1.0 / k
            else:
                kernel[:, k // 2] = 1.0 / k
            img_t = cv2.filter2D(img_t, -1, kernel)
        return img_t, mask_t


class ReferPseudoVideos:
    """RefCOCO refs as static pseudo-clips (reference data/refer_video.py).

    With `augmenter`, frames are jittered per-frame and shuffled
    (the refexp2seq behavior, reference data/refexp2seq.py:44-49, 81-98);
    without, the clip is a plain repeat of the image.
    """

    def __init__(self, refer: REFER, tokenizer: WordPieceTokenizer,
                 split: str = "train", num_frames: int = 8,
                 img_size: int = 480, max_tokens: int = 22,
                 augmenter: Optional[ImageToSeqAugmenter] = None,
                 seed: int = 0, host_normalize: bool = True):
        self.host_normalize = host_normalize
        self.refer = refer
        self.tokenizer = tokenizer
        self.num_frames = num_frames
        self.img_size = img_size
        self.max_tokens = max_tokens
        self.augmenter = augmenter
        self.rng = random.Random(seed)
        self.ref_ids: List[int] = refer.getRefIds(split=split)

    def __len__(self):
        return len(self.ref_ids)

    def __getitem__(self, index: int) -> VideoExample:
        ref = self.refer.Refs[self.ref_ids[index]]
        img = Image.open(self.refer.image_path(ref["image_id"]))
        img = img.convert("RGB")
        mask = self.refer.getMask(ref)["mask"]

        sent = self.rng.choice(ref["sentences"])["raw"]
        ids, attn = self.tokenizer.encode_padded(sent, self.max_tokens)

        base = np.asarray(img)
        frames, masks = [], []
        for t in range(self.num_frames):
            if self.augmenter is not None and t > 0:
                f, mk = self.augmenter(base, mask)
            else:
                f, mk = base, mask
            arr = resize_rgb_np(f, self.img_size)  # native fast path
            frames.append(normalize(arr) if self.host_normalize else arr)
            mi = Image.fromarray(mk.astype(np.uint8), mode="P").resize(
                (self.img_size, self.img_size), Image.NEAREST)
            masks.append(np.asarray(mi).astype(np.int32))

        order = list(range(self.num_frames))
        if self.augmenter is not None:
            self.rng.shuffle(order)
        valid_index = order.index(0)  # the unaugmented (annotated) frame
        return VideoExample(
            video=np.stack([frames[i] for i in order]),
            target=masks[0], valid_index=valid_index, valid=1,
            ids=ids, mask=attn,
            image_id=f"ref_{self.ref_ids[index]}")


class ConcatDataset:
    """build_joint_dataset equivalent (reference data/concat_dataset.py)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def __getitem__(self, idx: int):
        d = int(np.searchsorted(self.offsets, idx, side="right")) - 1
        return self.datasets[d][idx - int(self.offsets[d])]
