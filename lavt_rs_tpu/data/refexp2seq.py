"""COCO-format refexp pseudo-video reader — ModulatedDetection equivalent.

Behavioral contract: reference data/refexp2seq.py:28-298 (itself an MDETR/
coco_utils derivative).  The input is the COCO-format refexp json layout
(`{root}/{dataset}/instances_{dataset}_{split}.json` + the mscoco train2014
images): ONE image entry per referring sentence, with the sentence stored as
the image's `caption` and exactly one annotated instance per entry.  Each
item becomes a num_frames pseudo-clip: the original frame plus augmented
copies (perspective/affine/motion-blur, ImageToSeqAugmenter), randomly
shuffled (reference refexp2seq.py:44-49, 81-98); tokenization pads to 22.

Differences from the reference kept deliberately:
  * no torchvision/pycocotools — json + the native polygon/RLE decoder;
  * like the rest of this framework's video pipeline the supervised frame
    is the unaugmented one (valid_index), whereas the reference marks every
    augmented frame valid — the augmented masks ARE warped copies, so the
    unaugmented frame is the exact ground truth.
"""

from __future__ import annotations

import json
import os
import random
from typing import List, Optional

import numpy as np
from PIL import Image

from ..text.tokenizer import WordPieceTokenizer
from .a2d import VideoExample
from .coco_mask import annotation_to_mask
from .pseudo_video import ImageToSeqAugmenter
from .transforms import normalize, resize_rgb_np


class RefExpPseudoVideos:
    """COCO-format refexp json -> augmented pseudo-clips."""

    def __init__(self, img_folder: str, ann_file: str,
                 tokenizer: WordPieceTokenizer, num_frames: int = 8,
                 img_size: int = 480, max_tokens: int = 22,
                 augmenter: Optional[ImageToSeqAugmenter] = None,
                 seed: int = 0, host_normalize: bool = True):
        self.host_normalize = host_normalize
        self.img_folder = img_folder
        self.tokenizer = tokenizer
        self.num_frames = num_frames
        self.img_size = img_size
        self.max_tokens = max_tokens
        # the reference always augments on this path
        # (refexp2seq.py:33-38); pass augmenter=None for static clips
        self.augmenter = augmenter if augmenter is not None else \
            ImageToSeqAugmenter(seed=seed)
        self.rng = random.Random(seed)

        with open(ann_file) as f:
            coco = json.load(f)
        self.images = {im["id"]: im for im in coco["images"]}
        self.anns_by_image = {}
        for ann in coco["annotations"]:
            if ann.get("iscrowd", 0):
                continue
            self.anns_by_image.setdefault(ann["image_id"], []).append(ann)
        # one image entry per sentence; keep only entries with annotations
        self.ids: List[int] = [i for i in sorted(self.images)
                               if self.anns_by_image.get(i)]

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, index: int) -> VideoExample:
        entry = self.images[self.ids[index]]
        img = Image.open(os.path.join(self.img_folder,
                                      entry["file_name"])).convert("RGB")
        h, w = entry["height"], entry["width"]
        anns = self.anns_by_image[self.ids[index]]
        # the refexp format carries exactly one instance per sentence-entry
        # (reference asserts numinst == 1, refexp2seq.py:85); union any
        # extras defensively
        mask = np.zeros((h, w), np.uint8)
        for ann in anns:
            mask |= annotation_to_mask(ann["segmentation"], h, w
                                       ).astype(np.uint8)

        ids, attn = self.tokenizer.encode_padded(entry["caption"],
                                                 self.max_tokens)

        base = np.asarray(img)
        frames, masks = [], []
        for t in range(self.num_frames):
            if t > 0:
                f, mk = self.augmenter(base, mask)
            else:
                f, mk = base, mask
            arr = resize_rgb_np(f, self.img_size)  # native fast path
            frames.append(normalize(arr) if self.host_normalize else arr)
            mi = Image.fromarray(mk.astype(np.uint8), mode="P").resize(
                (self.img_size, self.img_size), Image.NEAREST)
            masks.append(np.asarray(mi).astype(np.int32))

        order = list(range(self.num_frames))
        self.rng.shuffle(order)  # random sequence shuffle (ref 44-49)
        valid_index = order.index(0)
        return VideoExample(
            video=np.stack([frames[i] for i in order]),
            target=masks[0], valid_index=valid_index, valid=1,
            ids=ids, mask=attn,
            image_id=f"refexp_{self.ids[index]}")


def build_refexp_dataset(dataset: str, split: str, refer_data_root: str,
                         tokenizer: WordPieceTokenizer, **kw
                         ) -> RefExpPseudoVideos:
    """Path layout of the reference's build() (refexp2seq.py:278-298):
    images under images/mscoco/images/train2014, annotations at
    {dataset}/instances_{dataset}_{split}.json."""
    img_folder = os.path.join(refer_data_root, "images", "mscoco", "images",
                              "train2014")
    ann_file = os.path.join(refer_data_root, dataset,
                            f"instances_{dataset}_{split}.json")
    return RefExpPseudoVideos(img_folder, ann_file, tokenizer, **kw)
