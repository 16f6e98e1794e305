"""RefCOCO-family dataset: the reference's ReferDataset re-designed for a
host-side numpy input pipeline.

Behavioral contract (reference data/dataset_refer_bert.py:24-124):
  * all sentences tokenized up front (pad/truncate to max_tokens);
  * train mode samples ONE random sentence per item;
  * eval mode exposes ALL sentences of the ref (the eval loop iterates
    them, reference test.py:73-94);
  * mask from REFER.getMask, resized NEAREST to the model size;
  * image resized bilinear + ImageNet-normalized.

Differences (deliberate, documented): no import-time argv parsing
(reference anti-pattern, SURVEY.md §5); tokenization uses our native
WordPiece tokenizer.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
from PIL import Image

from ..text.tokenizer import WordPieceTokenizer
from .refer import REFER
from .transforms import load_image_resized


@dataclasses.dataclass
class ReferExample:
    image: np.ndarray  # (H, W, 3) float32
    target: np.ndarray  # (H, W) int32
    ids: np.ndarray  # (N_l,) or (S, N_l) in eval mode
    mask: np.ndarray  # same leading shape as ids
    ref_id: int = -1


class ReferDataset:
    def __init__(self, refer: REFER, tokenizer: WordPieceTokenizer,
                 split: str = "train", img_size: int = 480,
                 max_tokens: int = 20, eval_mode: bool = False,
                 seed: int = 0, host_normalize: bool = True,
                 augment=None):
        self.refer = refer
        self.tokenizer = tokenizer
        self.split = split
        self.img_size = img_size
        self.max_tokens = max_tokens
        self.eval_mode = eval_mode
        self.host_normalize = host_normalize  # False -> uint8 images,
        # normalized on device (ops/norm.py maybe_normalize_image)
        # optional paired random augmentation (transforms.py
        # build_paired_augment) applied at full resolution BEFORE the final
        # model-size resize; train mode only (never on eval)
        self.augment = augment if not eval_mode else None
        self.rng = np.random.default_rng(seed)

        self.ref_ids: List[int] = refer.getRefIds(split=split)
        # pre-tokenize all sentences (reference does this at init)
        self.input_ids: List[np.ndarray] = []
        self.attn_masks: List[np.ndarray] = []
        for r in self.ref_ids:
            ref = refer.Refs[r]
            ids_list, mask_list = [], []
            for sent in ref["sentences"]:
                ids, m = tokenizer.encode_padded(sent["raw"],
                                                 self.max_tokens)
                ids_list.append(ids)
                mask_list.append(m)
            self.input_ids.append(np.stack(ids_list))  # (S, N_l)
            self.attn_masks.append(np.stack(mask_list))

    def __len__(self) -> int:
        return len(self.ref_ids)

    def __getitem__(self, index: int) -> ReferExample:
        ref_id = self.ref_ids[index]
        ref = self.refer.Refs[ref_id]
        ref_mask = self.refer.getMask(ref)["mask"]
        mask_img = Image.fromarray(ref_mask.astype(np.uint8), mode="P")
        if self.augment is not None:
            # augmented path: full-res PIL pair through the random augs,
            # then the standard final resize. RandomCrop pads masks with
            # 255 (ignore); our 2-class losses have no ignore channel, so
            # map pad pixels to background (the reference never trains
            # this path — its default pipeline has no random augs).
            img = Image.open(
                self.refer.image_path(ref["image_id"])).convert("RGB")
            img, mask_img = self.augment(img, mask_img)
            img = img.resize((self.img_size, self.img_size), Image.BILINEAR)
            image = np.asarray(img)
            if self.host_normalize:
                from .transforms import normalize

                image = normalize(image)
            target_a = np.asarray(mask_img.resize(
                (self.img_size, self.img_size), Image.NEAREST))
            target = np.where(target_a == 255, 0,
                              target_a).astype(np.int32)
        else:
            # image through the native decode+resize fast path (PIL
            # fallback)
            image = load_image_resized(
                self.refer.image_path(ref["image_id"]), self.img_size,
                host_normalize=self.host_normalize)
            mask_img = mask_img.resize((self.img_size, self.img_size),
                                       Image.NEAREST)
            target = np.asarray(mask_img).astype(np.int32)

        if self.eval_mode:
            ids = self.input_ids[index]  # all sentences (S, N_l)
            attn = self.attn_masks[index]
        else:
            s = int(self.rng.integers(len(self.input_ids[index])))
            ids = self.input_ids[index][s]
            attn = self.attn_masks[index][s]
        return ReferExample(image=image, target=target, ids=ids, mask=attn,
                            ref_id=ref_id)


def batch_iterator(ds: ReferDataset, batch_size: int, shuffle: bool = True,
                   seed: int = 0, drop_last: bool = True,
                   shard_index: int = 0, num_shards: int = 1
                   ) -> Iterator[Dict[str, np.ndarray]]:
    """Host-side batcher with deterministic per-epoch shuffling and optional
    sharding (the DistributedSampler equivalent, reference train.py:554).

    For multi-host TPU training, pass shard_index=jax.process_index().
    """
    order = np.arange(len(ds))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    order = order[shard_index::num_shards]
    n = len(order)
    end = n - n % batch_size if drop_last else n
    for start in range(0, end, batch_size):
        items = [ds[int(i)] for i in order[start:start + batch_size]]
        yield {
            "image": np.stack([it.image for it in items]),
            "target": np.stack([it.target for it in items]),
            "ids": np.stack([it.ids for it in items]).astype(np.int32),
            "mask": np.stack([it.mask for it in items]).astype(np.int32),
            "ref_id": np.asarray([it.ref_id for it in items]),
        }
