"""Data layer: COCO mask codecs, REFER reader, ReferDataset pipeline —
exercised on a synthetic on-disk RefCOCO fixture."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from lavt_rs_tpu.data.coco_mask import (
    annotation_to_mask, decode_compressed_rle_counts, mask_to_rle,
    polygons_to_mask, rle_to_mask,
)
from lavt_rs_tpu.data.refer import REFER
from lavt_rs_tpu.data.refcoco import ReferDataset, batch_iterator
from lavt_rs_tpu.data.transforms import preprocess
from lavt_rs_tpu.text.tokenizer import WordPieceTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "dog", "cat", "left",
         "right", "on", "a", "red"]


def test_rle_roundtrip(rng):
    m = (rng.random((13, 17)) > 0.5).astype(np.uint8)
    rle = mask_to_rle(m)
    back = rle_to_mask(rle)
    np.testing.assert_array_equal(m, back)


def test_compressed_rle_known_value():
    # encode a simple mask with the COCO-API algorithm run by hand:
    # mask 2x2 column-major [0,1,1,0] -> counts [1,2,1]
    m = np.array([[0, 1], [1, 0]], np.uint8)
    rle = mask_to_rle(m)
    assert rle["counts"] == [1, 2, 1]


def test_polygon_mask_square():
    m = polygons_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 12, 12)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert m.sum() == 49  # inclusive 7x7 rasterization


@pytest.fixture(scope="module")
def synthetic_refcoco(tmp_path_factory):
    """Builds a tiny on-disk RefCOCO-format dataset: 3 images, 4 refs."""
    root = tmp_path_factory.mktemp("refer_data")
    ds = root / "refcoco"
    ds.mkdir()
    img_dir = root / "images" / "mscoco" / "images" / "train2014"
    img_dir.mkdir(parents=True)

    rng = np.random.default_rng(0)
    images, annotations, refs = [], [], []
    sents = [["the dog on the left", "a red dog"],
             ["the cat"], ["dog right"], ["a cat on the right"]]
    splits = ["train", "train", "val", "testA"]
    for i in range(3):
        fn = f"COCO_train2014_{i:012d}.jpg"
        Image.fromarray(rng.integers(0, 255, (40, 50, 3), np.uint8)
                        ).save(img_dir / fn)
        images.append({"id": i, "file_name": fn, "height": 40, "width": 50})
    for j in range(4):
        img_id = j % 3
        x0, y0 = 5 + j, 5 + j
        annotations.append({
            "id": 100 + j, "image_id": img_id, "category_id": 1,
            "segmentation": [[x0, y0, x0 + 10, y0, x0 + 10, y0 + 8,
                              x0, y0 + 8]],
            "area": 80, "bbox": [x0, y0, 10, 8], "iscrowd": 0})
        refs.append({
            "ref_id": j, "ann_id": 100 + j, "image_id": img_id,
            "category_id": 1, "split": splits[j],
            "sentences": [{"raw": s, "sent": s, "tokens": s.split(),
                           "sent_id": 10 * j + k}
                          for k, s in enumerate(sents[j])],
            "sent_ids": [10 * j + k for k in range(len(sents[j]))]})

    with open(ds / "refs(unc).p", "wb") as f:
        pickle.dump(refs, f)
    with open(ds / "instances.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "animal"}]}, f)
    return str(root)


def test_refer_reader(synthetic_refcoco):
    r = REFER(synthetic_refcoco, "refcoco", "unc")
    train_ids = r.getRefIds(split="train")
    assert train_ids == [0, 1]
    assert r.getRefIds(split="val") == [2]
    assert r.getRefIds(split="testA") == [3]
    img_ids = r.getImgIds(train_ids)
    assert set(img_ids) <= {0, 1, 2}
    m = r.getMask(r.Refs[0])
    assert m["mask"].shape == (40, 50) and m["area"] > 0
    assert os.path.exists(r.image_path(0))


def test_refer_dataset_train_and_eval(synthetic_refcoco):
    r = REFER(synthetic_refcoco, "refcoco", "unc")
    tok = WordPieceTokenizer({w: i for i, w in enumerate(VOCAB)})
    ds = ReferDataset(r, tok, split="train", img_size=32, max_tokens=8)
    assert len(ds) == 2
    ex = ds[0]
    assert ex.image.shape == (32, 32, 3) and ex.image.dtype == np.float32
    assert ex.target.shape == (32, 32) and set(np.unique(ex.target)) <= {0, 1}
    assert ex.ids.shape == (8,) and ex.ids[0] == tok.cls_id

    ev = ReferDataset(r, tok, split="train", img_size=32, max_tokens=8,
                      eval_mode=True)
    ex = ev[0]
    assert ex.ids.shape == (2, 8)  # ref 0 has two sentences


def test_batch_iterator_sharding(synthetic_refcoco):
    r = REFER(synthetic_refcoco, "refcoco", "unc")
    tok = WordPieceTokenizer({w: i for i, w in enumerate(VOCAB)})
    ds = ReferDataset(r, tok, split="train", img_size=32, max_tokens=8)
    batches = list(batch_iterator(ds, batch_size=2, shuffle=True, seed=1))
    assert len(batches) == 1
    b = batches[0]
    assert b["image"].shape == (2, 32, 32, 3)
    assert b["ids"].dtype == np.int32
    # two shards see disjoint items
    s0 = list(batch_iterator(ds, 1, shuffle=False, shard_index=0,
                             num_shards=2))
    s1 = list(batch_iterator(ds, 1, shuffle=False, shard_index=1,
                             num_shards=2))
    assert {int(s0[0]["ref_id"][0]), int(s1[0]["ref_id"][0])} == {0, 1}


def test_preprocess_normalization():
    img = Image.fromarray(np.full((20, 20, 3), 128, np.uint8))
    x, t = preprocess(img, None, 16)
    assert x.shape == (16, 16, 3)
    # (128/255 - mean) / std
    want = (128 / 255.0 - 0.485) / 0.229
    assert abs(x[0, 0, 0] - want) < 1e-5


def test_uint8_pipeline_matches_host_normalize(synthetic_refcoco):
    """host_normalize=False ships resized uint8; the device-side
    maybe_normalize_image must reproduce the host normalize bit-exactly
    (same IEEE f32 ops), so the two pipelines are interchangeable."""
    import jax.numpy as jnp

    from lavt_rs_tpu.ops.norm import maybe_normalize_image

    r = REFER(synthetic_refcoco, "refcoco", "unc")
    tok = WordPieceTokenizer({w: i for i, w in enumerate(VOCAB)})
    ds_f32 = ReferDataset(r, tok, split="train", img_size=32, max_tokens=8)
    ds_u8 = ReferDataset(r, tok, split="train", img_size=32, max_tokens=8,
                         host_normalize=False)
    a, b = ds_f32[0], ds_u8[0]
    assert b.image.dtype == np.uint8
    assert a.image.dtype == np.float32
    dev = np.asarray(maybe_normalize_image(jnp.asarray(b.image)))
    np.testing.assert_array_equal(a.image, dev)
    # float inputs pass through untouched
    same = np.asarray(maybe_normalize_image(jnp.asarray(a.image)))
    np.testing.assert_array_equal(a.image, same)
    np.testing.assert_array_equal(a.target, b.target)


def test_prefetch_loader(synthetic_refcoco):
    from lavt_rs_tpu.data.loader import PrefetchLoader, collate_refer

    r = REFER(synthetic_refcoco, "refcoco", "unc")
    tok = WordPieceTokenizer({w: i for i, w in enumerate(VOCAB)})
    ds = ReferDataset(r, tok, split="train", img_size=32, max_tokens=8)
    loader = PrefetchLoader(ds, batch_size=2, collate=collate_refer,
                            num_workers=2, prefetch=2)
    assert len(loader) == 1
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["image"].shape == (2, 32, 32, 3)
    # different epoch -> potentially different order; loader reusable
    loader.set_epoch(1)
    assert len(list(loader)) == 1


# ---------------------------------------------------------------------------
# Random paired augmentations (reference transforms.py:33-103)
# ---------------------------------------------------------------------------

def test_random_resize_pair_smaller_edge(rng):
    from lavt_rs_tpu.data.transforms import random_resize_pair

    img = Image.fromarray(rng.integers(0, 255, (40, 60, 3), np.uint8))
    mask = Image.fromarray((rng.random((40, 60)) > 0.5).astype(np.uint8))
    r = np.random.default_rng(0)
    im2, mk2 = random_resize_pair(img, mask, 20, 20, r)
    # smaller edge (h=40) -> 20, aspect preserved -> w=30
    assert im2.size == (30, 20) and mk2.size == (30, 20)
    # NEAREST mask stays binary
    assert set(np.unique(np.asarray(mk2))) <= {0, 1}
    # degenerate range = deterministic size
    im3, _ = random_resize_pair(img, mask, 80, None, r)
    assert im3.size == (120, 80)


def test_pad_if_smaller_fill_and_placement():
    from lavt_rs_tpu.data.transforms import pad_if_smaller

    mask = Image.fromarray(np.ones((4, 6), np.uint8))
    out = np.asarray(pad_if_smaller(mask, 8, fill=255))
    assert out.shape == (8, 8)
    # original content top-left, pad right/bottom with 255
    assert (out[:4, :6] == 1).all()
    assert (out[4:, :] == 255).all() and (out[:, 6:] == 255).all()
    img = Image.fromarray(np.full((4, 6, 3), 7, np.uint8))
    oi = np.asarray(pad_if_smaller(img, 8))
    assert oi.shape == (8, 8, 3) and (oi[5, 5] == 0).all()


def test_random_crop_pair_is_paired(rng):
    from lavt_rs_tpu.data.transforms import random_crop_pair

    # identical content in img & mask -> identical crops proves ONE (i, j)
    grid = rng.integers(0, 200, (30, 30), np.uint8)
    img = Image.fromarray(np.stack([grid] * 3, -1))
    mask = Image.fromarray(grid)
    r = np.random.default_rng(3)
    ic, mc = random_crop_pair(img, mask, 12, r)
    assert ic.size == (12, 12) and mc.size == (12, 12)
    np.testing.assert_array_equal(np.asarray(ic)[:, :, 0], np.asarray(mc))


def test_affine_pair_identity_and_translate(rng):
    from lavt_rs_tpu.data.transforms import affine_pair

    arr = rng.integers(0, 255, (16, 16, 3), np.uint8)
    m = (rng.random((16, 16)) > 0.5).astype(np.uint8)
    img, mask = Image.fromarray(arr), Image.fromarray(m)
    i0, m0 = affine_pair(img, mask, 0.0)
    np.testing.assert_array_equal(np.asarray(i0), arr)
    np.testing.assert_array_equal(np.asarray(m0), m)
    # pure integer translate: content moves by (tx, ty), NEAREST exact
    i1, m1 = affine_pair(img, mask, 0.0, translate=(3, 2))
    np.testing.assert_array_equal(np.asarray(i1)[2:, 3:], arr[:-2, :-3])
    np.testing.assert_array_equal(np.asarray(m1)[2:, 3:], m[:-2, :-3])
    # 90-degree rotation of a centered square keeps its pixel count
    sq = np.zeros((17, 17), np.uint8)
    sq[6:11, 6:11] = 1
    _, m90 = affine_pair(Image.fromarray(sq), Image.fromarray(sq), 90.0)
    assert np.asarray(m90).sum() == 25


def test_random_affine_pair_same_params(rng):
    from lavt_rs_tpu.data.transforms import random_affine_pair

    grid = rng.integers(0, 200, (24, 24), np.uint8)
    img = Image.fromarray(np.stack([grid] * 3, -1))
    mask = Image.fromarray(grid)
    r = np.random.default_rng(7)
    i2, m2 = random_affine_pair(img, mask, r, degrees=(-30, 30),
                                translate=(0.2, 0.2), scale=(0.8, 1.2),
                                shear=(-5, 5))
    np.testing.assert_array_equal(np.asarray(i2)[:, :, 1], np.asarray(m2))


def test_build_paired_augment_off_by_default():
    from lavt_rs_tpu.data.transforms import build_paired_augment

    assert build_paired_augment() is None
    assert build_paired_augment(hflip=0.5) is not None


def test_refer_dataset_augmented(synthetic_refcoco):
    from lavt_rs_tpu.data.transforms import build_paired_augment

    r = REFER(synthetic_refcoco, "refcoco", "unc")
    tok = WordPieceTokenizer({w: i for i, w in enumerate(VOCAB)})
    aug = build_paired_augment(resize_range=(30, 50), hflip=0.5,
                               crop=28, seed=1)
    ds = ReferDataset(r, tok, split="train", img_size=32, max_tokens=8,
                      augment=aug, host_normalize=False)
    ex = ds[0]
    assert ex.image.shape == (32, 32, 3) and ex.image.dtype == np.uint8
    assert ex.target.shape == (32, 32)
    # crop pad fill (255) must have been mapped to background for the
    # 2-class loss
    assert set(np.unique(ex.target)) <= {0, 1}
    # eval mode never augments
    ds_ev = ReferDataset(r, tok, split="val", img_size=32, max_tokens=8,
                         eval_mode=True, augment=aug, host_normalize=False)
    assert ds_ev.augment is None
