"""Sequence-level video transforms (data/transforms_video.py).

Covers the reference's MTTR-style clip augmentations
(reference data/transforms_video.py:20-565): geometric box/mask
consistency, the Check valid/squash quirk, the caption left/right swap,
and a full MTTR-style composed pipeline.
"""

import numpy as np
import pytest

import lavt_rs_tpu.data.transforms_video as TV


def _clip(t=3, h=40, w=60):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (h, w, 3), dtype=np.uint8).astype(np.uint8)
            for _ in range(t)]


def _target(t=3, h=40, w=60):
    masks = np.zeros((t, h, w), np.uint8)
    masks[:, 10:20, 15:30] = 1
    return {
        "boxes": np.array([[15.0, 10.0, 30.0, 20.0]] * t, np.float32),
        "masks": masks,
        "labels": np.zeros((t,), np.int64),
        "caption": "the cat on the left",
        "area": np.array([150.0] * t, np.float32),
    }


def test_crop_moves_boxes_and_masks_together():
    clip, tgt = TV.crop(_clip(), _target(), (5, 10, 30, 40))
    assert clip[0].shape == (30, 40, 3)
    assert tgt["masks"].shape == (3, 30, 40)
    np.testing.assert_allclose(tgt["boxes"][0], [5, 5, 20, 15])
    ys, xs = np.nonzero(tgt["masks"][0])
    assert xs.min() == 5 and xs.max() == 19
    assert ys.min() == 5 and ys.max() == 14


def test_hflip_box_equals_mask_bbox():
    clip, tgt = TV.hflip(_clip(), _target())
    x0, _, x1, _ = tgt["boxes"][0]
    ys, xs = np.nonzero(tgt["masks"][0])
    assert (xs.min(), xs.max() + 1) == (int(x0), int(x1))
    np.testing.assert_array_equal(clip[0][:, ::-1], _clip()[0])


def test_vflip_box_matches_mask():
    _, tgt = TV.vflip(_clip(), _target())
    _, y0, _, y1 = tgt["boxes"][0]
    ys, _ = np.nonzero(tgt["masks"][0])
    assert (ys.min(), ys.max() + 1) == (int(y0), int(y1))


def test_resize_short_side_keeps_aspect_and_caps_max():
    clip, tgt = TV.resize(_clip(), _target(), 80, max_size=100)
    h, w = clip[0].shape[:2]
    assert h == 67 and w == 100  # max_size capped: 80*60/40=120 > 100
    assert tgt["masks"].shape[1:] == (h, w)
    assert tgt["masks"][0].any()


def test_resize_explicit_wh_tuple():
    clip, tgt = TV.resize(_clip(), _target(), (50, 30))  # (w, h)
    assert clip[0].shape[:2] == (30, 50)
    assert tuple(tgt["size"]) == (30, 50)


def test_check_marks_degenerate_boxes_invalid_and_squashes():
    tgt = _target()
    tgt["boxes"][1] = [10.0, 10.0, 10.0, 20.0]  # zero width
    _, out = TV.Check()(_clip(), tgt)
    np.testing.assert_array_equal(out["valid"], [1, 0, 1])
    assert out["boxes"][1].max() <= 1.0  # // 1000 squash quirk
    np.testing.assert_allclose(out["boxes"][0], [15, 10, 30, 20])


def test_hflip_swaps_left_right_in_caption():
    rng = np.random.default_rng(1)
    t = TV.RandomHorizontalFlip(p=1.0, rng=rng)
    _, tgt = t(_clip(), _target())
    assert tgt["caption"] == "the cat on the right"


def test_expand_keeps_box_on_mask():
    rng = np.random.default_rng(3)  # find a seed that expands
    t = TV.Expand(mean=(104, 117, 123), rng=rng)
    for _ in range(10):
        clip, tgt = t(_clip(), _target())
        if clip[0].shape[0] > 40:
            break
    assert clip[0].shape[0] > 40
    x0, y0, x1, y1 = tgt["boxes"][0].astype(int)
    ys, xs = np.nonzero(tgt["masks"][0])
    assert (xs.min(), ys.min()) == (x0, y0)


def test_normalize_boxes_to_cxcywh_unit():
    clip, tgt = TV.Normalize()(
        [f.astype(np.float32) / 255 for f in _clip()], _target())
    cx, cy, bw, bh = tgt["boxes"][0]
    np.testing.assert_allclose([cx, cy, bw, bh],
                               [22.5 / 60, 15 / 40, 15 / 60, 10 / 40],
                               atol=1e-6)
    assert abs(float(np.mean(clip[0]))) < 3.0


def test_min_iou_random_crop_terminates_and_keeps_center():
    rng = np.random.default_rng(0)
    t = TV.MinIoURandomCrop(rng=rng)
    clip, tgt = t(_clip(), _target())
    assert clip[0].ndim == 3  # bounded loop returned something


def test_photometric_distort_stays_uint8():
    rng = np.random.default_rng(0)
    clip, _ = TV.PhotometricDistort(rng=rng)(_clip(), _target())
    assert clip[0].dtype == np.uint8 and clip[0].shape == (40, 60, 3)


def test_random_erasing_blanks_rectangle():
    rng = np.random.default_rng(0)
    clip, _ = TV.RandomErasing(p=1.0, rng=rng)(_clip(), _target())
    assert (np.asarray(clip[0]) == 0).any()


def test_mttr_style_composed_pipeline():
    """The reference's train-shape pipeline: flip -> select(resize |
    resize+crop+resize) -> photometric -> tensor -> normalize -> check."""
    rng = np.random.default_rng(0)
    scales = [288, 320, 352]
    pipeline = TV.Compose([
        TV.RandomHorizontalFlip(rng=rng),
        TV.RandomSelect(
            TV.RandomResize(scales, max_size=480, rng=rng),
            TV.Compose([
                TV.RandomResize([400, 500], rng=rng),
                TV.RandomSizeCrop(384, 400, rng=rng),
                TV.RandomResize(scales, max_size=480, rng=rng),
            ]), rng=rng),
        TV.PhotometricDistort(rng=rng),
        TV.ToTensor(),
        TV.Normalize(),
        TV.Check(),
    ])
    clip, tgt = pipeline(_clip(t=4, h=240, w=320), _target(t=4, h=240, w=320))
    assert len(clip) == 4 and clip[0].dtype == np.float32
    assert tgt["masks"].shape[0] == 4
    assert tgt["valid"].shape == (4,)
    h, w = clip[0].shape[:2]
    assert tgt["masks"].shape[1:] == (h, w)
