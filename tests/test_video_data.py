"""Video datasets on synthetic fixtures: A2D (mp4 + h5) and YTVOS
(jpg/png dirs + meta_expressions)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from lavt_rs_tpu.data.video_sampling import consecutive_window, sparse_sample
from lavt_rs_tpu.text.tokenizer import WordPieceTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "dog", "running",
         "a", "cat"]


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer({w: i for i, w in enumerate(VOCAB)})


def test_sparse_sample_properties():
    import random

    rng = random.Random(0)
    for vid_len in (4, 8, 30):
        idx, pos = sparse_sample(2, vid_len, 8, rng)
        assert len(idx) == 8
        assert idx == sorted(idx)
        assert idx[pos] == 2
        assert all(0 <= i < vid_len for i in idx)


def test_consecutive_window_edge_padding():
    idx, pos = consecutive_window(1, 30, 8)
    assert len(idx) == 8
    assert idx[pos] == 1
    assert idx[0] == 0  # edge-clamped
    idx2, _ = consecutive_window(29, 30, 8)
    assert idx2[-1] == 29


@pytest.fixture(scope="module")
def a2d_fixture(tmp_path_factory):
    import cv2
    import h5py

    root = tmp_path_factory.mktemp("a2d")
    clips = root / "Release" / "clips320H"
    anns = root / "Release" / "a2d_annotation_with_instances" / "vid1"
    clips.mkdir(parents=True)
    anns.mkdir(parents=True)

    # 10-frame synthetic mp4
    w = cv2.VideoWriter(str(clips / "vid1.mp4"),
                        cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 24))
    rng = np.random.default_rng(0)
    for _ in range(10):
        w.write(rng.integers(0, 255, (24, 32, 3), np.uint8))
    w.release()

    # h5 mask for (1-indexed) frame 5 with 2 instances
    m = np.zeros((2, 32, 24), np.uint8)  # stored transposed
    m[1, 5:15, 5:15] = 1
    with h5py.File(anns / "00005.h5", "w") as f:
        f["instance"] = np.array([0, 7])
        f["reMask"] = m

    ann_file = root / "train_ann.json"
    with open(ann_file, "w") as f:
        json.dump([["the dog running", "vid1", 5, 7]], f)
    return str(root), str(ann_file)


def test_a2d_dataset(a2d_fixture, tok):
    from lavt_rs_tpu.data.a2d import A2DSentencesDataset

    root, ann = a2d_fixture
    ds = A2DSentencesDataset(root, ann, tok, subset="train", num_frames=4,
                             img_size=32)
    assert len(ds) == 1
    ex = ds[0]
    assert ex.video.shape == (4, 32, 32, 3)
    assert ex.target.shape == (32, 32)
    assert ex.target.sum() > 0
    assert ex.valid == 1
    assert 0 <= ex.valid_index < 4
    assert ex.ids.shape == (22,)
    assert ex.image_id == "v_vid1_f_5_i_7"

    ds_val = A2DSentencesDataset(root, ann, tok, subset="val",
                                 clip_length=6, img_size=32)
    ex = ds_val[0]
    assert ex.video.shape == (6, 32, 32, 3)


@pytest.fixture(scope="module")
def ytvos_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("ytvos")
    frames = [f"{i:05d}" for i in range(0, 20, 5)]
    jdir = root / "JPEGImages" / "vidA"
    adir = root / "Annotations" / "vidA"
    jdir.mkdir(parents=True)
    adir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for fr in frames:
        Image.fromarray(rng.integers(0, 255, (24, 32, 3), np.uint8)
                        ).save(jdir / f"{fr}.jpg")
        m = np.zeros((24, 32), np.uint8)
        m[4:12, 6:20] = 2  # obj_id 2
        img = Image.fromarray(m, mode="P")
        # full palette so PIL's PNG writer can't re-index the values
        img.putpalette(sum(([i, i, i] for i in range(256)), []))
        img.save(adir / f"{fr}.png", bits=8)

    meta = {"videos": {"vidA": {
        "frames": frames,
        "expressions": {"0": {"exp": "a cat", "obj_id": "2"}}}}}
    ann = root / "meta.json"
    with open(ann, "w") as f:
        json.dump(meta, f)
    return str(root), str(ann)


def test_ytvos_dataset(ytvos_fixture, tok):
    from lavt_rs_tpu.data.ytvos import YTVOSDataset

    root, ann = ytvos_fixture
    ds = YTVOSDataset(root, ann, tok, num_frames=4, img_size=32)
    assert len(ds) == 1  # 4 frames / num_frames 4 -> 1 meta
    ex = ds[0]
    assert ex.video.shape == (4, 32, 32, 3)
    assert ex.target.sum() > 0
    assert ex.ids[0] == tok.cls_id


def test_cli_a2d_eval_path(a2d_fixture, tmp_path):
    """cli.test --dataset a2d: the reference test.py evaluate_a2d path,
    including the --a2d_masks PNG dump, driven on the synthetic fixture
    with a shrunken model."""
    import dataclasses

    from lavt_rs_tpu.cli.args import model_config_from_args
    from lavt_rs_tpu.cli.test import _eval_a2d, get_parser
    from lavt_rs_tpu.config import SwinConfig
    from lavt_rs_tpu.models.factory import build_model

    root, ann = a2d_fixture
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(VOCAB) + "\n")
    args = get_parser().parse_args(
        ["--model", "lavt_video", "--dataset", "a2d", "--split", "train",
         "--a2d_data_root", root, "--a2d_ann", ann,
         "--vocab", str(vocab), "--img_size", "32", "--num_frames", "4",
         "--max_items", "1", "--a2d_masks", "--output-dir", str(tmp_path),
         "--no_bf16"])
    cfg = model_config_from_args(args)
    cfg = cfg.replace(
        swin=dataclasses.replace(cfg.swin, embed_dim=16,
                                 depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                                 window_size=4, window_size_3d=(2, 4, 4)),
        bert=dataclasses.replace(cfg.bert, num_layers=1,
                                 vocab_size=len(VOCAB)))
    model = build_model(cfg)
    summary = _eval_a2d(args, cfg, model)
    assert "mIoU" in summary and "P@0.5" in summary
    dumped = list((tmp_path / "a2d_masks").glob("*.png"))
    assert dumped, "expected an --a2d_masks PNG dump"


def test_refexp_pseudo_videos(tmp_path, tok):
    """COCO-format refexp reader (ModulatedDetection equivalent,
    reference data/refexp2seq.py:28-298): one image entry per sentence,
    caption on the image, augmented + shuffled pseudo-clip."""
    from lavt_rs_tpu.data.refexp2seq import RefExpPseudoVideos

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(rng.integers(0, 255, (40, 50, 3), np.uint8)).save(
        img_dir / "img0.jpg")
    coco = {
        "images": [
            {"id": 1, "file_name": "img0.jpg", "height": 40, "width": 50,
             "caption": "the dog running"},
            {"id": 2, "file_name": "img0.jpg", "height": 40, "width": 50,
             "caption": "a cat"},
            {"id": 3, "file_name": "img0.jpg", "height": 40, "width": 50,
             "caption": "no annotations -> dropped"},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "area": 100,
             "segmentation": [[5, 5, 25, 5, 25, 20, 5, 20]],
             "bbox": [5, 5, 20, 15]},
            {"id": 11, "image_id": 2, "category_id": 1, "iscrowd": 0,
             "area": 50,
             "segmentation": [[30, 25, 45, 25, 45, 35, 30, 35]],
             "bbox": [30, 25, 15, 10]},
        ],
    }
    ann = tmp_path / "instances_refcoco_train.json"
    with open(ann, "w") as f:
        json.dump(coco, f)

    ds = RefExpPseudoVideos(str(img_dir), str(ann), tok, num_frames=3,
                            img_size=32, max_tokens=8, seed=0)
    assert len(ds) == 2  # entry 3 has no annotations
    ex = ds[0]
    assert ex.video.shape == (3, 32, 32, 3)
    assert ex.target.shape == (32, 32) and ex.target.sum() > 0
    assert 0 <= ex.valid_index < 3 and ex.valid == 1
    assert ex.ids.shape == (8,) and ex.ids[0] == tok.cls_id
    assert ex.image_id == "refexp_1"


def test_a2d_not_consecutive_val_sampling(a2d_fixture, tok):
    """--not_consecutive: eval clips are sparse-sampled like training
    (reference a2d.py:108-135) instead of a consecutive window."""
    from lavt_rs_tpu.data.a2d import A2DSentencesDataset

    root, ann = a2d_fixture
    ds = A2DSentencesDataset(root, ann, tok, subset="val", clip_length=6,
                             img_size=32, not_consecutive=True)
    ex = ds[0]
    assert ex.video.shape == (6, 32, 32, 3)
    assert ex.valid == 1
    # the annotated frame must still sit at valid_index
    assert 0 <= ex.valid_index < 6
