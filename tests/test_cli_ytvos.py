"""YTVOS inference CLI tests: whole-video mask dump, --visualize overlays,
the single-frame path for image models, and the 202-video assertion
(reference test_ytvos.py:84-99, 255-269, 288-482)."""

import dataclasses
import json
import os

import numpy as np
import pytest
from PIL import Image

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "dog", "a", "cat"]


@pytest.fixture(scope="module")
def ytvos_root(tmp_path_factory):
    """Competition layout: meta_expressions/{valid,test}/... +
    valid/JPEGImages/<video>/<frame>.jpg."""
    root = tmp_path_factory.mktemp("ytvos_comp")
    rng = np.random.default_rng(0)
    vids = {
        "vidA": [f"{i:05d}" for i in range(3)],
        "vidB": [f"{i:05d}" for i in range(2)],
    }
    meta = {"videos": {}}
    for vid, frames in vids.items():
        jdir = root / "valid" / "JPEGImages" / vid
        jdir.mkdir(parents=True)
        for fr in frames:
            Image.fromarray(rng.integers(0, 255, (24, 32, 3), np.uint8)
                            ).save(jdir / f"{fr}.jpg")
        exps = {"0": {"exp": "a cat"}}
        if vid == "vidA":
            exps["1"] = {"exp": "the dog"}
        meta["videos"][vid] = {"frames": frames, "expressions": exps}
    mdir = root / "meta_expressions" / "valid"
    mdir.mkdir(parents=True)
    with open(mdir / "meta_expressions.json", "w") as f:
        json.dump(meta, f)
    return str(root), vids


from lavt_rs_tpu.cli.args import model_config_from_args as _real_mcfa


def _shrunk(args):
    from lavt_rs_tpu.config import SwinConfig

    cfg = _real_mcfa(args)
    return cfg.replace(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8), window_size=4,
                        window_size_3d=(2, 4, 4), drop_path_rate=0.0),
        bert=dataclasses.replace(cfg.bert, num_layers=1,
                                 vocab_size=len(VOCAB)),
        img_size=32)


@pytest.mark.parametrize("model", ["lavt_video", "lavt_one"])
def test_ytvos_mask_dump_and_visualize(ytvos_root, tmp_path, monkeypatch,
                                       model):
    """Whole-video (lavt_video) and single-frame (image model,
    evaluate_single_frames equivalent) inference dump masks for every
    frame of every expression; --visualize adds per-expression overlays."""
    from lavt_rs_tpu.cli import test_ytvos as cli

    monkeypatch.setattr("lavt_rs_tpu.cli.args.model_config_from_args",
                        _shrunk)
    root, vids = ytvos_root
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(VOCAB) + "\n")
    out = str(tmp_path / f"masks_{model}")

    cli.main(["--model", model, "--ytvos_data_root", root,
              "--vocab", str(vocab), "--img_size", "32",
              "--num_frames", "2", "--out", out, "--visualize",
              "--no_bf16"])

    for vid, frames in vids.items():
        n_exps = 2 if vid == "vidA" else 1
        for e in range(n_exps):
            for fr in frames:
                mask = os.path.join(out, vid, str(e), f"{fr}.png")
                assert os.path.exists(mask), mask
                m = np.asarray(Image.open(mask))
                assert m.shape == (24, 32)  # original resolution
                vis = os.path.join(f"{out}_visualize", vid, str(e),
                                   f"{fr}.png")
                assert os.path.exists(vis), vis
                assert np.asarray(Image.open(vis)).shape == (24, 32, 3)


def test_202_video_assertion(tmp_path):
    """With test metas present, the validation count must be exactly 202
    (reference test_ytvos.py:99)."""
    from lavt_rs_tpu.cli.test_ytvos import load_validation_videos

    def build(n_valid_only, root):
        vdir = root / "meta_expressions" / "valid"
        tdir = root / "meta_expressions" / "test"
        vdir.mkdir(parents=True)
        tdir.mkdir(parents=True)
        test = {f"t{i}": {} for i in range(3)}
        valid = {f"v{i}": {} for i in range(n_valid_only)}
        valid.update(test)  # competition quirk: valid contains test too
        with open(vdir / "meta_expressions.json", "w") as f:
            json.dump({"videos": valid}, f)
        with open(tdir / "meta_expressions.json", "w") as f:
            json.dump({"videos": test}, f)

    ok = tmp_path / "ok"
    build(202, ok)
    assert len(load_validation_videos(str(ok), "valid")) == 202

    bad = tmp_path / "bad"
    build(17, bad)
    with pytest.raises(AssertionError, match="incorrect number"):
        load_validation_videos(str(bad), "valid")


def test_chunk_frames_halo_matches_unchunked(tmp_path, monkeypatch):
    """--chunk_frames with the default halo must reproduce the unchunked
    masks exactly: chunks overlap by --chunk_halo frames and the halo is
    discarded on stitch, so every kept frame keeps its full temporal
    receptive field (halo >= receptive field here). Raw truncation
    (--chunk_halo 0) silently changed masks at chunk boundaries."""
    import json

    from lavt_rs_tpu.cli import test_ytvos as cli

    monkeypatch.setattr("lavt_rs_tpu.cli.args.model_config_from_args",
                        _shrunk)
    rng = np.random.default_rng(1)
    root = tmp_path / "ytvos_long"
    frames = [f"{i:05d}" for i in range(16)]
    jdir = root / "valid" / "JPEGImages" / "vidL"
    jdir.mkdir(parents=True)
    for fr in frames:
        Image.fromarray(rng.integers(0, 255, (24, 32, 3), np.uint8)
                        ).save(jdir / f"{fr}.jpg")
    meta = {"videos": {"vidL": {"frames": frames,
                                "expressions": {"0": {"exp": "a cat"}}}}}
    mdir = root / "meta_expressions" / "valid"
    mdir.mkdir(parents=True)
    with open(mdir / "meta_expressions.json", "w") as f:
        json.dump(meta, f)

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(VOCAB) + "\n")

    base = ["--model", "lavt_video", "--ytvos_data_root", str(root),
            "--vocab", str(vocab), "--img_size", "32", "--num_frames", "2",
            "--no_bf16", "--seed", "0"]
    out_full = str(tmp_path / "full")
    out_chunk = str(tmp_path / "chunk")
    cli.main(base + ["--out", out_full])
    cli.main(base + ["--out", out_chunk, "--chunk_frames", "8",
                     "--chunk_halo", "8"])

    for fr in frames:
        a = np.asarray(Image.open(os.path.join(out_full, "vidL", "0",
                                                f"{fr}.png")))
        b = np.asarray(Image.open(os.path.join(out_chunk, "vidL", "0",
                                                f"{fr}.png")))
        np.testing.assert_array_equal(a, b, err_msg=fr)
