"""End-to-end training CLI on real (synthetic on-disk) datasets.

Covers the round-1 gaps: the PrefetchLoader is now ON the training path
(image and video), video epochs evaluate every epoch (reference
train.py:768-789), and A2D applies the best-train-mIoU checkpoint policy.
"""

import dataclasses
import re

import pytest
import jax

from test_data import VOCAB as REFER_VOCAB, synthetic_refcoco  # noqa: F401
from test_video_data import VOCAB as VIDEO_VOCAB, a2d_fixture  # noqa: F401


def _shrunk_factory(vocab_size):
    from lavt_rs_tpu.cli.args import model_config_from_args
    from lavt_rs_tpu.config import SwinConfig

    def shrunk(args):
        cfg = model_config_from_args(args)
        return cfg.replace(
            swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                            num_heads=(1, 2, 4, 8), window_size=4,
                            window_size_3d=(2, 4, 4), drop_path_rate=0.0),
            bert=dataclasses.replace(cfg.bert, num_layers=1,
                                     vocab_size=vocab_size),
            img_size=32)

    return shrunk


def _one_device_mesh(monkeypatch):
    from lavt_rs_tpu.parallel import mesh as mesh_mod

    real = mesh_mod.make_mesh
    monkeypatch.setattr(mesh_mod, "make_mesh",
                        lambda **kw: real(devices=jax.devices()[:1]))


def test_cli_train_refcoco_real_data(synthetic_refcoco, tmp_path,
                                     monkeypatch):
    """Image training end-to-end from disk: REFER -> PrefetchLoader ->
    sharded step -> per-epoch padded-sentence eval -> metric-tagged
    checkpoint."""
    from lavt_rs_tpu.cli import train as cli_train
    from lavt_rs_tpu.train.checkpoint import list_checkpoints

    monkeypatch.setattr(cli_train, "model_config_from_args",
                        _shrunk_factory(len(REFER_VOCAB)))
    _one_device_mesh(monkeypatch)
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(REFER_VOCAB) + "\n")
    out = str(tmp_path / "ck")

    cli_train.main([
        "--dataset", "refcoco", "--refer_data_root", synthetic_refcoco,
        "--vocab", str(vocab), "--img_size", "32", "-b", "2",
        "--epochs", "1", "--val_split", "val", "-j", "2",
        "--print-freq", "1", "--no_bf16", "--output-dir", out])

    ckpts = list_checkpoints(out)
    assert len(ckpts) == 1
    # eval ran: checkpoint named with its metrics (reference
    # train.py:761-762)
    assert re.search(r"mIoU_[\d.]+_oIoU_[\d.]+$", ckpts[0][1]), ckpts


def test_cli_train_a2d_eval_and_policy(a2d_fixture, tmp_path, monkeypatch,
                                       capsys):
    """Video training end-to-end: A2D loader -> video step -> per-epoch
    evaluate_a2d -> best-train-mIoU-only checkpointing (reference
    train.py:768-789)."""
    from lavt_rs_tpu.cli import train as cli_train
    from lavt_rs_tpu.train.checkpoint import list_checkpoints

    monkeypatch.setattr(cli_train, "model_config_from_args",
                        _shrunk_factory(len(VIDEO_VOCAB)))
    _one_device_mesh(monkeypatch)
    root, ann = a2d_fixture
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(VIDEO_VOCAB) + "\n")
    out = str(tmp_path / "ck")

    cli_train.main([
        "--model", "lavt_video", "--dataset", "a2d",
        "--a2d_data_root", root, "--a2d_ann", ann,
        "--vocab", str(vocab), "--img_size", "32", "--num_frames", "2",
        "--clip_length", "2", "-b", "1", "--epochs", "2",
        "--val_split", "val", "-j", "2", "--print-freq", "1",
        "--no_bf16", "--output-dir", out])

    err = capsys.readouterr().err
    # per-epoch video eval ran (reference evaluates every epoch)
    assert err.count("A2D: mIoU=") == 2, err[-2000:]
    ckpts = list_checkpoints(out)
    # best-only policy: epoch 0 always saves; epoch 1 only on improvement
    assert 1 <= len(ckpts) <= 2
    assert "tmIoU_" in ckpts[0][1] and "_mIoU_" in ckpts[0][1]
    if len(ckpts) == 1:
        assert "did not improve" in err
