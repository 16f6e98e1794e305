"""CLI-level tests for the real entry points.

Round-1 verdict found three broken CLI paths that unit tests missed because
they never invoked the entry points themselves:
  * --resume lost the TrainState wrapper (restore returned a plain dict);
  * `python -m lavt_rs_tpu.cli.test --dataset a2d` NameError'd because the
    __main__ guard sat above the a2d helpers;
  * .pth conversion was hardwired to the lavt_one converter.
These tests drive main()/module-as-script directly so regressions in the
wiring (not just the building blocks) are caught.
"""

import dataclasses
import runpy
import sys

import numpy as np
import pytest


def _shrunk_config(args):
    """Real model_config_from_args, then shrink to test size."""
    from lavt_rs_tpu.cli.args import model_config_from_args
    from lavt_rs_tpu.config import SwinConfig

    cfg = model_config_from_args(args)
    return cfg.replace(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8), window_size=4,
                        window_size_3d=(2, 4, 4), drop_path_rate=0.0),
        bert=dataclasses.replace(cfg.bert, num_layers=1, vocab_size=128),
        img_size=32, max_tokens=6)


# -b 8: batches shard over the conftest's virtual 8-device CPU mesh
BASE_ARGV = ["--synthetic", "--synthetic_steps", "2", "-b", "8",
             "--img_size", "32", "--print-freq", "1", "--no_bf16"]


def test_train_save_resume_step(tmp_path, monkeypatch):
    """Save -> resume -> step through the REAL cli.train.main: the restored
    state must be a TrainState usable by step_fn, and training must
    continue at epoch+1 (reference train.py:738)."""
    from lavt_rs_tpu.cli import train as cli_train

    monkeypatch.setattr(cli_train, "model_config_from_args", _shrunk_config)
    out = str(tmp_path / "ckpts")

    cli_train.main(BASE_ARGV + ["--epochs", "1", "--output-dir", out])
    from lavt_rs_tpu.train.checkpoint import list_checkpoints

    assert [e for e, _ in list_checkpoints(out)] == [0]

    # resume from the directory; must train exactly epoch 1
    cli_train.main(BASE_ARGV + ["--epochs", "2", "--output-dir", out,
                                "--resume", out])
    assert [e for e, _ in list_checkpoints(out)] == [0, 1]

    # resume from an explicit epoch dir too
    ep1 = list_checkpoints(out)[-1][1]
    cli_train.main(BASE_ARGV + ["--epochs", "3", "--output-dir", out,
                                "--resume", ep1])
    assert [e for e, _ in list_checkpoints(out)] == [0, 1, 2]


def test_train_lavt_two_model_synthetic(tmp_path, monkeypatch):
    """--model lavt (the original two-model CVPR variant) must train: BERT
    rides along as the 'bert_model' sibling (reference train.py:596-605)."""
    from lavt_rs_tpu.cli import train as cli_train

    monkeypatch.setattr(cli_train, "model_config_from_args", _shrunk_config)
    cli_train.main(BASE_ARGV + ["--model", "lavt", "--epochs", "1",
                                "--output-dir", str(tmp_path / "ck")])
    from lavt_rs_tpu.train.checkpoint import list_checkpoints

    assert len(list_checkpoints(str(tmp_path / "ck"))) == 1


def test_cli_test_a2d_synthetic_as_script(monkeypatch):
    """Run cli.test as a script (__main__) on the a2d branch — the round-1
    bug was a NameError only visible in script mode."""
    monkeypatch.setattr(sys, "argv", [
        "lavt_rs_tpu.cli.test", "--model", "lavt_video", "--dataset", "a2d",
        "--synthetic", "--max_items", "1", "--no_bf16"])
    # run_module executes the module top-to-bottom with run_name __main__;
    # a guard above the a2d helpers would crash with NameError here.
    runpy.run_module("lavt_rs_tpu.cli.test", run_name="__main__",
                     alter_sys=True)


def test_convert_dispatch_by_model(monkeypatch):
    """.pth conversion dispatches on the model family, not always
    lavt_one (round-1 weak #3)."""
    from lavt_rs_tpu.cli.test import _convert_torch_checkpoint
    from lavt_rs_tpu.config import ModelConfig
    from lavt_rs_tpu.convert import torch2jax as t2j

    calls = []
    monkeypatch.setattr(t2j, "load_torch_state_dict",
                        lambda path: {"dummy": np.zeros(1)})
    for fn in ("convert_lavt_one", "convert_lts", "convert_vlt",
               "convert_lavt_video"):
        monkeypatch.setattr(
            t2j, fn,
            (lambda fn: lambda sd, cfg, **kw: calls.append(fn) or {})(fn))
    monkeypatch.setattr(
        t2j, "convert_lavt_two_file",
        lambda path, cfg: calls.append("convert_lavt_two_file") or {})

    for name, expect in (("lavt_one", "convert_lavt_one"),
                         ("lts", "convert_lts"),
                         ("vlt", "convert_vlt"),
                         ("lavt_vlt", "convert_vlt"),
                         ("lavt_video", "convert_lavt_video"),
                         ("lavt", "convert_lavt_two_file")):
        calls.clear()
        _convert_torch_checkpoint("x.pth", ModelConfig(name=name))
        assert calls == [expect], (name, calls)


def test_convert_lavt_two_roundtrip():
    """Reference-style {'model', 'bert_model'} dicts convert into the
    LAVTTwo tree and apply cleanly."""
    pytest.importorskip("transformers")
    import torch
    import torch.nn as tnn

    import jax
    import jax.numpy as jnp

    from lavt_rs_tpu.config import ModelConfig, SwinConfig
    from lavt_rs_tpu.convert.torch2jax import convert_lavt_two
    from lavt_rs_tpu.models.factory import build_model
    from torch_lavt import MMBackboneOracle
    from torch_oracles import SimpleDecodingOracle

    cfg = ModelConfig(
        name="lavt",
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8), window_size=4,
                        drop_path_rate=0.0),
        img_size=32, max_tokens=6)
    cfg = cfg.replace(bert=dataclasses.replace(cfg.bert, num_layers=1))

    torch.manual_seed(0)

    class _TorchLavt(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = MMBackboneOracle(16, (1, 1, 1, 1), (1, 2, 4, 8),
                                             window=4)
            self.classifier = SimpleDecodingOracle(8 * 16)

    model_sd = {k: v.detach().numpy()
                for k, v in _TorchLavt().state_dict().items()}
    from transformers import BertConfig as HFBertConfig, BertModel

    hf = BertModel(HFBertConfig(num_hidden_layers=1))
    bert_sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()
               if hasattr(v, "shape")}

    variables = convert_lavt_two(model_sd, bert_sd, cfg)
    model = build_model(cfg)
    img = jnp.zeros((1, 32, 32, 3))
    ids = jnp.ones((1, 6), jnp.int32)
    msk = jnp.ones((1, 6), jnp.int32)
    variables = jax.tree.map(jnp.asarray, variables)
    out = model.apply(variables, img, ids, msk)
    assert out.shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_window12_sniffed_from_pretrained_filename():
    """Reference flips to window-12 when 'window12' is in the checkpoint
    filename, without --window12 (lib/segmentation.py:35-39)."""
    import argparse

    from lavt_rs_tpu.cli.args import (add_data_args, add_eval_args,
                                      add_model_args, add_train_args,
                                      model_config_from_args)

    p = argparse.ArgumentParser()
    add_model_args(p)
    add_data_args(p)
    add_train_args(p)
    add_eval_args(p)

    base = ["--model", "lavt_one", "--swin_type", "base"]
    a = p.parse_args(base + [
        "--pretrained_swin_weights",
        "pretrained/swin_base_patch4_window12_384_22k.pth"])
    assert model_config_from_args(a).swin.window_size == 12

    a = p.parse_args(base + [
        "--pretrained_swin_weights",
        "pretrained/swin_base_patch4_window7_224_22k.pth"])
    assert model_config_from_args(a).swin.window_size == 7

    a = p.parse_args(base + ["--window12"])
    assert model_config_from_args(a).swin.window_size == 12
