"""Pretrained-weight initialization tests (round-1 verdict missing #2).

Synthetic torch checkpoints drive the real apply_pretrained_flags path:
backbone-only ImageNet-Swin merge, --ck_bert, and the 2D->video surgery
flags.  All published pretrain-then-finetune recipes depend on these.
"""

import argparse
import dataclasses

import numpy as np
import pytest
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from lavt_rs_tpu.config import ModelConfig, SwinConfig, TPWAMConfig, TPWAMKind
from lavt_rs_tpu.convert.pretrained import apply_pretrained_flags
from lavt_rs_tpu.models.factory import build_model

from torch_lavt import MMBackboneOracle, PatchEmbedOracle, PatchMergingOracle
from torch_oracles import SimpleDecodingOracle, SwinBlockOracle


def _cfg(name="lavt_one", **kw):
    swin = SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                      num_heads=(1, 2, 4, 8), window_size=4,
                      window_size_3d=(2, 4, 4), drop_path_rate=0.0)
    cfg = ModelConfig(name=name, swin=swin, img_size=32, max_tokens=6, **kw)
    return cfg.replace(bert=dataclasses.replace(cfg.bert, num_layers=1))


def _init_vars(cfg):
    model = build_model(cfg, train=True)
    if cfg.name == "lavt_video":
        vis = jnp.zeros((1, 2, 32, 32, 3))
    else:
        vis = jnp.zeros((1, 32, 32, 3))
    return model, jax.jit(model.init)(
        jax.random.PRNGKey(0), vis, jnp.ones((1, 6), jnp.int32),
        jnp.ones((1, 6), jnp.int32))


def _args(**kw):
    ns = argparse.Namespace(
        pretrained_swin_weights="", ck_bert="",
        pretrained2d_lavt_weights="",
        pretrained2d_lavt_weights_for_a_3d_model="",
        pretrained_video_lavt_weights_on_refcocos="")
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


class PlainSwinOracle(tnn.Module):
    """A raw ImageNet-style Swin checkpoint: no fusion, no res_gate,
    ONE final norm (the backbone-only init case,
    reference mmcv_custom/checkpoint.py:287-360)."""

    def __init__(self, embed_dim=16, depths=(1, 1, 1, 1),
                 heads=(1, 2, 4, 8), window=4):
        super().__init__()
        self.patch_embed = PatchEmbedOracle(embed_dim)
        dims = [embed_dim * 2**i for i in range(len(depths))]

        class Stage(tnn.Module):
            def __init__(self, dim, depth, h, last):
                super().__init__()
                self.blocks = tnn.ModuleList(
                    [SwinBlockOracle(dim, h, window,
                                     0 if i % 2 == 0 else window // 2)
                     for i in range(depth)])
                if not last:
                    self.downsample = PatchMergingOracle(dim)

        self.layers = tnn.ModuleList(
            [Stage(dims[i], depths[i], heads[i], i == len(depths) - 1)
             for i in range(len(depths))])
        self.norm = tnn.LayerNorm(dims[-1])


class TorchLavtOneOracle(tnn.Module):
    """Full 2D lavt_one state dict (backbone + classifier +
    text_encoder)."""

    def __init__(self):
        super().__init__()
        from transformers import BertConfig as HFBertConfig, BertModel

        self.backbone = MMBackboneOracle(16, (1, 1, 1, 1), (1, 2, 4, 8),
                                         window=4)
        self.classifier = SimpleDecodingOracle(8 * 16)
        self.text_encoder = BertModel(HFBertConfig(num_hidden_layers=1))


def _leaf(tree, path):
    for k in path.split("/"):
        tree = tree[k]
    return np.asarray(tree)


def test_backbone_only_imagenet_swin_merge(tmp_path):
    """--pretrained_swin_weights with a RAW Swin .pth initializes the
    backbone only; fusion / classifier / BERT stay at init.  Round 1
    KeyError'd on this (converter demanded text_encoder keys)."""
    torch.manual_seed(0)
    om = PlainSwinOracle()
    path = tmp_path / "swin_imagenet.pth"
    torch.save({"model": om.state_dict()}, path)

    cfg = _cfg("lavt_one")
    _, v0 = _init_vars(cfg)
    merged = apply_pretrained_flags(v0, cfg,
                                    _args(pretrained_swin_weights=str(path)))

    qkv = "params/backbone/layers_0/blocks_0/attn/qkv/kernel"
    want = om.layers[0].blocks[0].attn.qkv.weight.detach().numpy().T
    np.testing.assert_allclose(_leaf(merged, qkv), want, rtol=1e-6)
    # untouched subtrees keep their init values
    for p in ("params/backbone/layers_0/fusion/vis_project/kernel",
              "params/classifier/head/kernel",
              "params/text_encoder/layer_0/attention/query/kernel"):
        np.testing.assert_array_equal(_leaf(merged, p), _leaf(v0, p))


def test_backbone_only_ape_conversion(tmp_path):
    """APE checkpoints: torch stores absolute_pos_embed as (1, L, C); the
    converter reshapes to NHWC (1, S, S, C) (reference
    mmcv_custom/checkpoint.py:330-339) and the model bicubic-resizes it to
    the current grid at apply time (round-1 verdict missing #8)."""
    torch.manual_seed(0)
    om = PlainSwinOracle()
    sd = om.state_dict()
    pre = 224 // 4  # pretraining grid (224, patch 4)
    ape_t = torch.randn(1, pre * pre, 16)
    sd["absolute_pos_embed"] = ape_t
    path = tmp_path / "swin_ape.pth"
    torch.save({"model": sd}, path)

    cfg = _cfg("lavt_one")
    cfg = cfg.replace(swin=dataclasses.replace(cfg.swin, ape=True))
    model, v0 = _init_vars(cfg)
    merged = apply_pretrained_flags(v0, cfg,
                                    _args(pretrained_swin_weights=str(path)))
    got = _leaf(merged, "params/backbone/absolute_pos_embed")
    want = ape_t.numpy().reshape(1, pre, pre, 16)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # the merged tree still runs end-to-end (APE resized 56 -> 8 grid)
    out = jax.jit(lambda v, *a: model.apply(
        v, *a, deterministic=True, mutable=["batch_stats"]))(
            jax.tree.map(jnp.asarray, merged), jnp.zeros((1, 32, 32, 3)),
            jnp.ones((1, 6), jnp.int32), jnp.ones((1, 6), jnp.int32))[0]
    assert out.shape == (1, 32, 32, 2)


def test_backbone_only_rejects_garbage(tmp_path):
    """A checkpoint that matches nothing must raise, not silently no-op."""
    torch.manual_seed(0)
    path = tmp_path / "garbage.pth"
    torch.save({"model": {"foo.weight": torch.zeros(3)}}, path)
    cfg = _cfg("lavt_one")
    _, v0 = _init_vars(cfg)
    with pytest.raises((ValueError, KeyError)):
        apply_pretrained_flags(v0, cfg,
                               _args(pretrained_swin_weights=str(path)))


def test_ck_bert_merge(tmp_path):
    """--ck_bert with a local HF BertModel dump initializes the text
    encoder only."""
    pytest.importorskip("transformers")
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(0)
    hf = BertModel(HFBertConfig(num_hidden_layers=1))
    path = tmp_path / "bert.pth"
    torch.save(hf.state_dict(), path)

    cfg = _cfg("lavt_one")
    _, v0 = _init_vars(cfg)
    merged = apply_pretrained_flags(v0, cfg, _args(ck_bert=str(path)))
    want = hf.state_dict()[
        "encoder.layer.0.attention.self.query.weight"].numpy().T
    np.testing.assert_allclose(
        _leaf(merged, "params/text_encoder/layer_0/attention/query/kernel"),
        want, rtol=1e-6)
    np.testing.assert_array_equal(
        _leaf(merged, "params/backbone/patch_embed/proj/kernel"),
        _leaf(v0, "params/backbone/patch_embed/proj/kernel"))


def test_2d_lavt_into_3d_model(tmp_path):
    """--pretrained2d_lavt_weights_for_a_3d_model: patch embed unsqueezed,
    rel-pos tables spatially resized + temporally tiled, fusion dropped
    (reference lib/_utils.py:185-238)."""
    pytest.importorskip("transformers")
    torch.manual_seed(0)
    om = TorchLavtOneOracle()
    path = tmp_path / "lavt2d.pth"
    torch.save({"model": om.state_dict()}, path)

    cfg = _cfg("lavt_video", num_frames=2)
    _, v0 = _init_vars(cfg)
    merged = apply_pretrained_flags(
        v0, cfg, _args(pretrained2d_lavt_weights_for_a_3d_model=str(path)))

    pe = _leaf(merged, "params/backbone/patch_embed/proj/kernel")
    assert pe.shape[0] == 1 and pe.ndim == 5
    np.testing.assert_allclose(
        pe[0], om.backbone.patch_embed.proj.weight.detach().numpy()
        .transpose(2, 3, 1, 0), rtol=1e-6)
    # rel-pos table: (2wd-1)*(2wh-1)*(2ww-1) rows, temporal tiling of the
    # (possibly resized) 2D table
    wd, wh, ww = cfg.swin.window_size_3d
    table = _leaf(
        merged,
        "params/backbone/layers_0/blocks_0/attn/relative_position_bias_table")
    assert table.shape[0] == (2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1)
    src = om.backbone.layers[0].blocks[
        0].attn.relative_position_bias_table.detach().numpy()
    np.testing.assert_allclose(table[:49], src, rtol=1e-5)
    np.testing.assert_allclose(table[49:98], src, rtol=1e-5)
    # 3D fusion must stay at init (2D fusion keys dropped)
    np.testing.assert_array_equal(
        _leaf(merged, "params/backbone/layers_0/fusion/f_key/kernel"),
        _leaf(v0, "params/backbone/layers_0/fusion/f_key/kernel"))
    # classifier + BERT load
    np.testing.assert_allclose(
        _leaf(merged, "params/classifier/head/kernel"),
        om.classifier.conv1_1.weight.detach().numpy().transpose(2, 3, 1, 0),
        rtol=1e-6)


def test_2d_lavt_into_hybrid_model(tmp_path):
    """--pretrained2d_lavt_weights: the hybrid 2D-Swin video model keeps 2D
    rel-pos tables; fusion kept only for the 2D-PWAM hybrid
    (reference lib/_utils.py:133-183 non-strict load)."""
    pytest.importorskip("transformers")
    torch.manual_seed(0)
    om = TorchLavtOneOracle()
    path = tmp_path / "lavt2d.pth"
    torch.save({"model": om.state_dict()}, path)

    for kind, fusion_loads in ((TPWAMKind.SEP, False),
                               (TPWAMKind.PWAM2D, True)):
        cfg = _cfg("lavt_video", num_frames=2, hybrid_2d_3d=True,
                   tpwam=TPWAMConfig(kind=kind, kernel_t=(3, 1, 1)))
        _, v0 = _init_vars(cfg)
        merged = apply_pretrained_flags(
            v0, cfg, _args(pretrained2d_lavt_weights=str(path)))
        pe = _leaf(merged, "params/backbone/patch_embed/proj/kernel")
        assert pe.shape[0] == 1 and pe.ndim == 5
        table = _leaf(merged, "params/backbone/layers_0/blocks_0/attn/"
                              "relative_position_bias_table")
        assert table.shape[0] == 49  # 2D table, no temporal tiling
        f_key = "params/backbone/layers_0/fusion/image_lang_att/f_key/kernel"
        if fusion_loads:
            want = om.backbone.layers[0].fusion.image_lang_att.f_key[
                0].weight.detach().numpy()[:, :, 0].T
            np.testing.assert_allclose(_leaf(merged, f_key), want, rtol=1e-6)
        else:
            np.testing.assert_array_equal(
                _leaf(merged, "params/backbone/layers_0/fusion/f_key/kernel"),
                _leaf(v0, "params/backbone/layers_0/fusion/f_key/kernel"))


def test_video_weights_flag_routes(monkeypatch, tmp_path):
    """--pretrained_video_lavt_weights_on_refcocos routes to the full video
    converter (converter pieces are unit-tested elsewhere)."""
    from lavt_rs_tpu.convert import pretrained as pre

    cfg = _cfg("lavt_video", num_frames=2)
    _, v0 = _init_vars(cfg)
    called = {}

    def fake_convert(sd, cfg_, from_2d=False):
        called["from_2d"] = from_2d
        return {"params": {"backbone": {"patch_embed": {"proj": {
            "bias": np.ones(16, np.float32)}}}}}

    monkeypatch.setattr(pre.t2j, "load_torch_state_dict", lambda p: {})
    monkeypatch.setattr(pre.t2j, "convert_lavt_video", fake_convert)
    merged = apply_pretrained_flags(
        v0, cfg, _args(pretrained_video_lavt_weights_on_refcocos="x.pth"))
    assert called == {"from_2d": False}
    np.testing.assert_array_equal(
        _leaf(merged, "params/backbone/patch_embed/proj/bias"),
        np.ones(16, np.float32))


def test_inflate_patch_embed_temporal_depth():
    """Generic 2D->3D patch-embed inflation at temporal patch > 1:
    unsqueeze + repeat/÷patch_t (reference
    lib/video_swin_transformer.py:783) — a temporally constant input
    through the 3D conv must reproduce the 2D conv's output."""
    from lavt_rs_tpu.convert.torch2jax import inflate_patch_embed_2d_to_3d

    rng = np.random.default_rng(0)
    w2 = rng.standard_normal((8, 3, 4, 4)).astype(np.float32)

    # depth 1: plain unsqueeze (the shipped LAVT configs)
    w1 = inflate_patch_embed_2d_to_3d(w2, 1)
    assert w1.shape == (8, 3, 1, 4, 4)
    np.testing.assert_array_equal(w1[:, :, 0], w2)

    # depth 2: repeat/2 — conv of a constant-in-time clip == 2D conv
    w3 = inflate_patch_embed_2d_to_3d(w2, 2)
    assert w3.shape == (8, 3, 2, 4, 4)
    np.testing.assert_allclose(w3.sum(axis=2), w2, rtol=1e-6)
    conv2 = tnn.Conv2d(3, 8, 4, stride=4, bias=False)
    conv3 = tnn.Conv3d(3, 8, (2, 4, 4), stride=(2, 4, 4), bias=False)
    with torch.no_grad():
        conv2.weight.copy_(torch.from_numpy(w2))
        conv3.weight.copy_(torch.from_numpy(w3))
        img = torch.randn(1, 3, 8, 8)
        clip = img[:, :, None].repeat(1, 1, 2, 1, 1)
        out2 = conv2(img)
        out3 = conv3(clip)
    np.testing.assert_allclose(out3[:, :, 0].numpy(), out2.numpy(),
                               rtol=1e-5, atol=1e-6)
