"""Smoke tests across the full model zoo (lts, vlt, lavt_vlt, fusion
baselines) — forward shapes + finiteness on tiny configs."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lavt_rs_tpu.config import (
    FusionConfig, FusionKind, ModelConfig, SwinConfig,
)
from lavt_rs_tpu.models.factory import build_model


def _tiny_cfg(name, **kw):
    swin = SwinConfig(embed_dim=32, depths=(1, 1, 1, 1),
                      num_heads=(2, 4, 8, 16), window_size=4,
                      drop_path_rate=0.0)
    cfg = ModelConfig(name=name, swin=swin, img_size=64, max_tokens=5, **kw)
    return cfg.replace(bert=dataclasses.replace(cfg.bert, vocab_size=64,
                                                num_layers=1))


def _run(cfg, b=1):
    model = build_model(cfg)
    img = jnp.zeros((b, cfg.img_size, cfg.img_size, 3))
    ids = jnp.ones((b, cfg.max_tokens), jnp.int32)
    msk = jnp.ones((b, cfg.max_tokens), jnp.int32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), img, ids, msk)
    out = model.apply(v, img, ids, msk)
    assert np.isfinite(np.asarray(out)).all()
    return out


def test_lts_forward():
    out = _run(_tiny_cfg("lts"))
    assert out.shape == (1, 64, 64, 2)


def test_vlt_forward():
    out = _run(_tiny_cfg("vlt"))
    assert out.shape == (1, 64, 64, 2)


def test_lavt_vlt_forward():
    out = _run(_tiny_cfg("lavt_vlt"))
    assert out.shape == (1, 64, 64, 2)


@pytest.mark.parametrize("kind", [FusionKind.SIMPLE, FusionKind.BCAM,
                                  FusionKind.GACD, FusionKind.EFN])
def test_fusion_baselines_forward(kind):
    cfg = _tiny_cfg("lavt_one").replace(fusion=FusionConfig(kind=kind))
    out = _run(cfg)
    assert out.shape == (1, 64, 64, 2)


def test_lavt_external_bert_forward():
    """The raw LAVT module takes precomputed language features
    (reference lib/_utils.py:10-27)."""
    from lavt_rs_tpu.models.lavt import LAVT

    cfg = _tiny_cfg("lavt")
    model = LAVT(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    l_feats = jnp.zeros((1, 5, 768))
    msk = jnp.ones((1, 5), jnp.int32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), img, l_feats, msk)
    out = model.apply(v, img, l_feats, msk)
    assert out.shape == (1, 64, 64, 2)


def test_lavt_two_model_forward_and_structure():
    """build_model('lavt') returns the trainable two-model wrapper whose
    param tree mirrors the reference's {'model', 'bert_model'} checkpoint
    dicts (reference train.py:596-605)."""
    cfg = _tiny_cfg("lavt")
    model = build_model(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    ids = jnp.ones((1, 5), jnp.int32)
    msk = jnp.ones((1, 5), jnp.int32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), img, ids, msk)
    assert set(v["params"].keys()) == {"model", "bert_model"}
    assert set(v["params"]["model"].keys()) == {"backbone", "classifier"}
    out = model.apply(v, img, ids, msk)
    assert out.shape == (1, 64, 64, 2)
