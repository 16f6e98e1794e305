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


@pytest.mark.parametrize("name", ["lts", "vlt", "lavt_vlt"])
def test_zoo_train_step_descends(name):
    """Each zoo family TRAINS: a few steps on one fixed batch lower the
    loss and leave frozen BERT layers untouched (the lts/vlt/lavt_vlt
    families previously had forward smoke + converter parity only)."""
    from lavt_rs_tpu.train.optim import TrainConfig
    from lavt_rs_tpu.train.step import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    cfg = _tiny_cfg(name).replace(img_size=32)
    model = build_model(cfg, train=True)
    b = 2
    batch = {
        "image": jnp.asarray(rng.standard_normal((b, 32, 32, 3)),
                             jnp.float32),
        "ids": jnp.asarray(rng.integers(1, 64, (b, 5)), jnp.int32),
        "mask": jnp.ones((b, 5), jnp.int32),
        "target": jnp.asarray(rng.integers(0, 2, (b, 32, 32)), jnp.int32),
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["image"][:1], batch["ids"][:1],
        batch["mask"][:1])
    tcfg = TrainConfig(lr=1e-3, iters_per_epoch=100, epochs=1, loss="dice")
    state, tx = create_train_state(model, variables, tcfg)
    step = jax.jit(make_train_step(model, tx, tcfg))

    key = jax.random.PRNGKey(1)
    losses = []
    # VLT's query-balancing gate gives a rising transient for the first
    # ~4 steps from random init; 16 steps is comfortably past it
    for _ in range(16):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
    assert min(losses[-3:]) < losses[0], (name, losses)
    assert np.isfinite(losses).all(), (name, losses)
