"""Training step: optimizer labels, freezing, loss descent, data-parallel
sharding on the 8-device CPU mesh."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lavt_rs_tpu.config import lavt_one_tiny
from lavt_rs_tpu.models.factory import build_model
from lavt_rs_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from lavt_rs_tpu.train.optim import TrainConfig, label_param, build_optimizer
from lavt_rs_tpu.train.step import create_train_state, make_train_step


def test_label_param_rules():
    cfg = TrainConfig()
    assert label_param("backbone/layers_0/blocks_0/norm1/scale", cfg) == "no_decay"
    assert label_param("backbone/layers_0/blocks_0/attn/relative_position_bias_table", cfg) == "no_decay"
    assert label_param("backbone/layers_0/blocks_0/attn/qkv/kernel", cfg) == "decay"
    assert label_param("classifier/fuse4_a/bn/scale", cfg) == "decay"  # ref quirk
    assert label_param("text_encoder/layer_9/intermediate/kernel", cfg) == "decay"
    assert label_param("text_encoder/layer_10/intermediate/kernel", cfg) == "frozen"
    assert label_param("text_encoder/word_embeddings/embedding", cfg) == "frozen"
    cfg2 = TrainConfig(lang_enc_params="embeddings+encoder-all")
    assert label_param("text_encoder/word_embeddings/embedding", cfg2) == "decay"
    assert label_param("text_encoder/layer_11/output/kernel", cfg2) == "decay"


@pytest.fixture(scope="module")
def train_setup():
    from lavt_rs_tpu.config import SwinConfig

    swin = SwinConfig(embed_dim=48, depths=(1, 1, 2, 1),
                      num_heads=(3, 6, 12, 24), window_size=7,
                      drop_path_rate=0.0)
    cfg = lavt_one_tiny().replace(img_size=32, max_tokens=4, swin=swin)
    cfg = cfg.replace(bert=dataclasses.replace(
        cfg.bert, vocab_size=50, num_layers=12))
    model = build_model(cfg, train=True)
    rng = np.random.default_rng(0)
    b = 8
    batch = {
        "image": jnp.asarray(rng.standard_normal((b, 32, 32, 3)), jnp.float32),
        "ids": jnp.asarray(rng.integers(0, 50, (b, 4)), jnp.int32),
        "mask": jnp.ones((b, 4), jnp.int32),
        "target": jnp.asarray(rng.integers(0, 2, (b, 32, 32)), jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"][:1],
                                    batch["ids"][:1], batch["mask"][:1])
    return cfg, model, variables, batch


def test_train_step_descends_and_freezes(train_setup):
    cfg, model, variables, batch = train_setup
    tcfg = TrainConfig(lr=1e-3, iters_per_epoch=100, epochs=1, loss="dice")
    state, tx = create_train_state(model, variables, tcfg)
    step = jax.jit(make_train_step(model, tx, tcfg))

    frozen_before = np.asarray(
        state.params["text_encoder"]["layer_11"]["output"]["kernel"])
    trained_ref = np.asarray(
        state.params["text_encoder"]["layer_0"]["output"]["kernel"])

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))

    assert min(losses[-2:]) < losses[0], losses
    frozen_after = np.asarray(
        state.params["text_encoder"]["layer_11"]["output"]["kernel"])
    np.testing.assert_array_equal(frozen_before, frozen_after)
    trained_after = np.asarray(
        state.params["text_encoder"]["layer_0"]["output"]["kernel"])
    assert np.abs(trained_after - trained_ref).max() > 0

    # batch stats actually update (BN in decoder)
    assert int(state.step) == 6


def test_poly_lr_schedule():
    from lavt_rs_tpu.train.optim import poly_schedule

    tcfg = TrainConfig(lr=5e-5, epochs=40, iters_per_epoch=100)
    s = poly_schedule(tcfg)
    assert np.isclose(float(s(0)), 5e-5)
    assert np.isclose(float(s(2000)), 5e-5 * (1 - 0.5) ** 0.9)
    assert float(s(4000)) == 0.0


def test_data_parallel_matches_single_device(train_setup):
    """The sharded step computes the same update as the unsharded step."""
    cfg, model, variables, batch = train_setup
    tcfg = TrainConfig(lr=1e-3, iters_per_epoch=100, epochs=1, loss="dice")
    state, tx = create_train_state(model, variables, tcfg)
    step = make_train_step(model, tx, tcfg)
    key = jax.random.PRNGKey(0)

    # single device
    s1, m1 = jax.jit(step)(state, batch, key)

    # 8-device data-parallel
    mesh = make_mesh(jax.devices()[:8])
    state8 = replicate(mesh, state)
    batch8 = shard_batch(mesh, batch)
    s8, m8 = jax.jit(step)(state8, batch8, key)

    assert np.isclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    # Compare GRADIENTS (pre-Adam): Adam's sign-like first update amplifies
    # reduction-order noise on near-zero grads into O(lr) param diffs, so
    # the post-update params are not a sharp signal — the grads are.
    from lavt_rs_tpu.losses import get_loss

    loss_fn = get_loss(tcfg.loss)

    def scalar_loss(params, batch):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"], batch["ids"], batch["mask"],
            deterministic=True, mutable=["batch_stats"])
        return loss_fn(out, batch["target"])

    g1 = jax.jit(jax.grad(scalar_loss))(state.params, batch)
    g8 = jax.jit(jax.grad(scalar_loss))(state8.params, batch8)
    # Batch-axis sharding changes per-shard reduction shapes (conv/BN
    # accumulation order), giving O(1e-4) absolute noise on grads — a
    # relative-L2 criterion per leaf is the robust discriminator (a missing
    # gradient sync would give O(1) relative error).
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.linalg.norm(a) + 1e-8
        rel_l2 = np.linalg.norm(a - b) / denom
        assert rel_l2 < 0.02, rel_l2
    n1 = np.sqrt(sum(float((np.asarray(x) ** 2).sum())
                     for x in jax.tree.leaves(g1)))
    n8 = np.sqrt(sum(float((np.asarray(x) ** 2).sum())
                     for x in jax.tree.leaves(g8)))
    assert abs(n1 - n8) / n1 < 0.01, (n1, n8)
    # and the one-step params stay within an LR-scale envelope
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5e-3)
