"""Pipeline-parallel BERT (parallel/pp.py) vs the plain forward.

GPipe fill-and-drain with ppermute on a 4-stage CPU mesh must be
numerically identical to the sequential layer loop."""

import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from lavt_rs_tpu.config import BertConfig
from lavt_rs_tpu.models.bert import BertEncoder
from lavt_rs_tpu.parallel.pp import (bert_pipelined, make_pipeline_mesh,
                                     pipeline_apply, stack_layer_params)


@pytest.fixture(scope="module")
def tiny_bert():
    cfg = BertConfig(vocab_size=100, hidden_size=32, num_layers=4,
                     num_heads=2, intermediate_size=64,
                     max_position_embeddings=16)
    model = BertEncoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 100, (8, 8)),
                      jnp.int32)
    mask = jnp.asarray(np.random.default_rng(1).integers(0, 2, (8, 8)),
                       jnp.int32).at[:, 0].set(1)
    variables = model.init(jax.random.PRNGKey(0), ids, mask)
    return cfg, model, variables, ids, mask


@pytest.mark.parametrize("n_stages,n_mb", [(4, 4), (2, 8)])
def test_bert_pipeline_parity(tiny_bert, n_stages, n_mb):
    cfg, model, variables, ids, mask = tiny_bert
    want = model.apply(variables, ids, mask)

    mesh = make_pipeline_mesh(n_stages)
    got = jax.jit(
        lambda v, i, m: bert_pipelined(v, cfg, i, m, mesh=mesh,
                                       n_microbatches=n_mb))(
                                           variables, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_apply_grads_flow(tiny_bert):
    """The schedule differentiates: grads through the ring match the
    sequential stack's grads (ppermute transposes cleanly)."""
    cfg, model, variables, ids, mask = tiny_bert
    mesh = make_pipeline_mesh(4)

    from lavt_rs_tpu.models.bert import BertLayer

    layer = BertLayer(cfg)
    stacked = stack_layer_params(variables["params"], "layer_",
                                 cfg.num_layers)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 8, 32)), jnp.float32)
    bias = jnp.zeros((8, 1, 1, 8), jnp.float32)

    def layer_fn(p, h, b):
        return layer.apply({"params": p}, h, b, deterministic=True)

    def loss_pp(stacked):
        y = pipeline_apply(layer_fn, stacked, x, bias, mesh=mesh,
                           n_microbatches=4)
        return (y ** 2).mean()

    def loss_seq(stacked):
        h = x
        for i in range(cfg.num_layers):
            h = layer_fn(jax.tree.map(lambda p: p[i], stacked), h, bias)
        return (h ** 2).mean()

    g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    g_seq = jax.jit(jax.grad(loss_seq))(stacked)
    flat_pp, _ = jax.flatten_util.ravel_pytree(g_pp)
    flat_seq, _ = jax.flatten_util.ravel_pytree(g_seq)
    np.testing.assert_allclose(np.asarray(flat_pp), np.asarray(flat_seq),
                               rtol=2e-4, atol=2e-5)
