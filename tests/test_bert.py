"""BERT encoder parity vs. Hugging Face transformers (torch, random init)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from lavt_rs_tpu.config import BertConfig
from lavt_rs_tpu.convert.torch2jax import convert_bert
from lavt_rs_tpu.models.bert import BertEncoder


@pytest.fixture(scope="module")
def small_cfg():
    return BertConfig(vocab_size=100, hidden_size=32, num_layers=3,
                      num_heads=4, intermediate_size=64,
                      max_position_embeddings=40)


def _hf_model(cfg: BertConfig):
    from transformers import BertConfig as HFConfig, BertModel

    hf = BertModel(HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager"))
    hf.eval()
    return hf


def test_bert_parity_with_padding(small_cfg, rng):
    torch.manual_seed(0)
    cfg = small_cfg
    hf = _hf_model(cfg)

    B, N = 3, 11
    ids = rng.integers(0, cfg.vocab_size, (B, N)).astype(np.int64)
    mask = np.ones((B, N), np.int64)
    mask[0, 7:] = 0
    mask[2, 4:] = 0

    with torch.no_grad():
        want = hf(torch.from_numpy(ids),
                  attention_mask=torch.from_numpy(mask)
                  ).last_hidden_state.numpy()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_bert(sd, cfg.num_layers)
    m = BertEncoder(cfg)
    got = np.asarray(m.apply({"params": params}, jnp.asarray(ids),
                             jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bert_max20_tokens_shape(small_cfg):
    """The LAVT tokenization contract: fixed max_tokens with 0-padding."""
    cfg = small_cfg
    m = BertEncoder(cfg)
    import jax

    ids = jnp.ones((2, 20), jnp.int32)
    mask = jnp.ones((2, 20), jnp.int32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), ids, mask)
    out = m.apply(v, ids, mask)
    assert out.shape == (2, 20, cfg.hidden_size)
