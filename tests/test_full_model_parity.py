"""Full-model golden parity: torch LAVT-one oracle -> converter -> flax.

The strongest offline correctness signal: a complete randomly-initialized
torch LAVT-one (BERT + 4-stage multimodal Swin + PWAM/LG + decoder + final
corner-aligned upsample) is converted with the production converter and must
match the JAX model's logits.
"""

import dataclasses

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from lavt_rs_tpu.config import BertConfig, FusionConfig, ModelConfig, SwinConfig
from lavt_rs_tpu.convert.torch2jax import convert_lavt_one
from lavt_rs_tpu.models.factory import build_model


@pytest.fixture(scope="module")
def pair():
    from transformers import BertConfig as HFConfig

    from torch_lavt import LAVTOneOracle

    torch.manual_seed(0)
    embed_dim, depths, heads, window = 48, (1, 1, 2, 1), (3, 6, 12, 24), 7
    hf_cfg = HFConfig(vocab_size=120, hidden_size=768, num_hidden_layers=1,
                      num_attention_heads=12, intermediate_size=256,
                      max_position_embeddings=64, hidden_act="gelu",
                      attn_implementation="eager")
    om = LAVTOneOracle(embed_dim, depths, heads, window, bert_cfg=hf_cfg)
    om.eval()

    cfg = ModelConfig(
        name="lavt_one",
        swin=SwinConfig(embed_dim=embed_dim, depths=depths, num_heads=heads,
                        window_size=window),
        bert=BertConfig(vocab_size=120, hidden_size=768, num_layers=1,
                        num_heads=12, intermediate_size=256,
                        max_position_embeddings=64),
        img_size=64, max_tokens=6)
    model = build_model(cfg)
    sd = {k: v.detach().numpy() for k, v in om.state_dict().items()}
    variables = convert_lavt_one(sd, cfg)
    variables = jax.tree.map(jnp.asarray, variables)
    return om, model, variables


def test_full_model_logit_parity(pair, rng):
    om, model, variables = pair
    img = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    ids = rng.integers(1, 120, (2, 6)).astype(np.int64)
    mask = np.ones((2, 6), np.int64)
    mask[0, 4:] = 0

    with torch.no_grad():
        want = om(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                  torch.from_numpy(ids),
                  torch.from_numpy(mask)).numpy().transpose(0, 2, 3, 1)

    got = np.asarray(model.apply(variables, jnp.asarray(img),
                                 jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)
    # masks must agree exactly where logit margin is non-trivial
    margin = np.abs(want[..., 1] - want[..., 0])
    agree = (got.argmax(-1) == want.argmax(-1)) | (margin < 1e-3)
    assert agree.mean() > 0.9999


def test_converted_gate_zero_means_identity_residual(pair):
    """Converted zero-init res_gate keeps the fusion residual off."""
    om, model, variables = pair
    g = variables["params"]["backbone"]["layers_0"]["res_gate"]
    assert float(np.abs(np.asarray(g["fc1"]["kernel"])).max()) == 0.0
