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


@pytest.mark.slow
def test_headline_config_full_size_parity(rng):
    """Golden parity at the PUBLISHED config: Swin-B / window 12 / 480² /
    12-layer BERT-base, through the production converter — including the
    7->12 relative-position-bias bicubic (reference checkpoint.py:340-356)
    and the window12 path (reference segmentation.py:35-39).

    Flow mirrors the reference's pretrained load: a window-7 Swin-B
    state dict (the ImageNet-checkpoint shape) feeds the converter, which
    bicubic-resizes every rel-pos table to window 12; the torch oracle is
    rebuilt at window 12 with the SAME reference-style interpolation
    applied to its tables, and full-size logits must agree. The 64px toy
    above never touches stage-4 C=1024 head-group routing, real padding
    (15->24 at stage 4), or the at-size error accumulation."""
    import torch.nn.functional as F
    from transformers import BertConfig as HFConfig

    from torch_lavt import LAVTOneOracle

    torch.manual_seed(0)
    embed_dim, depths, heads = 128, (2, 2, 18, 2), (4, 8, 16, 32)
    hf_cfg = HFConfig(vocab_size=2000, attn_implementation="eager",
                      hidden_act="gelu")  # 12 layers, hidden 768 (defaults)

    # the "checkpoint": window-7 tables, every other param final
    om7 = LAVTOneOracle(embed_dim, depths, heads, window=7, bert_cfg=hf_cfg)
    om7.eval()
    sd7 = {k: v.detach().numpy() for k, v in om7.state_dict().items()}

    # torch target: window-12 oracle with the reference's own surgery —
    # copy all params, bicubic-resize the (169, h) tables to (529, h)
    # (checkpoint.py:340-356: permute -> F.interpolate(bicubic) -> back)
    om12 = LAVTOneOracle(embed_dim, depths, heads, window=12,
                         bert_cfg=hf_cfg)
    om12.eval()
    sd12 = om12.state_dict()
    for k, v in om7.state_dict().items():
        if k.endswith("relative_position_bias_table"):
            s1, nh = v.shape
            side = int(s1 ** 0.5)
            t = v.permute(1, 0).view(1, nh, side, side)
            t = F.interpolate(t, size=(23, 23), mode="bicubic")
            sd12[k] = t.view(nh, 23 * 23).permute(1, 0).contiguous()
        elif "relative_position_index" in k or "attn_mask" in k:
            continue  # geometry buffers stay the window-12 ones
        else:
            sd12[k] = v
    om12.load_state_dict(sd12, strict=False)
    om12.eval()

    cfg = ModelConfig(
        name="lavt_one",
        swin=SwinConfig(embed_dim=embed_dim, depths=depths,
                        num_heads=heads, window_size=12),
        bert=BertConfig(vocab_size=2000),
        img_size=480, max_tokens=20)
    model = build_model(cfg)
    variables = jax.tree.map(jnp.asarray, convert_lavt_one(sd7, cfg))

    img = rng.standard_normal((1, 480, 480, 3)).astype(np.float32)
    ids = rng.integers(1, 2000, (1, 20)).astype(np.int64)
    mask = np.ones((1, 20), np.int64)
    mask[0, 13:] = 0

    with torch.no_grad():
        want = om12(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                    torch.from_numpy(ids),
                    torch.from_numpy(mask)).numpy().transpose(0, 2, 3, 1)

    got = np.asarray(jax.jit(lambda v, *a: model.apply(v, *a))(
        variables, jnp.asarray(img), jnp.asarray(ids), jnp.asarray(mask)))
    # 22 Swin blocks + 12 BERT layers at 480² accumulate more float error
    # than the 64px toy; the mask-agreement check is the operative bound
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-3)
    margin = np.abs(want[..., 1] - want[..., 0])
    agree = (got.argmax(-1) == want.argmax(-1)) | (margin < 1e-3)
    assert agree.mean() > 0.9999
