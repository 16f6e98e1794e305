"""Golden parity tests: flax modules vs. independent torch oracles.

Weights are generated in torch, converted through the production converter
(lavt_rs_tpu.convert.torch2jax), and outputs compared — exercising both the
modules and the converter mappings.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from lavt_rs_tpu.config import AttnNorm
from lavt_rs_tpu.convert import torch2jax as cv
from lavt_rs_tpu.models.pwam import PWAM, SpatialImageLanguageAttention
from lavt_rs_tpu.models.swin2d import SwinBlock
from lavt_rs_tpu.models.decoder import SimpleDecoding

import torch_oracles as oracle


def _np(t):
    return t.detach().numpy()


def test_spatial_image_language_attention_parity(rng):
    torch.manual_seed(0)
    dim, l_in, heads, B, HW, NL = 32, 48, 4, 2, 25, 7
    om = oracle.SpatialImageLanguageAttentionOracle(dim, l_in, dim, dim, heads)
    om.eval()

    x = rng.standard_normal((B, HW, dim)).astype(np.float32)
    l = rng.standard_normal((B, NL, l_in)).astype(np.float32)
    mask = (rng.random((B, NL)) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0

    with torch.no_grad():
        want = _np(om(torch.from_numpy(x),
                      torch.from_numpy(l.transpose(0, 2, 1)),
                      torch.from_numpy(mask[:, :, None])))

    m = SpatialImageLanguageAttention(key_channels=dim, value_channels=dim,
                                      out_channels=dim, num_heads=heads)
    sd = {k: _np(v) for k, v in om.state_dict().items()}
    params = {
        "f_query": {"kernel": cv._lin(sd["f_query.0.weight"]),
                    "bias": sd["f_query.0.bias"]},
        "f_key": {"kernel": cv._lin(sd["f_key.0.weight"]),
                  "bias": sd["f_key.0.bias"]},
        "f_value": {"kernel": cv._lin(sd["f_value.0.weight"]),
                    "bias": sd["f_value.0.bias"]},
        "W": {"kernel": cv._lin(sd["W.0.weight"]), "bias": sd["W.0.bias"]},
    }
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x),
                             jnp.asarray(l), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pwam_parity(rng):
    torch.manual_seed(1)
    dim, l_in, B, HW, NL = 16, 24, 2, 36, 5
    om = oracle.PWAMOracle(dim, l_in, heads=2)
    om.eval()

    x = rng.standard_normal((B, HW, dim)).astype(np.float32)
    l = rng.standard_normal((B, NL, l_in)).astype(np.float32)
    mask = np.ones((B, NL), np.float32)
    mask[0, 3:] = 0.0

    with torch.no_grad():
        want = _np(om(torch.from_numpy(x),
                      torch.from_numpy(l.transpose(0, 2, 1)),
                      torch.from_numpy(mask[:, :, None])))

    sd = {f"fusion.{k}": _np(v) for k, v in om.state_dict().items()}
    tree: dict = {}
    # reuse the backbone converter's fusion mapping via a fake layer prefix
    sd = {f"layers.0.{k}": v for k, v in sd.items()}
    from lavt_rs_tpu.config import ModelConfig, SwinConfig
    params = {
        "vis_project": {"kernel": cv._lin(sd["layers.0.fusion.vis_project.0.weight"]),
                        "bias": sd["layers.0.fusion.vis_project.0.bias"]},
        "project_mm": {"kernel": cv._lin(sd["layers.0.fusion.project_mm.0.weight"]),
                       "bias": sd["layers.0.fusion.project_mm.0.bias"]},
        "image_lang_att": {
            s: {"kernel": cv._lin(sd[f"layers.0.fusion.image_lang_att.{s}.0.weight"]),
                "bias": sd[f"layers.0.fusion.image_lang_att.{s}.0.bias"]}
            for s in ("f_query", "f_key", "f_value", "W")},
    }
    m = PWAM(dim=dim, num_heads=2)
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x),
                             jnp.asarray(l), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _swin_block_params(om):
    sd = {k: _np(v) for k, v in om.state_dict().items()}
    return {
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
        "attn": {
            "relative_position_bias_table":
                sd["attn.relative_position_bias_table"],
            "qkv": {"kernel": cv._lin(sd["attn.qkv.weight"]),
                    "bias": sd["attn.qkv.bias"]},
            "proj": {"kernel": cv._lin(sd["attn.proj.weight"]),
                     "bias": sd["attn.proj.bias"]},
        },
        "mlp": {"fc1": {"kernel": cv._lin(sd["mlp.fc1.weight"]),
                        "bias": sd["mlp.fc1.bias"]},
                "fc2": {"kernel": cv._lin(sd["mlp.fc2.weight"]),
                        "bias": sd["mlp.fc2.bias"]}},
    }


def test_swin_block_parity_no_shift(rng):
    torch.manual_seed(2)
    dim, heads, ws, H, W, B = 32, 4, 7, 14, 14, 2
    om = oracle.SwinBlockOracle(dim, heads, ws, 0)
    om.eval()
    x = rng.standard_normal((B, H * W, dim)).astype(np.float32)
    with torch.no_grad():
        want = _np(om(torch.from_numpy(x), H, W))
    m = SwinBlock(dim=dim, num_heads=heads, window_size=ws, shift_size=0)
    got = np.asarray(m.apply({"params": _swin_block_params(om)},
                             jnp.asarray(x), (H, W)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_swin_block_parity_shifted_padded(rng):
    # H, W not divisible by window — exercises pad + roll + mask path.
    torch.manual_seed(3)
    dim, heads, ws, H, W, B = 16, 2, 7, 15, 10, 2
    om = oracle.SwinBlockOracle(dim, heads, ws, 3)
    om.eval()
    x = rng.standard_normal((B, H * W, dim)).astype(np.float32)
    with torch.no_grad():
        want = _np(om(torch.from_numpy(x), H, W))
    m = SwinBlock(dim=dim, num_heads=heads, window_size=ws, shift_size=3)
    got = np.asarray(m.apply({"params": _swin_block_params(om)},
                             jnp.asarray(x), (H, W)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_simple_decoding_parity(rng):
    torch.manual_seed(4)
    c4 = 64
    om = oracle.SimpleDecodingOracle(c4)
    om.eval()
    # put nontrivial running stats in the BN layers
    for mod in om.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)

    B = 2
    c1_feat = rng.standard_normal((B, 16, 16, c4 // 8)).astype(np.float32)
    c2_feat = rng.standard_normal((B, 8, 8, c4 // 4)).astype(np.float32)
    c3_feat = rng.standard_normal((B, 4, 4, c4 // 2)).astype(np.float32)
    c4_feat = rng.standard_normal((B, 2, 2, c4)).astype(np.float32)

    def t(x):
        return torch.from_numpy(x.transpose(0, 3, 1, 2))

    with torch.no_grad():
        want = _np(om(t(c4_feat), t(c3_feat), t(c2_feat), t(c1_feat)))
    want = want.transpose(0, 2, 3, 1)

    sd = {k: _np(v) for k, v in om.state_dict().items()}
    params, stats = cv.convert_simple_decoding(sd, prefix="")
    m = SimpleDecoding(c4_dims=c4)
    got = np.asarray(m.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(c4_feat), jnp.asarray(c3_feat),
                             jnp.asarray(c2_feat), jnp.asarray(c1_feat)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_language_gate_zero_init_is_identity(rng):
    from lavt_rs_tpu.models.pwam import LanguageGate, apply_gate
    from lavt_rs_tpu.config import GateKind

    m = LanguageGate(dim=8)
    mm = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), mm)
    g = m.apply(params, mm)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
    x = jnp.ones((2, 5, 8))
    np.testing.assert_array_equal(
        np.asarray(apply_gate(x, mm, g, GateKind.DEFAULT)), np.asarray(x))


# ---------------------------------------------------------------------------
# Fusion baselines: BCAM / GACD / EFN golden parity (reference lib/bcam.py)
# ---------------------------------------------------------------------------

def _lin_p(sd, tname):
    return {"kernel": cv._lin(sd[f"{tname}.weight"]),
            "bias": sd[f"{tname}.bias"]}


def test_bcam_parity(rng):
    from lavt_rs_tpu.models.fusion_baselines import BCAM

    torch.manual_seed(10)
    dim, l_in, B, HW, NL = 32, 48, 2, 36, 7
    om = oracle.BCAMOracle(dim, dim, l_in, HW)
    om.eval()

    x = rng.standard_normal((B, HW, dim)).astype(np.float32)
    l = rng.standard_normal((B, NL, l_in)).astype(np.float32)
    mask = (rng.random((B, NL)) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0

    with torch.no_grad():
        want = _np(om(torch.from_numpy(x),
                      torch.from_numpy(l.transpose(0, 2, 1)),
                      torch.from_numpy(mask[:, :, None])))

    sd = {k: _np(v) for k, v in om.state_dict().items()}
    params = {"lang_reduce": _lin_p(sd, "lang_reduce"),
              "out_1": _lin_p(sd, "out_1"),
              "vis_2_2": _lin_p(sd, "vis_2_2"),
              "a_proj": _lin_p(sd, "a_proj"),
              "out3_proj": _lin_p(sd, "out3_proj.0")}
    for i in (1, 2, 3, 4):
        params[f"vis_{i}"] = _lin_p(sd, f"vis_{i}.0")

    m = BCAM(dim=dim, hw=HW)
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x),
                             jnp.asarray(l), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gacd_parity(rng):
    from lavt_rs_tpu.models.fusion_baselines import GACD

    torch.manual_seed(11)
    dim, l_in, B, HW, NL = 16, 24, 2, 25, 5
    om = oracle.GACDOracle(dim, dim, l_in)
    om.eval()

    x = rng.standard_normal((B, HW, dim)).astype(np.float32)
    l = rng.standard_normal((B, NL, l_in)).astype(np.float32)
    mask = np.ones((B, NL), np.float32)
    mask[0, 3:] = 0.0

    with torch.no_grad():
        want = _np(om(torch.from_numpy(x),
                      torch.from_numpy(l.transpose(0, 2, 1)),
                      torch.from_numpy(mask[:, :, None])))

    sd = {k: _np(v) for k, v in om.state_dict().items()}
    params = {"lang_gen_fc1": _lin_p(sd, "lang_gen.0"),
              "lang_gen_fc2": _lin_p(sd, "lang_gen.2"),
              "mm_gen": _lin_p(sd, "mm_gen.0"),
              "query": _lin_p(sd, "query"),
              "key_c": _lin_p(sd, "key_c"),
              "key_d": _lin_p(sd, "key_d"),
              "value": _lin_p(sd, "value")}

    m = GACD(dim=dim)
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x),
                             jnp.asarray(l), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _efn_params(sd):
    def conv3(tname):
        return {"kernel": sd[f"{tname}.weight"].transpose(2, 1, 0),
                "bias": sd[f"{tname}.bias"]}

    return {"project": _lin_p(sd, "project.0"),
            "lang_project": _lin_p(sd, "lang_project.0"),
            "image_lang_att": {
                "f_query": _lin_p(sd, "image_lang_att.f_query.0"),
                "f_key": _lin_p(sd, "image_lang_att.f_key.0"),
                "W": conv3("image_lang_att.W.0")}}


def _efn_case(rng, seed, HW):
    from lavt_rs_tpu.models.fusion_baselines import EFN

    torch.manual_seed(seed)
    dim, l_in, B, NL = 16, 24, 2, 6
    om = oracle.EFNOracle(dim, dim, l_in)
    om.eval()

    x = rng.standard_normal((B, HW, dim)).astype(np.float32)
    l = rng.standard_normal((B, NL, l_in)).astype(np.float32)
    mask = (rng.random((B, NL)) > 0.2).astype(np.float32)
    mask[:, 0] = 1.0

    with torch.no_grad():
        want = _np(om(torch.from_numpy(x),
                      torch.from_numpy(l.transpose(0, 2, 1)),
                      torch.from_numpy(mask[:, :, None])))

    sd = {k: _np(v) for k, v in om.state_dict().items()}
    m = EFN(dim=dim)
    got = np.asarray(m.apply({"params": _efn_params(sd)}, jnp.asarray(x),
                             jnp.asarray(l), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_efn_parity_small(rng):
    # HW = 196 <= 225: full-resolution mutual attention, no pooling
    _efn_case(rng, 12, 14 * 14)


def test_efn_parity_pooled(rng):
    # HW = 256 > 225: exercises the avg-pool-2x + bilinear-upsample fallback
    # (reference bcam.py:239-245, 262-265 — the subtlest branch)
    _efn_case(rng, 13, 16 * 16)
