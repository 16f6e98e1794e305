"""Golden parity of the VLT decoder's transformer pieces against the exact
torch modules the reference composes (lib/vlt.py:203-263 uses
nn.MultiheadAttention / nn.TransformerEncoderLayer / nn.TransformerDecoderLayer
directly), plus the interleaved positional encoding (vlt.py:203-222)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from lavt_rs_tpu.models.vlt import (  # noqa: E402
    MHA,
    TransformerDecoderLayer,
    TransformerEncoderLayer,
    positional_encoding,
)


def _mha_params(tm: tnn.MultiheadAttention, dim: int):
    w = tm.in_proj_weight.detach().numpy()
    b = tm.in_proj_bias.detach().numpy()
    wo = tm.out_proj.weight.detach().numpy()
    bo = tm.out_proj.bias.detach().numpy()
    return {
        "q_proj": {"kernel": w[:dim].T, "bias": b[:dim]},
        "k_proj": {"kernel": w[dim:2 * dim].T, "bias": b[dim:2 * dim]},
        "v_proj": {"kernel": w[2 * dim:].T, "bias": b[2 * dim:]},
        "out_proj": {"kernel": wo.T, "bias": bo},
    }


def _lin(tl):
    return {"kernel": tl.weight.detach().numpy().T,
            "bias": tl.bias.detach().numpy()}


def _ln(tl):
    return {"scale": tl.weight.detach().numpy(),
            "bias": tl.bias.detach().numpy()}


def test_positional_encoding_matches_torch_formula():
    import math

    n, d = 22, 64
    pe_t = torch.zeros(n, d)
    pos = torch.arange(0, n, dtype=torch.float).unsqueeze(1)
    div = torch.exp(torch.arange(0, d, 2).float() * (-math.log(10000.0) / d))
    pe_t[:, 0::2] = torch.sin(pos * div)
    pe_t[:, 1::2] = torch.cos(pos * div)
    np.testing.assert_allclose(positional_encoding(n, d), pe_t.numpy(),
                               rtol=1e-6, atol=1e-6)


def test_mha_matches_torch_multiheadattention(rng):
    dim, heads, b, lq, s = 32, 4, 2, 5, 7
    tm = tnn.MultiheadAttention(dim, heads)
    tm.eval()
    q = rng.standard_normal((b, lq, dim)).astype(np.float32)
    k = rng.standard_normal((b, s, dim)).astype(np.float32)
    pad = rng.random((b, s)) > 0.6
    pad[:, 0] = False  # at least one valid key
    with torch.no_grad():
        # torch MHA is seq-first: (L, B, D)
        want, _ = tm(torch.from_numpy(q).transpose(0, 1),
                     torch.from_numpy(k).transpose(0, 1),
                     torch.from_numpy(k).transpose(0, 1),
                     key_padding_mask=torch.from_numpy(pad))
    want = want.transpose(0, 1).numpy()

    m = MHA(dim, heads)
    got = m.apply({"params": _mha_params(tm, dim)}, jnp.asarray(q),
                  jnp.asarray(k), jnp.asarray(k),
                  key_padding_mask=jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def _enc_params(tl, dim):
    return {
        "self_attn": _mha_params(tl.self_attn, dim),
        "linear1": _lin(tl.linear1), "linear2": _lin(tl.linear2),
        "norm1": _ln(tl.norm1), "norm2": _ln(tl.norm2),
    }


def test_encoder_layer_matches_torch(rng):
    dim, heads, ff, b, n = 32, 4, 64, 2, 9
    tl = tnn.TransformerEncoderLayer(dim, heads, ff, dropout=0.0)
    tl.eval()
    x = rng.standard_normal((b, n, dim)).astype(np.float32)
    with torch.no_grad():
        want = tl(torch.from_numpy(x).transpose(0, 1)).transpose(0, 1).numpy()

    m = TransformerEncoderLayer(dim, heads, ff)
    got = m.apply({"params": _enc_params(tl, dim)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_decoder_layer_matches_torch(rng):
    dim, heads, ff, b, nq, ns = 32, 4, 64, 2, 6, 11
    tl = tnn.TransformerDecoderLayer(dim, heads, ff, dropout=0.0)
    tl.eval()
    tgt = rng.standard_normal((b, nq, dim)).astype(np.float32)
    mem = rng.standard_normal((b, ns, dim)).astype(np.float32)
    with torch.no_grad():
        want = tl(torch.from_numpy(tgt).transpose(0, 1),
                  torch.from_numpy(mem).transpose(0, 1)
                  ).transpose(0, 1).numpy()

    params = {
        "self_attn": _mha_params(tl.self_attn, dim),
        "cross_attn": _mha_params(tl.multihead_attn, dim),
        "linear1": _lin(tl.linear1), "linear2": _lin(tl.linear2),
        "norm1": _ln(tl.norm1), "norm2": _ln(tl.norm2),
        "norm3": _ln(tl.norm3),
    }
    m = TransformerDecoderLayer(dim, heads, ff)
    got = m.apply({"params": params}, jnp.asarray(tgt), jnp.asarray(mem))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
