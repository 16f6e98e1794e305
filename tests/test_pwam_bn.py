"""BN att_norm variant of PWAM's cross-attention (--att_norm_layer_type bn,
reference lib/backbone.py:1296-1302): train-mode batch stats + running-stat
updates vs a torch oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from lavt_rs_tpu.config import AttnNorm  # noqa: E402
from lavt_rs_tpu.models.pwam import SpatialImageLanguageAttention  # noqa: E402


class _SILABNOracle(tnn.Module):
    """Reference-style cross attention with BatchNorm1d norms."""

    def __init__(self, v_in, l_in, c, heads):
        super().__init__()
        self.c, self.heads = c, heads
        self.f_query = tnn.Sequential(tnn.Conv1d(v_in, c, 1),
                                      tnn.BatchNorm1d(c))
        self.f_key = tnn.Conv1d(l_in, c, 1)
        self.f_value = tnn.Conv1d(l_in, c, 1)
        self.W = tnn.Sequential(tnn.Conv1d(c, c, 1), tnn.BatchNorm1d(c))

    def forward(self, x, l, l_mask):
        B, HW = x.size(0), x.size(1)
        q = self.f_query(x.permute(0, 2, 1)).permute(0, 2, 1)
        m = l_mask.unsqueeze(1)  # (B, 1, N_l)
        k = self.f_key(l) * m
        v = self.f_value(l) * m
        n_l = l.size(-1)
        h = self.heads
        q = q.reshape(B, HW, h, self.c // h).permute(0, 2, 1, 3)
        k = k.reshape(B, h, self.c // h, n_l)
        v = v.reshape(B, h, self.c // h, n_l)
        sim = torch.matmul(q, k) * (self.c ** -0.5)
        sim = sim + (1e4 * m.unsqueeze(1) - 1e4)
        sim = torch.softmax(sim, dim=-1)
        out = torch.matmul(sim, v.permute(0, 1, 3, 2))
        out = out.permute(0, 2, 1, 3).reshape(B, HW, self.c)
        return self.W(out.permute(0, 2, 1)).permute(0, 2, 1)


def _conv1d(m):
    return {"kernel": m.weight.detach().numpy()[:, :, 0].T,
            "bias": m.bias.detach().numpy()}


def _bn(m):
    # .copy(): torch's in-place running-stat updates would otherwise leak
    # into these views when the oracle runs in train mode
    return ({"scale": m.weight.detach().numpy().copy(),
             "bias": m.bias.detach().numpy().copy()},
            {"mean": m.running_mean.detach().numpy().copy(),
             "var": m.running_var.detach().numpy().copy()})


def test_sila_bn_train_parity(rng):
    b, hw, c, n_l, l_in, h = 2, 64, 32, 6, 48, 2
    t = _SILABNOracle(c, l_in, c, h)
    # non-trivial BN affine + running stats
    with torch.no_grad():
        for bn in (t.f_query[1], t.W[1]):
            bn.weight.copy_(torch.rand(c) + 0.5)
            bn.bias.copy_(torch.randn(c) * 0.1)
            bn.running_mean.copy_(torch.randn(c) * 0.1)
            bn.running_var.copy_(torch.rand(c) + 0.5)

    x = rng.standard_normal((b, hw, c)).astype(np.float32)
    l = rng.standard_normal((b, l_in, n_l)).astype(np.float32)
    lm = np.ones((b, n_l), np.float32)
    lm[:, -2:] = 0.0

    qn, qs = _bn(t.f_query[1])
    wn, wss = _bn(t.W[1])
    variables = {
        "params": {
            "f_query": _conv1d(t.f_query[0]), "f_key": _conv1d(t.f_key),
            "f_value": _conv1d(t.f_value), "W": _conv1d(t.W[0]),
            "f_query_norm": qn, "W_norm": wn,
        },
        "batch_stats": {"f_query_norm": qs, "W_norm": wss},
    }
    m = SpatialImageLanguageAttention(
        key_channels=c, value_channels=c, out_channels=c, num_heads=h,
        att_norm=AttnNorm.BN)

    # --- train mode: batch-stat normalization + running-stat update
    t.train()
    want = t(torch.from_numpy(x), torch.from_numpy(l),
             torch.from_numpy(lm)).detach().numpy()
    got, updated = m.apply(variables, jnp.asarray(x),
                           jnp.asarray(l).transpose(0, 2, 1),
                           jnp.asarray(lm), train=True,
                           mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)

    # running means update identically; torch stores Bessel-corrected
    # running VAR (n/(n-1)) while flax stores the biased batch var — a
    # documented deviation, bounded by 1/(n-1)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["f_query_norm"]["mean"]),
        t.f_query[1].running_mean.detach().numpy(), rtol=1e-4, atol=1e-5)
    n = b * hw
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["f_query_norm"]["var"]),
        t.f_query[1].running_var.detach().numpy(),
        rtol=2.0 / (n - 1), atol=1e-4)

    # --- eval mode with each side's own updated stats stays close
    t.eval()
    want_e = t(torch.from_numpy(x), torch.from_numpy(l),
               torch.from_numpy(lm)).detach().numpy()
    got_e = m.apply({"params": variables["params"],
                     "batch_stats": updated["batch_stats"]},
                    jnp.asarray(x), jnp.asarray(l).transpose(0, 2, 1),
                    jnp.asarray(lm), train=False)
    np.testing.assert_allclose(np.asarray(got_e), want_e, rtol=0.02,
                               atol=0.02)
