"""Pixel-Word Attention Module (PWAM) and language-gate fusion.

TPU-native reimplementation of the reference's signature fusion modules:
  * PWAM                           — reference lib/backbone.py:1238-1278
  * SpatialImageLanguageAttention  — reference lib/backbone.py:1281-1372
  * LangProject (--fuse simple)    — reference lib/backbone.py:1375-1402
  * language gate (res_gate)       — reference lib/backbone.py:604-623, 666-671

Layout conventions differ from the reference on purpose: visual tokens are
(B, L, C) and language features are (B, N_l, D_l) (the reference carries
language as (B, 768, N_l) to satisfy torch Conv1d).  All the reference's
1x1 Conv1d projections are Dense layers here — identical math, and XLA maps
them straight onto the MXU.

Padding-word masking reproduces the reference's exact trick:
`sim + (1e4 * mask - 1e4)` before softmax (lib/backbone.py:1360), so
converted checkpoints are numerically comparable.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import AttnNorm, FusionConfig, GateKind, LGAct
from ..ops.norm import instance_norm_tokens


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


class SpatialImageLanguageAttention(nn.Module):
    """Multi-head cross attention: visual queries over language keys/values.

    N_l is tiny (<= 22), so the score matrix (B, h, L, N_l) is a skinny
    matmul; XLA fuses the mask-add + softmax into the surrounding ops.
    """

    key_channels: int
    value_channels: int
    out_channels: int
    num_heads: int = 1
    att_norm: AttnNorm = AttnNorm.IN
    dtype: jnp.dtype = jnp.float32

    def _norm(self, x, name, train=False):
        # Norm applied on (B, L, C) tokens after the projection.
        if self.att_norm == AttnNorm.IN:
            return instance_norm_tokens(x)
        if self.att_norm == AttnNorm.LN:
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)(x)
        if self.att_norm == AttnNorm.BN:
            # BatchNorm1d over (B, L) per channel (reference
            # backbone.py:1296-1302); training uses batch stats (SyncBN
            # semantics under a sharded jit), eval the stored running stats.
            return nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                                momentum=0.9, dtype=self.dtype, name=name)(x)
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray, l: jnp.ndarray, l_mask: jnp.ndarray,
                 *, train: bool = False):
        """x: (B, L, C_v); l: (B, N_l, D_l); l_mask: (B, N_l) in {0,1}."""
        b, hw, _ = x.shape
        n_l = l.shape[1]
        h = self.num_heads
        kc, vc = self.key_channels, self.value_channels

        query = nn.Dense(kc, dtype=self.dtype, name="f_query")(x)
        query = self._norm(query, "f_query_norm", train)
        key = nn.Dense(kc, dtype=self.dtype, name="f_key")(l)
        value = nn.Dense(vc, dtype=self.dtype, name="f_value")(l)

        m = l_mask.astype(self.dtype)[:, :, None]  # (B, N_l, 1)
        key = key * m
        value = value * m

        q = query.reshape(b, hw, h, kc // h).transpose(0, 2, 1, 3)
        k = key.reshape(b, n_l, h, kc // h).transpose(0, 2, 1, 3)
        v = value.reshape(b, n_l, h, vc // h).transpose(0, 2, 1, 3)

        sim = jnp.einsum("bhld,bhnd->bhln", q, k,
                         preferred_element_type=jnp.float32)
        sim = sim * (kc ** -0.5)
        # Reference masking trick: +1e4*mask - 1e4 (lib/backbone.py:1360).
        mf = l_mask.astype(jnp.float32)[:, None, None, :]
        sim = sim + (1e4 * mf - 1e4)
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)

        out = jnp.einsum("bhln,bhnd->bhld", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, hw, vc)
        out = nn.Dense(self.out_channels, dtype=self.dtype, name="W")(out)
        out = self._norm(out, "W_norm", train)
        return out


class LangProject(nn.Module):
    """Masked mean-pool of language features -> 2-layer MLP -> (B, 1, C).

    The `--fuse simple` ablation (reference lib/backbone.py:1375-1402).
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask):
        m = l_mask.astype(jnp.float32)[:, :, None]  # (B, N_l, 1)
        pooled = (l.astype(jnp.float32) * m).sum(1) / m.sum(1)
        pooled = pooled.astype(self.dtype)
        y = nn.Dense(self.out_channels, dtype=self.dtype, name="fc1")(pooled)
        y = nn.relu(y)
        y = nn.Dense(self.out_channels, dtype=self.dtype, name="fc2")(y)
        return y[:, None, :]


class PWAM(nn.Module):
    """mm = project_mm( vis_project(x) * image_lang_att(x, l, l_mask) )."""

    dim: int
    num_heads: int = 1
    dropout: float = 0.0
    attention: bool = True  # False => LangProject ablation
    att_norm: AttnNorm = AttnNorm.IN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask, *, deterministic: bool = True):
        vis = nn.Dense(self.dim, dtype=self.dtype, name="vis_project")(x)
        vis = _gelu(vis)
        vis = nn.Dropout(self.dropout, deterministic=deterministic)(vis)

        if self.attention:
            lang = SpatialImageLanguageAttention(
                key_channels=self.dim, value_channels=self.dim,
                out_channels=self.dim, num_heads=self.num_heads,
                att_norm=self.att_norm, dtype=self.dtype,
                name="image_lang_att")(x, l, l_mask,
                                       train=not deterministic)
        else:
            lang = LangProject(out_channels=self.dim, dtype=self.dtype,
                               name="image_lang_att")(x, l, l_mask)

        mm = vis * lang  # broadcasts over L for the LangProject ablation
        mm = nn.Dense(self.dim, dtype=self.dtype, name="project_mm")(mm)
        mm = _gelu(mm)
        mm = nn.Dropout(self.dropout, deterministic=deterministic)(mm)
        return mm


class LanguageGate(nn.Module):
    """Zero-initialized tanh gate on the fusion residual.

    x_new = x + gate(mm) * mm, gate = Linear -> ReLU -> Linear -> tanh with
    both Linears bias-free and zero-initialized (reference
    lib/backbone.py:604-623): at init the fusion branch is exactly off.
    """

    dim: int
    act: LGAct = LGAct.TANH
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mm):
        g = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name="fc1")(mm)
        g = nn.relu(g)
        g = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name="fc2")(g)
        g = jnp.tanh(g) if self.act == LGAct.TANH else jax.nn.sigmoid(g)
        return g


def apply_gate(x, mm, gate_out, kind: GateKind):
    if kind == GateKind.DEFAULT:
        return x + gate_out * mm
    if kind == GateKind.NO_GATE:
        return x + mm
    return x  # GateKind.NONE: fusion output unused on the residual path
