"""Alternative fusion baselines: BCAM, GACD, EFN.

Behavioral contract: reference lib/bcam.py
  * BCAM (BRINet bi-directional cross-attention) — bcam.py:7-72.  The
    reference hardcodes HW per stage dim for 480² inputs (bcam.py:11-18);
    here the relevance-map projection size is taken from the config the
    same way (it is a *learned* Linear to HW, so it is genuinely
    resolution-bound — a documented limitation inherited from BRINet).
  * GACD (GARAN collect-diffuse attention) — bcam.py:75-127.
  * EFN + EFNAttention (sentence-concat + mutual HW×HW attention with 2×
    avg-pool fallback when HW > 225) — bcam.py:160-269.

Layouts: x (B, HW, C); l (B, N_l, D_l); l_mask (B, N_l).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.norm import instance_norm_tokens


def _masked_meanpool(l, l_mask):
    m = l_mask.astype(jnp.float32)[:, :, None]
    return (l.astype(jnp.float32) * m).sum(1) / m.sum(1)


class BCAM(nn.Module):
    """Bi-directional cross-attention module (BRINet)."""

    dim: int
    hw: int  # stage H*W — learned relevance projection size
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask, *, deterministic: bool = True):
        dt = self.dtype
        l = nn.Dense(self.dim, dtype=dt, name="lang_reduce")(l)  # (B,N_l,dim)

        # VLAM: visual-to-language attention
        query = nn.relu(nn.Dense(self.dim, dtype=dt, name="vis_1")(x))
        sim = jnp.einsum("bld,bnd->bln", query, l,
                         preferred_element_type=jnp.float32)
        mf = l_mask.astype(jnp.float32)[:, None, :]
        sim = sim + (1e4 * mf - 1e4)
        attn = jax.nn.softmax(sim, axis=-1).astype(dt)
        out = jnp.einsum("bln,bnd->bld", attn, l,
                         preferred_element_type=jnp.float32).astype(dt)

        # LVAM: language-guided spatial relevance
        query2 = nn.relu(nn.Dense(self.dim, dtype=dt, name="vis_2")(x))
        a = jnp.tanh(nn.Dense(self.dim, dtype=dt, name="out_1")(out)
                     + nn.Dense(self.dim, dtype=dt, name="vis_2_2")(query2))
        a = nn.Dense(self.hw, dtype=dt, name="a_proj")(a)  # (B, HW, HW)
        rel = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(dt)
        query3 = nn.relu(nn.Dense(self.dim, dtype=dt, name="vis_3")(x))
        out2 = jnp.einsum("blm,bmd->bld", rel, query3,
                          preferred_element_type=jnp.float32).astype(dt)
        out3 = jnp.concatenate([out2, out], axis=-1)
        out3 = nn.relu(nn.Dense(self.dim, dtype=dt, name="out3_proj")(out3))
        query4 = nn.relu(nn.Dense(self.dim, dtype=dt, name="vis_4")(x))
        return out3 + query4


class GACD(nn.Module):
    """GARAN collect-diffuse attention."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask, *, deterministic: bool = True):
        dt = self.dtype
        # sentence vector -> 2-layer MLP (LangProject)
        pooled = _masked_meanpool(l, l_mask).astype(dt)
        s = nn.Dense(x.shape[-1], dtype=dt, name="lang_gen_fc1")(pooled)
        s = nn.relu(s)
        s = nn.Dense(x.shape[-1], dtype=dt, name="lang_gen_fc2")(s)
        s = s[:, None, :]  # (B, 1, C)

        x = s * x
        x = nn.relu(nn.Dense(self.dim, dtype=dt, name="mm_gen")(x))

        query = nn.Dense(self.dim, dtype=dt, name="query")(s)  # (B, 1, dim)
        key_c = nn.Dense(self.dim, dtype=dt, name="key_c")(x)
        key_d = nn.Dense(self.dim, dtype=dt, name="key_d")(x)
        value = nn.Dense(self.dim, dtype=dt, name="value")(x)

        scale = self.dim ** -0.5
        a_c = jnp.einsum("bqd,bld->bql", query, key_c,
                         preferred_element_type=jnp.float32) * scale
        a_c = jax.nn.softmax(a_c, axis=-1)
        a_d = jnp.einsum("bqd,bld->bql", query, key_d,
                         preferred_element_type=jnp.float32) * scale
        a_d = jax.nn.sigmoid(a_d)

        f_col = jnp.einsum("bql,bld->bqd", a_c.astype(dt), value,
                           preferred_element_type=jnp.float32).astype(dt)
        f_dif = jnp.einsum("bql,bqd->bld", a_d.astype(dt), f_col,
                           preferred_element_type=jnp.float32).astype(dt)
        return x + f_dif


class EFN(nn.Module):
    """Sentence-concat projection + mutual HW×HW attention."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask, *, deterministic: bool = True):
        dt = self.dtype
        b, hw, _ = x.shape

        sent = _masked_meanpool(l, l_mask).astype(dt)  # (B, D_l)
        sent = jnp.broadcast_to(sent[:, None, :], (b, hw, sent.shape[-1]))
        xc = jnp.concatenate([x, sent], axis=-1)
        m = nn.Dense(self.dim, dtype=dt, name="project")(xc)
        m = jax.nn.gelu(m, approximate=False)

        lang = nn.Dense(self.dim, dtype=dt, name="lang_project")(l)
        lang = jax.nn.gelu(lang, approximate=False)
        lang = lang * l_mask.astype(dt)[:, :, None]

        score = jnp.einsum("bld,bnd->bln", m, lang,
                           preferred_element_type=jnp.float32)
        score = score * (self.dim ** -0.5)
        mf = l_mask.astype(jnp.float32)[:, None, :]
        score = score + (1e4 * mf - 1e4)
        score = jax.nn.softmax(score, axis=-1).astype(dt)
        l_map = jnp.einsum("bln,bnd->bld", score, lang,
                           preferred_element_type=jnp.float32).astype(dt)

        return EFNAttention(dim=self.dim, dtype=dt,
                            name="image_lang_att")(m, l_map)


class EFNAttention(nn.Module):
    """Mutual HW×HW attention with a 2x avg-pool fallback above 225 tokens
    (reference bcam.py:231-269)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, m, l_map):
        dt = self.dtype
        b, hw, c = m.shape
        h = w = int(round(hw ** 0.5))

        m = nn.Dense(self.dim, dtype=dt, name="f_query")(m)
        m = instance_norm_tokens(m)
        l_map = nn.Dense(self.dim, dtype=dt, name="f_key")(l_map)
        l_map = instance_norm_tokens(l_map)

        pooled = hw > 225
        if pooled:
            def pool(t):
                t = t.reshape(b, h, w, c)
                t = t.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
                return t.reshape(b, hw // 4, c)

            m, l_map = pool(m), pool(l_map)

        sim = jnp.einsum("bld,bmd->blm", m, l_map,
                         preferred_element_type=jnp.float32)
        sim = sim * (self.dim ** -0.5)
        s1 = jax.nn.softmax(sim, axis=-1).astype(dt)
        s2 = jnp.swapaxes(jax.nn.softmax(sim, axis=-2), -1, -2).astype(dt)

        lp = jnp.einsum("blm,bmd->bld", s1, l_map,
                        preferred_element_type=jnp.float32).astype(dt)
        mp = jnp.einsum("blm,bmd->bld", s2, m,
                        preferred_element_type=jnp.float32).astype(dt)
        cat = jnp.concatenate([lp, mp], axis=-1)

        # W: Conv1d kernel 3 over the token axis + IN
        ph, pw = (h // 2, w // 2) if pooled else (h, w)
        out = nn.Conv(self.dim, (3,), padding="SAME", dtype=dt,
                      name="W")(cat)
        out = instance_norm_tokens(out)

        if pooled:
            from ..ops.resize import resize_2d

            out = out.reshape(b, ph, pw, self.dim)
            out = resize_2d(out, (h, w), method="bilinear",
                            align_corners=False)
            out = out.reshape(b, hw, self.dim)
        return out
