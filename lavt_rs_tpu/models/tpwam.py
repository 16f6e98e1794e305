"""3D PWAM family for the video backbone.

Behavioral contract: reference lib/video_swin_transformer.py:1061-2089.
The published default is SepTPWAM (A2D recipe: kernel_t=3-3-3, kernel_s=1-1-1
with W and project_mm decomposed into temporal+spatial branches,
README.md:185).  All variants consume (B, D, H, W, C) visual features and
(B, N_l, D_l) language features and return (B, D*H*W, C).

TPU-native layout: NDHWC convs (flax nn.Conv handles 3D kernels natively);
the reference's 1x1 Conv1d projections become Dense; InstanceNorm3d
(affine=False) is instance_norm_nd over (D, H, W).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import BranchFuse, TPWAMConfig, TPWAMKind
from ..ops.norm import instance_norm_nd, instance_norm_tokens


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


class ConvGELU3D(nn.Module):
    """Conv3d + GELU (+Dropout) block, NDHWC."""

    features: int
    kernel: Tuple[int, int, int]
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Conv(self.features, self.kernel, padding="SAME",
                    dtype=self.dtype, name="conv")(x)
        x = _gelu(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


class ConvIN3D(nn.Module):
    """Conv3d + InstanceNorm3d(affine=False), NDHWC."""

    features: int
    kernel: Tuple[int, int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, padding="SAME",
                    dtype=self.dtype, name="conv")(x)
        return instance_norm_nd(x, axes=(1, 2, 3))


class SelfGate3D(nn.Module):
    """(1 + tanh-gate) self gate: x + g(x) * x, zero-init 1x1x1 convs
    (reference video_swin_transformer.py:1345-1360)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = nn.Conv(self.dim, (1, 1, 1), use_bias=False,
                    kernel_init=nn.initializers.zeros, dtype=self.dtype,
                    name="fc1")(x)
        g = nn.relu(g)
        g = nn.Conv(self.dim, (1, 1, 1), use_bias=False,
                    kernel_init=nn.initializers.zeros, dtype=self.dtype,
                    name="fc2")(g)
        return x + jnp.tanh(g) * x


def _lang_kv(l, l_mask, dim, dtype):
    """Shared language key/value projection with padding zeroing."""
    key = nn.Dense(dim, dtype=dtype, name="f_key")(l)
    value = nn.Dense(dim, dtype=dtype, name="f_value")(l)
    m = l_mask.astype(dtype)[:, :, None]
    return key * m, value * m


def _cross_attention(query, key, value, l_mask, num_heads, dim):
    """(B, THW, C) x (B, N_l, C) -> (B, THW, C) with the 1e4 mask trick."""
    b, thw, _ = query.shape
    n_l = key.shape[1]
    h = num_heads
    q = query.reshape(b, thw, h, dim // h).transpose(0, 2, 1, 3)
    k = key.reshape(b, n_l, h, dim // h).transpose(0, 2, 1, 3)
    v = value.reshape(b, n_l, h, dim // h).transpose(0, 2, 1, 3)
    sim = jnp.einsum("bhld,bhnd->bhln", q, k,
                     preferred_element_type=jnp.float32) * (dim ** -0.5)
    mf = l_mask.astype(jnp.float32)[:, None, None, :]
    sim = sim + (1e4 * mf - 1e4)
    attn = jax.nn.softmax(sim, axis=-1).astype(query.dtype)
    out = jnp.einsum("bhln,bhnd->bhld", attn, v,
                     preferred_element_type=jnp.float32).astype(query.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, thw, dim)


class SepTPWAM(nn.Module):
    """Decoupled temporal/spatial PWAM — the published video default
    (reference video_swin_transformer.py:1300-1584)."""

    dim: int
    num_heads: int = 1
    dropout: float = 0.0
    cfg: TPWAMConfig = TPWAMConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask, *, deterministic: bool = True):
        c = self.cfg
        b, d, h, w, ch = x.shape
        assert ch == self.dim

        # outer visual projection: temporal + spatial branches
        t_vis = ConvGELU3D(self.dim, c.kernel_t, self.dropout,
                           dtype=self.dtype, name="temporal_vis_project")(
                               x, deterministic=deterministic)
        s_vis = ConvGELU3D(self.dim, c.kernel_s, self.dropout,
                           dtype=self.dtype, name="spatial_vis_project")(
                               x, deterministic=deterministic)
        if c.self_gate:
            t_vis = SelfGate3D(self.dim, dtype=self.dtype, name="t_gate_v")(t_vis)
            s_vis = SelfGate3D(self.dim, dtype=self.dtype, name="s_gate_v")(s_vis)
        fuse_k = c.fuse_kernel or c.kernel_t
        if c.branch_fuse == BranchFuse.CAT:
            ts_vis = ConvGELU3D(self.dim, fuse_k, self.dropout,
                                dtype=self.dtype, name="vis_fuse")(
                jnp.concatenate([t_vis, s_vis], -1),
                deterministic=deterministic)
        else:
            ts_vis = t_vis + s_vis
            if c.branch_fuse == BranchFuse.SUM_CONV:
                ts_vis = ConvGELU3D(self.dim, fuse_k, self.dropout,
                                    dtype=self.dtype, name="vis_fuse")(
                                        ts_vis, deterministic=deterministic)

        # inner query: temporal + spatial conv branches with IN
        q_t = ConvIN3D(self.dim, c.kernel_t, dtype=self.dtype,
                       name="f_query_t")(x)
        q_s = ConvIN3D(self.dim, c.kernel_s, dtype=self.dtype,
                       name="f_query_s")(x)
        if c.self_gate:
            q_t = SelfGate3D(self.dim, dtype=self.dtype, name="t_gate_q")(q_t)
            q_s = SelfGate3D(self.dim, dtype=self.dtype, name="s_gate_q")(q_s)
        if c.branch_fuse == BranchFuse.CAT:
            query = ConvIN3D(self.dim, fuse_k, dtype=self.dtype,
                             name="f_fuse")(jnp.concatenate([q_t, q_s], -1))
        else:
            query = q_t + q_s
            if c.branch_fuse == BranchFuse.SUM_CONV:
                query = ConvIN3D(self.dim, fuse_k, dtype=self.dtype,
                                 name="f_fuse")(query)
        query = query.reshape(b, d * h * w, self.dim)

        key, value = _lang_kv(l, l_mask, self.dim, self.dtype)
        ts_lang = _cross_attention(query, key, value, l_mask,
                                   self.num_heads, self.dim)

        # out projection W: single-conv ablations > t/s decomposition >
        # Dense+IN (reference precedence, video_swin_transformer.py:1424)
        if c.w_single_conv:
            k = c.kernel_t if c.w_single_conv == "3x3" else (1, 3, 3)
            lang3d = ts_lang.reshape(b, d, h, w, self.dim)
            ts_lang = ConvIN3D(self.dim, k, dtype=self.dtype, name="W")(
                lang3d).reshape(b, d * h * w, self.dim)
        elif c.w_t3x3_s1x1:
            lang3d = ts_lang.reshape(b, d, h, w, self.dim)
            wt = ConvIN3D(self.dim, c.kernel_t, dtype=self.dtype,
                          name="W_t")(lang3d)
            ws_ = ConvIN3D(self.dim, (1, 1, 1), dtype=self.dtype,
                           name="W_s")(lang3d)
            ts_lang = (wt + ws_).reshape(b, d * h * w, self.dim)
        else:
            ts_lang = nn.Dense(self.dim, dtype=self.dtype, name="W")(ts_lang)
            ts_lang = instance_norm_tokens(ts_lang)

        mm = ts_vis.reshape(b, d * h * w, self.dim) * ts_lang

        if c.mm_single_conv:
            k = c.kernel_t if c.mm_single_conv == "3x3" else (1, 3, 3)
            mm = ConvGELU3D(self.dim, k, self.dropout, dtype=self.dtype,
                            name="project_mm")(
                mm.reshape(b, d, h, w, self.dim),
                deterministic=deterministic).reshape(b, d * h * w, self.dim)
        elif c.mm_t3x3_s1x1:
            mm3d = mm.reshape(b, d, h, w, self.dim)
            mt = ConvGELU3D(self.dim, c.kernel_t, self.dropout,
                            dtype=self.dtype, name="project_mm_t")(
                                mm3d, deterministic=deterministic)
            ms = ConvGELU3D(self.dim, (1, 1, 1), self.dropout,
                            dtype=self.dtype, name="project_mm_s")(
                                mm3d, deterministic=deterministic)
            mm = (mt + ms).reshape(b, d * h * w, self.dim)
        else:
            mm = nn.Dense(self.dim, dtype=self.dtype, name="project_mm")(mm)
            mm = _gelu(mm)
            mm = nn.Dropout(self.dropout, deterministic=deterministic)(mm)
        return mm


class SepTPWAMInner(nn.Module):
    """Inner-query-only decoupling (reference
    video_swin_transformer.py:1587-1694): the OUTER vis projection is a
    single 1x1x1 Conv3d (no temporal branch, lines 1602-1606); only the
    inner attention query gets parallel temporal (kernel_t) + spatial
    (kernel_s) ConvIN branches, summed.  W and project_mm are the plain
    token-wise Conv1d(+IN)/Conv1d+GELU pair."""

    dim: int
    num_heads: int = 1
    dropout: float = 0.0
    kernel_t: Tuple[int, int, int] = (3, 1, 1)
    kernel_s: Tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask, *, deterministic: bool = True):
        b, d, h, w, ch = x.shape
        vis = ConvGELU3D(self.dim, (1, 1, 1), self.dropout, dtype=self.dtype,
                         name="spatial_vis_project")(
                             x, deterministic=deterministic)

        q_t = ConvIN3D(self.dim, self.kernel_t, dtype=self.dtype,
                       name="f_query_t")(x)
        q_s = ConvIN3D(self.dim, self.kernel_s, dtype=self.dtype,
                       name="f_query_s")(x)
        query = (q_t + q_s).reshape(b, d * h * w, self.dim)

        key, value = _lang_kv(l, l_mask, self.dim, self.dtype)
        lang = _cross_attention(query, key, value, l_mask, self.num_heads,
                                self.dim)
        lang = nn.Dense(self.dim, dtype=self.dtype, name="W")(lang)
        lang = instance_norm_tokens(lang)
        mm = vis.reshape(b, d * h * w, self.dim) * lang
        mm = nn.Dense(self.dim, dtype=self.dtype, name="project_mm")(mm)
        mm = _gelu(mm)
        return nn.Dropout(self.dropout, deterministic=deterministic)(mm)


class SepSeqTPWAM(nn.Module):
    """Decoupled-sequential + parallel-spatial PWAM (reference
    video_swin_transformer.py:1822-1964; the `inner_only` flavor is
    SepSeqTPWAMInner, 1967-2089).

    The sequential branch runs a spatial conv with its OWN kernel
    (kernel_sq, reference --conv3d_kernel_size_sq) followed by the temporal
    conv (kernel_t); `residual` adds the P3D-C residual *within* that
    branch (--res).  A parallel plain spatial branch (kernel_s) is summed
    in.  With `inner_only`, the outer vis projection collapses to a single
    1x1x1 conv and only the query keeps the decoupled structure."""

    dim: int
    num_heads: int = 1
    dropout: float = 0.0
    kernel_t: Tuple[int, int, int] = (3, 1, 1)
    kernel_s: Tuple[int, int, int] = (1, 1, 1)
    kernel_sq: Tuple[int, int, int] = (1, 1, 1)
    residual: bool = False
    inner_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask, *, deterministic: bool = True):
        b, d, h, w, ch = x.shape
        if self.inner_only:
            vis = ConvGELU3D(self.dim, (1, 1, 1), self.dropout,
                             dtype=self.dtype, name="spatial_vis_project")(
                                 x, deterministic=deterministic)
        else:
            s_q = ConvGELU3D(self.dim, self.kernel_sq, self.dropout,
                             dtype=self.dtype,
                             name="spatial_vis_project_q")(
                                 x, deterministic=deterministic)
            t_q = ConvGELU3D(self.dim, self.kernel_t, self.dropout,
                             dtype=self.dtype,
                             name="temporal_vis_project_q")(
                                 s_q, deterministic=deterministic)
            if self.residual:
                t_q = s_q + t_q
            s_vis = ConvGELU3D(self.dim, self.kernel_s, self.dropout,
                               dtype=self.dtype,
                               name="spatial_vis_project")(
                                   x, deterministic=deterministic)
            vis = t_q + s_vis

        q_s_q = ConvIN3D(self.dim, self.kernel_sq, dtype=self.dtype,
                         name="f_query_s_q")(x)
        q_t = ConvIN3D(self.dim, self.kernel_t, dtype=self.dtype,
                       name="f_query_t_q")(q_s_q)
        if self.residual:
            q_t = q_s_q + q_t
        q_s = ConvIN3D(self.dim, self.kernel_s, dtype=self.dtype,
                       name="f_query_s")(x)
        query = (q_t + q_s).reshape(b, d * h * w, self.dim)

        key, value = _lang_kv(l, l_mask, self.dim, self.dtype)
        lang = _cross_attention(query, key, value, l_mask, self.num_heads,
                                self.dim)
        lang = nn.Dense(self.dim, dtype=self.dtype, name="W")(lang)
        lang = instance_norm_tokens(lang)
        mm = vis.reshape(b, d * h * w, self.dim) * lang
        mm = nn.Dense(self.dim, dtype=self.dtype, name="project_mm")(mm)
        mm = _gelu(mm)
        return nn.Dropout(self.dropout, deterministic=deterministic)(mm)


class TPWAM(nn.Module):
    """Single-branch 3D-conv PWAM (reference
    video_swin_transformer.py:1186-1236): PWAM with the outer vis projection
    and inner query as one Conv3d each."""

    dim: int
    num_heads: int = 1
    dropout: float = 0.0
    kernel: Tuple[int, int, int] = (3, 1, 1)
    all_conv3d: bool = False  # TPWAMComp: W/project_mm also Conv3d
    # per-part Conv3d kernel overrides (TSPWAM's --mm_3x3 temporal branch)
    w_conv: Optional[Tuple[int, int, int]] = None
    mm_conv: Optional[Tuple[int, int, int]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask, *, deterministic: bool = True):
        b, d, h, w, ch = x.shape
        w_conv = self.w_conv or (self.kernel if self.all_conv3d else None)
        mm_conv = self.mm_conv or (self.kernel if self.all_conv3d else None)
        vis = ConvGELU3D(self.dim, self.kernel, self.dropout,
                         dtype=self.dtype, name="vis_project")(
                             x, deterministic=deterministic)
        query = ConvIN3D(self.dim, self.kernel, dtype=self.dtype,
                         name="f_query")(x)
        query = query.reshape(b, d * h * w, self.dim)
        key, value = _lang_kv(l, l_mask, self.dim, self.dtype)
        lang = _cross_attention(query, key, value, l_mask, self.num_heads,
                                self.dim)
        if w_conv is not None:
            lang3d = lang.reshape(b, d, h, w, self.dim)
            lang = ConvIN3D(self.dim, w_conv, dtype=self.dtype,
                            name="W")(lang3d).reshape(b, d * h * w, self.dim)
        else:
            lang = nn.Dense(self.dim, dtype=self.dtype, name="W")(lang)
            lang = instance_norm_tokens(lang)
        mm = vis.reshape(b, d * h * w, self.dim) * lang
        if mm_conv is not None:
            mm3d = mm.reshape(b, d, h, w, self.dim)
            mm = ConvGELU3D(self.dim, mm_conv, self.dropout,
                            dtype=self.dtype, name="project_mm")(
                mm3d, deterministic=deterministic).reshape(
                    b, d * h * w, self.dim)
        else:
            mm = nn.Dense(self.dim, dtype=self.dtype, name="project_mm")(mm)
            mm = _gelu(mm)
            mm = nn.Dropout(self.dropout, deterministic=deterministic)(mm)
        return mm


class TSPWAM(nn.Module):
    """Two full parallel PWAMs — spatial (1x1, the plain 2D PWAM math) and
    temporal (Conv3d) — fused by concat+reduce (the reference default) or
    sum (--tspwam_sum); the reduce is a Linear, or a (1,3,3) Conv3d with
    --cat_reduce_3 (reference video_swin_transformer.py:1061-1183)."""

    dim: int
    num_heads: int = 1
    dropout: float = 0.0
    cfg: TPWAMConfig = TPWAMConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask, *, deterministic: bool = True):
        c = self.cfg
        b, d, h, w, _ = x.shape
        t = TPWAM(dim=self.dim, num_heads=self.num_heads,
                  dropout=self.dropout, kernel=c.kernel_t,
                  mm_conv=(c.kernel_t if c.mm_single_conv == "3x3"
                           else None),
                  dtype=self.dtype,
                  name="temporal")(x, l, l_mask, deterministic=deterministic)
        s = TPWAM(dim=self.dim, num_heads=self.num_heads,
                  dropout=self.dropout, kernel=(1, 1, 1), dtype=self.dtype,
                  name="spatial")(x, l, l_mask, deterministic=deterministic)
        if c.branch_fuse == BranchFuse.SUM:
            return t + s
        out = jnp.concatenate([s, t], axis=-1)  # (B, THW, 2C)
        if c.fuse_kernel is not None:  # --cat_reduce_3: (1,3,3) Conv3d
            out = ConvGELU3D(self.dim, c.fuse_kernel, self.dropout,
                             dtype=self.dtype, name="out_reduce")(
                out.reshape(b, d, h, w, 2 * self.dim),
                deterministic=deterministic)
            return out.reshape(b, d * h * w, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="out_reduce")(out)
        out = _gelu(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class SeqTPWAM(nn.Module):
    """P3D-A style sequential spatial->temporal PWAM with optional P3D-C
    residual (reference video_swin_transformer.py:1697-1819)."""

    dim: int
    num_heads: int = 1
    dropout: float = 0.0
    kernel_t: Tuple[int, int, int] = (3, 1, 1)
    kernel_s: Tuple[int, int, int] = (1, 3, 3)
    residual: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask, *, deterministic: bool = True):
        b, d, h, w, ch = x.shape
        s_vis = ConvGELU3D(self.dim, self.kernel_s, self.dropout,
                           dtype=self.dtype, name="spatial_vis_project")(
                               x, deterministic=deterministic)
        t_vis = ConvGELU3D(self.dim, self.kernel_t, self.dropout,
                           dtype=self.dtype, name="temporal_vis_project")(
                               s_vis, deterministic=deterministic)
        vis = t_vis + s_vis if self.residual else t_vis

        q_s = ConvIN3D(self.dim, self.kernel_s, dtype=self.dtype,
                       name="f_query_s")(x)
        q_t = ConvIN3D(self.dim, self.kernel_t, dtype=self.dtype,
                       name="f_query_t")(q_s)
        query = (q_t + q_s if self.residual else q_t).reshape(
            b, d * h * w, self.dim)

        key, value = _lang_kv(l, l_mask, self.dim, self.dtype)
        lang = _cross_attention(query, key, value, l_mask, self.num_heads,
                                self.dim)
        lang = nn.Dense(self.dim, dtype=self.dtype, name="W")(lang)
        lang = instance_norm_tokens(lang)
        mm = vis.reshape(b, d * h * w, self.dim) * lang
        mm = nn.Dense(self.dim, dtype=self.dtype, name="project_mm")(mm)
        mm = _gelu(mm)
        return nn.Dropout(self.dropout, deterministic=deterministic)(mm)


def build_tpwam(cfg: TPWAMConfig, dim: int, num_heads: int, dropout: float,
                dtype, name: str = "fusion") -> nn.Module:
    """Factory over the 3D-PWAM family (the reference's 8 boolean flags,
    SURVEY.md §2.1)."""
    k = cfg.kind
    if k == TPWAMKind.SEP:
        return SepTPWAM(dim=dim, num_heads=num_heads, dropout=dropout,
                        cfg=cfg, dtype=dtype, name=name)
    if k == TPWAMKind.SEP_INNER:
        return SepTPWAMInner(dim=dim, num_heads=num_heads, dropout=dropout,
                             kernel_t=cfg.kernel_t, kernel_s=cfg.kernel_s,
                             dtype=dtype, name=name)
    if k == TPWAMKind.T:
        return TPWAM(dim=dim, num_heads=num_heads, dropout=dropout,
                     kernel=cfg.kernel_t, dtype=dtype, name=name)
    if k == TPWAMKind.T_COMP:
        return TPWAM(dim=dim, num_heads=num_heads, dropout=dropout,
                     kernel=cfg.kernel_t, all_conv3d=True, dtype=dtype,
                     name=name)
    if k == TPWAMKind.TS:
        return TSPWAM(dim=dim, num_heads=num_heads, dropout=dropout,
                      cfg=cfg, dtype=dtype, name=name)
    if k == TPWAMKind.SEQ:
        return SeqTPWAM(dim=dim, num_heads=num_heads, dropout=dropout,
                        kernel_t=cfg.kernel_t, kernel_s=cfg.kernel_s,
                        residual=cfg.seq_residual, dtype=dtype, name=name)
    if k in (TPWAMKind.SEP_SEQ, TPWAMKind.SEP_SEQ_INNER):
        return SepSeqTPWAM(dim=dim, num_heads=num_heads, dropout=dropout,
                           kernel_t=cfg.kernel_t, kernel_s=cfg.kernel_s,
                           kernel_sq=cfg.kernel_sq,
                           residual=cfg.seq_residual,
                           inner_only=(k == TPWAMKind.SEP_SEQ_INNER),
                           dtype=dtype, name=name)
    raise ValueError(f"unknown 3D PWAM kind: {k}")
