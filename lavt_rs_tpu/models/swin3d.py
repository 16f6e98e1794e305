"""Multimodal Video Swin Transformer (3D) — the LAVT video backbone.

Behavioral contract: reference lib/video_swin_transformer.py
  * WindowAttention3D          — :86-168 (bias index sliced [:N, :N] for
    truncated windows — reproduced exactly)
  * SwinTransformerBlock3D     — :171-273 (window/shift clamped per input
    dims via get_window_size)
  * PatchEmbed3D / PatchMerging (spatial-only 2x2) — :276-311, 594-634
  * MMBasicLayer (3D)          — :331-591 (LG skipped on last stage when
    use_checkpoint — reproduced; stage output is the PWAM residual)
  * MultiModalSwinTransformer3D — :637-886 (outputs (B*T, Hi, Wi, Ci))

TPU-first: NDHWC layout, trace-time numpy shift masks (the reference
lru_caches torch masks per shape), static padding, remat per block.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import FusionConfig, FusionKind, GateKind, StageOutput, SwinConfig, TPWAMConfig, TPWAMKind
from ..ops.attention import window_attention
from ..ops.window import (
    get_window_size_3d,
    relative_bias_from_table_3d,
    shift_mask_3d,
    window_partition_3d,
    window_reverse_3d,
)
from .pwam import PWAM, LanguageGate, apply_gate
from .swin2d import Mlp, drop_path, trunc_normal_init
from .tpwam import build_tpwam


class WindowAttention3D(nn.Module):
    """3D W-MSA with relative position bias over (Wd, Wh, Ww) windows.

    `window_size` is the *configured* window; when the actual window is
    clamped to smaller input dims, the bias index is sliced [:N, :N] like
    the reference (video_swin_transformer.py:150).
    """

    dim: int
    window_size: Tuple[int, int, int]  # configured (table size)
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True,
                 groups: Optional[int] = None, n_real: Optional[int] = None):
        """x: (B, nW, N, C) where N = prod(actual window).

        groups/n_real: the GROUPED fused route (see SwinBlock3D) — x is
        then the sublane-padded (B, nW, n_p, C) stream with windows
        permuted unmasked-first, `groups` the unmasked-prefix length,
        `mask` the (nW-groups, n_p, n_p) small mask, and `n_real` the
        true token count (bias is built at n_real and sublane-padded)."""
        b, nw, n, c = x.shape
        h = self.num_heads
        if groups is not None:
            n = n_real  # bias/table fold run at the REAL window size
        wd, wh, ww = self.window_size
        table = self.param(
            "relative_position_bias_table", trunc_normal_init,
            ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), h), jnp.float32)
        # gather forward / separable one-hot backward (the scatter-add
        # transpose of the gather is very slow on TPU).  Inference folding
        # as in the 2D module; the shape guard covers a fold taken at a
        # different clamped window (n differs per input dims).
        if (self.has_variable("folded", "rel_pos_bias")
                and self.get_variable("folded", "rel_pos_bias").shape[1] == n):
            bias = self.get_variable("folded", "rel_pos_bias")
        else:
            bias = relative_bias_from_table_3d(table, wd, wh, ww, n)
            if self.is_mutable_collection("folded"):
                self.put_variable("folded", "rel_pos_bias", bias)

        scale = self.qk_scale if self.qk_scale is not None else (c // h) ** -0.5

        # Video keeps the XLA-composable path by default.  The sublane-
        # PADDED fused MSA kernel (392 -> 400, 1.04x FLOP tax) wins
        # 1.6-4.5x per block at every A2D Swin-T stage in ISOLATION
        # (tools/bench_msa_video.py), but the full-model A/B on v5e
        # (tools/bench_fused_bisect.py) regressed e2e: 44 ms/clip XLA vs
        # 76.7 ms all-stages-routed and 55-72 ms per-stage — layout
        # copies and mask materialization around the kernel outweigh the
        # kernel win, same as round 2's unpadded attempt (161 -> 228 ms
        # train).  LAVT_FUSED_PADDED=<widths|all> is the A/B hatch that
        # takes this branch.  Window (8,12,12)'s n=1152 busts the VMEM
        # gates either way (support-gated inside window_attention).
        from ..ops.pallas.fused_msa import fused_msa_padded_routed

        if groups is not None:
            # GROUPED fused route (see SwinBlock3D + fused3d_grouped_routed):
            # x arrives sublane-padded and unmasked-first; run the big
            # unmasked prefix maskless and the boundary windows with the
            # small mask — the only mask that ever materializes.
            from ..ops.pallas.fused_msa import (fused_window_msa,
                                                pad_bias_sublane)
            from .swin2d import _DenseParams

            wqkv, bqkv = _DenseParams(3 * c, c, self.qkv_bias, name="qkv")()
            wproj, bproj = _DenseParams(c, c, True, name="proj")()
            n_p = x.shape[2]
            bias_p = pad_bias_sublane(bias, n_p)
            outs = []
            if groups > 0:
                outs.append(fused_window_msa(
                    x[:, :groups], wqkv, bqkv, wproj, bproj, bias_p, None,
                    h, float(scale)))
            if groups < nw:
                outs.append(fused_window_msa(
                    x[:, groups:], wqkv, bqkv, wproj, bproj, bias_p, mask,
                    h, float(scale)))
            return outs[0] if len(outs) == 1 else jnp.concatenate(
                outs, axis=1)

        if (self.use_pallas
                and fused_msa_padded_routed(nw, n, c, h,
                                            jnp.dtype(self.dtype).itemsize)):
            from ..ops.pallas.fused_msa import fused_window_msa_padded
            from .swin2d import _DenseParams

            wqkv, bqkv = _DenseParams(3 * c, c, self.qkv_bias, name="qkv")()
            wproj, bproj = _DenseParams(c, c, True, name="proj")()
            return fused_window_msa_padded(x, wqkv, bqkv, wproj, bproj,
                                           bias, mask, h, float(scale))

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b, nw, n, 3, h, c // h)
        q, k, v = (qkv[..., i, :, :].transpose(0, 1, 3, 2, 4) for i in range(3))
        out = window_attention(q, k, v, bias, mask=mask, scale=scale,
                               use_pallas=self.use_pallas)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, nw, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock3D(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 7, 7)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    drop_path_rate: float = 0.0
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, D, H, W, C) with static dims."""
        b, d, h, w, c = x.shape
        ws, ss = get_window_size_3d((d, h, w), self.window_size,
                                    self.shift_size)

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)

        pad_d = (ws[0] - d % ws[0]) % ws[0]
        pad_b = (ws[1] - h % ws[1]) % ws[1]
        pad_r = (ws[2] - w % ws[2]) % ws[2]
        dp, hp, wp = d + pad_d, h + pad_b, w + pad_r
        nw = (dp // ws[0]) * (hp // ws[1]) * (wp // ws[2])
        n = ws[0] * ws[1] * ws[2]

        from ..ops.pallas.fused_msa import (_sublane_pad,
                                            fused3d_grouped_routed)

        attn = WindowAttention3D(
            dim=c, window_size=self.window_size, num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            use_pallas=self.use_pallas, dtype=self.dtype, name="attn")

        import os as _os

        if (self.use_pallas
                and (deterministic
                     or _os.environ.get("LAVT_FUSED3D_TRAIN") == "1")
                and fused3d_grouped_routed(
                    nw, n, c, self.num_heads,
                    jnp.dtype(self.dtype).itemsize)):
            # GROUPED fused route: pad + shift + partition + sublane
            # token-pad as ONE gather with windows permuted
            # unmasked-first (ops/window.py), so the kernel runs
            # maskless on the interior and with a boundary-windows-only
            # mask — never materializing the full (nW, N, N) mask
            # (~200 MB at 480² clips) nor the padded/rolled copies.
            from ..ops.window import (partition_3d_groups,
                                      partition_shifted_padded_3d,
                                      reverse_shifted_unpadded_3d)

            n_p = _sublane_pad(n, jnp.dtype(self.dtype).itemsize)
            nu, mask_small = partition_3d_groups(d, h, w, dp, hp, wp, ws,
                                                 ss, n_p)
            yw = partition_shifted_padded_3d(y, ws, ss, dp, hp, wp, n_p)
            yw = attn(yw, mask=mask_small, deterministic=deterministic,
                      groups=nu, n_real=n)
            y = reverse_shifted_unpadded_3d(yw, ws, ss, dp, hp, wp,
                                            d, h, w, n_p)
        else:
            if pad_d or pad_b or pad_r:
                y = jnp.pad(y, ((0, 0), (0, pad_d), (0, pad_b),
                                (0, pad_r), (0, 0)))
            if any(ss):
                y = jnp.roll(y, shift=(-ss[0], -ss[1], -ss[2]),
                             axis=(1, 2, 3))
            mask = shift_mask_3d(dp, hp, wp, ws, ss)

            yw = window_partition_3d(y, ws).reshape(b, nw, n, c)
            yw = attn(yw, mask=mask, deterministic=deterministic)
            y = window_reverse_3d(yw.reshape(b * nw, n, c), ws, dp, hp, wp)

            if any(ss):
                y = jnp.roll(y, shift=ss, axis=(1, 2, 3))
            if pad_d or pad_b or pad_r:
                y = y[:, :d, :h, :w, :]

        rng = self.make_rng("dropout") if (
            not deterministic and self.drop_path_rate > 0) else None
        x = shortcut + drop_path(y, self.drop_path_rate, deterministic, rng)

        # NOTE: the fused LN2+MLP tail (swin2d.SwinBlock) is NOT used in
        # 3D: measured end-to-end on v5e it LOSES at video geometries
        # (Swin-T clips: 118.6 vs 99.7 ms/clip with only the stage-3
        # c=384 tail active) — the 2D win comes from Swin-B's larger
        # token counts and 128-multiple channels.
        z = Mlp(hidden=int(c * self.mlp_ratio), out=c, drop=self.drop,
                dtype=self.dtype, name="mlp")(
                    nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name="norm2")(x),
                    deterministic=deterministic)
        rng = self.make_rng("dropout") if (
            not deterministic and self.drop_path_rate > 0) else None
        return x + drop_path(z, self.drop_path_rate, deterministic, rng)


class PatchEmbed3D(nn.Module):
    """Conv3d patchifier, kernel == stride == patch (e.g. (1, 4, 4))."""

    embed_dim: int = 96
    patch_size: Tuple[int, int, int] = (1, 4, 4)
    patch_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, D, H, W, 3) -> (B, D', H', W', C)."""
        pd, ph, pw = self.patch_size
        d, h, w = x.shape[1:4]
        pads = [(0, (p - s % p) % p) for p, s in ((pd, d), (ph, h), (pw, w))]
        if any(p[1] for p in pads):
            x = jnp.pad(x, ((0, 0), *pads, (0, 0)))
        # Space-to-depth + matmul instead of conv3d, for the same reason
        # as the 2D PatchEmbed (Cin=3 starves the MXU; see swin2d.py).
        # Param tree identical to nn.Conv (proj/kernel (pd,ph,pw,Cin,C)).
        b = x.shape[0]
        dd, hh, ww, cin = x.shape[1] // pd, x.shape[2] // ph, \
            x.shape[3] // pw, x.shape[4]
        from .swin2d import _ConvParams
        kernel, bias = _ConvParams(self.embed_dim, self.patch_size, cin,
                                   name="proj")()
        xd = x.astype(self.dtype).reshape(b, dd, pd, hh, ph, ww, pw, cin)
        xd = xd.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, dd, hh, ww, pd * ph * pw * cin)
        x = (jnp.dot(xd, kernel.reshape(pd * ph * pw * cin,
                                        self.embed_dim).astype(self.dtype))
             + bias.astype(self.dtype))
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


class PatchMerging3D(nn.Module):
    """Spatial-only 2x2 merge; the temporal dim is untouched
    (reference video_swin_transformer.py:276-311)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, :, 0::2, 0::2, :]
        x1 = x[:, :, 1::2, 0::2, :]
        x2 = x[:, :, 0::2, 1::2, :]
        x3 = x[:, :, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class MMBasicLayer3D(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int]
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    drop: float
    drop_path_rates: Tuple[float, ...]
    has_downsample: bool
    fusion: FusionConfig
    fusion_heads: int
    tpwam: TPWAMConfig
    is_last_layer: bool = False
    use_checkpoint: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask, *, deterministic: bool = True):
        """x: (B, D, H, W, C) -> (x_out (B,D,H,W,C), x_next)."""
        b, d, h, w, c = x.shape
        shift = tuple(s // 2 for s in self.window_size)

        block_cls = SwinBlock3D
        if self.use_checkpoint:
            block_cls = nn.remat(SwinBlock3D, static_argnums=(2,))
        for i in range(self.depth):
            x = block_cls(
                dim=self.dim, num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=(0, 0, 0) if i % 2 == 0 else shift,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, drop=self.drop,
                drop_path_rate=self.drop_path_rates[i],
                use_pallas=self.use_pallas, dtype=self.dtype,
                name=f"blocks_{i}")(x, deterministic)

        x_pre_fusion = x

        # fusion
        if self.tpwam.kind == TPWAMKind.PWAM2D:
            flat = x.reshape(b, d * h * w, c)
            mm = PWAM(dim=self.dim, num_heads=self.fusion_heads,
                      dropout=self.fusion.dropout,
                      attention=self.fusion.kind != FusionKind.SIMPLE,
                      att_norm=self.fusion.att_norm, dtype=self.dtype,
                      name="fusion")(flat, l, l_mask,
                                     deterministic=deterministic)
        else:
            mm = build_tpwam(self.tpwam, self.dim, self.fusion_heads,
                             self.fusion.dropout, self.dtype,
                             name="fusion")(x, l, l_mask,
                                            deterministic=deterministic)
        # mm: (B, DHW, C)
        flat = x.reshape(b, d * h * w, c)
        skip_gate = self.is_last_layer and self.use_checkpoint
        if self.fusion.gate == GateKind.DEFAULT and not skip_gate:
            gate_out = LanguageGate(dim=self.dim, act=self.fusion.lg_act,
                                    dtype=self.dtype, name="res_gate")(mm)
            flat = flat + gate_out * mm
        elif self.fusion.gate == GateKind.NO_GATE:
            flat = flat + mm

        if self.fusion.stage_output == StageOutput.RESIDUAL:
            x_out = mm.reshape(b, d, h, w, c)
        elif self.fusion.stage_output == StageOutput.HIDDEN:
            x_out = flat.reshape(b, d, h, w, c)
        else:
            x_out = x_pre_fusion

        x = flat.reshape(b, d, h, w, c)
        if self.has_downsample:
            x = PatchMerging3D(dim=self.dim, dtype=self.dtype,
                               name="downsample")(x)
        return x_out, x


class Hybrid2D3DLayer(nn.Module):
    """2D Swin blocks per frame + 3D PWAM fusion across frames.

    Behavioral contract: reference lib/backbone.py:708-992
    (MMBasicLayer_2d_swin_3d_pwam, the --ytvos_2d_swin_3d_pwam path):
    spatial windowed attention runs on (B*T, HW, C) folded frames; the
    SepTPWAM fusion and LG gate see the full (B, T, H, W, C) clip.
    """

    dim: int
    depth: int
    num_heads: int
    window_size: int  # 2D window
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    drop: float
    drop_path_rates: Tuple[float, ...]
    has_downsample: bool
    fusion: FusionConfig
    fusion_heads: int
    tpwam: TPWAMConfig
    use_checkpoint: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask, *, deterministic: bool = True):
        from .swin2d import SwinBlock

        b, d, h, w, c = x.shape
        flat = x.reshape(b * d, h * w, c)
        block_cls = SwinBlock
        if self.use_checkpoint:
            block_cls = nn.remat(SwinBlock, static_argnums=(2, 3))
        for i in range(self.depth):
            flat = block_cls(
                dim=self.dim, num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, drop=self.drop,
                drop_path_rate=self.drop_path_rates[i],
                use_pallas=self.use_pallas, dtype=self.dtype,
                name=f"blocks_{i}")(flat, (h, w), deterministic)

        x = flat.reshape(b, d, h, w, c)
        if self.tpwam.kind == TPWAMKind.PWAM2D:
            # --ytvos_2d_swin_pwam: 2D Swin backbone + plain 2D PWAM over
            # the flattened clip tokens (reference backbone.py:390-392,
            # the MMBasicLayer path on (B*T, HW, C) frames)
            mm = PWAM(dim=self.dim, num_heads=self.fusion_heads,
                      dropout=self.fusion.dropout,
                      attention=self.fusion.kind != FusionKind.SIMPLE,
                      att_norm=self.fusion.att_norm, dtype=self.dtype,
                      name="fusion")(x.reshape(b, d * h * w, c), l, l_mask,
                                     deterministic=deterministic)
        else:
            mm = build_tpwam(self.tpwam, self.dim, self.fusion_heads,
                             self.fusion.dropout, self.dtype,
                             name="fusion")(x, l, l_mask,
                                            deterministic=deterministic)
        tokens = x.reshape(b, d * h * w, c)
        if self.fusion.gate == GateKind.DEFAULT:
            gate_out = LanguageGate(dim=self.dim, act=self.fusion.lg_act,
                                    dtype=self.dtype, name="res_gate")(mm)
            tokens = tokens + gate_out * mm
        elif self.fusion.gate == GateKind.NO_GATE:
            tokens = tokens + mm

        x_out = mm.reshape(b, d, h, w, c)
        x = tokens.reshape(b, d, h, w, c)
        if self.has_downsample:
            x = PatchMerging3D(dim=self.dim, dtype=self.dtype,
                               name="downsample")(x)
        return x_out, x


class MultiModalSwinTransformer3D(nn.Module):
    """4-stage multimodal video backbone.

    __call__(video (B, T, H, W, 3), l (B, N_l, D_l), l_mask (B, N_l))
      -> tuple of (B*T, Hi, Wi, Ci) NHWC per-frame features.
    """

    cfg: SwinConfig
    fusion: FusionConfig
    tpwam: TPWAMConfig
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    hybrid_2d: bool = False  # --ytvos_2d_swin_3d_pwam
    use_checkpoint: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video, l, l_mask, *, deterministic: bool = True):
        cfg = self.cfg
        x = PatchEmbed3D(embed_dim=cfg.embed_dim,
                         patch_size=cfg.patch_size_3d,
                         patch_norm=cfg.patch_norm, dtype=self.dtype,
                         name="patch_embed")(video)
        x = nn.Dropout(cfg.drop_rate, deterministic=deterministic)(x)

        total_depth = sum(cfg.depths)
        dpr = np.linspace(0, cfg.drop_path_rate, total_depth).tolist()

        outs = []
        for i in range(cfg.num_layers):
            start = sum(cfg.depths[:i])
            common = dict(
                dim=cfg.num_features[i], depth=cfg.depths[i],
                num_heads=cfg.num_heads[i],
                mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                qk_scale=cfg.qk_scale, drop=cfg.drop_rate,
                drop_path_rates=tuple(dpr[start:start + cfg.depths[i]]),
                has_downsample=i < cfg.num_layers - 1,
                fusion=self.fusion, fusion_heads=self.fusion.num_heads[i],
                tpwam=self.tpwam,
                use_checkpoint=self.use_checkpoint,
                use_pallas=self.use_pallas, dtype=self.dtype,
                name=f"layers_{i}")
            if self.hybrid_2d:
                layer = Hybrid2D3DLayer(window_size=cfg.window_size,
                                        **common)
            else:
                layer = MMBasicLayer3D(window_size=cfg.window_size_3d,
                                       is_last_layer=i == cfg.num_layers - 1,
                                       **common)
            x_out, x = layer(x, l, l_mask, deterministic=deterministic)
            if i in self.out_indices:
                x_out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                     name=f"norm{i}")(x_out)
                b, d, hh, ww, cc = x_out.shape
                outs.append(x_out.reshape(b * d, hh, ww, cc))
        return tuple(outs)
