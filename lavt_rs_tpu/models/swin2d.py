"""Multimodal Swin Transformer (2D) — the LAVT image backbone.

Re-designed TPU-first from the behavior of reference lib/backbone.py:
  * WindowAttention            — lib/backbone.py:65-143
  * SwinTransformerBlock       — lib/backbone.py:146-245
  * PatchEmbed / PatchMerging  — lib/backbone.py:248-331
  * MMBasicLayer (+ LG gate)   — lib/backbone.py:523-686
  * MultiModalSwinTransformer  — lib/backbone.py:334-520

TPU-first design choices (vs. the reference):
  * NHWC tokens end-to-end; stage outputs are (B, H, W, C), not NCHW.
  * Shift masks and relative-position indices are numpy constants built once
    per static shape at trace time (the reference rebuilds the mask with
    tensor ops on every forward, lib/backbone.py:633-652).
  * All shapes are static under jit: padding amounts are Python ints.
  * Softmax/bias math accumulates in float32; activations may be bfloat16.
  * `jax.checkpoint` (remat) replaces torch.utils.checkpoint per block.
  * The fused attention can route to a Pallas kernel (config.use_pallas).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import FusionConfig, FusionKind, GateKind, StageOutput, SwinConfig
from ..ops.attention import window_attention
from ..ops.window import (
    partition_shifted,
    partition_shifted_padded,
    relative_bias_from_table,
    reverse_shifted,
    reverse_shifted_unpadded,
    shift_mask_2d,
    use_take_partition,
    window_partition,
    window_reverse,
)
from .pwam import PWAM, LanguageGate, apply_gate

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Per-sample stochastic depth (timm DropPath semantics)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class _DenseParams(nn.Module):
    """Parameter container matching nn.Dense's tree layout (kernel/bias) so
    the fused-kernel path and the XLA path share checkpoints."""

    features: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias
                else jnp.zeros((self.features,), jnp.float32))
        return kernel, bias


class _LNParams(nn.Module):
    """Parameter container matching nn.LayerNorm's tree (scale/bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32),
                self.param("bias", nn.initializers.zeros, (self.dim,),
                           jnp.float32))


class _ConvParams(nn.Module):
    """Parameter container matching nn.Conv's tree layout (kernel/bias) —
    same shapes and initializers, so checkpoints are interchangeable with
    the nn.Conv formulation."""

    features: int
    ksize: Tuple[int, int]
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.ksize + (self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class _StageNorm(nn.Module):
    """Stage-output LayerNorm with the same param tree as nn.LayerNorm
    (scale/bias) but routed through the one-pass Pallas row-LN kernel
    (ops/pallas/ln.py) when available — XLA's two-pass decomposition
    measured ~5x off HBM roofline at (B*L, 128..512) (profile_infer)."""

    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        rows = int(np.prod(x.shape[:-1]))
        from ..ops.pallas.ln import (layer_norm_rows,
                                     layer_norm_rows_supported)
        if self.use_pallas and layer_norm_rows_supported(rows, c):
            return layer_norm_rows(x.reshape(rows, c), scale,
                                   bias).reshape(x.shape)
        from ..ops.pallas.fused_msa import layer_norm_f32
        return layer_norm_f32(x, scale, bias)


class _MlpParams(nn.Module):
    """Parameter container matching Mlp's tree (fc1/fc2 Dense)."""

    hidden: int
    out: int
    in_features: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.hidden, self.in_features, name="fc1")()
        w2, b2 = _DenseParams(self.out, self.hidden, name="fc2")()
        return w1, b1, w2, b2


class WindowAttention(nn.Module):
    """W-MSA with learned relative position bias.

    use_pallas=True routes qkv + attention + out-projection through the
    fully fused Pallas kernel (ops/pallas/fused_msa.py); the parameter tree
    is identical either way.
    """

    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, ln=None, *, deterministic: bool = True):
        """x: (B, nW, N, C); mask: (nW, N, N) or None.

        ln: optional (scale, bias) of the block's pre-attention LayerNorm
        — when given, x is PRE-LN tokens and the LN runs inside the fused
        kernel (or as an explicit f32 row-norm on the fallback paths)."""
        h = self.num_heads
        wh, ww = self.window_size
        b, nw, n, c = x.shape
        table = self.param(
            "relative_position_bias_table", trunc_normal_init,
            ((2 * wh - 1) * (2 * ww - 1), h), jnp.float32)
        # gather forward / separable one-hot-contraction backward (the
        # gather's scatter-add transpose is very slow on TPU).  For
        # inference the expansion is param-only, so fold_inference_variables
        # precomputes it once into the 'folded' collection (the 24 Swin-B
        # expansions cost ~0.6 ms/step at bs 8 inside every jitted apply).
        if self.has_variable("folded", "rel_pos_bias"):
            bias = self.get_variable("folded", "rel_pos_bias")
        else:
            bias = relative_bias_from_table(table, wh, ww)  # (h, N, N)
            if self.is_mutable_collection("folded"):
                self.put_variable("folded", "rel_pos_bias", bias)

        scale = self.qk_scale if self.qk_scale is not None else (c // h) ** -0.5

        # The fully fused kernel needs the qkv/proj weights + f32 bias
        # resident in VMEM; wide stages split heads into groups
        # (fused_msa._pick_fwd_groups) and huge windows (video n=1152)
        # fall back to the attention-only kernel / XLA.
        from ..ops.pallas.fused_msa import fused_msa_routed

        # Window-7 (n=49) COULD run fused (chunk-of-1 grid, or the
        # sublane-padded wrapper) but measured on v5e both lose to XLA at
        # every Swin-T/S 2D stage (tools/bench_msa_chunk1.py) — these
        # windows are tiny enough that XLA is already near-peak.  The
        # routing policy lives in fused_msa_routed.
        fused_ok = (self.use_pallas
                    and fused_msa_routed(nw, n, c, h,
                                         jnp.dtype(self.dtype).itemsize))
        if fused_ok:
            from ..ops.pallas.fused_msa import (fused_window_msa,
                                                fused_window_msa_ln)

            wqkv, bqkv = _DenseParams(3 * c, c, self.qkv_bias, name="qkv")()
            wproj, bproj = _DenseParams(c, c, True, name="proj")()
            if ln is not None:
                out = fused_window_msa_ln(x, ln[0], ln[1], wqkv, bqkv,
                                          wproj, bproj, bias, mask,
                                          h, float(scale))
            else:
                out = fused_window_msa(x, wqkv, bqkv, wproj, bproj, bias,
                                       mask, h, float(scale))
        else:
            if ln is not None:  # fallback: explicit pre-attention LN
                from ..ops.pallas.fused_msa import layer_norm_f32

                x = layer_norm_f32(x, ln[0], ln[1])
            qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                           name="qkv")(x)
            qkv = qkv.reshape(b, nw, n, 3, h, c // h)
            q, k, v = (qkv[..., i, :, :].transpose(0, 1, 3, 2, 4)
                       for i in range(3))
            out = window_attention(q, k, v, bias, mask=mask, scale=scale,
                                   use_pallas=self.use_pallas)
            out = out.transpose(0, 1, 3, 2, 4).reshape(b, nw, n, c)
            out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int], deterministic: bool = True):
        """x: (B, H*W, C); hw static (Python tuple)."""
        h, w = hw
        b, l, c = x.shape
        ws, ss = self.window_size, self.shift_size

        shortcut = x

        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        # Fuse the pre-attention LN into the MSA kernel when the fused
        # path is routed AND windowing needs no padding (the reference
        # pads AFTER LN with zeros; in-kernel LN of a pad row would give
        # ln_bias — at 480² only stage 4 pads, 15 -> 24).  Saves a full
        # HBM round-trip + f32 convert per block; measured at bs 32 the
        # separate norm1 pass stopped fusing and cost ~0.25 ms/img.
        import os as _os

        from ..ops.pallas.fused_msa import fused_msa_routed as _routed

        nw_pre = ((h + pad_b) // ws) * ((w + pad_r) // ws)
        ln_in_attn = (self.use_pallas and not (pad_b or pad_r)
                      and _os.environ.get("LAVT_FUSED_LN", "1") != "0"
                      and _routed(nw_pre, ws * ws, c,
                                  self.num_heads,
                                  jnp.dtype(self.dtype).itemsize))
        if ln_in_attn:
            ln_params = _LNParams(c, name="norm1")()
        else:
            ln_params = None
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="norm1")(x)
        x = x.reshape(b, h, w, c)

        take_part = use_take_partition(b)
        if (pad_b or pad_r) and not take_part:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        mask = shift_mask_2d(hp, wp, ws, ss) if ss > 0 else None

        # NOTE: folding the window partition into the Pallas grid (the
        # fused_msa_2d spatial kernel) is blocked on real hardware — window
        # slices land at 12k sublane offsets, which Mosaic's (8, 128)
        # tiling rejects — so the partition/reverse stay XLA layout ops and
        # the fused kernel consumes windowed (B, nW, N, C) tokens.
        attn = WindowAttention(
            dim=c, window_size=(ws, ws), num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            use_pallas=self.use_pallas, dtype=self.dtype, name="attn")
        nw = (hp // ws) * (wp // ws)
        if take_part:
            # shift + partition as ONE static-gather copy (exact same
            # permutation as roll + reshape + 6D transpose; see
            # ops/window.py partition_shifted).  Padded geometries fold
            # the zero-pad into the gather too (zero-row trick) — the
            # (B, Hp, Wp, C) padded copy and the unpad slice never hit
            # HBM (~0.25 ms/step at Swin-B 480² bs 8, stages 3-4).
            if pad_b or pad_r:
                xw = partition_shifted_padded(x, ws, ss, hp, wp)
            else:
                xw = partition_shifted(x, ws, ss)
            xw = attn(xw, mask=mask, ln=ln_params,
                      deterministic=deterministic)
            if pad_b or pad_r:
                x = reverse_shifted_unpadded(xw, ws, ss, hp, wp, h, w)
            else:
                x = reverse_shifted(xw, ws, ss, hp, wp)
        else:
            if ss > 0:
                x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
            xw = window_partition(x, ws).reshape(b, nw, ws * ws, c)
            xw = attn(xw, mask=mask, ln=ln_params,
                      deterministic=deterministic)
            x = window_reverse(xw.reshape(b * nw, ws * ws, c), ws, hp, wp)
            if ss > 0:
                x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        if (pad_b or pad_r) and not take_part:
            x = x[:, :h, :w, :]
        x = x.reshape(b, h * w, c)

        rng = self.make_rng("dropout") if (
            not deterministic and self.drop_path_rate > 0) else None
        x = shortcut + drop_path(x, self.drop_path_rate, deterministic, rng)

        # Fused LN2 + MLP + residual (ops/pallas/fused_mlp.py): one HBM
        # read + one write instead of many full-tensor passes. Only when
        # MLP dropout is inactive (true dropout lives in the XLA path) and
        # the fc weights fit VMEM (C <= 512); DropPath is handled in-kernel
        # via a per-sample SMEM scale so the training forward stays fused.
        # c % 128: at sub-lane-width channels (Swin-T's 96/192) the
        # kernel is ~3x slower than XLA's fused chain (measured 2.49 vs
        # 0.82 ms at (115200, 96)); it wins at Swin-B's 128/256/512.
        fused_tail = (self.use_pallas and c <= 512 and c % 128 == 0 and
                      (deterministic or self.drop == 0.0))
        if fused_tail:
            scale_, bias_ = _LNParams(c, name="norm2")()
            w1, b1, w2, b2 = _MlpParams(hidden=int(c * self.mlp_ratio),
                                        out=c, in_features=c, name="mlp")()
            if deterministic or self.drop_path_rate == 0.0:
                from ..ops.pallas.fused_mlp import fused_ln_mlp

                y = fused_ln_mlp(x.reshape(b * l, c), scale_, bias_,
                                 w1, b1, w2, b2)
            else:
                from ..ops.pallas.fused_mlp import fused_ln_mlp_droppath

                keep_prob = 1.0 - self.drop_path_rate
                bern = jax.random.bernoulli(self.make_rng("dropout"),
                                            keep_prob, (b,))
                keep = jnp.where(bern, 1.0 / keep_prob, 0.0)
                y = fused_ln_mlp_droppath(x.reshape(b * l, c), scale_,
                                          bias_, w1, b1, w2, b2, keep, l)
            return y.reshape(b, l, c)

        y = Mlp(hidden=int(c * self.mlp_ratio), out=c, drop=self.drop,
                dtype=self.dtype, name="mlp")(
                    nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name="norm2")(x),
                    deterministic=deterministic)
        rng = self.make_rng("dropout") if (
            not deterministic and self.drop_path_rate > 0) else None
        return x + drop_path(y, self.drop_path_rate, deterministic, rng)


class PatchEmbed(nn.Module):
    """4x4 stride-4 conv patchifier. Input NHWC image, output (B, Wh, Ww, C)."""

    embed_dim: int = 96
    patch_size: int = 4
    patch_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ps = self.patch_size
        h, w = x.shape[1], x.shape[2]
        pad_b = (ps - h % ps) % ps
        pad_r = (ps - w % ps) % ps
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        # Stride-ps VALID conv == space-to-depth + (ps*ps*Cin -> C) matmul.
        # XLA's conv ran at ~7 TFLOP/s here (Cin=3 leaves 125/128 MXU
        # lanes idle and forces an f32 layout copy of the whole image —
        # 0.74 ms/step at 480² bs 8); the explicit form does one bf16
        # transpose copy and a K=48 GEMM.  Param tree identical to
        # nn.Conv (proj/kernel (ps, ps, Cin, C) + proj/bias).
        b, hp, wp, cin = x.shape
        kernel, bias = _ConvParams(self.embed_dim, (ps, ps), cin,
                                   name="proj")()
        oh, ow = hp // ps, wp // ps
        xd = x.astype(self.dtype).reshape(b, oh, ps, ow, ps, cin)
        xd = xd.transpose(0, 1, 3, 2, 4, 5).reshape(b, oh, ow, ps * ps * cin)
        x = (jnp.dot(xd, kernel.reshape(ps * ps * cin,
                                        self.embed_dim).astype(self.dtype))
             + bias.astype(self.dtype))
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


class PatchMerging(nn.Module):
    """2x2 space-to-depth + LN + Linear(4C -> 2C, no bias)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        h, w = hw
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(b, -1, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                     name="reduction")(x)
        return x


class MMBasicLayer(nn.Module):
    """One multimodal stage: Swin blocks -> PWAM -> LG residual -> merge."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    drop: float
    attn_drop: float
    drop_path_rates: Tuple[float, ...]
    has_downsample: bool
    fusion: FusionConfig
    fusion_heads: int
    use_checkpoint: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw, l, l_mask, *, deterministic: bool = True):
        h, w = hw
        block_cls = SwinBlock
        if self.use_checkpoint:
            # Rematerialize each block's activations on the backward pass
            # (the TPU equivalent of torch.utils.checkpoint per block,
            # reference lib/backbone.py:657-660).
            block_cls = nn.remat(SwinBlock, static_argnums=(2, 3))
        for i in range(self.depth):
            block = block_cls(
                dim=self.dim, num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path_rate=self.drop_path_rates[i],
                use_pallas=self.use_pallas, dtype=self.dtype,
                name=f"blocks_{i}")
            x = block(x, hw, deterministic)

        x_pre_fusion = x

        if self.fusion.kind in (FusionKind.PWAM, FusionKind.SIMPLE):
            mm = PWAM(dim=self.dim, num_heads=self.fusion_heads,
                      dropout=self.fusion.dropout,
                      attention=self.fusion.kind == FusionKind.PWAM,
                      att_norm=self.fusion.att_norm, dtype=self.dtype,
                      name="fusion")(x, l, l_mask, deterministic=deterministic)
        elif self.fusion.kind == FusionKind.BCAM:
            from .fusion_baselines import BCAM

            mm = BCAM(dim=self.dim, hw=h * w, dtype=self.dtype,
                      name="fusion")(x, l, l_mask,
                                     deterministic=deterministic)
        elif self.fusion.kind == FusionKind.GACD:
            from .fusion_baselines import GACD

            mm = GACD(dim=self.dim, dtype=self.dtype, name="fusion")(
                x, l, l_mask, deterministic=deterministic)
        elif self.fusion.kind == FusionKind.EFN:
            from .fusion_baselines import EFN

            mm = EFN(dim=self.dim, dtype=self.dtype, name="fusion")(
                x, l, l_mask, deterministic=deterministic)
        else:
            raise NotImplementedError(
                f"fusion kind {self.fusion.kind} not yet implemented")

        if self.fusion.gate == GateKind.DEFAULT:
            gate_out = LanguageGate(dim=self.dim, act=self.fusion.lg_act,
                                    dtype=self.dtype, name="res_gate")(mm)
        else:
            gate_out = None
        x = apply_gate(x, mm, gate_out, self.fusion.gate)

        if self.fusion.stage_output == StageOutput.RESIDUAL:
            x_out = mm
        elif self.fusion.stage_output == StageOutput.HIDDEN:
            x_out = x
        else:  # LAZY
            x_out = x_pre_fusion

        if self.has_downsample:
            x_down = PatchMerging(dim=self.dim, dtype=self.dtype,
                                  name="downsample")(x, hw)
            down_hw = ((h + 1) // 2, (w + 1) // 2)
            return x_out, x_down, down_hw
        return x_out, x, hw


class BasicLayer(nn.Module):
    """Plain (language-free) Swin stage for the LTS/VLT baselines
    (reference lib/backbone.py:1409-1554)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    drop: float
    attn_drop: float
    drop_path_rates: Tuple[float, ...]
    has_downsample: bool
    use_checkpoint: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw, *, deterministic: bool = True):
        h, w = hw
        block_cls = SwinBlock
        if self.use_checkpoint:
            block_cls = nn.remat(SwinBlock, static_argnums=(2, 3))
        for i in range(self.depth):
            x = block_cls(
                dim=self.dim, num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path_rate=self.drop_path_rates[i],
                use_pallas=self.use_pallas, dtype=self.dtype,
                name=f"blocks_{i}")(x, hw, deterministic)
        x_out = x
        if self.has_downsample:
            x = PatchMerging(dim=self.dim, dtype=self.dtype,
                             name="downsample")(x, hw)
            return x_out, x, ((h + 1) // 2, (w + 1) // 2)
        return x_out, x, hw


class SwinTransformer(nn.Module):
    """Plain 4-stage Swin backbone (reference lib/backbone.py:1557-1693)."""

    cfg: SwinConfig
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    use_checkpoint: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        x = PatchEmbed(embed_dim=cfg.embed_dim, patch_size=cfg.patch_size,
                       patch_norm=cfg.patch_norm, dtype=self.dtype,
                       name="patch_embed")(x)
        b, wh, ww, c = x.shape
        x = x.reshape(b, wh * ww, c)
        x = nn.Dropout(cfg.drop_rate, deterministic=deterministic)(x)

        dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths)).tolist()
        outs = []
        hw = (wh, ww)
        for i in range(cfg.num_layers):
            start = sum(cfg.depths[:i])
            x_out, x, next_hw = BasicLayer(
                dim=cfg.num_features[i], depth=cfg.depths[i],
                num_heads=cfg.num_heads[i], window_size=cfg.window_size,
                mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                qk_scale=cfg.qk_scale, drop=cfg.drop_rate,
                attn_drop=cfg.attn_drop_rate,
                drop_path_rates=tuple(dpr[start:start + cfg.depths[i]]),
                has_downsample=i < cfg.num_layers - 1,
                use_checkpoint=self.use_checkpoint,
                use_pallas=self.use_pallas, dtype=self.dtype,
                name=f"layers_{i}")(x, hw, deterministic=deterministic)
            if i in self.out_indices:
                x_out = _StageNorm(use_pallas=self.use_pallas,
                                   dtype=self.dtype,
                                   name=f"norm{i}")(x_out)
                outs.append(x_out.reshape(b, hw[0], hw[1],
                                          cfg.num_features[i]))
            hw = next_hw
        return tuple(outs)


class MultiModalSwinTransformer(nn.Module):
    """The full 4-stage multimodal backbone.

    __call__(image NHWC, l (B, N_l, D_l), l_mask (B, N_l))
      -> tuple of per-stage NHWC features, one per cfg out_indices.
    """

    cfg: SwinConfig
    fusion: FusionConfig
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    use_checkpoint: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask, *, deterministic: bool = True):
        cfg = self.cfg
        x = PatchEmbed(embed_dim=cfg.embed_dim, patch_size=cfg.patch_size,
                       patch_norm=cfg.patch_norm, dtype=self.dtype,
                       name="patch_embed")(x)
        b, wh, ww, c = x.shape
        if cfg.ape:
            # Absolute position embedding at the pretraining resolution,
            # bicubic-resized to the current grid (reference backbone.py:497).
            from ..ops.resize import resize_2d
            pre = 224 // cfg.patch_size
            ape = self.param("absolute_pos_embed", trunc_normal_init,
                             (1, pre, pre, cfg.embed_dim), jnp.float32)
            x = x + resize_2d(ape, (wh, ww), method="bicubic",
                              align_corners=False).astype(self.dtype)
        x = x.reshape(b, wh * ww, c)
        x = nn.Dropout(cfg.drop_rate, deterministic=deterministic)(x)

        total_depth = sum(cfg.depths)
        dpr = np.linspace(0, cfg.drop_path_rate, total_depth).tolist()

        outs = []
        hw = (wh, ww)
        for i in range(cfg.num_layers):
            start = sum(cfg.depths[:i])
            layer = MMBasicLayer(
                dim=cfg.num_features[i], depth=cfg.depths[i],
                num_heads=cfg.num_heads[i], window_size=cfg.window_size,
                mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                qk_scale=cfg.qk_scale, drop=cfg.drop_rate,
                attn_drop=cfg.attn_drop_rate,
                drop_path_rates=tuple(dpr[start:start + cfg.depths[i]]),
                has_downsample=i < cfg.num_layers - 1,
                fusion=self.fusion, fusion_heads=self.fusion.num_heads[i],
                use_checkpoint=self.use_checkpoint,
                use_pallas=self.use_pallas, dtype=self.dtype,
                name=f"layers_{i}")
            x_out, x, next_hw = layer(x, hw, l, l_mask,
                                      deterministic=deterministic)
            if i in self.out_indices:
                x_out = _StageNorm(use_pallas=self.use_pallas,
                                   dtype=self.dtype,
                                   name=f"norm{i}")(x_out)
                outs.append(x_out.reshape(b, hw[0], hw[1],
                                          cfg.num_features[i]))
            hw = next_hw
        return tuple(outs)
