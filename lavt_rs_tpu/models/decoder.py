"""SimpleDecoding — the LAVT top-down conv decoder.

Behavioral contract: reference lib/mask_predictor.py:7-144.  Top-down
FPN-style fusion: at each join, upsample (bilinear, align_corners=True) to
the skip's resolution, concat along channels, then two 3x3 Conv-BN-ReLU
blocks; finally a 1x1 conv to `num_classes` logits.

TPU-native: NHWC features in, NHWC logits out.  The corner-aligned upsample
is the matmul-based resize from ops/resize.py (MXU-friendly).  BatchNorm uses
flax batch stats; under a data-parallel jit the batch statistics are computed
over the *global* batch (XLA inserts the cross-chip reduction), which matches
the reference's SyncBatchNorm conversion (train.py:589).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import resize_2d


class HeadConv1x1(nn.Module):
    """1x1 classifier head with the same param tree as nn.Conv
    (kernel (1,1,C,K), bias (K,)) but an explicit dot_general so the
    class axis can land OUTSIDE the minor (lane) dimension.

    With num_classes=2, an NHWC conv output wastes 126/128 lanes in every
    op that touches it; measured 2.9 ms/step at bs 8 on v5e for a
    0.24 GFLOP projection (tools/profile_infer.py). nchw=True emits
    (B, K, H, W) — spatial minor — so the downstream final upsample runs
    on full lanes.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    nchw: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel[0, 0].astype(self.dtype)
        b = bias.astype(self.dtype)
        if self.nchw:
            y = jnp.einsum("bhwc,ck->bkhw", x.astype(self.dtype), k)
            return y + b[:, None, None]
        return jnp.einsum("bhwc,ck->bhwk", x.astype(self.dtype), k) + b


class _ConvKernel(nn.Module):
    """Parameter container matching nn.Conv(use_bias=False)'s tree."""

    features: int
    ksize: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.ksize, self.ksize, self.in_features,
                           self.features), jnp.float32)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x2=None):
        """x2: optional second input — semantically conv(concat([x, x2],
        -1)) but computed as conv_a(x) + conv_b(x2) with the kernel split
        along input channels.  Same math (a 3x3 conv is linear in its
        input channels), same param tree, but the (B, H, W, Ca+Cb)
        concat never hits HBM — at the decoder's 120² stage that concat
        measured 0.42 ms/step (bs 8) of pure bandwidth."""
        if x2 is None:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        use_bias=False, dtype=self.dtype, name="conv")(x)
        else:
            ca = x.shape[-1]
            kern = _ConvKernel(self.features, self.kernel,
                               ca + x2.shape[-1], name="conv")()
            dn = ("NHWC", "HWIO", "NHWC")
            # Same dtype semantics as the nn.Conv branch (inputs + kernel
            # cast to self.dtype, conv emits self.dtype; the MXU still
            # accumulates f32 internally).  An earlier form requested
            # preferred_element_type=f32, which BROKE the bf16 training
            # trace: the weight-grad transpose rule then pairs an f32
            # cotangent with the bf16 input and conv_general_dilated
            # rejects mixed dtypes.
            conv = lambda inp, k: jax.lax.conv_general_dilated(
                inp.astype(self.dtype), k.astype(self.dtype), (1, 1),
                "SAME", dimension_numbers=jax.lax.conv_dimension_numbers(
                    inp.shape, k.shape, dn))
            x = conv(x, kern[:, :, :ca]) + conv(x2, kern[:, :, ca:])
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class SimpleDecoding(nn.Module):
    """x_c4..x_c1 are NHWC stage features (C4 deepest). Returns NHWC logits
    at the stage-1 (H/4) resolution (before the final image-size upsample,
    which the top-level model owns, as in the reference)."""

    c4_dims: int
    num_classes: int = 2
    factor: int = 2
    lazy_pred: bool = False
    interpolate_before_seg: bool = False
    seg_last: bool = False
    train: bool = False
    dtype: jnp.dtype = jnp.float32
    nchw_out: bool = False  # head emits (B, K, H, W); see HeadConv1x1

    @nn.compact
    def __call__(self, x_c4, x_c3, x_c2, x_c1: Optional[jnp.ndarray]):
        hidden = self.c4_dims // self.factor

        def up_to(x, ref):
            if x.shape[1] < ref.shape[1] or x.shape[2] < ref.shape[2]:
                # exact=False: intermediate features interpolate in the
                # compute dtype (single-pass bf16 matmul under bf16 —
                # AMP-equivalent); the exact f32 path is reserved for the
                # final logits upsample
                return resize_2d(x, (ref.shape[1], ref.shape[2]),
                                 method="bilinear", align_corners=True,
                                 exact=False)
            return x

        x = ConvBNReLU(hidden, train=self.train, dtype=self.dtype,
                       name="fuse4_a")(up_to(x_c4, x_c3), x_c3)
        x = ConvBNReLU(hidden, train=self.train, dtype=self.dtype,
                       name="fuse4_b")(x)

        x = ConvBNReLU(hidden, train=self.train, dtype=self.dtype,
                       name="fuse3_a")(up_to(x, x_c2), x_c2)
        x = ConvBNReLU(hidden, train=self.train, dtype=self.dtype,
                       name="fuse3_b")(x)

        if not self.lazy_pred:
            assert x_c1 is not None
            x = ConvBNReLU(hidden, train=self.train, dtype=self.dtype,
                           name="fuse2_a")(up_to(x, x_c1), x_c1)
            x = ConvBNReLU(hidden, train=self.train, dtype=self.dtype,
                           name="fuse2_b")(x)

        if self.interpolate_before_seg:
            # Extra upsample+conv stage(s) (reference mask_predictor.py:88-97).
            base = x_c1 if x_c1 is not None else x
            x = resize_2d(x, (2 * base.shape[1], 2 * base.shape[2]),
                          method="bilinear", align_corners=True, exact=False)
            x = ConvBNReLU(hidden, train=self.train, dtype=self.dtype,
                           name="pre_seg")(x)
            if self.seg_last:
                x = resize_2d(x, (4 * base.shape[1], 4 * base.shape[2]),
                              method="bilinear", align_corners=True,
                              exact=False)
                x = ConvBNReLU(hidden, train=self.train, dtype=self.dtype,
                               name="seg_last_conv")(x)

        return HeadConv1x1(self.num_classes, dtype=self.dtype,
                           nchw=self.nchw_out, name="head")(x)
