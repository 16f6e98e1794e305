"""LTS decoder: sentence-vector modulation + language filter + ASPP.

Behavioral contract: reference lib/mask_predictor.py:147-281 (LTSDecoding,
ASPPConv, ASPPPooling, ASPP).  NHWC layout; LeakyReLU default slope 0.01
(torch default); ASPP rates 12/24/36; ASPPPooling upsample is
align_corners=False (the only non-corner-aligned resize in the reference).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import resize_2d


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class ASPPConv(nn.Module):
    features: int
    dilation: int
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), kernel_dilation=self.dilation,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class ASPPPooling(nn.Module):
    features: int
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(y)
        y = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        y = nn.relu(y)
        return jnp.broadcast_to(y, x.shape[:1] + (h, w) + y.shape[-1:])


class ASPP(nn.Module):
    features: int
    rates: Tuple[int, int, int] = (12, 24, 36)
    dropout: float = 0.0
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        outs = []
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1x1")(x)
        y = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1x1")(y)
        outs.append(nn.relu(y))
        for i, r in enumerate(self.rates):
            outs.append(ASPPConv(self.features, r, train=self.train,
                                 dtype=self.dtype, name=f"atrous_{i}")(x))
        outs.append(ASPPPooling(self.features, train=self.train,
                                dtype=self.dtype, name="pool")(x))
        y = jnp.concatenate(outs, axis=-1)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(y)
        y = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="project_bn")(y)
        y = nn.relu(y)
        return nn.Dropout(self.dropout, deterministic=deterministic)(y)


class LTSDecoding(nn.Module):
    """x_c4..x_c2 NHWC + language -> (B, H/4*2?, ...) logits.

    Note the reference's output chain: ASPP at the c2 (H/8) resolution,
    1x1 head, then a fixed 2x non-corner-aligned upsample -> H/4 logits.
    """

    c4_dims: int
    num_classes: int = 2
    dropout: float = 0.0
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_c4, x_c3, x_c2, l, l_mask, *,
                 deterministic: bool = True):
        dt = self.dtype
        hidden = self.c4_dims // 2
        c2_size = self.c4_dims // 4

        # sentence vector (LangProject) -> projection
        m = l_mask.astype(jnp.float32)[:, :, None]
        pooled = ((l.astype(jnp.float32) * m).sum(1) / m.sum(1)).astype(dt)
        s = nn.Dense(self.c4_dims, dtype=dt, name="lang_gen_fc1")(pooled)
        s = nn.relu(s)
        s = nn.Dense(self.c4_dims, dtype=dt, name="lang_gen_fc2")(s)
        s = _leaky(nn.Dense(self.c4_dims, dtype=dt, name="lang_proj")(s))

        v = nn.Conv(self.c4_dims, (1, 1), use_bias=False, dtype=dt,
                    name="vis_proj")(x_c4)
        v = _leaky(v)
        mm = v * s[:, None, None, :]

        mm = resize_2d(mm, x_c3.shape[1:3], align_corners=True)
        mm = _leaky(nn.Conv(hidden, (1, 1), use_bias=False, dtype=dt,
                            name="conv4")(mm))
        c3 = _leaky(nn.Conv(hidden, (1, 1), use_bias=False, dtype=dt,
                            name="conv3_v")(x_c3))
        mm = jnp.concatenate([mm, c3], axis=-1)

        mm = resize_2d(mm, x_c2.shape[1:3], align_corners=True)
        mm = _leaky(nn.Conv(hidden, (1, 1), use_bias=False, dtype=dt,
                            name="conv3")(mm))
        c2 = _leaky(nn.Conv(c2_size, (1, 1), use_bias=False, dtype=dt,
                            name="conv2_v")(x_c2))
        mm = jnp.concatenate([mm, c2], axis=-1)

        l_kernel = nn.Dense(hidden + c2_size, dtype=dt,
                            name="lang_filter")(s)
        relevance = (mm * l_kernel[:, None, None, :]).sum(-1, keepdims=True)
        mm = jnp.concatenate([mm, relevance], axis=-1)

        mm = ASPP(hidden // 2, dropout=self.dropout, train=self.train,
                  dtype=dt, name="aspp")(mm, deterministic=deterministic)
        mm = nn.Conv(self.num_classes, (1, 1), dtype=dt, name="head")(mm)
        h, w = mm.shape[1:3]
        return resize_2d(mm.astype(jnp.float32), (2 * h, 2 * w),
                         align_corners=False)
