"""Normalization helpers with PyTorch-matching semantics.

The only nonstandard one is InstanceNorm1d as used inside PWAM's
SpatialImageLanguageAttention (reference lib/backbone.py:1296-1302,
1338-1343): torch's `nn.InstanceNorm1d(C)` with default `affine=False`
normalizes each (sample, channel) over the length axis with eps=1e-5 and no
learned scale/offset.  In our (B, L, C) token layout that is a reduction
over axis=-2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def maybe_normalize_image(x: jnp.ndarray) -> jnp.ndarray:
    """Device-side ImageNet normalization for uint8 image/video tensors.

    The input pipeline may ship images as raw resized uint8 (4x smaller
    host->device transfer, no host float math — see data/transforms.py
    `preprocess(host_normalize=False)`); the first thing the jitted step
    does is this exact f32 normalize.  Standalone it is bit-identical to
    the host-side numpy version (same IEEE ops); inside a fused graph XLA
    may contract it into FMAs, which agrees to 1 ulp (~7e-7, asserted in
    tests/test_train.py).  Already-normalized float inputs pass through
    untouched, so every existing call site keeps working.
    """
    if x.dtype != jnp.uint8:
        return x
    # constants mirror data/transforms.py IMAGENET_MEAN/STD
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    return (x.astype(jnp.float32) / 255.0 - mean) / std


def instance_norm_tokens(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm1d(affine=False) over a (..., L, C) token tensor.

    Normalizes over the token axis L independently per channel and per
    leading index.  Statistics in float32 (biased variance, like torch).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-2, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-2, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype)


def instance_norm_nd(x: jnp.ndarray, axes, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over arbitrary spatial axes (channels-last layout).

    Matches torch InstanceNorm3d(affine=False): per-sample, per-channel
    statistics over the spatial axes (reference SepTPWAM uses
    nn.InstanceNorm3d on (B, C, D, H, W); here x is (B, D, H, W, C) and
    axes=(1, 2, 3)).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype)
