"""Standalone one-pass row LayerNorm Pallas kernel.

The backbone's stage-output LayerNorms (swin2d norm0..norm3, reference
backbone.py `norm{i}` after each stage) are pure bandwidth ops, but
XLA's decomposition runs them as a stats reduce pass plus a separate
normalize+affine pass with f32 converts in between — measured
0.35 ms/step at Swin-B 480² bs 8 for norm0+norm1 alone
(tools/profile_infer.py) vs a ~0.07 ms read+write roofline.  This
kernel reads each row block once, computes f32 fast-variance stats
in-register, and writes the normalized rows back — one HBM round-trip.

Math is identical to flax nn.LayerNorm(use_fast_variance=True) and to
fused_msa.layer_norm_f32: f32 stats, var = E[x²] − E[x]², epsilon
inside rsqrt.

Backward: LN's VJP is a handful of row reductions — XLA fuses it well —
so the custom VJP recomputes stats and emits the standard formula in
XLA (the kernel win is the inference/forward HBM pass; training keeps
exact gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (xn * s_ref[...].astype(jnp.float32)[None]
                  + b_ref[...].astype(jnp.float32)[None]).astype(o_ref.dtype)


def _pick_rows_chunk(rows: int, c: int, itemsize: int) -> int:
    """Largest divisor of rows whose in+out blocks stay under ~4 MB
    (double-buffered by Mosaic), preferring sublane multiples."""
    budget = 4 * 1024 * 1024
    best = 1
    for ch in range(1, rows + 1):
        if rows % ch:
            continue
        if ch * c * (2 * itemsize + 4) > budget:  # x + out + f32 temp
            continue
        if ch % 8 == 0 or best == 1:
            best = ch
    return best


def layer_norm_rows_supported(rows: int, c: int) -> bool:
    """Routing gate: lane-aligned feature dim and a usable row chunk."""
    return c % 128 == 0 and c <= 4096


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_rows(x, scale, bias, eps: float = 1e-5):
    """x: (rows, C) -> LayerNorm over C, affine scale/bias.  One-pass
    Pallas kernel forward, XLA backward (see module docstring)."""
    rows, c = x.shape
    ch = _pick_rows_chunk(rows, c, jnp.dtype(x.dtype).itemsize)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rows // ch,),
        in_specs=[pl.BlockSpec((ch, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  const(scale), const(bias)],
        out_specs=pl.BlockSpec((ch, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * x.size, transcendentals=rows,
            bytes_accessed=2 * x.size * x.dtype.itemsize),
    )(x, scale, bias)


def _ln_fwd(x, scale, bias, eps):
    return layer_norm_rows(x, scale, bias, eps), (x, scale)


def _ln_bwd(eps, res, g):
    x, scale = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
    rsig = jax.lax.rsqrt(var + eps)
    xn = (xf - mu) * rsig
    dxn = gf * scale.astype(jnp.float32)[None]
    m1 = jnp.mean(dxn, axis=1, keepdims=True)
    m2 = jnp.mean(dxn * xn, axis=1, keepdims=True)
    dx = (rsig * (dxn - m1 - xn * m2)).astype(x.dtype)
    dscale = jnp.sum(gf * xn, axis=0).astype(scale.dtype)
    dbias = jnp.sum(gf, axis=0).astype(scale.dtype)
    return dx, dscale, dbias


layer_norm_rows.defvjp(_ln_fwd, _ln_bwd)
