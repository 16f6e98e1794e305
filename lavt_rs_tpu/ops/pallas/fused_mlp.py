"""Fused LayerNorm -> MLP (fc1 -> exact GELU -> fc2) -> residual add.

Motivation (measured on v5e, Swin-B 480², bs 16): one stage-1 SwinBlock
costs 6.2 ms while its fused MSA is only 1.9 ms — the tail (LN2 + fc1 +
gelu + fc2 + residual) makes many full passes over the 59 MB (B, L, C)
activation plus a 236 MB fc1 intermediate in HBM.  This kernel keeps the
(chunk, 4C) hidden activation in VMEM: the activation is read once and the
result written once.

Used for the SwinBlock tail when dropout/drop-path are inactive (inference,
or training with rates 0); the dropout path falls back to XLA.  Weights are
VMEM-resident via constant index maps, so the kernel is limited to C <= 512
(Swin-B stage 4's C=1024 needs 16 MB of fc weights alone).

Backward: recompute-based custom VJP in XLA (same pattern as fused_msa).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation (|err| < 1.5e-7).

    Mosaic has no erf lowering (NotImplementedError on real TPUs), and the
    tanh-approximate GELU deviates up to ~1e-3 from the exact one the model
    uses — this polynomial keeps the fused tail within float32 parity
    tolerances of jax.nn.gelu(approximate=False)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t * jnp.exp(
        -ax * ax)
    return s * y


def _kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + _EPS)
    xn = xn * g_ref[...].astype(jnp.float32)[None] + \
        be_ref[...].astype(jnp.float32)[None]
    h = jnp.dot(xn.astype(x.dtype), w1_ref[...],
                preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)[None]
    # exact-GELU via the A&S erf polynomial (matches
    # jax.nn.gelu(approximate=False) to ~1e-7)
    h = h * 0.5 * (1.0 + _erf(h * (2.0 ** -0.5)))
    y = jnp.dot(h.astype(x.dtype), w2_ref[...],
                preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)[None]
    out_ref[...] = (xf + y).astype(out_ref.dtype)


def _pick_rows(m: int, c: int, hidden: int, itemsize: int) -> int:
    """Largest divisor of m whose footprint (x + xn + h f32 + out, double-
    buffered x/out) fits a ~6 MB budget."""
    best = 1
    for tc in range(1, min(m, 2048) + 1):
        if m % tc:
            continue
        buf = (2 * tc * c * itemsize      # x + out (double-buffered pair)
               + tc * c * 4               # xn f32
               + tc * hidden * 4          # h f32
               + tc * c * 4)              # residual accum f32
        if buf <= 6 * 1024 * 1024:
            best = tc
    return best


def _fwd(x, g, be, w1, b1, w2, b2):
    m, c = x.shape
    hidden = w1.shape[1]
    dt = x.dtype
    w1c = w1.astype(dt)
    w2c = w2.astype(dt)
    tc = _pick_rows(m, c, hidden, jnp.dtype(dt).itemsize)

    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    flops = 2 * m * c * hidden * 2
    return pl.pallas_call(
        _kernel,
        grid=(m // tc,),
        in_specs=[
            pl.BlockSpec((tc, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const(g), const(be), const(w1c), const(b1), const(w2c),
            const(b2),
        ],
        out_specs=pl.BlockSpec((tc, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=m * hidden,
            bytes_accessed=2 * m * c * jnp.dtype(dt).itemsize
            + (w1.size + w2.size) * 2),
    )(x, g, be, w1c, b1, w2c, b2)


def _ref_forward(x, g, be, w1, b1, w2, b2):
    """XLA reference (backward recompute + parity tests)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + _EPS)
    xn = xn * g.astype(jnp.float32) + be.astype(jnp.float32)
    h = xn.astype(x.dtype).astype(jnp.float32) @ w1.astype(jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=False)
    y = h.astype(x.dtype).astype(jnp.float32) @ w2.astype(jnp.float32) + b2
    return xf + y


@jax.custom_vjp
def fused_ln_mlp(x, g, be, w1, b1, w2, b2):
    """x: (M, C) tokens. Returns (x + fc2(gelu(fc1(LN(x))))) in x.dtype."""
    return _fwd(x, g, be, w1, b1, w2, b2)


def _vjp_fwd(x, g, be, w1, b1, w2, b2):
    return _fwd(x, g, be, w1, b1, w2, b2), (x, g, be, w1, b1, w2, b2)


def _vjp_bwd(res, gr):
    x, g, be, w1, b1, w2, b2 = res

    def f(x, g, be, w1, b1, w2, b2):
        return _ref_forward(x, g, be, w1, b1, w2, b2).astype(x.dtype)

    _, vjp = jax.vjp(f, x, g, be, w1, b1, w2, b2)
    return vjp(gr)


fused_ln_mlp.defvjp(_vjp_fwd, _vjp_bwd)
