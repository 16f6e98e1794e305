"""Fused windowed-attention Pallas kernel.

Computes softmax(q·kᵀ·scale + bias + mask)·v entirely in VMEM, one grid
step per (batch, window), all heads per step.  The XLA path materializes
the (B, nW, h, N, N) score tensor in HBM (~0.5 GB for Swin-B stage 1 at
batch 16) and re-reads it around the softmax; fusing removes those HBM
round trips, which is the dominant cost — window attention is
bandwidth-bound at these sizes (N ≤ 392, hd = 32).

Numerics: scores and softmax in float32 regardless of activation dtype
(matches ops/attention.py's XLA path); output cast back to the input dtype.

Backward: a custom VJP recomputes attention per window (flash-style, no
saved score tensor) and accumulates dq, dk, dv in VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref):
    # blocks: q/k/v (1, 1, h, N, hd); bias (h, N, N); mask (1, N, N)
    q = q_ref[0, 0].astype(jnp.float32)  # (h, N, hd)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    bias = bias_ref[...].astype(jnp.float32)  # (h, N, N)

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (h, N, N)
    s = s + bias
    if mask_ref is not None:
        s = s + mask_ref[0].astype(jnp.float32)[None, :, :]

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    z = jnp.sum(e, axis=-1, keepdims=True)
    p = e / z
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (h, N, hd)
    out_ref[0, 0] = o.astype(out_ref.dtype)


def _pick_head_group(h: int, n: int, budget: int) -> int:
    """Largest divisor of h whose f32 (hg, N, N) tile fits the budget —
    bounds the score+bias tiles in VMEM (Swin-B stage 4 has 32 heads;
    video Swin-T has 3, which halving alone could never split)."""
    for hg in range(h, 0, -1):
        if h % hg == 0 and hg * n * n * 4 <= budget:
            return hg
    return 1


def _attn_fwd_head_group(h: int, n: int, hd: int) -> int:
    """Head group for the forward kernel: the largest divisor of h whose
    bias tile stays under ~2 MB, but only if THAT group's double-buffered
    step footprint also fits ~9 MB — deliberately no fallback to smaller
    groups: at video geometry (n=392, h=3) an hg=1 grid is 3x b x nW tiny
    steps and measured 60 ms/step SLOWER than the XLA path at Swin-T
    8-frame clips. 0 = unsupported (caller falls back to XLA)."""
    hg = _pick_head_group(h, n, 2 * 1024 * 1024)
    buf = (hg * n * n * 4          # bias block
           + hg * n * n * 4        # f32 score tile
           + n * n * 4             # mask block
           + 3 * hg * n * hd * 4)  # q/k/v blocks (f32 upper bound)
    return hg if 2 * buf <= 9 * 1024 * 1024 else 0


def _fwd(q, k, v, bias, mask, scale):
    b, nw, h, n, hd = q.shape
    dt = q.dtype
    qs = (q * jnp.asarray(scale, dt))

    hg = _attn_fwd_head_group(h, n, hd)

    def qkv_spec():
        return pl.BlockSpec((1, 1, hg, n, hd),
                            lambda i, j, g: (i, j, g, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [qkv_spec(), qkv_spec(), qkv_spec(),
                pl.BlockSpec((hg, n, n), lambda i, j, g: (g, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [qs, k, v, bias]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, n, n), lambda i, j, g: (j, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
        kernel = _fwd_kernel
    else:
        def kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
            _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, None, out_ref)

    flops = 2 * 2 * b * nw * h * n * n * hd
    return pl.pallas_call(
        kernel,
        grid=(b, nw, h // hg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, hg, n, hd),
                               lambda i, j, g: (i, j, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nw, h, n, hd), dt),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=b * nw * h * n * n,
            bytes_accessed=q.size * q.dtype.itemsize * 4),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _window_attention_pallas(q, k, v, bias, mask, scale):
    return _fwd(q, k, v, bias, mask, scale)


def _vjp_fwd(q, k, v, bias, mask, scale):
    out = _fwd(q, k, v, bias, mask, scale)
    return out, (q, k, v, bias, mask)


def _vjp_bwd(scale, res, g):
    """Backward. Preferred: the attention-core Pallas kernel (recomputes
    probs in VMEM, no HBM score tensors). Fallback (VMEM-gated, e.g. video
    n=1152 windows): recompute in plain XLA.

    The mask cotangent is returned as zeros — in this model the shift mask
    is a trace-time constant of integer region ids."""
    q, k, v, bias, mask = res
    dt = q.dtype

    b, nw, h, n, hd = q.shape
    if attention_core_bwd_supported(n, h, hd):
        dq, dk, dv, dbias, _ = attention_core_bwd(
            q, k, v, bias, mask, g, float(scale))
        return (dq.astype(dt), dk.astype(dt), dv.astype(dt),
                dbias.astype(bias.dtype),
                None if mask is None else jnp.zeros_like(mask))
    qs = q.astype(jnp.float32) * scale
    s = jnp.einsum("bwhnd,bwhmd->bwhnm", qs, k.astype(jnp.float32))
    s = s + bias.astype(jnp.float32)[None, None]
    if mask is not None:
        s = s + mask.astype(jnp.float32)[None, :, None]
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("bwhnm,bwhnd->bwhmd", p, gf)
    dp = jnp.einsum("bwhnd,bwhmd->bwhnm", gf, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bwhnm,bwhmd->bwhnd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bwhnm,bwhnd->bwhmd", ds, qs)
    dbias = ds.sum(axis=(0, 1)).astype(bias.dtype)
    dmask = None if mask is None else ds.sum(axis=(0, 2)).astype(mask.dtype)
    return dq.astype(dt), dk.astype(dt), dv.astype(dt), dbias, dmask


_window_attention_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def window_attention_pallas(q, k, v, bias, mask=None,
                            scale: Optional[float] = None):
    """Same contract as ops.attention.window_attention_xla."""
    hd = q.shape[-1]
    scale = hd**-0.5 if scale is None else scale
    return _window_attention_pallas(q, k, v, bias, mask, float(scale))


def attn_only_supported(n: int, heads: int, hd: int) -> bool:
    """Whether the attention-only kernel fits VMEM for this window size.

    Head grouping may pick any divisor of h (video Swin-T has 3 heads);
    window (8, 12, 12)'s n=1152 has a ~5 MB single-head tile — those
    shapes fall back to the XLA path."""
    return _attn_fwd_head_group(heads, n, hd) > 0


# ---------------------------------------------------------------------------
# Attention-core backward kernel (used by fused_msa's VJP)
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, o_ref, *, scale: float):
    """One (head-group, batch, window) step: recompute scores/probs in VMEM
    and emit dq/dk/dv, the accumulated dbias, and the recomputed attention
    output o (so the caller's projection grads need no second pass)."""
    g_idx = pl.program_id(0)
    i_idx = pl.program_id(1)
    j_idx = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (hg, N, hd)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s + bias_ref[...].astype(jnp.float32)
    if mask_ref is not None:
        s = s + mask_ref[0].astype(jnp.float32)[None]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (hg, N, N)

    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)

    # dv[m, d] = sum_r p[r, m] * do[r, d]
    dv = jax.lax.dot_general(p, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    # dk[m, d] = sum_r ds[r, m] * (q*scale)[r, d]
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)

    # dbias accumulates over all (batch, window) steps of this head group;
    # the group dim is OUTERMOST so visits are consecutive and Mosaic keeps
    # the block resident.
    @pl.when(jnp.logical_and(i_idx == 0, j_idx == 0))
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dbias_ref[...] += ds.astype(dbias_ref.dtype)


def attention_core_bwd_supported(n: int, heads: int, hd: int) -> bool:
    """VMEM gate for attention_core_bwd: the head-group loop can only halve
    even counts, and the resident f32 tiles (bias + dbias + 4 score-sized
    temporaries per group) must fit alongside the 9 double-buffered
    (hg, n, hd) blocks."""
    hg = _pick_head_group(heads, n, 3 * 1024 * 1024 // 4)
    if hg < 2:
        # an hg=1 grid means h x B x nW tiny steps — measured neutral at
        # best (video n=392: 188 vs 187 ms/step XLA); not worth the
        # compile time, so fall back to XLA recompute
        return False
    buf = (2 * hg * n * n * 4            # bias + dbias blocks
           + 4 * hg * n * n * 4          # s/p/dp/ds f32 tiles
           + 9 * 2 * hg * n * hd * 4)    # q/k/v/do + dq/dk/dv/o (dbl-buf)
    return buf <= 12 * 1024 * 1024


def attention_core_bwd(q, k, v, bias, mask, do, scale: float):
    """Backward of softmax(q·kᵀ·scale + bias + mask)·v, fully in VMEM.

    q/k/v/do: (B, nW, h, N, hd); bias (h, N, N); mask (nW, N, N) or None.
    Returns (dq, dk, dv, dbias, o) — o is the recomputed attention output.
    The mask cotangent is identically zero for the model (the shift mask is
    a function of integer region ids), so it is not computed.
    """
    b, nw, h, n, hd = q.shape
    dt = q.dtype

    hg = _pick_head_group(h, n, 3 * 1024 * 1024 // 4)

    def qkv_spec():
        return pl.BlockSpec((1, 1, hg, n, hd),
                            lambda g, i, j: (i, j, g, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [qkv_spec(), qkv_spec(), qkv_spec(),
                pl.BlockSpec((hg, n, n), lambda g, i, j: (g, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [q, k, v, bias]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, n, n), lambda g, i, j: (j, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
        kernel = functools.partial(_bwd_kernel, scale=scale)
    else:
        def kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                   dq_ref, dk_ref, dv_ref, dbias_ref, o_ref):
            _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, None, do_ref,
                        dq_ref, dk_ref, dv_ref, dbias_ref, o_ref,
                        scale=scale)
    in_specs.append(qkv_spec())  # do
    args.append(do)

    out_shape = [
        jax.ShapeDtypeStruct((b, nw, h, n, hd), dt),   # dq
        jax.ShapeDtypeStruct((b, nw, h, n, hd), dt),   # dk
        jax.ShapeDtypeStruct((b, nw, h, n, hd), dt),   # dv
        jax.ShapeDtypeStruct((h, n, n), jnp.float32),  # dbias
        jax.ShapeDtypeStruct((b, nw, h, n, hd), dt),   # o
    ]
    out_specs = [qkv_spec(), qkv_spec(), qkv_spec(),
                 pl.BlockSpec((hg, n, n), lambda g, i, j: (g, 0, 0),
                              memory_space=pltpu.VMEM),
                 qkv_spec()]
    flops = 5 * 2 * b * nw * h * n * n * hd
    return pl.pallas_call(
        kernel,
        grid=(h // hg, b, nw),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=b * nw * h * n * n,
            bytes_accessed=q.size * q.dtype.itemsize * 8),
    )(*args)
