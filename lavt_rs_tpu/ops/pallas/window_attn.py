"""Attention-only windowed-attention Pallas kernels (forward + backward
core), used where the fully fused MSA kernel (fused_msa.py) cannot hold
the projection weights in VMEM (Swin-B stage 4, C=1024).

Computes softmax(q·kᵀ·scale + bias + mask)·v entirely in VMEM; each grid
step covers a (window-chunk x head-group) batch of windows.  The XLA path
materializes the (B, nW, h, N, N) score tensor in HBM (~0.5 GB for Swin-B
stage 1 at batch 16) and re-reads it around the softmax; fusing removes
those round trips.  Routing is measurement-gated per shape
(_attn_tiling): 2D windows (N = 49/144) win; video windows (N >= 392)
fall back to XLA.

Numerics: scores and softmax in float32 regardless of activation dtype
(matches ops/attention.py's XLA path); output cast back to the input dtype.

Backward: the attention-core kernel recomputes probs per chunk (no saved
score tensor) and emits dq/dk/dv plus the accumulated bias-table grad;
it is also used by fused_msa's decomposed backward fallback.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref):
    # blocks: q/k/v (1, cw, hg, N, hd); bias (hg, N, N); mask (cw, N, N).
    # The window-chunk and head-group dims collapse into one batch dim for
    # the dots (video geometry has many small windows — per-window steps
    # are latency-bound there).
    _, cw, hg, n, hd = q_ref.shape
    q = q_ref[0].astype(jnp.float32).reshape(cw * hg, n, hd)
    k = k_ref[0].astype(jnp.float32).reshape(cw * hg, n, hd)
    v = v_ref[0].astype(jnp.float32).reshape(cw * hg, n, hd)
    bias = bias_ref[...].astype(jnp.float32)  # (hg, N, N)

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (cw*hg, N, N)
    s = s.reshape(cw, hg, n, n) + bias[None]
    if mask_ref is not None:
        s = s + mask_ref[...].astype(jnp.float32)[:, None]
    s = s.reshape(cw * hg, n, n)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    z = jnp.sum(e, axis=-1, keepdims=True)
    p = e / z
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (cw*hg, N, hd)
    out_ref[0] = o.reshape(cw, hg, n, hd).astype(out_ref.dtype)


def _pick_head_group(h: int, n: int, budget: int) -> int:
    """Largest divisor of h whose f32 (hg, N, N) tile fits the budget —
    bounds the score+bias tiles in VMEM (Swin-B stage 4 has 32 heads;
    video Swin-T has 3, which halving alone could never split)."""
    for hg in range(h, 0, -1):
        if h % hg == 0 and hg * n * n * 4 <= budget:
            return hg
    return 1


def _attn_tiling(h: int, nw: int, n: int, hd: int, itemsize: int,
                 score_tiles: int, budget: int):
    """Joint (head-group, window-chunk) search: maximize the per-step dot
    batch cw*hg (ties -> larger hg, which amortizes the resident bias)
    subject to `score_tiles` live f32 (n, n) arrays per batch slot plus
    the double-buffered I/O blocks fitting `budget` bytes. None when even
    a single slot overflows.

    Measured on v5e: these kernels win at 2D window sizes (N = 49/144)
    and LOSE at video windows — N=392 was 245 vs 187 ms/step (XLA) for a
    Swin-T 8-frame train step even with cw*hg = 4 slots, and N=1152
    overflows outright — so N > 256 always falls back to XLA (whose
    pipelined einsums handle the big-but-bandwidth-friendly score
    tensors better than a latency-bound many-small-steps grid)."""
    if n > 256:
        return None
    best = None
    for hg in range(h, 0, -1):
        if h % hg:
            continue
        for cw in range(1, nw + 1):
            if nw % cw:
                continue
            slots = cw * hg
            cost = (hg * n * n * 4                      # bias block
                    + score_tiles * slots * n * n * 4   # live score tiles
                    + 2 * cw * n * n * 2                # bf16 mask (dbl-buf)
                    + 2 * 5 * slots * n * hd * itemsize)  # qkv/o/do blocks
            if cost <= budget:
                key = (slots, hg)
                if best is None or key > best[0]:
                    best = (key, hg, cw)
    if best is None:
        return None
    _, hg, cw = best
    if cw * hg < 2 and h * nw > cw * hg:
        return None  # too little per-step work to beat XLA
    return hg, cw


def _attn_fwd_tiling(h: int, nw: int, n: int, hd: int, itemsize: int = 4):
    return _attn_tiling(h, nw, n, hd, itemsize, score_tiles=3,
                        budget=11 * 1024 * 1024)


def attn_fwd_supported(nw: int, n: int, heads: int, hd: int) -> bool:
    return _attn_fwd_tiling(heads, nw, n, hd) is not None


def _fwd(q, k, v, bias, mask, scale):
    b, nw, h, n, hd = q.shape
    dt = q.dtype
    qs = (q * jnp.asarray(scale, dt))

    hg, cw = _attn_fwd_tiling(h, nw, n, hd)

    def qkv_spec():
        return pl.BlockSpec((1, cw, hg, n, hd),
                            lambda i, j, g: (i, j, g, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [qkv_spec(), qkv_spec(), qkv_spec(),
                pl.BlockSpec((hg, n, n), lambda i, j, g: (g, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [qs, k, v, bias]
    if mask is not None:
        in_specs.append(pl.BlockSpec((cw, n, n), lambda i, j, g: (j, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask.astype(jnp.bfloat16))  # 0/-100: exact in bf16
        kernel = _fwd_kernel
    else:
        def kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
            _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, None, out_ref)

    flops = 2 * 2 * b * nw * h * n * n * hd
    return pl.pallas_call(
        kernel,
        grid=(b, nw // cw, h // hg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, cw, hg, n, hd),
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
    if attention_core_bwd_supported(n, h, hd, nw):
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


# ---------------------------------------------------------------------------
# Attention-core backward kernel (used by fused_msa's VJP)
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, o_ref, *, scale: float):
    """One (head-group, batch, window-chunk) step: recompute scores/probs
    in VMEM and emit dq/dk/dv, the accumulated dbias, and the recomputed
    attention output o (so the caller's projection grads need no second
    pass). Blocks are (1, cw, hg, N, hd) — the chunk and group dims
    collapse into one batch dim for the dots."""
    i_idx = pl.program_id(1)
    j_idx = pl.program_id(2)
    _, cw, hg, n, hd = q_ref.shape

    q = q_ref[0].astype(jnp.float32).reshape(cw * hg, n, hd) * scale
    k = k_ref[0].astype(jnp.float32).reshape(cw * hg, n, hd)
    v = v_ref[0].astype(jnp.float32).reshape(cw * hg, n, hd)
    do = do_ref[0].astype(jnp.float32).reshape(cw * hg, n, hd)

    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s.reshape(cw, hg, n, n) + bias_ref[...].astype(jnp.float32)[None]
    if mask_ref is not None:
        s = s + mask_ref[...].astype(jnp.float32)[:, None]
    s = s.reshape(cw * hg, n, n)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (cw*hg, N, N)

    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.reshape(cw, hg, n, hd).astype(o_ref.dtype)

    # dv[m, d] = sum_r p[r, m] * do[r, d]
    dv = jax.lax.dot_general(p, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dv_ref[0] = dv.reshape(cw, hg, n, hd).astype(dv_ref.dtype)

    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.reshape(cw, hg, n, hd).astype(dq_ref.dtype)
    # dk[m, d] = sum_r ds[r, m] * (q*scale)[r, d]
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk_ref[0] = dk.reshape(cw, hg, n, hd).astype(dk_ref.dtype)

    # dbias accumulates over all (batch, window-chunk) steps of this head
    # group; the group dim is OUTERMOST so visits are consecutive and
    # Mosaic keeps the block resident.
    @pl.when(jnp.logical_and(i_idx == 0, j_idx == 0))
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dbias_ref[...] += ds.reshape(cw, hg, n, n).sum(0).astype(
        dbias_ref.dtype)


def _attn_bwd_tiling(h: int, nw: int, n: int, hd: int, itemsize: int = 4):
    """(head-group, window-chunk) for the backward core kernel, or None.
    One extra resident (hg, n, n) block vs the forward (the dbias
    accumulator) and ~4 live score tiles per slot; the 8 MB budget is
    empirical — Swin-B stage 4 at hg=16 lands at 20.7 MB scoped (OOM)
    where the estimate says 11, so the budget keeps stage 4 at hg=8."""
    return _attn_tiling(h, nw, n, hd, itemsize, score_tiles=5,
                        budget=8 * 1024 * 1024)


def attention_core_bwd_supported(n: int, heads: int, hd: int,
                                 nw: int = 1) -> bool:
    return _attn_bwd_tiling(heads, nw, n, hd) is not None


def attention_core_bwd(q, k, v, bias, mask, do, scale: float):
    """Backward of softmax(q·kᵀ·scale + bias + mask)·v, fully in VMEM.

    q/k/v/do: (B, nW, h, N, hd); bias (h, N, N); mask (nW, N, N) or None.
    Returns (dq, dk, dv, dbias, o) — o is the recomputed attention output.
    The mask cotangent is identically zero for the model (the shift mask is
    a function of integer region ids), so it is not computed.
    """
    b, nw, h, n, hd = q.shape
    dt = q.dtype

    hg, cw = _attn_bwd_tiling(h, nw, n, hd)

    def qkv_spec():
        return pl.BlockSpec((1, cw, hg, n, hd),
                            lambda g, i, j: (i, j, g, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [qkv_spec(), qkv_spec(), qkv_spec(),
                pl.BlockSpec((hg, n, n), lambda g, i, j: (g, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [q, k, v, bias]
    if mask is not None:
        in_specs.append(pl.BlockSpec((cw, n, n), lambda g, i, j: (j, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask.astype(jnp.bfloat16))  # 0/-100: exact in bf16
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
        grid=(h // hg, b, nw // cw),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=b * nw * h * n * n,
            bytes_accessed=q.size * q.dtype.itemsize * 8),
    )(*args)
