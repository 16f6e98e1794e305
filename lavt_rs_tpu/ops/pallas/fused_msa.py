"""Fully fused windowed MSA: qkv projection + attention + out projection
in one Pallas kernel.

Motivation (measured on v5e, Swin-B 480², bs 16): the attention-only kernel
(window_attn.py) removes the HBM score tensor but still leaves the qkv/proj
GEMMs and the 6-D q/k/v layout transposes to XLA.  This kernel takes the
*windowed tokens* (B, nW, N, C) plus the projection weights and produces the
projected attention output directly — no (B, nW, h, N, hd) intermediates in
HBM at all.

Mosaic note: the kernel uses only 2-D values with static lane slices —
full-width q/k/v GEMMs (K = C on the MXU) followed by a statically unrolled
per-head loop that lane-slices (N, C) into (N, hd) views; heads re-merge via
per-head out-projection slices summed into the (N, C) accumulator
(concat+proj == sum of per-head projections).  Lane-splitting reshapes like
(N, 3C) -> (N, 3, h, hd) and 3-D-rhs dots fail Mosaic's layout inference.

Grid is (B, nW); weight blocks use a constant index map so Mosaic keeps
them resident in VMEM across grid steps.

Backward: recompute-based custom VJP in XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
            wp_ref, bp_ref, bias_ref, mask_ref, out_ref, *,
            heads: int, scale: float):
    """Processes a CHUNK of ch windows per grid step.

    One window per step (grid b*nW) is latency-bound: at Swin-B stage 1
    that is 1600 steps of (144, 128) tiles, ~5us fixed cost each.  Chunking
    turns the qkv/out projections into (ch*N, C) GEMMs and batches the
    per-head attention dots over the chunk, amortizing the step overhead.

    Mosaic notes: projections are 2-D with static lane slices (lane-dim
    reshapes like (N, 3C)->(N, 3, h, hd) fail layout inference); the head
    loop is a static Python unroll; the per-head score/out dots are 3-D
    dot_generals batched over the chunk dim."""
    ch, n, c = x_ref.shape
    hd = c // heads
    x = x_ref[...].reshape(ch * n, c)  # leading-dim collapse only

    # Full-width projections — the MXU-heavy GEMMs with K = C.
    q_all = jnp.dot(x, wq_ref[...], preferred_element_type=jnp.float32)
    q_all = (q_all + bq_ref[...].astype(jnp.float32)[None]) * scale
    k_all = jnp.dot(x, wk_ref[...], preferred_element_type=jnp.float32)
    k_all = (k_all + bk_ref[...].astype(jnp.float32)[None]).astype(x.dtype)
    v_all = jnp.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
    v_all = (v_all + bv_ref[...].astype(jnp.float32)[None]).astype(x.dtype)

    y = jnp.zeros((ch * n, c), jnp.float32)
    batched = (((2,), (2,)), ((0,), (0,)))  # contract hd, batch chunk
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        q = q_all[:, sl].astype(x.dtype).reshape(ch, n, hd)
        k = k_all[:, sl].reshape(ch, n, hd)
        v = v_all[:, sl].reshape(ch, n, hd)
        s = jax.lax.dot_general(q, k, batched,
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[h].astype(jnp.float32)[None]
        if mask_ref is not None:
            s = s + mask_ref[...].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        o = jax.lax.dot_general(  # (ch, n, n) @ (ch, n, hd) -> (ch, n, hd)
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # per-head slice of the out projection; summing heads == concat+proj
        y = y + jnp.dot(o.astype(x.dtype).reshape(ch * n, hd), wp_ref[sl, :],
                        preferred_element_type=jnp.float32)
    y = y + bp_ref[...].astype(jnp.float32)[None]
    out_ref[...] = y.reshape(ch, n, c).astype(out_ref.dtype)


def fused_msa_supported(nw: int, n: int, c: int, heads: int,
                        itemsize: int = 2) -> bool:
    """Whether the fused kernel fits VMEM at all for this window geometry.

    Weights (4c² resident), the f32 bias (h, n, n), and one chunk's buffers
    must fit ~12 MB of the 16 MB scoped budget.  Video Swin with window
    (8, 12, 12) has n=1152 — its bias alone is 15.9 MB, so those configs
    fall back (measured OOM: 16.68M scoped at Swin-T video stage 1)."""
    weights = 4 * c * c * itemsize
    bias = heads * n * n * 4
    ch1 = (n * c * itemsize + 3 * n * c * 4 + n * n * 4 + n * c * 4
           + n * n * 4)
    return weights + bias + 2 * ch1 <= 12 * 1024 * 1024


def _pick_chunk(nw: int, n: int, c: int, heads: int, itemsize: int) -> int:
    """Largest divisor of nw whose per-step VMEM footprint stays under a
    ~6 MB budget (16 MB VMEM minus weights, bias, and double-buffering).

    The budget is empirical: at Swin-B stage 1 (n=144, c=128) chunk 20
    (est. ~10 MB) lands at 16.52 MB scoped-vmem — right at the 16 MB
    limit, compiling on some runs and OOMing on others — so the budget
    stays at 6 MB (chunk 10) for deterministic compiles."""
    best = 1
    for ch in range(1, nw + 1):
        if nw % ch:
            continue
        buf = (ch * n * c * itemsize          # x block
               + 3 * ch * n * c * 4           # q f32 + k/v (pre-cast peak)
               + ch * n * n * 4               # one head's scores
               + ch * n * c * 4               # y accumulator
               + ch * n * n * 4)              # mask block
        if buf <= 6 * 1024 * 1024:
            best = ch
    return best


def _split_weights(wqkv, bqkv, wproj, heads):
    """Host-side split: wqkv (C, 3C) -> three (C, C); bqkv -> three (C,).

    The head interleaving inside each C-wide block already matches the
    (h, hd) lane order, so in-kernel head slicing is a static lane slice.
    """
    c = wqkv.shape[0]
    wq, wk, wv = wqkv[:, :c], wqkv[:, c:2 * c], wqkv[:, 2 * c:]
    bq, bk, bv = bqkv[:c], bqkv[c:2 * c], bqkv[2 * c:]
    return wq, wk, wv, bq, bk, bv, wproj


def _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale):
    b, nw, n, c = x.shape
    dt = x.dtype
    wq, wk, wv, bq, bk, bv, wp = _split_weights(
        wqkv.astype(dt), bqkv, wproj.astype(dt), heads)

    ch = _pick_chunk(nw, n, c, heads, jnp.dtype(dt).itemsize)
    m = b * nw
    xm = x.reshape(m, n, c)

    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((ch, n, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        const(wq), const(wk), const(wv), const(bq), const(bk), const(bv),
        const(wp), const(bproj), const(bias),
    ]
    args = [xm, wq, wk, wv, bq, bk, bv, wp, bproj, bias]
    if mask is not None:
        # chunk i covers windows [i*ch, (i+1)*ch) of image i*ch//nw; since
        # ch | nw the chunk never crosses an image, and its in-image window
        # offset is (i mod nw//ch) in block units.
        per_img = nw // ch
        in_specs.append(pl.BlockSpec((ch, n, n), lambda i: (i % per_img, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
        kernel = functools.partial(_kernel, heads=heads, scale=scale)
    else:
        def kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
                   wp_ref, bp_ref, bias_ref, out_ref):
            _kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
                    wp_ref, bp_ref, bias_ref, None, out_ref, heads=heads,
                    scale=scale)

    flops = 2 * b * nw * (n * c * 3 * c + 2 * heads * n * n * (c // heads)
                          + n * c * c)
    out = pl.pallas_call(
        kernel,
        grid=(m // ch,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ch, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=b * nw * heads * n * n,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (wqkv.size + wproj.size) * 2),
    )(*args)
    return out.reshape(b, nw, n, c)


def _kernel_2d(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
               wp_ref, bp_ref, bias_ref, mask_ref, out_ref, *,
               heads: int, scale: float, ws: int):
    """Same math as _kernel on one window sliced out of a (1, ws, Wp, C)
    row-of-windows tile.  Mosaic requires the last two block dims to be
    (8k, 128m)-aligned, which a bare (ws, ws) window tile violates for
    ws=7/12 — so the block is the full padded row (Wp is a ws multiple and
    C is 128-aligned for every fused stage), its index map ignores the
    innermost grid dim (Mosaic then keeps it VMEM-resident across the row),
    and the per-window slice happens in-kernel."""
    c = x_ref.shape[3]
    n = ws * ws
    hd = c // heads
    w_idx = pl.program_id(2)
    x = x_ref[0, :, pl.dslice(w_idx * ws, ws), :].reshape(n, c)

    q_all = jnp.dot(x, wq_ref[...], preferred_element_type=jnp.float32)
    q_all = (q_all + bq_ref[...].astype(jnp.float32)[None]) * scale
    k_all = jnp.dot(x, wk_ref[...], preferred_element_type=jnp.float32)
    k_all = k_all + bk_ref[...].astype(jnp.float32)[None]
    v_all = jnp.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
    v_all = v_all + bv_ref[...].astype(jnp.float32)[None]

    y = jnp.zeros((n, c), jnp.float32)
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        q = q_all[:, sl]
        k = k_all[:, sl]
        v = v_all[:, sl].astype(x.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[h].astype(jnp.float32)
        if mask_ref is not None:
            s = s + mask_ref[0].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        y = y + jnp.dot(o.astype(x.dtype), wp_ref[sl, :],
                        preferred_element_type=jnp.float32)
    y = y + bp_ref[...].astype(jnp.float32)[None]
    out_ref[0, :, pl.dslice(w_idx * ws, ws), :] = (
        y.reshape(ws, ws, c).astype(out_ref.dtype))


def _fwd_2d(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale, ws):
    """x: (B, Hp, Wp, C) padded + (if shifted) pre-rolled feature map."""
    b, hp, wp_, c = x.shape
    dt = x.dtype
    nwh, nww = hp // ws, wp_ // ws
    wq, wk, wv, bq, bk, bv, wpj = _split_weights(
        wqkv.astype(dt), bqkv, wproj.astype(dt), heads)

    const = lambda a: pl.BlockSpec(a.shape, lambda i, j, k_: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, ws, wp_, c), lambda i, j, k_: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        row_spec,
        const(wq), const(wk), const(wv), const(bq), const(bk), const(bv),
        const(wpj), const(bproj), const(bias),
    ]
    args = [x, wq, wk, wv, bq, bk, bv, wpj, bproj, bias]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, ws * ws, ws * ws),
                         lambda i, j, k_: (j * nww + k_, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(mask)
        kernel = functools.partial(_kernel_2d, heads=heads, scale=scale,
                                   ws=ws)
    else:
        def kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
                   wp_ref, bp_ref, bias_ref, out_ref):
            _kernel_2d(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
                       bv_ref, wp_ref, bp_ref, bias_ref, None, out_ref,
                       heads=heads, scale=scale, ws=ws)

    n = ws * ws
    flops = 2 * b * nwh * nww * (n * c * 3 * c
                                 + 2 * heads * n * n * (c // heads)
                                 + n * c * c)
    return pl.pallas_call(
        kernel,
        grid=(b, nwh, nww),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ws, wp_, c),
                               lambda i, j, k_: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp_, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=b * nwh * nww * heads * n * n,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (wqkv.size + wproj.size) * 2),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_window_msa_2d(x, wqkv, bqkv, wproj, bproj, bias, mask,
                        heads: int, scale: float, ws: int):
    """Window partition + MSA + reverse fused over a padded (and, for
    shifted blocks, pre-rolled) (B, Hp, Wp, C) feature map.

    STATUS: correct in interpret mode, but NOT yet usable on real TPUs —
    the in-kernel window slices sit at ws-multiple (e.g. 12k) sublane
    offsets, which Mosaic's (8, 128) tiling rejects (the remote compile
    crashes).  The model path therefore uses fused_window_msa on
    XLA-partitioned windows; this kernel is kept for when Mosaic grows
    unaligned-sublane slicing."""
    return _fwd_2d(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale, ws)


def _ref_forward_2d(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale,
                    ws):
    from ...ops.window import window_partition, window_reverse

    b, hp, wp_, c = x.shape
    nw = (hp // ws) * (wp_ // ws)
    xw = window_partition(x, ws).reshape(b, nw, ws * ws, c)
    y = _ref_forward(xw, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale)
    return window_reverse(y.reshape(b * nw, ws * ws, c), ws, hp, wp_)


def _vjp_fwd_2d(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale, ws):
    out = _fwd_2d(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale, ws)
    return out, (x, wqkv, bqkv, wproj, bproj, bias, mask)


def _vjp_bwd_2d(heads, scale, ws, res, g):
    x, wqkv, bqkv, wproj, bproj, bias, mask = res

    def f(x, wqkv, bqkv, wproj, bproj, bias, mask):
        return _ref_forward_2d(x, wqkv, bqkv, wproj, bproj, bias, mask,
                               heads, scale, ws)

    _, vjp = jax.vjp(f, x, wqkv, bqkv, wproj, bproj, bias, mask)
    dx, dwqkv, dbqkv, dwproj, dbproj, dbias, dmask = vjp(
        g.astype(jnp.float32))
    return (dx.astype(x.dtype), dwqkv.astype(wqkv.dtype),
            dbqkv.astype(bqkv.dtype), dwproj.astype(wproj.dtype),
            dbproj.astype(bproj.dtype), dbias.astype(bias.dtype),
            None if mask is None else dmask.astype(mask.dtype))


fused_window_msa_2d.defvjp(_vjp_fwd_2d, _vjp_bwd_2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_window_msa(x, wqkv, bqkv, wproj, bproj, bias, mask,
                     heads: int, scale: float):
    """x: (B, nW, N, C) windowed tokens (post-LN);
    wqkv (C, 3C), bqkv (3C), wproj (C, C), bproj (C),
    bias (h, N, N), mask (nW, N, N) or None.
    Returns the projected attention output (B, nW, N, C)."""
    return _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale)


def _ref_forward(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale):
    """XLA reference (used for the backward recompute and parity tests)."""
    b, nw, n, c = x.shape
    hd = c // heads
    xf = x.astype(jnp.float32)
    qkv = jnp.einsum("bwnc,cd->bwnd", xf, wqkv.astype(jnp.float32)) + bqkv
    qkv = qkv.reshape(b, nw, n, 3, heads, hd)
    q = qkv[..., 0, :, :].transpose(0, 1, 3, 2, 4) * scale
    k = qkv[..., 1, :, :].transpose(0, 1, 3, 2, 4)
    v = qkv[..., 2, :, :].transpose(0, 1, 3, 2, 4)
    s = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k) + bias.astype(jnp.float32)
    if mask is not None:
        s = s + mask.astype(jnp.float32)[None, :, None]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bwhnm,bwhmd->bwhnd", p, v)
    o = o.transpose(0, 1, 3, 2, 4).reshape(b, nw, n, c)
    return jnp.einsum("bwnc,cd->bwnd", o, wproj.astype(jnp.float32)) + bproj


def _vjp_fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale):
    out = _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale)
    return out, (x, wqkv, bqkv, wproj, bproj, bias, mask)


def _vjp_bwd(heads, scale, res, g):
    """Decomposed backward: the qkv/out projections and their weight grads
    are plain XLA GEMMs (MXU-bound, cheap), while the attention core —
    whose XLA backward materializes two (B, nW, h, N, N) score tensors in
    HBM — runs in the attention_core_bwd Pallas kernel, which recomputes
    probs in VMEM and also returns the recomputed attention output for the
    out-projection weight grad.  The mask cotangent is identically zero
    (the shift mask is a function of integer region ids)."""
    from .window_attn import attention_core_bwd

    x, wqkv, bqkv, wproj, bproj, bias, mask = res
    b, nw, n, c = x.shape
    hd = c // heads
    f32 = jnp.float32
    xf = x.astype(f32)

    # recompute q/k/v (one GEMM) in the (3, h, hd) lane layout
    qkv = jnp.einsum("bwnc,cd->bwnd", xf, wqkv.astype(f32)) + bqkv
    qkv = qkv.reshape(b, nw, n, 3, heads, hd)
    q = qkv[..., 0, :, :].transpose(0, 1, 3, 2, 4)
    k = qkv[..., 1, :, :].transpose(0, 1, 3, 2, 4)
    v = qkv[..., 2, :, :].transpose(0, 1, 3, 2, 4)

    gf = g.astype(f32)
    dattn = jnp.einsum("bwnd,cd->bwnc", gf, wproj.astype(f32))
    do = dattn.reshape(b, nw, n, heads, hd).transpose(0, 1, 3, 2, 4)

    dq, dk, dv, dbias, o = attention_core_bwd(
        q.astype(f32), k.astype(f32), v.astype(f32), bias, mask,
        do.astype(f32), float(scale))

    attn_out = o.transpose(0, 1, 3, 2, 4).reshape(b, nw, n, c)
    dwproj = jnp.einsum("bwnc,bwnd->cd", attn_out.astype(f32), gf)
    dbproj = gf.sum((0, 1, 2))

    def merge(t):  # (b, nw, h, n, hd) -> (b, nw, n, c)
        return t.transpose(0, 1, 3, 2, 4).reshape(b, nw, n, c)

    dqkv = jnp.concatenate(
        [merge(dq.astype(f32)), merge(dk.astype(f32)),
         merge(dv.astype(f32))], axis=-1)  # same (3, h, hd) lane order
    dx = jnp.einsum("bwnd,cd->bwnc", dqkv, wqkv.astype(f32))
    dwqkv = jnp.einsum("bwnc,bwnd->cd", xf, dqkv)
    dbqkv = dqkv.sum((0, 1, 2))

    return (dx.astype(x.dtype), dwqkv.astype(wqkv.dtype),
            dbqkv.astype(bqkv.dtype), dwproj.astype(wproj.dtype),
            dbproj.astype(bproj.dtype), dbias.astype(bias.dtype),
            None if mask is None else jnp.zeros_like(mask))


fused_window_msa.defvjp(_vjp_fwd, _vjp_bwd)
