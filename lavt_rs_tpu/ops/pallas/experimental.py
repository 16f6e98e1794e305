"""EXPERIMENTAL: whole-feature-map fused windowed MSA.

fused_window_msa_2d fuses window partition + MSA + window reverse over a
padded (B, Hp, Wp, C) feature map in ONE kernel — no (B, nW, N, C)
partition tensors in HBM at all.  It is correct in interpret mode (tested
in tests/test_pallas_window_attn.py) but NOT usable on real TPUs today:
the in-kernel window slices sit at ws-multiple (e.g. 12k) sublane offsets,
which Mosaic's (8, 128) tiling rejects (the remote compile crashes).  The
production path routes fused_window_msa (fused_msa.py) over
XLA-partitioned windows instead; revisit when Mosaic grows
unaligned-sublane slicing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_msa import _ref_forward, _split_weights


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
