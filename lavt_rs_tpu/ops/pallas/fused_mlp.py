"""Fused LayerNorm -> MLP (fc1 -> exact GELU -> fc2) -> residual add.

Motivation (measured on v5e, Swin-B 480², bs 16): one stage-1 SwinBlock
costs 6.2 ms while its fused MSA is only 1.9 ms — the tail (LN2 + fc1 +
gelu + fc2 + residual) makes many full passes over the 59 MB (B, L, C)
activation plus a 236 MB fc1 intermediate in HBM.  This kernel keeps the
(chunk, 4C) hidden activation in VMEM: the activation is read once and the
result written once.

Used for the SwinBlock tail when MLP dropout is inactive (inference, or
training with drop_rate 0 — the LAVT default); true dropout falls back to
XLA.  DropPath (stochastic depth) IS supported in-kernel: a per-row
keep/scale block scales the MLP branch before the residual add
(fused_ln_mlp_droppath), so the training forward keeps the
single-HBM-pass tail.  Weights are VMEM-resident via constant index maps,
so the kernel is limited to C <= 512 (Swin-B stage 4's C=1024 needs 16 MB
of fc weights alone).

Backward: fused Pallas kernels with VMEM-resident weight-grad
accumulators — the full kernel at C <= 256, a hidden-split variant (weight
slices per group, LN backward finished in XLA) at C = 512 — with an
XLA-recompute fallback outside both gates.
"""

from __future__ import annotations

import functools
import os

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


def _kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            *, keep_ref=None):
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
    if keep_ref is not None:
        # DropPath: per-row keep/scale factors, an (tc, 1) f32 block
        # broadcast over channels.
        y = y * keep_ref[...]
    out_ref[...] = (xf + y).astype(out_ref.dtype)


def _pick_rows(m: int, c: int, hidden: int, itemsize: int) -> int:
    """Largest divisor of m whose footprint (x + xn + h f32 + out, double-
    buffered x/out, plus the VMEM-resident w1/w2) fits a ~12 MB budget.

    The per-step GEMM at narrow stages is tiny (Swin-B stage 1: a
    (1600, 128) block is ~0.4 GFLOP ≈ 2 us at peak), so the grid-step
    fixed cost dominates — the budget counts the resident weights so
    narrow stages (small weights) get the large row blocks they can
    afford while wide stages (Swin-B stage 3: 4.2 MB of weights) keep
    their measured-safe chunks.

    Sub-full blocks must have a sublane dim divisible by 8 (Mosaic (8, 128)
    tiling); when m has no such divisor (e.g. m = 2700 rows from an
    sp=3-sentence eval batch at 30x30 tokens) returns 0 and the caller
    falls back to the XLA chain — a (1, C) block is NOT legal."""
    best = 0
    weights = 2 * c * hidden * itemsize
    budget = 12 * 1024 * 1024 - weights
    for tc in range(1, min(m, 8192) + 1):
        if m % tc or (tc != m and tc % 8):
            continue
        buf = (2 * tc * c * itemsize      # x + out (double-buffered pair)
               + tc * c * 4               # xn f32
               + tc * hidden * 4          # h f32
               + tc * c * 4)              # residual accum f32
        if buf <= budget:
            best = tc
    return best


def _fwd(x, g, be, w1, b1, w2, b2, keep_rows=None):
    m, c = x.shape
    hidden = w1.shape[1]
    dt = x.dtype
    w1c = w1.astype(dt)
    w2c = w2.astype(dt)
    tc = _pick_rows(m, c, hidden, jnp.dtype(dt).itemsize)
    if tc < 1:
        # No Mosaic-legal row block for this m: same math through XLA.
        y = _ref_forward(x, g, be, w1, b1, w2, b2)
        if keep_rows is not None:
            xf = x.astype(jnp.float32)
            y = xf + (y - xf) * keep_rows
        return y.astype(dt)

    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((tc, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        const(g), const(be), const(w1c), const(b1), const(w2c),
        const(b2),
    ]
    args = [x, g, be, w1c, b1, w2c, b2]
    if keep_rows is None:
        kernel = _kernel
    else:
        in_specs.append(pl.BlockSpec((tc, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(keep_rows)

        def kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   keep_ref, out_ref):
            _kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    out_ref, keep_ref=keep_ref)

    flops = 2 * m * c * hidden * 2
    return pl.pallas_call(
        kernel,
        grid=(m // tc,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tc, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=m * hidden,
            bytes_accessed=2 * m * c * jnp.dtype(dt).itemsize
            + (w1.size + w2.size) * 2),
    )(*args)


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


def _bwd_dispatch(x, gr, g, be, w1, b1, w2, keep_rows):
    """Pallas backward if the full kernel or a hidden-split fits VMEM,
    else None (caller falls back to the XLA recompute)."""
    m, c = x.shape
    hidden = w1.shape[1]
    it = jnp.dtype(x.dtype).itemsize
    if fused_ln_mlp_bwd_supported(m, c, hidden, it):
        return _bwd(x, gr, g, be, w1, b1, w2, keep_rows)
    groups = _pick_hidden_groups(m, c, hidden, it)
    if groups is not None:
        return _bwd_hsplit(x, gr, g, be, w1, b1, w2, keep_rows, groups)
    return None


def _vjp_bwd(res, gr):
    x, g, be, w1, b1, w2, b2 = res

    outs = _bwd_dispatch(x, gr, g, be, w1, b1, w2, None)
    if outs is not None:
        dx, dg, dbe, dw1, db1, dw2, db2 = outs
        return (dx.astype(x.dtype), dg.astype(g.dtype), dbe.astype(be.dtype),
                dw1.astype(w1.dtype), db1.astype(b1.dtype),
                dw2.astype(w2.dtype), db2.astype(b2.dtype))

    def f(x, g, be, w1, b1, w2, b2):
        return _ref_forward(x, g, be, w1, b1, w2, b2).astype(x.dtype)

    _, vjp = jax.vjp(f, x, g, be, w1, b1, w2, b2)
    return vjp(gr)


fused_ln_mlp.defvjp(_vjp_fwd, _vjp_bwd)


def _bwd_kernel(x_ref, gy_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref,
                keep_ref, dx_ref, dw1_ref, dw2_ref, db1_ref, db2_ref,
                dg_ref, dbe_ref):
    """Fused backward of LN -> fc1 -> GELU -> fc2 -> (droppath) residual:
    recomputes the forward in VMEM per chunk (the (tc, hidden) activation
    never touches HBM) and accumulates all weight/bias/LN grads in VMEM
    across the sequential grid."""
    i = pl.program_id(0)
    f32 = jnp.float32
    x = x_ref[...]
    dt = x.dtype
    xf = x.astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mu) * rstd
    gv = g_ref[...].astype(f32)[None]
    xn = xhat * gv + be_ref[...].astype(f32)[None]
    xn_c = xn.astype(dt)
    hpre = jnp.dot(xn_c, w1_ref[...], preferred_element_type=f32)
    hpre = hpre + b1_ref[...].astype(f32)[None]
    cdf = 0.5 * (1.0 + _erf(hpre * (2.0 ** -0.5)))
    h = hpre * cdf

    gy = gy_ref[...].astype(f32)
    dmlp = gy * keep_ref[...] if keep_ref is not None else gy
    dmlp_c = dmlp.astype(dt)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)

    rowsT = (((0,), (0,)), ((), ()))  # a^T @ b over rows
    laneT = (((1,), (1,)), ((), ()))  # a @ b^T over lanes
    db2_ref[...] += dmlp.sum(0)[None]
    dw2_ref[...] += jax.lax.dot_general(h.astype(dt), dmlp_c, rowsT,
                                        preferred_element_type=f32)
    dh = jax.lax.dot_general(dmlp_c, w2_ref[...], laneT,
                             preferred_element_type=f32)
    pdf = jnp.exp(-0.5 * hpre * hpre) * 0.3989422804014327
    dhpre = dh * (cdf + hpre * pdf)
    dhpre_c = dhpre.astype(dt)
    db1_ref[...] += dhpre.sum(0)[None]
    dw1_ref[...] += jax.lax.dot_general(xn_c, dhpre_c, rowsT,
                                        preferred_element_type=f32)
    dyln = jax.lax.dot_general(dhpre_c, w1_ref[...], laneT,
                               preferred_element_type=f32)
    dg_ref[...] += (dyln * xhat).sum(0)[None]
    dbe_ref[...] += dyln.sum(0)[None]
    dxhat = dyln * gv
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[...] = (gy + dx_ln).astype(dx_ref.dtype)


def _bwd_kernel_hsplit(x_ref, gy_ref, g_ref, be_ref, w1_ref, b1_ref,
                       w2_ref, keep_ref, dyln_ref, dw1_ref, dw2_ref,
                       db1_ref, db2_ref):
    """Hidden-split backward: covers a SLICE of the hidden dim (w1 columns
    / w2 rows), so wide stages (C=512, hidden=2048) whose full weight +
    accumulator set exceeds VMEM still avoid the (M, hidden) HBM
    intermediates. Emits the dyln partial (the LN backward runs in XLA
    after the group partials are summed) plus this slice's weight grads."""
    i = pl.program_id(0)
    f32 = jnp.float32
    x = x_ref[...]
    dt = x.dtype
    xf = x.astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xhat = (xf - mu) * jax.lax.rsqrt(var + _EPS)
    xn = xhat * g_ref[...].astype(f32)[None] + be_ref[...].astype(f32)[None]
    xn_c = xn.astype(dt)
    hpre = jnp.dot(xn_c, w1_ref[...], preferred_element_type=f32)
    hpre = hpre + b1_ref[...].astype(f32)[None]
    cdf = 0.5 * (1.0 + _erf(hpre * (2.0 ** -0.5)))
    h = hpre * cdf

    gy = gy_ref[...].astype(f32)
    dmlp = gy * keep_ref[...] if keep_ref is not None else gy
    dmlp_c = dmlp.astype(dt)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    rowsT = (((0,), (0,)), ((), ()))
    laneT = (((1,), (1,)), ((), ()))
    db2_ref[...] += dmlp.sum(0)[None]
    dw2_ref[...] += jax.lax.dot_general(h.astype(dt), dmlp_c, rowsT,
                                        preferred_element_type=f32)
    dh = jax.lax.dot_general(dmlp_c, w2_ref[...], laneT,
                             preferred_element_type=f32)
    pdf = jnp.exp(-0.5 * hpre * hpre) * 0.3989422804014327
    dhpre = dh * (cdf + hpre * pdf)
    dhpre_c = dhpre.astype(dt)
    db1_ref[...] += dhpre.sum(0)[None]
    dw1_ref[...] += jax.lax.dot_general(xn_c, dhpre_c, rowsT,
                                        preferred_element_type=f32)
    dyln_ref[...] = jax.lax.dot_general(dhpre_c, w1_ref[...], laneT,
                                        preferred_element_type=f32)


def _bwd_hsplit(x, gy, g, be, w1, b1, w2, keep_rows, groups: int):
    """Run _bwd_kernel_hsplit per hidden group, then finish the LN backward
    (and the residual add) in XLA from the summed dyln."""
    m, c = x.shape
    hidden = w1.shape[1]
    hg = hidden // groups
    dt = x.dtype
    f32 = jnp.float32
    tc = _pick_rows_bwd_split(m, c, hidden, groups,
                              jnp.dtype(dt).itemsize)

    dyln = None
    dw1_p, dw2_p, db1_p = [], [], []
    db2 = None
    for gi in range(groups):
        sl = slice(gi * hg, (gi + 1) * hg)
        w1g = w1[:, sl].astype(dt)
        w2g = w2[sl, :].astype(dt)
        const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                       memory_space=pltpu.VMEM)
        blk = pl.BlockSpec((tc, c), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        in_specs = [blk, blk, const(g), const(be), const(w1g),
                    const(b1[sl]), const(w2g)]
        args = [x, gy, g, be, w1g, b1[sl], w2g]
        if keep_rows is not None:
            in_specs.append(pl.BlockSpec((tc, 1), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))
            args.append(keep_rows)
            kernel = _bwd_kernel_hsplit
        else:
            def kernel(x_ref, gy_ref, g_ref, be_ref, w1_ref, b1_ref,
                       w2_ref, *out_refs):
                _bwd_kernel_hsplit(x_ref, gy_ref, g_ref, be_ref, w1_ref,
                                   b1_ref, w2_ref, None, *out_refs)

        cc = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                      memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=(m // tc,),
            in_specs=in_specs,
            out_specs=[blk, cc((c, hg)), cc((hg, c)), cc((1, hg)),
                       cc((1, c))],
            out_shape=[
                jax.ShapeDtypeStruct((m, c), f32),      # dyln partial
                jax.ShapeDtypeStruct((c, hg), f32),     # dw1 slice
                jax.ShapeDtypeStruct((hg, c), f32),     # dw2 slice
                jax.ShapeDtypeStruct((1, hg), f32),     # db1 slice
                jax.ShapeDtypeStruct((1, c), f32),      # db2
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * m * c * hg * 6, transcendentals=3 * m * hg,
                bytes_accessed=3 * m * c * jnp.dtype(dt).itemsize
                + (w1g.size + w2g.size) * 2),
        )(*args)
        dyln = outs[0] if dyln is None else dyln + outs[0]
        dw1_p.append(outs[1])
        dw2_p.append(outs[2])
        db1_p.append(outs[3][0])
        if db2 is None:
            db2 = outs[4][0]

    # LN backward + residual in XLA (elementwise over (M, C), fused).
    xf = x.astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mu) * rstd
    dg = (dyln * xhat).sum(0)
    dbe = dyln.sum(0)
    dxhat = dyln * g.astype(f32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (gy.astype(f32) + rstd * (dxhat - m1 - xhat * m2)).astype(dt)
    return (dx, dg, dbe, jnp.concatenate(dw1_p, axis=1),
            jnp.concatenate(db1_p), jnp.concatenate(dw2_p, axis=0), db2)


def _bwd_budget_bytes() -> int:
    """VMEM budget for the backward row-chunk pickers (MB).

    Default 10 MB is the measured OPTIMUM, not just measured-safe:
    the full bs-8 Swin-B train step (tools/bench_train.py, v5e) is
    119.6 ms at 10 MB vs 125.6 at 8 MB and 154.4 at 13 MB — larger
    row chunks starve Mosaic's double-buffering long before the 16 MB
    scoped-memory ceiling, so the "fewer grid steps" intuition loses.
    The LAVT_MLP_BWD_VMEM_MB override exists to re-run that A/B; like
    LAVT_MSA_CHUNK it bypasses no Mosaic legality checks other than
    this heuristic — it is a re-measurement hatch, not a tuning knob
    to ship."""
    try:
        return int(float(os.environ.get("LAVT_MLP_BWD_VMEM_MB", "10"))
                   * 1024 * 1024)
    except ValueError:
        return 10 * 1024 * 1024


def _pick_rows_bwd_split(m: int, c: int, hidden: int, groups: int,
                         itemsize: int) -> int:
    """Row chunk for the hidden-split backward (per-group weights)."""
    hg = hidden // groups
    fixed = 2 * c * hg * (itemsize + 4)
    budget = _bwd_budget_bytes()
    best = 0
    for tc in range(8, min(m, 2048) + 1, 8):
        if m % tc:
            continue
        buf = (2 * tc * c * itemsize        # x + gy blocks
               + tc * c * 4                 # dyln out block
               + 5 * tc * c * 4             # xf/xhat/xn/dmlp f32
               + 4 * tc * hg * 4)           # hpre/h/dh/dhpre f32
        if fixed + buf <= budget:
            best = tc
    return best


def _pick_hidden_groups(m: int, c: int, hidden: int, itemsize: int):
    for groups in (2, 4):
        if hidden % groups == 0 and _pick_rows_bwd_split(
                m, c, hidden, groups, itemsize) >= 8:
            return groups
    return None


def _pick_rows_bwd(m: int, c: int, hidden: int, itemsize: int) -> int:
    """Row-chunk chooser for the backward kernel (~10 MB minus the
    VMEM-resident weights and grad accumulators)."""
    fixed = 2 * c * hidden * (itemsize + 4)
    budget = _bwd_budget_bytes()
    best = 0
    for tc in range(8, min(m, 2048) + 1, 8):
        if m % tc:
            continue
        buf = (3 * tc * c * itemsize        # x + gy + dx blocks
               + 6 * tc * c * 4             # xf/xhat/xn/dyln/dxhat/dmlp f32
               + 4 * tc * hidden * 4)       # hpre/h/dh/dhpre f32
        if fixed + buf <= budget:
            best = tc
    return best


def fused_ln_mlp_bwd_supported(m: int, c: int, hidden: int,
                               itemsize: int = 2) -> bool:
    return _pick_rows_bwd(m, c, hidden, itemsize) >= 8


def _bwd(x, gy, g, be, w1, b1, w2, keep_rows):
    m, c = x.shape
    hidden = w1.shape[1]
    dt = x.dtype
    w1c = w1.astype(dt)
    w2c = w2.astype(dt)
    tc = _pick_rows_bwd(m, c, hidden, jnp.dtype(dt).itemsize)
    f32 = jnp.float32

    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((tc, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [blk, blk, const(g), const(be), const(w1c), const(b1),
                const(w2c)]
    args = [x, gy, g, be, w1c, b1, w2c]
    if keep_rows is not None:
        in_specs.append(pl.BlockSpec((tc, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(keep_rows)
        kernel = _bwd_kernel
    else:
        def kernel(x_ref, gy_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref,
                   *out_refs):
            _bwd_kernel(x_ref, gy_ref, g_ref, be_ref, w1_ref, b1_ref,
                        w2_ref, None, *out_refs)

    cc = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                  memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((m, c), dt),            # dx
        jax.ShapeDtypeStruct((c, hidden), f32),      # dw1
        jax.ShapeDtypeStruct((hidden, c), f32),      # dw2
        jax.ShapeDtypeStruct((1, hidden), f32),      # db1
        jax.ShapeDtypeStruct((1, c), f32),           # db2
        jax.ShapeDtypeStruct((1, c), f32),           # dg
        jax.ShapeDtypeStruct((1, c), f32),           # dbe
    ]
    out_specs = [blk, cc((c, hidden)), cc((hidden, c)), cc((1, hidden)),
                 cc((1, c)), cc((1, c)), cc((1, c))]
    flops = 2 * m * c * hidden * 6
    outs = pl.pallas_call(
        kernel,
        grid=(m // tc,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=3 * m * hidden,
            bytes_accessed=3 * m * c * jnp.dtype(dt).itemsize
            + (w1.size + w2.size) * 2),
    )(*args)
    dx, dw1, dw2, db1, db2, dg, dbe = outs
    return dx, dg[0], dbe[0], dw1, db1[0], dw2, db2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_ln_mlp_droppath(x, g, be, w1, b1, w2, b2, keep, rows: int):
    """DropPath variant: x (M, C) with M = B * rows tokens grouped by
    sample; keep (B,) f32 per-sample branch scale (0 or 1/keep_prob).
    Returns x + keep[sample] * fc2(gelu(fc1(LN(x))))."""
    keep_rows = jnp.repeat(keep.astype(jnp.float32), rows)[:, None]
    return _fwd(x, g, be, w1, b1, w2, b2, keep_rows)


def _ref_forward_droppath(x, g, be, w1, b1, w2, b2, keep, rows):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + _EPS)
    xn = xn * g.astype(jnp.float32) + be.astype(jnp.float32)
    h = xn.astype(x.dtype).astype(jnp.float32) @ w1.astype(jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=False)
    y = h.astype(x.dtype).astype(jnp.float32) @ w2.astype(jnp.float32) + b2
    s = jnp.repeat(keep.astype(jnp.float32), rows)[:, None]
    return xf + s * y


def _vjp_fwd_dp(x, g, be, w1, b1, w2, b2, keep, rows):
    keep_rows = jnp.repeat(keep.astype(jnp.float32), rows)[:, None]
    return _fwd(x, g, be, w1, b1, w2, b2, keep_rows), (
        x, g, be, w1, b1, w2, b2, keep)


def _vjp_bwd_dp(rows, res, gr):
    x, g, be, w1, b1, w2, b2, keep = res

    keep_rows = jnp.repeat(keep.astype(jnp.float32), rows)[:, None]
    outs = _bwd_dispatch(x, gr, g, be, w1, b1, w2, keep_rows)
    if outs is not None:
        dx, dg, dbe, dw1, db1, dw2, db2 = outs
        return (dx.astype(x.dtype), dg.astype(g.dtype), dbe.astype(be.dtype),
                dw1.astype(w1.dtype), db1.astype(b1.dtype),
                dw2.astype(w2.dtype), db2.astype(b2.dtype),
                jnp.zeros_like(keep))

    def f(x, g, be, w1, b1, w2, b2):
        return _ref_forward_droppath(x, g, be, w1, b1, w2, b2, keep,
                                     rows).astype(x.dtype)

    _, vjp = jax.vjp(f, x, g, be, w1, b1, w2, b2)
    # keep is a Bernoulli draw — no useful cotangent.
    return vjp(gr) + (jnp.zeros_like(keep),)


fused_ln_mlp_droppath.defvjp(_vjp_fwd_dp, _vjp_bwd_dp)
