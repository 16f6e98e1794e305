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

Grid is chunks of windows; weight blocks use a constant index map so
Mosaic keeps them resident in VMEM across grid steps.

Backward: a fully fused Pallas kernel in the same merged lane layout —
recompute + dx + all weight/bias/bias-table grads accumulated in VMEM,
head-group-split at wide stages (see _fused_bwd) — with a decomposed
XLA-GEMMs + attention-core-kernel fallback outside its VMEM gate.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softmax_exp(s, exact: bool = False):
    """exp() for the in-kernel softmax numerator.

    Inference default: shift-free with an overflow clamp — exp(min(s, 80)).
    Mathematically identical to max-subtracted softmax whenever every
    score is <= 80 (always, for real checkpoints: window-attention
    logits are O(10), and the shift/pad mask only SUBTRACTS), and the
    clamp rides the exp pass on the VPU, while the per-row max is a
    LANE-dim reduction + broadcast subtract that measured ~1.4 ms/step
    at Swin-B 480² bs 8 (31.9 -> 30.6 ms/step e2e).

    Training (exact=True — the custom-VJP forward and the backward
    recompute): the max-subtracted form.  A training run CAN drive
    logits past the clamp (lr spikes / exploding logits): above 80 the
    clamp collapses a row to uniform weights with a silently wrong
    gradient, and an all-below--87 row underflows to 0/0 = NaN — so
    the differentiated path pays the row-max pass for safety.  Both
    jax.grad legs use exact, so the backward's recomputed
    probabilities still match the taped forward bitwise.

    LAVT_SOFTMAX=exact / =clamp forces one form everywhere (read at
    trace time; `clamp` restores the pre-round-5 training behavior
    for A/B measurement)."""
    mode = os.environ.get("LAVT_SOFTMAX", "")
    if mode == "exact" or (exact and mode != "clamp"):
        return jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    return jnp.exp(jnp.minimum(s, 80.0))


def _kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
            wp_ref, bp_ref, bias_ref, mask_ref, out_ref, fat, *,
            heads: int, scale: float, ln_s_ref=None, ln_b_ref=None,
            ln_eps: float = 1e-5, exact: bool = False,
            qs_ref=None, ks_ref=None, vs_ref=None, p_ref=None,
            xs_ref=None):
    """Processes a CHUNK of ch windows per grid step.

    One window per step (grid b*nW) is latency-bound: at Swin-B stage 1
    that is 1600 steps of (144, 128) tiles, ~5us fixed cost each.  Chunking
    turns the qkv/out projections into (ch*N, C) GEMMs and batches the
    per-head attention dots over the chunk, amortizing the step overhead.

    The call may cover a SUBSET of heads (head-group splitting, see
    _fwd): wq/wk/wv then have cq = heads*hd < C columns and wp has cq
    rows; the partial output (this group's heads' contribution to the
    out-projection sum) is emitted in f32 and summed across groups by the
    caller.  bp_ref is None for groups > 0 (the projection bias is added
    exactly once).

    Mosaic notes: projections are 2-D with static lane slices (lane-dim
    reshapes like (N, 3C)->(N, 3, h, hd) fail layout inference); the head
    loop is a static Python unroll; the per-head score/out dots are 3-D
    dot_generals batched over the chunk dim."""
    ch, n, c = x_ref.shape
    cq = wq_ref.shape[1]
    hd = cq // heads
    x = x_ref[...].reshape(ch * n, c)  # leading-dim collapse only

    if ln_s_ref is not None:
        # Pre-attention LayerNorm fused in (rows are tokens, so LN
        # commutes with the window permutation): f32 stats, fast-variance
        # (E[x²]−E[x]², flax default).  Saves the separate XLA LN's full
        # HBM round-trip + the f32->bf16 convert per block.
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
        xn = (xf - mu) * jax.lax.rsqrt(var + ln_eps)
        x = (xn * ln_s_ref[...].astype(jnp.float32)[None]
             + ln_b_ref[...].astype(jnp.float32)[None]).astype(x.dtype)
        if xs_ref is not None:
            # post-LN tokens: the residual backward's "x" (dw/dx are wrt
            # the NORMALIZED stream; the LN backward chains in XLA)
            xs_ref[...] = x.reshape(ch, n, c)

    # Full-width projections — the MXU-heavy GEMMs with K = C.  The f32
    # accumulate + bias/scale epilogue casts straight back to x.dtype
    # (bit-identical to casting at the per-head slice, but the RESIDENT
    # q/k/v arrays are 2-byte — which is what lets _pick_chunk run
    # bigger chunks and amortize the per-grid-step overhead).
    q_all = jnp.dot(x, wq_ref[...], preferred_element_type=jnp.float32)
    q_all = ((q_all + bq_ref[...].astype(jnp.float32)[None])
             * scale).astype(x.dtype)
    k_all = jnp.dot(x, wk_ref[...], preferred_element_type=jnp.float32)
    k_all = (k_all + bk_ref[...].astype(jnp.float32)[None]).astype(x.dtype)
    v_all = jnp.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
    v_all = (v_all + bv_ref[...].astype(jnp.float32)[None]).astype(x.dtype)

    if qs_ref is not None:
        # Training residuals: the exact bf16 q (post-scale) / k / v this
        # forward used, so the fused backward skips its recompute GEMMs
        # (see _bwd_kernel's residual mode).
        qs_ref[...] = q_all.reshape(ch, n, cq)
        ks_ref[...] = k_all.reshape(ch, n, cq)
        vs_ref[...] = v_all.reshape(ch, n, cq)

    y = jnp.zeros((ch * n, c), jnp.float32)
    batched = (((2,), (2,)), ((0,), (0,)))  # contract hd, batch chunk
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        q = q_all[:, sl].reshape(ch, n, hd)
        k = k_all[:, sl].reshape(ch, n, hd)
        v = v_all[:, sl].reshape(ch, n, hd)
        s = jax.lax.dot_general(q, k, batched,
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[h].astype(jnp.float32)[None]
        if mask_ref is not None:
            s = s + mask_ref[...].astype(jnp.float32)
        e = _softmax_exp(s, exact)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        if p_ref is not None:
            # the very probabilities the taped output came from — the
            # backward's ds/dv/dp chains reuse them bit-identically
            p_ref[:, h] = p
        o = jax.lax.dot_general(  # (ch, n, n) @ (ch, n, hd) -> (ch, n, hd)
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if fat:
            # concat heads via lane-slice stores INTO OUT_REF's block
            # (reused as scratch — its (ch, n, C) VMEM is dead until the
            # final store, and dropping the separate (ch*n, cq) buffer
            # was worth ~0.9 MB at Swin-B stage 3, the margin that lets
            # chunk 6 fit the 16 MB scoped limit), then one fat K=C
            # projection GEMM after the loop (per-head K=hd=32 dots are
            # ~4× under the MXU's 128 systolic edge).  Measured win at
            # C>=256; at C=128 the per-head sum stays (see _use_fat_gemm).
            out_ref[:, :, sl] = o.astype(out_ref.dtype)
        else:
            y = y + jnp.dot(o.astype(x.dtype).reshape(ch * n, hd),
                            wp_ref[sl, :], preferred_element_type=jnp.float32)
    if fat:
        o_cat = out_ref[...][:, :, :cq].reshape(ch * n, cq).astype(x.dtype)
        y = jnp.dot(o_cat, wp_ref[...], preferred_element_type=jnp.float32)
    if bp_ref is not None:  # None for head-groups > 0 (bias added once)
        y = y + bp_ref[...].astype(jnp.float32)[None]
    out_ref[...] = y.reshape(ch, n, c).astype(out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
                bv_ref, wp_ref, bias_ref, mask_ref,
                dx_ref, dwq_ref, dwk_ref, dwv_ref, dwp_ref,
                dbq_ref, dbk_ref, dbv_ref, dbp_ref, dbias_ref,
                o_scr, dq_scr, dk_scr, dv_scr, *,
                heads: int, scale: float):
    """Fully fused MSA backward: recompute qkv + probs per chunk in VMEM,
    emit dx blocks, and accumulate every weight/bias/bias-table grad in
    VMEM across the sequential grid (constant-index-map outputs).

    Everything stays in the merged (rows, C) lane layout — per-head views
    are static lane slices, exactly like the forward kernel — so the
    backward needs NO (B, nW, h, N, hd) transposes in XLA at all (the
    previous decomposed backward spent ~40 ms/step on layout copies at
    Swin-B bs 8).

    MXU shaping: the per-head loop only does the attention-geometry dots
    (N×N×hd); everything that touches the weights runs AFTER the loop as
    one fat K=cq GEMM per tensor, fed from (rows, cq) VMEM scratch that
    the loop fills via static lane-slice stores (hd = 32-aligned).  The
    earlier per-head dx/dW dots had K = N = hd = 32 — ~4× under the MXU's
    128 systolic edge — and measured 27.6 ms/step at Swin-B stage 2 alone;
    the fat-GEMM form is the same math with full-width contractions.

    The call may cover a SUBSET of heads (head-group splitting, see
    _fused_bwd): the q/k/v weights then have cq = heads*hd < C columns,
    which shrinks both the VMEM-resident weights and the grad accumulators
    so wider stages (Swin-B stage 3, C=512/16 heads) still get multi-window
    chunks instead of a latency-bound chunk-of-1 grid."""
    ch, n, c = x_ref.shape
    cq = wq_ref.shape[1]
    hd = cq // heads
    i = pl.program_id(0)
    f32 = jnp.float32
    x = x_ref[...].reshape(ch * n, c)
    gy = g_ref[...].reshape(ch * n, c).astype(f32)
    gyc = gy.astype(x.dtype)

    # recompute projections (same math/casting as the forward kernel)
    q_all = jnp.dot(x, wq_ref[...], preferred_element_type=f32)
    q_all = (q_all + bq_ref[...].astype(f32)[None]) * scale
    k_all = jnp.dot(x, wk_ref[...], preferred_element_type=f32)
    k_all = (k_all + bk_ref[...].astype(f32)[None]).astype(x.dtype)
    v_all = jnp.dot(x, wv_ref[...], preferred_element_type=f32)
    v_all = (v_all + bv_ref[...].astype(f32)[None]).astype(x.dtype)

    # do (merged heads) = gy @ wp^T
    dattn = jax.lax.dot_general(gyc, wp_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)

    @pl.when(i == 0)
    def _init():
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dwk_ref[...] = jnp.zeros_like(dwk_ref)
        dwv_ref[...] = jnp.zeros_like(dwv_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dbk_ref[...] = jnp.zeros_like(dbk_ref)
        dbv_ref[...] = jnp.zeros_like(dbv_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    fat = o_scr is not None
    dx = None if fat else jnp.zeros((ch * n, c), f32)
    rowsT = (((0,), (0,)), ((), ()))          # a^T @ b over rows
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        q = q_all[:, sl].astype(x.dtype).reshape(ch, n, hd)
        k = k_all[:, sl].reshape(ch, n, hd)
        v = v_all[:, sl].reshape(ch, n, hd)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=f32)
        s = s + bias_ref[h].astype(f32)[None]
        if mask_ref is not None:
            s = s + mask_ref[...].astype(f32)
        e = _softmax_exp(s, exact=True)  # backward only runs in training
        p = e / jnp.sum(e, axis=-1, keepdims=True)   # (ch, n, n) f32
        pc = p.astype(x.dtype)

        do_h = dattn[:, sl].astype(x.dtype).reshape(ch, n, hd)
        # o_h feeds the out-projection weight grad
        o_h = jax.lax.dot_general(pc, v, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=f32)
        if fat:
            o_scr[:, sl] = o_h.astype(x.dtype).reshape(ch * n, hd)
        else:
            dwp_ref[sl, :] += jax.lax.dot_general(
                o_h.astype(x.dtype).reshape(ch * n, hd), gyc, rowsT,
                preferred_element_type=f32)

        # dv = p^T @ do ; dp = do @ v^T ; ds = p*(dp - rowsum(dp*p))
        dv_h = jax.lax.dot_general(pc, do_h, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=f32)
        dp = jax.lax.dot_general(do_h, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=f32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_ref[h] += ds.sum(0)
        dsc = ds.astype(x.dtype)

        # dq (pre-scale) and dk chains
        dq_h = jax.lax.dot_general(dsc, k, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=f32) * scale
        dk_h = jax.lax.dot_general(dsc, q, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=f32)

        for d_h, scr, w_ref, dw_ref, db_ref in (
                (dq_h, dq_scr, wq_ref, dwq_ref, dbq_ref),
                (dk_h, dk_scr, wk_ref, dwk_ref, dbk_ref),
                (dv_h, dv_scr, wv_ref, dwv_ref, dbv_ref)):
            d_flat = d_h.reshape(ch * n, hd)
            dc = d_flat.astype(x.dtype)
            if fat:
                scr[:, sl] = dc
            else:
                dx = dx + jax.lax.dot_general(
                    dc, w_ref[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                dw_ref[:, sl] += jax.lax.dot_general(
                    x, dc, rowsT, preferred_element_type=f32)
            db_ref[:, sl] += d_flat.sum(0)[None]   # f32-exact bias grads

    if fat:
        # Fat K=cq GEMMs over the scratch buffers (same math as the
        # per-head dots, full-width contractions for the MXU — measured
        # 27.6 -> 20.5 ms/step at Swin-B stage 2; at C=128 the scratch
        # shrinks the chunk instead, so the per-head path stays there).
        colsT = (((1,), (1,)), ((), ()))          # a @ b^T over columns
        dwp_ref[...] += jax.lax.dot_general(o_scr[...], gyc, rowsT,
                                            preferred_element_type=f32)
        dq_all_c, dk_all_c, dv_all_c = dq_scr[...], dk_scr[...], dv_scr[...]
        dx = jax.lax.dot_general(dq_all_c, wq_ref[...], colsT,
                                 preferred_element_type=f32)
        dx = dx + jax.lax.dot_general(dk_all_c, wk_ref[...], colsT,
                                      preferred_element_type=f32)
        dx = dx + jax.lax.dot_general(dv_all_c, wv_ref[...], colsT,
                                      preferred_element_type=f32)
        dwq_ref[...] += jax.lax.dot_general(x, dq_all_c, rowsT,
                                            preferred_element_type=f32)
        dwk_ref[...] += jax.lax.dot_general(x, dk_all_c, rowsT,
                                            preferred_element_type=f32)
        dwv_ref[...] += jax.lax.dot_general(x, dv_all_c, rowsT,
                                            preferred_element_type=f32)

    dbp_ref[...] += gy.sum(0)[None]
    dx_ref[...] = dx.reshape(ch, n, c).astype(dx_ref.dtype)


def _bwd_kernel_resid(x_ref, g_ref, wq_ref, wk_ref, wv_ref, wp_ref,
                      qs_ref, ks_ref, vs_ref, p_ref,
                      dx_ref, dwq_ref, dwk_ref, dwv_ref, dwp_ref,
                      dbq_ref, dbk_ref, dbv_ref, dbp_ref, dbias_ref,
                      o_scr, dq_scr, dk_scr, dv_scr, *,
                      heads: int, scale: float, lane_off: int):
    """Fused MSA backward consuming the taped forward's residuals.

    Same math and layout as _bwd_kernel, minus the entire recompute:
    q/k/v arrive as the forward's bf16 projections (qs/ks/vs_ref — q
    post-scale) and p as the exact bf16 probabilities the taped output
    was produced from (p_ref), so the s = q@k^T dot, bias/mask adds,
    exp, and the softmax reductions all disappear (measured ~60% of the
    recompute kernel's time at Swin-B 480² stage 2, bs 8 — the VPU
    softmax passes, not the MXU, were the bottleneck).  bias and mask
    are not inputs at all: dbias comes from ds, and the shift-mask
    cotangent is identically zero.

    lane_off: static lane offset of this head-group's columns inside
    qs/ks/vs_ref — 0 when the BlockSpec already lane-sliced the group
    (cq % 128 == 0), gi*cq when the refs carry the full C width."""
    ch, n, c = x_ref.shape
    cq = wq_ref.shape[1]
    hd = cq // heads
    i = pl.program_id(0)
    f32 = jnp.float32
    x = x_ref[...].reshape(ch * n, c)
    gy = g_ref[...].reshape(ch * n, c).astype(f32)
    gyc = gy.astype(x.dtype)

    dattn = jax.lax.dot_general(gyc, wp_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)

    @pl.when(i == 0)
    def _init():
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dwk_ref[...] = jnp.zeros_like(dwk_ref)
        dwv_ref[...] = jnp.zeros_like(dwv_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dbk_ref[...] = jnp.zeros_like(dbk_ref)
        dbv_ref[...] = jnp.zeros_like(dbv_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    fat = o_scr is not None
    dx = None if fat else jnp.zeros((ch * n, c), f32)
    rowsT = (((0,), (0,)), ((), ()))          # a^T @ b over rows
    qs = qs_ref[...]
    ks = ks_ref[...]
    vs = vs_ref[...]
    for h in range(heads):
        lsl = slice(lane_off + h * hd, lane_off + (h + 1) * hd)
        sl = slice(h * hd, (h + 1) * hd)
        q = qs[:, :, lsl]
        k = ks[:, :, lsl]
        v = vs[:, :, lsl]
        pc = p_ref[:, h]                      # (ch, n, n) bf16, as taped
        pf = pc.astype(f32)

        do_h = dattn[:, sl].astype(x.dtype).reshape(ch, n, hd)
        o_h = jax.lax.dot_general(pc, v, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=f32)
        if fat:
            o_scr[:, sl] = o_h.astype(x.dtype).reshape(ch * n, hd)
        else:
            dwp_ref[sl, :] += jax.lax.dot_general(
                o_h.astype(x.dtype).reshape(ch * n, hd), gyc, rowsT,
                preferred_element_type=f32)

        dv_h = jax.lax.dot_general(pc, do_h, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=f32)
        dp = jax.lax.dot_general(do_h, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=f32)
        ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
        dbias_ref[h] += ds.sum(0)
        dsc = ds.astype(x.dtype)

        dq_h = jax.lax.dot_general(dsc, k, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=f32) * scale
        dk_h = jax.lax.dot_general(dsc, q, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=f32)

        for d_h, scr, w_ref, dw_ref, db_ref in (
                (dq_h, dq_scr, wq_ref, dwq_ref, dbq_ref),
                (dk_h, dk_scr, wk_ref, dwk_ref, dbk_ref),
                (dv_h, dv_scr, wv_ref, dwv_ref, dbv_ref)):
            d_flat = d_h.reshape(ch * n, hd)
            dc = d_flat.astype(x.dtype)
            if fat:
                scr[:, sl] = dc
            else:
                dx = dx + jax.lax.dot_general(
                    dc, w_ref[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                dw_ref[:, sl] += jax.lax.dot_general(
                    x, dc, rowsT, preferred_element_type=f32)
            db_ref[:, sl] += d_flat.sum(0)[None]

    if fat:
        colsT = (((1,), (1,)), ((), ()))          # a @ b^T over columns
        dwp_ref[...] += jax.lax.dot_general(o_scr[...], gyc, rowsT,
                                            preferred_element_type=f32)
        dq_all_c, dk_all_c, dv_all_c = dq_scr[...], dk_scr[...], dv_scr[...]
        dx = jax.lax.dot_general(dq_all_c, wq_ref[...], colsT,
                                 preferred_element_type=f32)
        dx = dx + jax.lax.dot_general(dk_all_c, wk_ref[...], colsT,
                                      preferred_element_type=f32)
        dx = dx + jax.lax.dot_general(dv_all_c, wv_ref[...], colsT,
                                      preferred_element_type=f32)
        dwq_ref[...] += jax.lax.dot_general(x, dq_all_c, rowsT,
                                            preferred_element_type=f32)
        dwk_ref[...] += jax.lax.dot_general(x, dk_all_c, rowsT,
                                            preferred_element_type=f32)
        dwv_ref[...] += jax.lax.dot_general(x, dv_all_c, rowsT,
                                            preferred_element_type=f32)

    dbp_ref[...] += gy.sum(0)[None]
    dx_ref[...] = dx.reshape(ch, n, c).astype(dx_ref.dtype)


def _use_fat_gemm(c: int, fwd: bool = False) -> bool:
    """Route the head-concat + fat-GEMM form by width (measured on v5e,
    Swin-B bs 8): C>=256 wins (stage-2 bwd 27.6 -> 20.5 ms/step); at
    C=128 the BACKWARD's separate scratch shrinks the chunk and loses
    ~0.4 ms/step, so the per-head-slice GEMMs stay there.  The FORWARD's
    concat reuses out_ref's block (no scratch cost since the
    out-ref-as-scratch change) — but measured e2e it still LOSES at
    C=128 (32.17 vs 31.94 ms/step, Swin-B 480² bs 8: the out_ref
    read-back costs more than the K=32 dots save), so the per-head sum
    stays the default there; LAVT_FAT128=1 is the A/B hatch."""
    if fwd and c == 128:
        return os.environ.get("LAVT_FAT128", "0") == "1"
    return c >= 256


def _pick_chunk_bwd(nw: int, n: int, c: int, cq: int, heads: int,
                    itemsize: int,
                    budget: int = 10 * 1024 * 1024) -> int:
    """Chunk chooser for the backward kernel: fixed VMEM (weights, grad
    accumulators, bias + dbias) plus per-chunk buffers under `budget`.
    cq = heads*hd is the q/k/v width covered by this call (== c without
    head-group splitting)."""
    fixed = ((3 * c * cq + cq * c) * itemsize   # wq/wk/wv + wp
             + (3 * c * cq + cq * c) * 4        # their f32 grad accumulators
             + 2 * heads * n * n * 4)           # bias + dbias
    best = 0
    for ch in range(1, nw + 1):
        if nw % ch or not _chunk_ok(ch, n, itemsize):
            continue
        buf = (ch * n * c * itemsize * 2     # x + dx blocks
               + ch * n * c * 4              # gy f32
               + ch * n * cq * 4             # dattn f32
               + 3 * ch * n * cq * 4         # q/k/v (f32 pre-cast peak)
               + (4 * ch * n * cq * itemsize  # o/dq/dk/dv fat-GEMM scratch
                  if _use_fat_gemm(c) else 0)
               + ch * n * c * 4              # dx accumulator f32
               + 4 * ch * n * n * 4          # s/p/dp/ds tiles (one head)
               + ch * n * n * 4)             # mask block
        if fixed + buf <= budget:
            best = ch
    return best


def _pick_head_groups(nw: int, n: int, c: int, heads: int,
                      itemsize: int):
    """Head-group count G (1/2/4/8) and chunk size for the fused backward.
    Splitting heads shrinks the per-call weights + grad accumulators, so
    wider stages trade G× extra x/gy reads for multi-window chunks (fewer,
    fatter grid steps). Picks the G with the best chunk-per-read ratio;
    None if nothing fits.

    Two budget tiers: the conservative 10 MB estimate (under which every
    Swin-B 480² stage's pick measured optimal — tools/bench_msa_bwd.py),
    and a 13.5 MB retry used only when nothing fits at 10 MB — video
    Swin-T's stage 4 (nw=9, n=392, C=768, 24 heads) only fits at
    G=8/ch=1 (est. 13.1 MB), which compiles fine and measures 1.34 ms
    fwd+bwd vs 3.6 ms on the XLA path (b=1, v5e)."""
    for budget in (10 * 1024 * 1024, int(13.5 * 1024 * 1024)):
        best = None
        for g_count in (1, 2, 4, 8):
            if heads % g_count:
                continue
            if g_count > 1 and ((heads // g_count) * (c // heads)) % 32:
                continue
            cq = (heads // g_count) * (c // heads)
            ch = _pick_chunk_bwd(nw, n, c, cq, heads // g_count, itemsize,
                                 budget)
            if ch >= 1 and (best is None or ch / g_count > best[2]):
                best = (g_count, ch, ch / g_count)
        if best is not None:
            return best[0], best[1]
    return None


def fused_msa_bwd_supported(nw: int, n: int, c: int, heads: int,
                            itemsize: int = 2) -> bool:
    """True iff some head-group/chunk combination both fits VMEM and
    passes Mosaic's collapse constraint (_chunk_ok — sublane-misaligned n
    is fine at chunk 1, where the collapse is a unit-dim squeeze)."""
    return _pick_head_groups(nw, n, c, heads, itemsize) is not None


def _fused_bwd(x, wqkv, bqkv, wproj, bias, mask, g, heads, scale,
               saved=None):
    """Assembler: optionally split heads into G groups, run the fused
    backward kernel per group on its weight/bias slices, and stitch the
    grads back together (dx sums over groups; dbproj comes from group 0).
    saved: optional (q, k, v, p) residuals from the taped forward (see
    _vjp_fwd) — the kernel then skips its qkv/softmax recompute."""
    b, nw, n, c = x.shape
    dt = x.dtype
    g_count, chunk = _pick_head_groups(nw, n, c, heads,
                                       jnp.dtype(dt).itemsize)
    hd = c // heads
    hpg = heads // g_count
    w = hpg * hd  # q/k/v columns per group

    dx = None
    dwq_p, dwk_p, dwv_p, dwp_p = [], [], [], []
    dbq_p, dbk_p, dbv_p, dbias_p = [], [], [], []
    dbp = None
    for gi in range(g_count):
        sl = slice(gi * w, (gi + 1) * w)
        wqkv_g = jnp.concatenate(
            [wqkv[:, sl], wqkv[:, c:][:, sl], wqkv[:, 2 * c:][:, sl]],
            axis=1)
        bqkv_g = jnp.concatenate([bqkv[sl], bqkv[c:][sl], bqkv[2 * c:][sl]])
        outs = _fused_bwd_group(x, wqkv_g, bqkv_g, wproj[sl, :],
                                bias[gi * hpg:(gi + 1) * hpg], mask, g,
                                hpg, scale, chunk,
                                saved=saved, gi=gi, w=w)
        dx_g, dwq, dwk, dwv, dwp, dbq, dbk, dbv, dbp_g, dbias = outs
        dx = dx_g if dx is None else dx + dx_g
        dwq_p.append(dwq)
        dwk_p.append(dwk)
        dwv_p.append(dwv)
        dwp_p.append(dwp)
        dbq_p.append(dbq[0])
        dbk_p.append(dbk[0])
        dbv_p.append(dbv[0])
        dbias_p.append(dbias)
        if dbp is None:
            dbp = dbp_g[0]
    dwqkv = jnp.concatenate(
        [jnp.concatenate(dwq_p, axis=1), jnp.concatenate(dwk_p, axis=1),
         jnp.concatenate(dwv_p, axis=1)], axis=1)
    dbqkv = jnp.concatenate(dbq_p + dbk_p + dbv_p)
    dwproj = jnp.concatenate(dwp_p, axis=0)
    dbias = jnp.concatenate(dbias_p, axis=0)
    return dx, dwqkv, dbqkv, dwproj, dbp, dbias


def _fused_bwd_group(x, wqkv_g, bqkv_g, wp_g, bias, mask, g, heads, scale,
                     ch, saved=None, gi: int = 0, w: int = 0):
    """One head-group backward call. wqkv_g: (C, 3*cq); wp_g: (cq, C);
    bias: (heads, N, N) for this group's heads; ch: the window-chunk size
    chosen by _pick_head_groups (which may come from the 13.5 MB retry
    tier, so it must be threaded through, not re-picked at the default
    budget). Returns per-part grads.

    saved: optional (q, k, v, p) residuals from the taped forward —
    routes to _bwd_kernel_resid (no recompute, no bias/mask inputs).
    gi/w: this group's index and lane width inside the full-width saved
    tensors."""
    b, nw, n, c = x.shape
    dt = x.dtype
    cq = wqkv_g.shape[1] // 3
    wqc = wqkv_g.astype(dt)
    wq, wk, wv = wqc[:, :cq], wqc[:, cq:2 * cq], wqc[:, 2 * cq:]
    bq, bk, bv = bqkv_g[:cq], bqkv_g[cq:2 * cq], bqkv_g[2 * cq:]
    wp = wp_g.astype(dt)
    m = b * nw
    xm = x.reshape(m, n, c)
    gm = g.reshape(m, n, c)

    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((ch, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    if saved is not None:
        return _fused_bwd_group_resid(xm, gm, wq, wk, wv, wp, saved, gi, w,
                                      b, nw, n, c, cq, heads, scale, ch, dt)
    in_specs = [blk, blk, const(wq), const(wk), const(wv), const(bq),
                const(bk), const(bv), const(wp), const(bias)]
    args = [xm, gm, wq, wk, wv, bq, bk, bv, wp, bias]
    if mask is not None:
        per_img = nw // ch
        in_specs.append(pl.BlockSpec((ch, n, n),
                                     lambda i: (i % per_img, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
        if _use_fat_gemm(c):
            kernel = functools.partial(_bwd_kernel, heads=heads, scale=scale)
        else:
            def kernel(*refs):
                _bwd_kernel(*refs, None, None, None, None,
                            heads=heads, scale=scale)
    else:
        if _use_fat_gemm(c):
            def kernel(x_ref, g_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
                       bv_ref, wp_ref, bias_ref, *out_refs):
                _bwd_kernel(x_ref, g_ref, wq_ref, wk_ref, wv_ref, bq_ref,
                            bk_ref, bv_ref, wp_ref, bias_ref, None,
                            *out_refs, heads=heads, scale=scale)
        else:
            def kernel(x_ref, g_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
                       bv_ref, wp_ref, bias_ref, *out_refs):
                _bwd_kernel(x_ref, g_ref, wq_ref, wk_ref, wv_ref, bq_ref,
                            bk_ref, bv_ref, wp_ref, bias_ref, None,
                            *out_refs, None, None, None, None,
                            heads=heads, scale=scale)

    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((m, n, c), dt),        # dx
        jax.ShapeDtypeStruct((c, cq), f32),         # dwq
        jax.ShapeDtypeStruct((c, cq), f32),         # dwk
        jax.ShapeDtypeStruct((c, cq), f32),         # dwv
        jax.ShapeDtypeStruct((cq, c), f32),         # dwp
        jax.ShapeDtypeStruct((1, cq), f32),         # dbq
        jax.ShapeDtypeStruct((1, cq), f32),         # dbk
        jax.ShapeDtypeStruct((1, cq), f32),         # dbv
        jax.ShapeDtypeStruct((1, c), f32),          # dbp
        jax.ShapeDtypeStruct((heads, n, n), f32),   # dbias
    ]
    cc = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                  memory_space=pltpu.VMEM)
    out_specs = [blk, cc((c, cq)), cc((c, cq)), cc((c, cq)), cc((cq, c)),
                 cc((1, cq)), cc((1, cq)), cc((1, cq)), cc((1, c)),
                 cc((heads, n, n))]
    flops = 2 * b * nw * (4 * n * c * cq * 2
                          + 6 * heads * n * n * (cq // heads))
    dx_and_grads = pl.pallas_call(
        kernel,
        grid=(m // ch,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=([pltpu.VMEM((ch * n, cq), dt)] * 4  # o/dq/dk/dv
                        if _use_fat_gemm(c) else []),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=b * nw * heads * n * n,
            bytes_accessed=3 * x.size * x.dtype.itemsize),
    )(*args)
    dx = dx_and_grads[0].reshape(b, nw, n, c)
    return (dx,) + tuple(dx_and_grads[1:])


def _fused_bwd_group_resid(xm, gm, wq, wk, wv, wp, saved, gi, w,
                           b, nw, n, c, cq, heads, scale, ch, dt):
    """Residual-mode group backward pallas_call (see _bwd_kernel_resid).

    The saved q/k/v are full-width (m, n, C); when this group's lane
    width is 128-aligned the BlockSpec itself slices the group's columns
    (no extra DMA traffic), otherwise the kernel fetches the full width
    and lane-slices statically (G× redundant reads — only hit by
    hd-misaligned groupings, none of the shipped image stages)."""
    q_sav, k_sav, v_sav, p_sav = saved
    m = b * nw
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((ch, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    if w % 128 == 0:
        qkv_spec = pl.BlockSpec((ch, n, w), lambda i, _g=gi: (i, 0, _g),
                                memory_space=pltpu.VMEM)
        lane_off = 0
    else:
        qkv_spec = pl.BlockSpec((ch, n, c), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        lane_off = gi * w
    hpg = heads
    p_spec = pl.BlockSpec((ch, hpg, n, n), lambda i, _g=gi: (i, _g, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [blk, blk, const(wq), const(wk), const(wv), const(wp),
                qkv_spec, qkv_spec, qkv_spec, p_spec]
    args = [xm, gm, wq, wk, wv, wp, q_sav, k_sav, v_sav, p_sav]

    fat = _use_fat_gemm(c)
    if fat:
        kernel = functools.partial(_bwd_kernel_resid, heads=heads,
                                   scale=scale, lane_off=lane_off)
    else:
        def kernel(*refs):
            _bwd_kernel_resid(*refs, None, None, None, None,
                              heads=heads, scale=scale, lane_off=lane_off)

    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((m, n, c), dt),        # dx
        jax.ShapeDtypeStruct((c, cq), f32),         # dwq
        jax.ShapeDtypeStruct((c, cq), f32),         # dwk
        jax.ShapeDtypeStruct((c, cq), f32),         # dwv
        jax.ShapeDtypeStruct((cq, c), f32),         # dwp
        jax.ShapeDtypeStruct((1, cq), f32),         # dbq
        jax.ShapeDtypeStruct((1, cq), f32),         # dbk
        jax.ShapeDtypeStruct((1, cq), f32),         # dbv
        jax.ShapeDtypeStruct((1, c), f32),          # dbp
        jax.ShapeDtypeStruct((heads, n, n), f32),   # dbias
    ]
    cc = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                  memory_space=pltpu.VMEM)
    out_specs = [blk, cc((c, cq)), cc((c, cq)), cc((c, cq)), cc((cq, c)),
                 cc((1, cq)), cc((1, cq)), cc((1, cq)), cc((1, c)),
                 cc((heads, n, n))]
    flops = 2 * b * nw * (3 * n * c * cq * 2      # dx/dw GEMMs + dattn
                          + 6 * heads * n * n * (cq // heads))
    dx_and_grads = pl.pallas_call(
        kernel,
        grid=(m // ch,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=([pltpu.VMEM((ch * n, cq), dt)] * 4  # o/dq/dk/dv
                        if fat else []),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=3 * xm.size * xm.dtype.itemsize
            + p_sav.size * p_sav.dtype.itemsize // max(
                1, p_sav.shape[1] // hpg)),
    )(*args)
    dx = dx_and_grads[0].reshape(b, nw, n, c)
    return (dx,) + tuple(dx_and_grads[1:])


def _sublane_ok(n: int, itemsize: int) -> bool:
    """Whether MULTI-window chunks may collapse (chunk, n, c) ->
    (chunk*n, c); Mosaic only supports that shape cast when the
    second-minor dim is a multiple of the dtype's sublane pack (16 for
    bf16, 8 for f32).  Window-7 models (Swin-T/S, n=49; video (8,7,7),
    n=392) fail this ('infer-vector-layout: unsupported shape cast
    vector<9x49x96xbf16> -> vector<441x96xbf16>'); window-12 (n=144)
    passes.  At chunk == 1 the collapse is a leading-unit-dim squeeze,
    which Mosaic always supports — see _chunk_ok."""
    return n % (16 if itemsize == 2 else 8) == 0


def _chunk_ok(ch: int, n: int, itemsize: int) -> bool:
    """Mosaic-collapse validity of a window-chunk size (see _sublane_ok)."""
    return ch == 1 or _sublane_ok(n, itemsize)


def fused_msa_supported(nw: int, n: int, c: int, heads: int,
                        itemsize: int = 2) -> bool:
    """Whether the fused forward COMPILES for this window geometry (fits
    VMEM, with head-group splitting for wide stages — _pick_fwd_groups;
    sublane-misaligned n runs at chunk 1, see _chunk_ok).

    Per call, the group's weights, its f32 bias slice, and one chunk's
    buffers must fit ~12 MB of the 16 MB scoped budget.  Video Swin with
    window (8, 12, 12) has n=1152 — its bias alone is 15.9 MB and even a
    1-head slice busts the chunk budget, so those configs fall back
    (measured OOM: 16.68M scoped at Swin-T video stage 1).

    This is capability, not policy — models route via fused_msa_routed."""
    return _pick_fwd_groups(nw, n, c, heads, itemsize) is not None


def fused_msa_routed(nw: int, n: int, c: int, heads: int,
                     itemsize: int = 2) -> bool:
    """Measured routing policy for the fused MSA kernel (v5e).

    Route only geometries with sublane-aligned n (window-12 2D: n=144),
    where multi-window chunks amortize the per-grid-step cost and the
    fused path measured a clear win (README perf table).  Misaligned n
    (window-7 2D n=49, video (8,7,7) n=392) is forced to chunk-of-1
    grids, which measured SLOWER than the XLA / attention-core path
    (tools/bench_msa_chunk1.py, v5e: n=49 fwd 0.2-0.5x XLA, n=392
    fwd+bwd ~0.8x), so those stay unrouted even though they compile.

    LAVT_FUSED_MSA is the per-stage A/B hatch (read per call, like
    LAVT_FUSED_PADDED): "all"/unset keeps this measured policy; "off"
    routes nothing; a comma list of channel widths (e.g. "512,1024")
    routes only those widths."""
    env = os.environ.get("LAVT_FUSED_MSA", "all")
    if env in ("off", "0"):
        return False
    if env not in ("all", "") and str(c) not in env.split(","):
        return False
    return _sublane_ok(n, itemsize) and fused_msa_supported(
        nw, n, c, heads, itemsize)


def _sublane_pad(n: int, itemsize: int) -> int:
    pack = 16 if itemsize == 2 else 8
    return -(-n // pack) * pack


def fused_msa_padded_supported(nw: int, n: int, c: int, heads: int,
                               itemsize: int = 2) -> bool:
    """Whether the sublane-padded wrapper applies: n itself fails the
    (chunk, n, c)->(chunk*n, c) collapse (e.g. window-7 models, n=49)
    but the padded n does fit the kernels' VMEM gate."""
    n_p = _sublane_pad(n, itemsize)
    if n_p == n:
        return False  # use the unpadded kernel
    return _pick_fwd_groups(nw, n_p, c, heads, itemsize) is not None


def fused_msa_padded_routed(nw: int, n: int, c: int, heads: int,
                            itemsize: int = 2) -> bool:
    """Measured routing policy for the sublane-PADDED fused kernel (v5e).

    Default: route NOTHING.  The padded kernel wins in isolation at
    video (8,7,7) n=392 (pads to 400, 1.04x FLOP tax; 1.6-4.5x XLA per
    block at every A2D Swin-T stage, tools/bench_msa_video.py) but the
    full-model A/B on v5e (tools/bench_fused_bisect.py, 2026-08-19)
    regressed END TO END: video inference 44 ms/clip on the XLA path vs
    76.7 ms with all stages routed, and 55.1/71.7/62.2 ms with only the
    C=96/192/384 stage routed — the surrounding layout copies and mask
    materialization outside the kernel cost more than the kernel saves,
    the same pathology that kept the unpadded kernel unrouted in round 2
    (161 -> 228 ms/clip train).  2D window-7 (n=49 -> 64) additionally
    pays a 1.7x padding tax and lost per block too.

    LAVT_FUSED_PADDED is the A/B hatch (read per call so benches and
    tests can toggle it): a comma list of channel counts (e.g. "96,192")
    routes those widths; "all" routes every supported width; unset/"off"/
    "auto" route nothing."""
    env = os.environ.get("LAVT_FUSED_PADDED", "off")
    if env in ("off", "auto", ""):
        return False
    if env != "all" and str(c) not in env.split(","):
        return False
    n_p = _sublane_pad(n, itemsize)
    if n_p == n:
        return False  # aligned: fused_msa_routed covers it
    if (n_p / n) ** 2 > 1.10:
        return False  # padding tax ate the win (e.g. 49 -> 64)
    return fused_msa_padded_supported(nw, n, c, heads, itemsize)


def fused3d_grouped_routed(nw: int, n: int, c: int, heads: int,
                           itemsize: int = 2) -> bool:
    """Routing policy for the GROUPED 3D fused path (round 5): the
    block partitions with ops/window.partition_shifted_padded_3d (pad +
    shift + window + sublane token-pad as one gather, windows permuted
    unmasked-first) and runs the fused kernel maskless on the big
    unmasked group plus a small-mask call on the boundary windows —
    killing the two costs that sank the round-4 all-routed A/B (the
    ~200 MB full shift-mask materialization and the pad/roll/transpose
    relays around the kernel).

    LAVT_FUSED3D: "1"/"all" routes every supported geometry, a comma
    list of channel counts routes those widths, "0"/"off" routes
    nothing.  Measured default (v5e, A2D Swin-T 480² 8-frame clips,
    round 5): "96" — the stage-1 swap is a clean local win (38.4 ->
    35.4 ms/clip inference), but routing the deeper widths makes XLA's
    global layout assignment recompile the NEIGHBORING TPWAM fusion
    convs 3.5x slower (width-192 leg: stage-0 fusion convs 1.7 -> 9.0
    ms despite being untouched), so 96,192 measures 49.6 and all-stages
    57.0 ms/clip.  The caller additionally gates on deterministic
    (inference): the TRAIN step measured 154.7 -> 184.8 ms/clip with 96
    routed (gather VJP passes + the recompute backward at C=96 outweigh
    the forward win); LAVT_FUSED3D_TRAIN=1 forces it for A/B."""
    env = os.environ.get("LAVT_FUSED3D", "96")
    if env in ("off", "0", ""):
        return False
    if env not in ("1", "all") and str(c) not in env.split(","):
        return False
    n_p = _sublane_pad(n, itemsize)
    if (n_p / n) ** 2 > 1.10:
        return False  # padding tax (e.g. 2D window-7, 49 -> 64)
    return _pick_fwd_groups(nw, n_p, c, heads, itemsize) is not None and \
        fused_msa_bwd_supported(nw, n_p, c, heads, itemsize)


def fused_window_msa_padded(x, wqkv, bqkv, wproj, bproj, bias, mask,
                            heads: int, scale: float):
    """fused_window_msa for sublane-misaligned window sizes.

    Window-7 geometries (Swin-T/S 2D, n=49; video (8,7,7), n=392) fail
    Mosaic's in-kernel (chunk, n, c) -> (chunk*n, c) collapse (see
    _sublane_ok), so tokens are zero-padded to the next sublane multiple
    and padded KEYS are masked with -1e9 folded into the bias (their
    softmax weight underflows to exactly 0 in f32).  Padded QUERY rows
    compute garbage that the final slice discards; under jax.grad the
    pad/slice transposes zero their cotangents, so all weight/bias grads
    are exact (the custom VJP runs entirely at the padded n).

    STATUS: parity-tested but NOT routed by the model — measured on v5e
    (tools/bench_msa_padded.py) it loses to XLA at every Swin-T/S 2D
    window-7 stage (fwd 0.80/0.09/0.44/0.28x, fwd+bwd
    0.69/0.95/1.17/0.12x vs XLA at bs 8): n=49 windows are small enough
    that XLA's GEMMs+einsum are already near-peak while the padding adds
    (n_p/n)² = 1.7x attention FLOPs.  Kept for geometries where the
    unpadded kernel's measured win would survive the padding tax (none
    shipped today)."""
    b, nw, n, c = x.shape
    n_p = _sublane_pad(n, jnp.dtype(x.dtype).itemsize)
    p = n_p - n
    x_p = jnp.pad(x, ((0, 0), (0, 0), (0, p), (0, 0)))
    bias_p = pad_bias_sublane(bias, n_p)
    mask_p = None if mask is None else jnp.pad(
        mask, ((0, 0), (0, p), (0, p)))
    y = fused_window_msa(x_p, wqkv, bqkv, wproj, bproj, bias_p, mask_p,
                         heads, scale)
    return y[:, :, :n, :]


def pad_bias_sublane(bias, n_p: int):
    """Pad an (h, N, N) bias to (h, n_p, n_p) with -1e9 on the padded
    KEY columns (their softmax weight underflows to exactly 0 in f32) —
    the bias half of the sublane-padding trick, shared by
    fused_window_msa_padded and the grouped 3D partition route (which
    folds the token pad into its gather and so never calls jnp.pad on
    x itself)."""
    heads, n, _ = bias.shape
    p = n_p - n
    if p == 0:
        return bias
    bias_p = jnp.pad(bias, ((0, 0), (0, p), (0, p)))
    return jnp.concatenate(
        [bias_p[:, :, :n],
         jnp.full((heads, n_p, p), -1e9, bias_p.dtype)], axis=2)


def _pick_chunk(nw: int, n: int, c: int, heads: int, itemsize: int,
                cq: Optional[int] = None, m: Optional[int] = None,
                masked: bool = True, save: bool = False) -> int:
    """Largest window-chunk size whose per-step VMEM footprint stays under
    the LAVT_MSA_VMEM_MB budget (16 MB VMEM minus weights, bias, and
    double-buffering).  cq: the q/k/v width covered by the call (== c
    without head-group splitting).

    Chunk candidates must divide the GRID total m = B*nW (default: nw, the
    per-image window count, for backward compatibility).  An unmasked
    (non-shifted) block has no per-image mask lookup, so ANY divisor of m
    works — at Swin-B 480² stage 3 that takes the chunk from 3 (largest
    divisor of nW=9 that fits) to 8, i.e. 24 -> 9 grid steps per block.
    A masked (shifted) block's chunk must additionally keep the mask
    lookup well-defined: either inside one image (nw % ch == 0, mask
    block = a slice of the (nW, N, N) mask) or covering WHOLE images
    (ch % nw == 0, mask pre-tiled to (ch, N, N), constant index map —
    see _fwd_call).

    The 6 MB default was empirical against f32-resident q/k/v (chunk 20
    at Swin-B stage 1 landed at 16.52 MB scoped and OOMed on some runs);
    with the bf16-resident q/k/v the measured e2e optimum moved to 8 MB
    (231 -> 238 img/s bs 8; 10/12 MB measured no further gain and risk
    the scoped limit), which is the new default."""
    cq = c if cq is None else cq
    m = nw if m is None else m
    # Per-width chunk override for A/B tuning: "512=6,128=40" forces those
    # chunks (when they divide the grid and keep the mask lookup legal)
    # instead of the VMEM estimate.  The estimator's cross-image gate is
    # deliberately conservative (true scoped usage runs ~2x the estimate);
    # this is the measured escape hatch.
    env = os.environ.get("LAVT_MSA_CHUNK", "")
    budget_mb = float(os.environ.get("LAVT_MSA_VMEM_MB", "8"))
    if env:
        for part in env.split(","):
            try:
                wc, chs = part.split("=")
                if int(wc) == c:
                    ch = int(chs)
                    if m % ch == 0 and _chunk_ok(ch, n, itemsize) and (
                            not masked or nw % ch == 0 or ch % nw == 0):
                        est = (ch * n * (c + 3 * cq) * itemsize
                               + ch * n * (n * 2 + c) * 4
                               + (3 * c * cq + cq * c) * itemsize
                               + heads * n * n * 4)
                        if est > budget_mb * 1024 * 1024:
                            import warnings
                            warnings.warn(
                                f"LAVT_MSA_CHUNK={ch} at C={c}: estimated "
                                f"VMEM footprint {est / 2**20:.1f} MB "
                                f"exceeds the {budget_mb:.0f} MB budget "
                                "(true scoped usage runs ~2x the estimate "
                                "— Mosaic's 16 MB limit may fail the "
                                "compile)")
                        return ch
            except ValueError:
                continue
    best = 1
    # Weights + f32 bias resident across the grid.  The buf<=budget rule
    # was calibrated WITHOUT this term (on within-image candidates), so it
    # only gates the NEW cross-image candidates below; counting it for the
    # legacy ones would dislodge measured-good picks (e.g. stage-1 ch=20).
    fixed = (3 * c * cq + cq * c) * itemsize + heads * n * n * 4
    for ch in range(1, m + 1):
        if m % ch or not _chunk_ok(ch, n, itemsize):
            continue
        if masked and not (nw % ch == 0 or ch % nw == 0):
            continue
        buf = (ch * n * c * itemsize          # x block
               + 3 * ch * n * cq * itemsize   # q/k/v (cast in the GEMM
               #   epilogue — resident at x.dtype, f32 only per-tile)
               + ch * n * n * 4               # one head's scores
               # (fat-GEMM head concat reuses out_ref's block — no
               #  separate scratch since the out-ref-as-scratch change)
               + ch * n * c * 4               # y f32 (post-proj)
               + ch * n * n * 4)              # mask block
        if save:
            # training-residual output blocks: q/k/v (ch, n, cq), the
            # (ch, heads, n, n) probabilities at their tile-padded lane
            # width (n rounds up to the 128-lane tile), and the xn block
            # the LN-fused variant saves
            n_pad = -(-n // 128) * 128
            buf += (3 * ch * n * cq * itemsize + ch * n * c * itemsize
                    + ch * heads * n * n_pad * itemsize)
        if buf > budget_mb * 1024 * 1024:
            continue
        if cq != c and buf + fixed > 10 * 1024 * 1024:
            # Head-group-split call: the estimate runs ~3x optimistic
            # against Mosaic's true scoped usage (Swin-B stage 4 ch=4:
            # est 11.5 MB, scoped 17.71 MB — and whether it fits the
            # 16 MB limit then depends on the INPUT LAYOUT XLA happens
            # to pick, which broke bs-32 compiles).  Count the resident
            # weights+bias and keep a wide margin; the smaller chunk
            # costs only grid steps (~3 us each).
            continue
        if nw % ch and buf + fixed > (budget_mb + 0.5) * 1024 * 1024:
            # cross-image candidate (not covered by the legacy
            # calibration): count the resident weights/bias too.  The
            # compiler's true scoped usage runs ~2x this estimate
            # (Swin-B stage-3 ch=6 est 10.5 MB scoped 16.46 MB OOM),
            # so the margin here is deliberately thin.
            continue
        best = ch
    return best


def _pick_fwd_groups(nw: int, n: int, c: int, heads: int,
                     itemsize: int) -> Optional[int]:
    """Head-group count for the fused forward.  G=1 (the common case) is
    the plain single-call kernel; wider stages (Swin-B stage 3 C=1024;
    video stages with (h, N, N) biases too large for VMEM) split heads so
    each call's resident weights + bias slice fit.  None if no G fits."""
    hd = c // heads
    for g in (1, 2, 4, 8):
        if heads % g:
            continue
        if g > 1 and ((heads // g) * hd) % 32:
            # weight slices at lane offsets need 32-alignment (cq % 32)
            continue
        hpg = heads // g
        cq = hpg * hd
        weights = (3 * c * cq + cq * c) * itemsize
        bias = hpg * n * n * 4
        ch1 = (n * c * itemsize + 3 * n * cq * 4 + n * n * 4 + n * c * 4
               + n * n * 4)
        if weights + bias + 2 * ch1 <= 12 * 1024 * 1024:
            return g
    return None


def _split_weights(wqkv, bqkv, wproj, heads):
    """Host-side split: wqkv (C, 3C) -> three (C, C); bqkv -> three (C,).

    The head interleaving inside each C-wide block already matches the
    (h, hd) lane order, so in-kernel head slicing is a static lane slice.
    """
    c = wqkv.shape[0]
    wq, wk, wv = wqkv[:, :c], wqkv[:, c:2 * c], wqkv[:, 2 * c:]
    bq, bk, bv = bqkv[:c], bqkv[c:2 * c], bqkv[2 * c:]
    return wq, wk, wv, bq, bk, bv, wproj


def _fwd_call(xm, wq, wk, wv, bq, bk, bv, wp, bproj, bias, mask,
              heads, scale, ch, nw, out_dtype, ln=None,
              ln_eps: float = 1e-5, exact: bool = False,
              save: bool = False):
    """One forward pallas_call over (possibly head-group-sliced) weights.

    xm: (m, n, C) windowed tokens; wq/wk/wv: (C, cq); wp: (cq, C);
    bias: (heads, N, N) for this call's heads; bproj: (C,) or None (head
    groups > 0 pass None so the projection bias is added exactly once).
    Returns (m, n, C) in out_dtype (f32 for grouped partial sums); with
    save=True, returns (out, (q, k, v, p)) where q/k/v are the bf16
    (m, n, cq) projections (q post-scale) and p the (m, heads, n, n)
    bf16 attention probabilities — the training residuals the fused
    backward consumes instead of recomputing (see _vjp_fwd)."""
    m, n, c = xm.shape
    dt = xm.dtype
    cq = wq.shape[1]
    fat = _use_fat_gemm(cq, fwd=True)
    has_mask = mask is not None
    has_bp = bproj is not None

    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((ch, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [blk, const(wq), const(wk), const(wv), const(bq), const(bk),
                const(bv), const(wp)]
    args = [xm, wq, wk, wv, bq, bk, bv, wp]
    has_ln = ln is not None
    if has_ln:
        in_specs += [const(ln[0]), const(ln[1])]
        args += [ln[0], ln[1]]
    if has_bp:
        in_specs.append(const(bproj))
        args.append(bproj)
    in_specs.append(const(bias))
    args.append(bias)
    if has_mask:
        if ch % nw == 0:
            # chunk covers WHOLE images: every chunk sees the same
            # (ch, n, n) mask — pre-tile the per-image mask and use a
            # constant index map (Mosaic keeps it VMEM-resident).
            args.append(jnp.tile(mask, (ch // nw, 1, 1)))
            in_specs.append(pl.BlockSpec((ch, n, n),
                                         lambda i: (0, 0, 0),
                                         memory_space=pltpu.VMEM))
        else:
            # chunk i covers windows [i*ch, (i+1)*ch) of image i*ch//nw;
            # since ch | nw the chunk never crosses an image, and its
            # in-image window offset is (i mod nw//ch) in block units.
            per_img = nw // ch
            in_specs.append(pl.BlockSpec((ch, n, n),
                                         lambda i: (i % per_img, 0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(mask)

    def kernel(*refs):
        i = 8
        ln_s_ref = refs[i] if has_ln else None
        ln_b_ref = refs[i + 1] if has_ln else None
        i += 2 * int(has_ln)
        bp_ref = refs[i] if has_bp else None
        i += int(has_bp)
        bias_ref = refs[i]
        i += 1
        mask_ref = refs[i] if has_mask else None
        i += int(has_mask)
        out_ref = refs[i]
        sv = refs[i + 1:i + 6] if save else (None,) * 5
        if save and not has_ln:
            sv = tuple(sv[:4]) + (None,)
        _kernel(*refs[:8], bp_ref, bias_ref, mask_ref, out_ref, fat,
                heads=heads, scale=scale, ln_s_ref=ln_s_ref,
                ln_b_ref=ln_b_ref, ln_eps=ln_eps, exact=exact,
                qs_ref=sv[0], ks_ref=sv[1], vs_ref=sv[2], p_ref=sv[3],
                xs_ref=sv[4])

    flops = 2 * m * (n * c * 3 * cq + 2 * heads * n * n * (cq // heads)
                     + n * cq * c)
    out_specs = pl.BlockSpec((ch, n, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((m, n, c), out_dtype)
    if save:
        qkv_spec = pl.BlockSpec((ch, n, cq), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        p_spec = pl.BlockSpec((ch, heads, n, n), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        qkv_shp = jax.ShapeDtypeStruct((m, n, cq), dt)
        out_specs = [out_specs, qkv_spec, qkv_spec, qkv_spec, p_spec]
        out_shape = [out_shape, qkv_shp, qkv_shp, qkv_shp,
                     jax.ShapeDtypeStruct((m, heads, n, n), dt)]
        if has_ln:  # also save the post-LN tokens (the MSA bwd's "x")
            out_specs.append(pl.BlockSpec((ch, n, c), lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((m, n, c), dt))
    out = pl.pallas_call(
        kernel,
        grid=(m // ch,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=m * heads * n * n,
            bytes_accessed=2 * xm.size * dt.itemsize
            + 4 * c * cq * 2),
    )(*args)
    if save:
        return out[0], tuple(out[1:])
    return out


def _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale, ln=None,
         ln_eps: float = 1e-5, exact: bool = False, save: bool = False):
    """save=True (training tape only): also return the (q, k, v, p)
    residuals — q/k/v as (B*nW, N, C) bf16 (head-major lanes, q
    post-scale) and p as (B*nW, heads, N, N) bf16 — assembled across
    head groups so the backward can re-slice them under ANY bwd
    grouping."""
    b, nw, n, c = x.shape
    dt = x.dtype
    itemsize = jnp.dtype(dt).itemsize
    wq, wk, wv, bq, bk, bv, wp = _split_weights(
        wqkv.astype(dt), bqkv, wproj.astype(dt), heads)
    m = b * nw
    xm = x.reshape(m, n, c)

    g_count = _pick_fwd_groups(nw, n, c, heads, itemsize)
    if g_count == 1:
        ch = _pick_chunk(nw, n, c, heads, itemsize, m=m,
                         masked=mask is not None, save=save)
        out = _fwd_call(xm, wq, wk, wv, bq, bk, bv, wp, bproj, bias, mask,
                        heads, scale, ch, nw, dt, ln=ln, ln_eps=ln_eps,
                        exact=exact, save=save)
        if save:
            out, saved = out
            return out.reshape(b, nw, n, c), saved
        return out.reshape(b, nw, n, c)

    # Head-group split (wide stages, e.g. Swin-B stage 3 C=1024): each
    # group's call holds only its weight/bias slices in VMEM and emits an
    # f32 partial of the out-projection sum (concat+proj == sum of
    # per-head projections, so partials just add).  Costs G× extra x
    # reads — negligible next to the saved 6-D XLA transposes.  With ln,
    # each group recomputes the row LN (VPU-cheap vs an HBM round-trip).
    hpg = heads // g_count
    w = hpg * (c // heads)
    ch = _pick_chunk(nw, n, c, hpg, itemsize, cq=w, m=m,
                     masked=mask is not None, save=save)
    total = None
    parts = []
    for gi in range(g_count):
        sl = slice(gi * w, (gi + 1) * w)
        part = _fwd_call(xm, wq[:, sl], wk[:, sl], wv[:, sl],
                         bq[sl], bk[sl], bv[sl], wp[sl, :],
                         bproj if gi == 0 else None,
                         bias[gi * hpg:(gi + 1) * hpg], mask,
                         hpg, scale, ch, nw, jnp.float32, ln=ln,
                         ln_eps=ln_eps, exact=exact, save=save)
        if save:
            part, saved_g = part
            parts.append(saved_g)
        total = part if total is None else total + part
    out = total.astype(dt).reshape(b, nw, n, c)
    if save:
        # reassemble full-width residuals: lanes stay in head order, so
        # any backward grouping can re-slice them; every group computes
        # the same in-kernel LN, so xn comes from group 0
        saved = (jnp.concatenate([p[0] for p in parts], axis=-1),
                 jnp.concatenate([p[1] for p in parts], axis=-1),
                 jnp.concatenate([p[2] for p in parts], axis=-1),
                 jnp.concatenate([p[3] for p in parts], axis=1))
        if len(parts[0]) > 4:
            saved = saved + (parts[0][4],)
        return out, saved
    return out


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


def _save_residuals_ok(b, nw, n, c, heads, itemsize) -> bool:
    """Whether the training forward should save (q, k, v, p) residuals
    for the fused backward (skipping its recompute - measured 1.45 ->
    ~0.9 ms/block fwd+bwd at Swin-B 480² stage 2 bs 8).

    Gates: LAVT_MSA_RESIDUALS=0 disables; the fused backward must
    actually be routable (otherwise the memory is wasted on the
    decomposed fallback); and the saved-p tensor must stay under
    LAVT_MSA_RESID_CAP_MB (default 192 MB per block) so video clips /
    big batches fall back to recompute instead of exhausting HBM."""
    if os.environ.get("LAVT_MSA_RESIDUALS", "1") == "0":
        return False
    if not fused_msa_bwd_supported(nw, n, c, heads, itemsize):
        return False
    cap = float(os.environ.get("LAVT_MSA_RESID_CAP_MB", "192"))
    p_bytes = b * nw * heads * n * n * itemsize
    qkv_bytes = 3 * b * nw * n * c * itemsize
    return max(p_bytes, qkv_bytes) <= cap * 1024 * 1024


def _vjp_fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale):
    # exact=True: the taped (training) forward uses the max-subtracted
    # softmax so it stays finite under exploding logits and matches the
    # backward recompute bitwise (see _softmax_exp).
    b, nw, n, c = x.shape
    if _save_residuals_ok(b, nw, n, c, heads,
                          jnp.dtype(x.dtype).itemsize):
        out, saved = _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, heads,
                          scale, exact=True, save=True)
        return out, (x, wqkv, bqkv, wproj, bproj, bias, mask, saved)
    out = _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale,
               exact=True)
    return out, (x, wqkv, bqkv, wproj, bproj, bias, mask, None)


def _vjp_bwd(heads, scale, res, g):
    """Backward. Preferred path: the fully fused Pallas backward kernel
    (_fused_bwd) — dx + all weight/bias grads in one pass, no HBM
    intermediates and no 6-D layout transposes.  Fallback (VMEM-gated):
    decomposed backward — qkv/out projections and their weight grads as
    XLA GEMMs, the attention core in the attention_core_bwd Pallas kernel.
    The mask cotangent is identically zero (the shift mask is a function
    of integer region ids)."""
    from .window_attn import attention_core_bwd

    x, wqkv, bqkv, wproj, bproj, bias, mask, saved = res

    if fused_msa_bwd_supported(x.shape[1], x.shape[2], x.shape[3], heads,
                               jnp.dtype(x.dtype).itemsize):
        dx, dwqkv, dbqkv, dwproj, dbproj, dbias = _fused_bwd(
            x, wqkv, bqkv, wproj, bias, mask, g, heads, scale, saved=saved)
        return (dx.astype(x.dtype), dwqkv.astype(wqkv.dtype),
                dbqkv.astype(bqkv.dtype), dwproj.astype(wproj.dtype),
                dbproj.astype(bproj.dtype), dbias.astype(bias.dtype),
                None if mask is None else jnp.zeros_like(mask))
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

    from .window_attn import attention_core_bwd_supported

    if attention_core_bwd_supported(n, heads, hd, nw):
        dq, dk, dv, dbias, o = attention_core_bwd(
            q.astype(f32), k.astype(f32), v.astype(f32), bias, mask,
            do.astype(f32), float(scale))
    else:  # plain-XLA attention backward (scores in HBM)
        s = jnp.einsum("bwhnd,bwhmd->bwhnm", q * scale, k) + bias.astype(f32)
        if mask is not None:
            s = s + mask.astype(f32)[None, :, None]
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bwhnm,bwhmd->bwhnd", p, v)
        dv = jnp.einsum("bwhnm,bwhnd->bwhmd", p, do)
        dp = jnp.einsum("bwhnd,bwhmd->bwhnm", do, v)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jnp.einsum("bwhnm,bwhmd->bwhnd", ds, k) * scale
        dk = jnp.einsum("bwhnm,bwhnd->bwhmd", ds, q * scale)
        dbias = ds.sum(axis=(0, 1))

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


def layer_norm_f32(x, scale, bias, eps: float = 1e-5):
    """Row LayerNorm with f32 stats and fast variance — the exact math the
    fused kernel applies when ln is fused in (used for its backward
    recompute and parity tests)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xn * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_window_msa_ln(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                        bias, mask, heads: int, scale: float,
                        ln_eps: float = 1e-5):
    """fused_window_msa with the pre-attention LayerNorm INSIDE the
    kernel: x is PRE-LN windowed tokens (LN is row-wise, so it commutes
    with the window permutation — callers partition the raw residual
    stream and skip the separate XLA LN pass entirely).

    Only valid when windowing needed no spatial padding: the reference
    pads AFTER LN with zeros, and in-kernel LN of a zero row would yield
    `ln_bias` instead (callers gate on pad == 0; at 480² only stage 4
    pads, 15 -> 24)."""
    return _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale,
                ln=(ln_scale, ln_bias), ln_eps=ln_eps)


def _vjp_ln_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias,
                mask, heads, scale, ln_eps):
    b, nw, n, c = x.shape
    if _save_residuals_ok(b, nw, n, c, heads,
                          jnp.dtype(x.dtype).itemsize):
        out, saved = _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, heads,
                          scale, ln=(ln_scale, ln_bias), ln_eps=ln_eps,
                          exact=True, save=True)
        return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias,
                     mask, saved)
    out = _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale,
               ln=(ln_scale, ln_bias), ln_eps=ln_eps, exact=True)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias,
                 mask, None)


def _vjp_ln_bwd(heads, scale, ln_eps, res, g):
    """Backward.  Residual path (saved != None): the taped forward saved
    (q, k, v, p, xn); the fused residual kernel produces the MSA grads
    wrt the post-LN stream xn directly — NO re-forward, NO recompute —
    and only the LN backward chains in XLA (a cheap fused
    elementwise+reduce over x).  Fallback: recompute the LN in XLA and
    chain through fused_window_msa's own custom VJP (which re-runs the
    forward to rebuild its own tape)."""
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, mask = res[:9]
    saved = res[9]

    if saved is not None:
        b, nw, n, c = x.shape
        xn = saved[4].reshape(b, nw, n, c)
        dxn, dwqkv, dbqkv, dwproj, dbproj, dbias = _fused_bwd(
            xn, wqkv, bqkv, wproj, bias, mask, g, heads, scale,
            saved=saved[:4])
        _, ln_vjp = jax.vjp(
            lambda xx, s, bb: layer_norm_f32(xx, s, bb, ln_eps),
            x, ln_scale, ln_bias)
        dx, dls, dlb = ln_vjp(dxn.astype(xn.dtype))
        return (dx.astype(x.dtype), dls.astype(ln_scale.dtype),
                dlb.astype(ln_bias.dtype), dwqkv.astype(wqkv.dtype),
                dbqkv.astype(bqkv.dtype), dwproj.astype(wproj.dtype),
                dbproj.astype(bproj.dtype), dbias.astype(bias.dtype),
                None if mask is None else jnp.zeros_like(mask))

    def f(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias):
        xn = layer_norm_f32(x, ln_scale, ln_bias, ln_eps)
        return fused_window_msa(xn, wqkv, bqkv, wproj, bproj, bias, mask,
                                heads, scale)

    _, vjp = jax.vjp(f, x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                     bias)
    grads = vjp(g)
    return grads + (None if mask is None else jnp.zeros_like(mask),)


fused_window_msa_ln.defvjp(_vjp_ln_fwd, _vjp_ln_bwd)
