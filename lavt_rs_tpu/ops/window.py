"""Window partition / reverse and shifted-window masks for Swin attention.

Pure shape manipulation (reshape/transpose) — XLA turns these into layout
changes; the actual attention lives in ops/attention.py and the Pallas kernel
in ops/pallas/window_attn.py.

Behavioral contract (2D): reference lib/backbone.py:33-62 (partition order is
row-major over window grid, then within-window row-major) and
lib/backbone.py:633-652 (9-region shift mask with -100 additive penalty).
3D: reference lib/video_swin_transformer.py:35-66, 315-328.

Unlike the reference, shift masks are built once per static shape at trace
time in numpy (the reference rebuilds the mask with torch ops on every
forward — pure overhead under jit).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# 2D
# ---------------------------------------------------------------------------

def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * H//ws * W//ws, ws*ws, C). H, W divisible by ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of window_partition: (B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=64)
def _shifted_partition_idx_np(hp: int, wp: int, ws: int, ss: int):
    """Static gather indices fusing cyclic shift + window partition into
    ONE copy: out[b, wi*Ww+wj, i*ws+j] = x[b, flat] with
    flat = ((wi*ws+i+ss) % hp) * wp + ((wj*ws+j+ss) % wp).

    The decomposed chain (roll -> reshape -> 6D transpose -> reshape) costs
    2-3 HBM round-trips per block; as a single static `take` XLA emits one
    gather-copy (and fuses the inverse with the residual add). Exact same
    permutation — parity-tested against window_partition/jnp.roll."""
    wi, wj, i, j = np.meshgrid(np.arange(hp // ws), np.arange(wp // ws),
                               np.arange(ws), np.arange(ws), indexing="ij")
    src = (((wi * ws + i + ss) % hp) * wp + ((wj * ws + j + ss) % wp))
    fwd = np.ascontiguousarray(src.reshape(-1).astype(np.int32))
    inv = np.empty(hp * wp, np.int32)
    inv[fwd] = np.arange(hp * wp, dtype=np.int32)
    return fwd, inv


def _partition_impl(b: int = None) -> str:
    """Formulation for the shift+partition permutation (measured, v5e):

    - "take" (batched axis-1 gather): one HBM pass; the measured winner
      at bs <= 16 and the default there.
    - "flat" (axis-0 gather over (B*Hp*Wp, C) rows with per-image offset
      indices): same single pass, but batch-free gather dims — XLA's
      batched-gather emitter degrades superlinearly at bs 32 (measured
      ~4 ms/step of gathers vs ~1.6 expected at Swin-B 480²).
    - "transpose" (roll + reshape + 6-D transpose): 2 HBM passes for
      shifted blocks, but pure tiled copies.

    b: the trace-time batch size, for LAVT_TAKE_PARTITION_MAX_BS routing
    ("take" up to the threshold, "transpose" above).  The threshold
    DEFAULTS OFF (huge): although the isolated round-trip A/B at bs 32
    favors transpose (take 1.62 ms vs transpose 1.36 ms at stage 1,
    0.32 vs 0.17 at the padded stage-3 geometry,
    tools/bench_partition.py — the batched-gather emitter degrades to
    ~1/3 of HBM roofline there), the e2e bs-32 bench LOSES with the
    transpose route (135.3 vs 127.9 ms/step, round 5): in-graph, the
    take gather fuses with the neighboring convert/normalize passes
    while roll+transpose adds unfused copies.  Large-batch serving
    should micro-batch instead (eval/microbatch.py).

    LAVT_PARTITION_IMPL overrides ("take"/"flat"/"transpose") for every
    batch; NOTE the padded gathers (partition_shifted_padded) route
    "flat" to the batched take — flat would need per-image sentinel
    offsets and already measured a loss on the unpadded stages."""
    impl = os.environ.get("LAVT_PARTITION_IMPL", "auto")
    if os.environ.get("LAVT_TAKE_PARTITION", "1") == "0":  # legacy hatch
        return "transpose"
    if impl != "auto":
        return impl
    max_bs = int(os.environ.get("LAVT_TAKE_PARTITION_MAX_BS", "1000000"))
    if b is not None and b > max_bs:
        return "transpose"
    return "take"


def use_take_partition(b: int = None) -> bool:
    """Single source of truth for the gather-vs-transpose routing: True
    unless the legacy LAVT_TAKE_PARTITION=0 hatch (or
    LAVT_PARTITION_IMPL=transpose, or a batch above the auto-routing
    threshold) forces the roll+6D-transpose path.  SwinBlock gates its
    pre-pad on this, so it must agree with _partition_impl — pass the
    same trace-time batch size the partition calls will see."""
    return _partition_impl(b) != "transpose"


@functools.lru_cache(maxsize=32)
def _flat_partition_idx(b: int, hp: int, wp: int, ws: int, ss: int):
    fwd, inv = _shifted_partition_idx_np(hp, wp, ws, ss)
    off = (np.arange(b, dtype=np.int32) * (hp * wp))[:, None]
    return ((off + fwd[None, :]).reshape(-1),
            (off + inv[None, :]).reshape(-1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def partition_shifted(x: jnp.ndarray, ws: int, ss: int) -> jnp.ndarray:
    """(B, Hp, Wp, C) -> (B, nW, ws*ws, C): cyclic shift by -ss on both
    spatial axes + window partition, as one static gather (see
    _partition_impl for the formulation variants).

    custom VJP: the indices are a PERMUTATION, so the gather's transpose
    is the inverse gather — jnp.take's default autodiff transpose is a
    scatter-add, which is slow on TPU and would have regressed training.
    """
    b, hp, wp, c = x.shape
    nw = (hp // ws) * (wp // ws)
    impl = _partition_impl(b)
    if impl == "transpose":
        if ss:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
        return window_partition(x, ws).reshape(b, nw, ws * ws, c)
    if impl == "flat":
        fwd, _ = _flat_partition_idx(b, hp, wp, ws, ss)
        return jnp.take(x.reshape(b * hp * wp, c), jnp.asarray(fwd),
                        axis=0).reshape(b, nw, ws * ws, c)
    fwd, _ = _shifted_partition_idx_np(hp, wp, ws, ss)
    return _batched_take(x.reshape(b, hp * wp, c), jnp.asarray(fwd),
                         impl).reshape(b, nw, ws * ws, c)


def _batched_take(x2, idx, impl):
    """jnp.take along axis 1, optionally split into batch halves.

    impl "split": two half-batch gathers + concat — probes whether XLA's
    batched-gather emitter (superlinear at bs 32, see _partition_impl)
    recovers its small-batch throughput on halves.

    NOTE: only "split" is special-cased here; the PADDED gathers
    (partition_shifted_padded / reverse_shifted_unpadded) route every
    other impl — including "flat" and "transpose" — to the batched take,
    because the zero-sentinel row is per-image (a flat axis-0 variant
    would need per-image sentinel offsets over (B*(H*W+1), C) rows, and
    "flat" already measured a loss on the unpadded stages: 216 vs
    241 img/s at bs 32).  A/B flags at padded stages measure the batched
    formulation regardless of LAVT_PARTITION_IMPL."""
    b = x2.shape[0]
    if impl == "split" and b >= 4:
        h = b // 2
        return jnp.concatenate(
            [jnp.take(x2[:h], idx, axis=1), jnp.take(x2[h:], idx, axis=1)],
            axis=0)
    return jnp.take(x2, idx, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def reverse_shifted(xw: jnp.ndarray, ws: int, ss: int,
                    hp: int, wp: int) -> jnp.ndarray:
    """Inverse of partition_shifted: (B, nW, ws*ws, C) -> (B, Hp, Wp, C).
    Same permutation argument for the custom VJP."""
    b, nw, n, c = xw.shape
    impl = _partition_impl(b)
    if impl == "transpose":
        x = window_reverse(xw.reshape(b * nw, n, c), ws, hp, wp)
        if ss:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        return x
    if impl == "flat":
        _, inv = _flat_partition_idx(b, hp, wp, ws, ss)
        return jnp.take(xw.reshape(b * hp * wp, c), jnp.asarray(inv),
                        axis=0).reshape(b, hp, wp, c)
    _, inv = _shifted_partition_idx_np(hp, wp, ws, ss)
    return _batched_take(xw.reshape(b, hp * wp, c), jnp.asarray(inv),
                         impl).reshape(b, hp, wp, c)


@functools.lru_cache(maxsize=32)
def _padded_partition_idx_np(h: int, w: int, hp: int, wp: int,
                             ws: int, ss: int):
    """Index arrays folding zero-PADDING into the shift+partition gather.

    fwd: (hp*wp,) indices into the unpadded flat (h*w) space, with every
    pad position (row >= h or col >= w) mapped to the sentinel h*w — the
    caller appends one zero row so the gather emits exact zeros there
    (same values as the reference's post-LN jnp.pad, backbone.py:615-621,
    without materializing the padded (B, Hp, Wp, C) copy).
    inv: (h*w,) indices into the windowed (hp*wp) ordering selecting only
    the real positions — reverse + un-pad as one gather."""
    fwd_p, _ = _shifted_partition_idx_np(hp, wp, ws, ss)
    rows, cols = np.divmod(fwd_p, wp)
    real = (rows < h) & (cols < w)
    fwd = np.where(real, rows * w + cols, h * w).astype(np.int32)
    # position of each real source (r*w + c) within the windowed ordering
    inv = np.empty(h * w, np.int32)
    inv[fwd[real]] = np.nonzero(real)[0].astype(np.int32)
    return fwd, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def partition_shifted_padded(x: jnp.ndarray, ws: int, ss: int,
                             hp: int, wp: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, nW, ws*ws, C) for geometries needing zero
    padding to (Hp, Wp): pad + cyclic shift + window partition as ONE
    gather from x plus an appended zero row (pad positions read it).

    custom VJP: real positions form a permutation into the output; pad
    outputs carry no gradient (their cotangent lands on the appended row
    and is dropped), matching jnp.pad's transpose exactly."""
    b, h, w, c = x.shape
    nw = (hp // ws) * (wp // ws)
    if _partition_impl(b) == "transpose":
        # big-batch route (see _partition_impl): explicit pad + roll +
        # 6-D transpose — one extra tiled pass, but it dodges the
        # batched-gather emitter entirely
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        if ss:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
        return window_partition(x, ws).reshape(b, nw, ws * ws, c)
    fwd, _ = _padded_partition_idx_np(h, w, hp, wp, ws, ss)
    xa = jnp.concatenate(
        [x.reshape(b, h * w, c), jnp.zeros((b, 1, c), x.dtype)], axis=1)
    return _batched_take(xa, jnp.asarray(fwd), _partition_impl()).reshape(
        b, nw, ws * ws, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def reverse_shifted_unpadded(xw: jnp.ndarray, ws: int, ss: int,
                             hp: int, wp: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of partition_shifted_padded: (B, nW, ws*ws, C) ->
    (B, H, W, C), dropping pad positions in the same gather."""
    b, nw, n, c = xw.shape
    if _partition_impl(b) == "transpose":
        x = window_reverse(xw.reshape(b * nw, n, c), ws, hp, wp)
        if ss:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        return x[:, :h, :w, :]
    _, inv = _padded_partition_idx_np(h, w, hp, wp, ws, ss)
    return _batched_take(xw.reshape(b, hp * wp, c), jnp.asarray(inv),
                         _partition_impl()).reshape(b, h, w, c)


def _partition_shifted_padded_fwd(x, ws, ss, hp, wp):
    return partition_shifted_padded(x, ws, ss, hp, wp), x.shape


def _partition_shifted_padded_bwd(ws, ss, hp, wp, shape, g):
    b, h, w, c = shape
    return (reverse_shifted_unpadded(g, ws, ss, hp, wp, h, w),)


partition_shifted_padded.defvjp(_partition_shifted_padded_fwd,
                                _partition_shifted_padded_bwd)


def _reverse_shifted_unpadded_fwd(xw, ws, ss, hp, wp, h, w):
    return reverse_shifted_unpadded(xw, ws, ss, hp, wp, h, w), None


def _reverse_shifted_unpadded_bwd(ws, ss, hp, wp, h, w, _, g):
    return (partition_shifted_padded(g, ws, ss, hp, wp),)


reverse_shifted_unpadded.defvjp(_reverse_shifted_unpadded_fwd,
                                _reverse_shifted_unpadded_bwd)


def _partition_shifted_fwd(x, ws, ss):
    return partition_shifted(x, ws, ss), x.shape


def _partition_shifted_bwd(ws, ss, shape, g):
    b, hp, wp, c = shape
    return (reverse_shifted(g, ws, ss, hp, wp),)


partition_shifted.defvjp(_partition_shifted_fwd, _partition_shifted_bwd)


def _reverse_shifted_fwd(xw, ws, ss, hp, wp):
    return reverse_shifted(xw, ws, ss, hp, wp), None


def _reverse_shifted_bwd(ws, ss, hp, wp, _, g):
    return (partition_shifted(g, ws, ss),)


reverse_shifted.defvjp(_reverse_shifted_fwd, _reverse_shifted_bwd)


@functools.lru_cache(maxsize=64)
def _shift_region_ids_2d_np(hp: int, wp: int, ws: int,
                            shift: int) -> np.ndarray:
    """(nW, ws*ws) int32 region ids of each windowed token."""
    img = np.zeros((hp, wp), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs_ in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs_] = cnt
            cnt += 1
    # partition into windows
    img = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    return np.ascontiguousarray(img.reshape(-1, ws * ws))  # (nW, N)


def _ids_to_mask(ids: np.ndarray) -> jnp.ndarray:
    """(nW, N) region ids -> (nW, N, N) additive mask, built ON DEVICE.

    Baking the full mask as an HLO literal is fine in 2D but fatal in 3D:
    at 480² video the (324, 392, 392) f32 constant is ~199 MB and the
    compile request itself blows up.  Only the ids are a constant; the
    0/-100 comparison is a traced (fused/cheap) op."""
    idj = jnp.asarray(ids)
    return jnp.where(idj[:, None, :] != idj[:, :, None], -100.0,
                     0.0).astype(jnp.float32)


def shift_mask_2d(hp: int, wp: int, ws: int, shift: int) -> Optional[jnp.ndarray]:
    """Additive SW-MSA mask for padded size (hp, wp); None when shift == 0."""
    if shift == 0:
        return None
    return _ids_to_mask(_shift_region_ids_2d_np(hp, wp, ws, shift))


@functools.lru_cache(maxsize=64)
def relative_position_index_2d(wh: int, ww: int) -> np.ndarray:
    """(Wh*Ww, Wh*Ww) index into the (2Wh-1)(2Ww-1) bias table.

    Same indexing scheme as Swin (reference lib/backbone.py:93-104).
    """
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=64)
def _axis_onehot(w: int) -> np.ndarray:
    """(2w-1, w, w) constant E with E[u, i, k] = [u == i - k + w - 1]."""
    u = np.arange(2 * w - 1)[:, None, None]
    i = np.arange(w)[None, :, None]
    k = np.arange(w)[None, None, :]
    return (u == i - k + w - 1).astype(np.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def relative_bias_from_table(table, wh: int, ww: int):
    """(h, N, N) relative-position bias from a ((2Wh-1)(2Ww-1), h) table.

    Forward: separable one-hot contraction on the MXU instead of a gather
    — the relative-position map factors per axis, and each output element
    has EXACTLY one nonzero (e1, e2) pair, so the matmul is bit-exact
    while the equivalent gather measured ~17x off HBM roofline on v5e
    (0.63 ms/step across Swin-B's 24 tables at bs 8, plus layout-copy
    fusions XLA wrapped around it). Backward: same trick on the cotangent
    (the gather's scatter-add transpose cost 3.5 ms/step)."""
    heads = table.shape[-1]
    e1 = jnp.asarray(_axis_onehot(wh))  # (2wh-1, wh, wh)
    e2 = jnp.asarray(_axis_onehot(ww))
    t3 = table.reshape(2 * wh - 1, 2 * ww - 1, heads)
    bias5 = jnp.einsum("uik,vjl,uvh->ijklh", e1, e2, t3,
                       precision=jax.lax.Precision.HIGHEST)
    n = wh * ww
    return bias5.reshape(n, n, heads).transpose(2, 0, 1)


def _bias_vjp_fwd(table, wh, ww):
    return relative_bias_from_table(table, wh, ww), None


def _bias_vjp_bwd(wh, ww, _, g):
    heads = g.shape[0]
    e1 = jnp.asarray(_axis_onehot(wh))
    e2 = jnp.asarray(_axis_onehot(ww))
    g5 = g.transpose(1, 2, 0).reshape(wh, ww, wh, ww, heads)
    dt3 = jnp.einsum("ijklh,uik,vjl->uvh", g5, e1, e2,
                     precision=jax.lax.Precision.HIGHEST)
    return (dt3.reshape((2 * wh - 1) * (2 * ww - 1), heads),)


relative_bias_from_table.defvjp(_bias_vjp_fwd, _bias_vjp_bwd)


# ---------------------------------------------------------------------------
# 3D
# ---------------------------------------------------------------------------

def window_partition_3d(x: jnp.ndarray, ws: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B*nW, wd*wh*ww, C). Dims divisible by ws."""
    b, d, h, w, c = x.shape
    wd, wh, ww = ws
    x = x.reshape(b, d // wd, wd, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wd * wh * ww, c)


def window_reverse_3d(windows: jnp.ndarray, ws: Tuple[int, int, int],
                      d: int, h: int, w: int) -> jnp.ndarray:
    wd, wh, ww = ws
    c = windows.shape[-1]
    b = windows.shape[0] // ((d // wd) * (h // wh) * (w // ww))
    x = windows.reshape(b, d // wd, h // wh, w // ww, wd, wh, ww, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, c)


def get_window_size_3d(input_size: Sequence[int], window_size: Sequence[int],
                       shift_size: Optional[Sequence[int]] = None):
    """Clamp window/shift to input dims (reference
    lib/video_swin_transformer.py:70-83): when an input dim is <= the window
    dim, the window collapses to the input dim and its shift becomes 0."""
    use_ws = list(window_size)
    use_ss = list(shift_size) if shift_size is not None else None
    for i in range(len(input_size)):
        if input_size[i] <= window_size[i]:
            use_ws[i] = input_size[i]
            if use_ss is not None:
                use_ss[i] = 0
    if shift_size is None:
        return tuple(use_ws)
    return tuple(use_ws), tuple(use_ss)


@functools.lru_cache(maxsize=64)
def _shift_region_ids_3d_np(dp: int, hp: int, wp: int,
                            ws: Tuple[int, int, int],
                            ss: Tuple[int, int, int]) -> np.ndarray:
    img = np.zeros((dp, hp, wp), dtype=np.int32)
    cnt = 0
    for d in (slice(0, -ws[0]), slice(-ws[0], -ss[0]) if ss[0] else slice(-ws[0], None),
              slice(-ss[0], None) if ss[0] else None):
        if d is None:
            continue
        for h in (slice(0, -ws[1]), slice(-ws[1], -ss[1]) if ss[1] else slice(-ws[1], None),
                  slice(-ss[1], None) if ss[1] else None):
            if h is None:
                continue
            for w in (slice(0, -ws[2]), slice(-ws[2], -ss[2]) if ss[2] else slice(-ws[2], None),
                      slice(-ss[2], None) if ss[2] else None):
                if w is None:
                    continue
                img[d, h, w] = cnt
                cnt += 1
    wd, wh, ww = ws
    img = img.reshape(dp // wd, wd, hp // wh, wh, wp // ww, ww)
    img = img.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wd * wh * ww)
    return np.ascontiguousarray(img)


def shift_mask_3d(dp: int, hp: int, wp: int, ws, ss) -> Optional[jnp.ndarray]:
    ws, ss = tuple(int(v) for v in ws), tuple(int(v) for v in ss)
    if not any(ss):
        return None
    return _ids_to_mask(_shift_region_ids_3d_np(dp, hp, wp, ws, ss))


@functools.lru_cache(maxsize=32)
def _grouped_padded_partition_idx_3d_np(d: int, h: int, w: int,
                                        dp: int, hp: int, wp: int,
                                        ws: Tuple[int, int, int],
                                        ss: Tuple[int, int, int],
                                        n_p: int):
    """Index arrays for the 3D fused-attention fast path: spatial
    zero-pad + cyclic shift + window partition + SUBLANE token pad
    (n -> n_p) folded into ONE gather, with the windows PERMUTED so all
    unmasked windows (shift mask identically zero) come first.

    The permutation is what makes the fused kernel affordable for video:
    the full (nW, N, N) shift mask at 480² clips is ~200 MB — but only
    the windows crossing a shift boundary (e.g. 35 of 324 at stage 1)
    need one, so the partition orders [unmasked..., masked...] and the
    caller runs a maskless kernel call on the big group and a small-mask
    call on the rest (reference mask semantics:
    video_swin_transformer.py compute_mask / window partition at
    :171-273, reproduced exactly — same additive -100 mask values).

    Returns (fwd, inv, nu, ids_masked):
      fwd (nw*n_p,) int32 — indices into the flat (d*h*w) source, with
        every pad/sublane-pad position mapped to the sentinel d*h*w
        (callers append one zero row);
      inv (d*h*w,) int32 — indices into the permuted windowed
        (nw*n_p) stream selecting each real position (reverse+unpad);
      nu — number of unmasked windows (they form the prefix);
      ids_masked (nw-nu, n) — region ids of the masked windows (build
        the small masks with _ids_to_mask)."""
    wd, wh, ww = ws
    n = wd * wh * ww
    nw = (dp // wd) * (hp // wh) * (wp // ww)
    di, hi, wi, i, j, k = np.meshgrid(
        np.arange(dp // wd), np.arange(hp // wh), np.arange(wp // ww),
        np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij")
    sd = (di * wd + i + ss[0]) % dp
    sh = (hi * wh + j + ss[1]) % hp
    sw = (wi * ww + k + ss[2]) % wp
    real = (sd < d) & (sh < h) & (sw < w)
    src = np.where(real, (sd * h + sh) * w + sw, d * h * w).astype(np.int32)
    src = src.reshape(nw, n)
    real = real.reshape(nw, n)

    if any(ss):
        ids = _shift_region_ids_3d_np(dp, hp, wp, ws, ss)  # (nw, n)
        masked = np.array([len(np.unique(r)) > 1 for r in ids])
    else:
        ids = np.zeros((nw, n), np.int32)
        masked = np.zeros((nw,), bool)
    perm = np.concatenate([np.nonzero(~masked)[0], np.nonzero(masked)[0]])
    nu = int((~masked).sum())

    src_p = src[perm]
    real_p = real[perm]
    pad_tokens = np.full((nw, n_p - n), d * h * w, np.int32)
    fwd = np.concatenate([src_p, pad_tokens], axis=1).reshape(-1)

    inv = np.empty(d * h * w, np.int32)
    wpos, tpos = np.nonzero(real_p)
    inv[src_p[real_p]] = (wpos * n_p + tpos).astype(np.int32)
    return (np.ascontiguousarray(fwd), np.ascontiguousarray(inv), nu,
            np.ascontiguousarray(ids[perm[nu:]]))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def partition_shifted_padded_3d(x: jnp.ndarray, ws, ss,
                                dp: int, hp: int, wp: int,
                                n_p: int) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, nW, n_p, C): 3D pad + shift + partition +
    sublane token-pad as ONE gather, windows permuted unmasked-first
    (see _grouped_padded_partition_idx_3d_np; query group sizes with
    partition_3d_groups).  custom VJP: real positions are a permutation,
    pad rows carry no gradient."""
    b, d, h, w, c = x.shape
    fwd, _, _, _ = _grouped_padded_partition_idx_3d_np(
        d, h, w, dp, hp, wp, tuple(ws), tuple(ss), n_p)
    nw = (dp // ws[0]) * (hp // ws[1]) * (wp // ws[2])
    xa = jnp.concatenate(
        [x.reshape(b, d * h * w, c), jnp.zeros((b, 1, c), x.dtype)], axis=1)
    return _batched_take(xa, jnp.asarray(fwd), _partition_impl(b)).reshape(
        b, nw, n_p, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))
def reverse_shifted_unpadded_3d(xw: jnp.ndarray, ws, ss,
                                dp: int, hp: int, wp: int,
                                d: int, h: int, w: int,
                                n_p: int) -> jnp.ndarray:
    """Inverse of partition_shifted_padded_3d:
    (B, nW, n_p, C) -> (B, D, H, W, C)."""
    b, nw, _, c = xw.shape
    _, inv, _, _ = _grouped_padded_partition_idx_3d_np(
        d, h, w, dp, hp, wp, tuple(ws), tuple(ss), n_p)
    return _batched_take(xw.reshape(b, nw * n_p, c), jnp.asarray(inv),
                         _partition_impl(b)).reshape(b, d, h, w, c)


def _partition_3d_fwd(x, ws, ss, dp, hp, wp, n_p):
    return partition_shifted_padded_3d(x, ws, ss, dp, hp, wp, n_p), x.shape


def _partition_3d_bwd(ws, ss, dp, hp, wp, n_p, shape, g):
    b, d, h, w, c = shape
    return (reverse_shifted_unpadded_3d(g, ws, ss, dp, hp, wp, d, h, w,
                                        n_p),)


partition_shifted_padded_3d.defvjp(_partition_3d_fwd, _partition_3d_bwd)


def _reverse_3d_fwd(xw, ws, ss, dp, hp, wp, d, h, w, n_p):
    return reverse_shifted_unpadded_3d(xw, ws, ss, dp, hp, wp, d, h, w,
                                       n_p), None


def _reverse_3d_bwd(ws, ss, dp, hp, wp, d, h, w, n_p, _, g):
    return (partition_shifted_padded_3d(g, ws, ss, dp, hp, wp, n_p),)


reverse_shifted_unpadded_3d.defvjp(_reverse_3d_fwd, _reverse_3d_bwd)


def partition_3d_groups(d: int, h: int, w: int, dp: int, hp: int, wp: int,
                        ws, ss, n_p: int):
    """(nu, mask_small or None) for the grouped 3D partition ordering:
    nu = unmasked-window count (prefix), mask_small = (nW-nu, n_p, n_p)
    additive mask for the masked suffix (built on device from the id
    constants, like shift_mask_3d; zero-padded to the sublane size —
    padded KEYS are killed by the -1e9 bias columns, padded QUERY rows
    compute garbage the reverse gather drops)."""
    _, _, nu, ids_masked = _grouped_padded_partition_idx_3d_np(
        d, h, w, dp, hp, wp, tuple(ws), tuple(ss), n_p)
    if ids_masked.shape[0] == 0:
        return nu, None
    m = _ids_to_mask(ids_masked)
    p = n_p - m.shape[1]
    if p:
        m = jnp.pad(m, ((0, 0), (0, p), (0, p)))
    return nu, m


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def relative_bias_from_table_3d(table, wd: int, wh: int, ww: int, n: int):
    """(h, n, n) 3D relative-position bias, == table[idx[:n, :n]] where
    idx = relative_position_index_3d (the [:n] truncation is the
    reference's clamped-window slicing, video_swin_transformer.py:150).

    Forward: plain gather. Backward: the scatter-add transpose is slow on
    TPU (~17 ms/step over video Swin-T's 12 tables); instead the cotangent
    is zero-padded to the full window and contracted against three tiny
    one-hot axis constants on the MXU (the map is separable per axis)."""
    heads = table.shape[-1]
    nf = wd * wh * ww
    if n == nf:
        # separable one-hot contraction (exact; gathers are slow on TPU —
        # see relative_bias_from_table)
        ed = jnp.asarray(_axis_onehot(wd))
        eh = jnp.asarray(_axis_onehot(wh))
        ew = jnp.asarray(_axis_onehot(ww))
        t4 = table.reshape(2 * wd - 1, 2 * wh - 1, 2 * ww - 1, heads)
        hp = jax.lax.Precision.HIGHEST
        b7 = jnp.einsum("uad,vbe,wcf,uvwh->abcdefh", ed, eh, ew, t4,
                        precision=hp)
        return b7.reshape(nf, nf, heads).transpose(2, 0, 1)
    # clamped window ([:n, :n] truncation): keep the gather — the einsum
    # would compute the full nf² bias just to slice it
    idx = relative_position_index_3d(wd, wh, ww)[:n, :n]
    bias = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, heads)
    return bias.transpose(2, 0, 1)


def _bias3d_vjp_fwd(table, wd, wh, ww, n):
    return relative_bias_from_table_3d(table, wd, wh, ww, n), None


def _bias3d_vjp_bwd(wd, wh, ww, n, _, g):
    heads = g.shape[0]
    nf = wd * wh * ww
    gp = g.transpose(1, 2, 0)
    if n < nf:  # clamped window: scatter of zeros adds nothing
        gp = jnp.pad(gp, ((0, nf - n), (0, nf - n), (0, 0)))
    g7 = gp.reshape(wd, wh, ww, wd, wh, ww, heads)
    ed = jnp.asarray(_axis_onehot(wd))
    eh = jnp.asarray(_axis_onehot(wh))
    ew = jnp.asarray(_axis_onehot(ww))
    dt = jnp.einsum("abcdefh,uad,vbe,wcf->uvwh", g7, ed, eh, ew,
                    precision=jax.lax.Precision.HIGHEST)
    return (dt.reshape((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), heads),)


relative_bias_from_table_3d.defvjp(_bias3d_vjp_fwd, _bias3d_vjp_bwd)


@functools.lru_cache(maxsize=16)
def relative_position_index_3d(wd: int, wh: int, ww: int) -> np.ndarray:
    """(N, N) index into the (2wd-1)(2wh-1)(2ww-1) bias table
    (reference lib/video_swin_transformer.py:104-120)."""
    coords = np.stack(np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww),
                                  indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)
