"""Pallas fused window attention vs the XLA reference path.

Runs in interpreter mode on CPU (the kernel is exercised compiled on real
TPU by bench/eval); gradients checked through the custom VJP.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from lavt_rs_tpu.ops.attention import window_attention_xla
from lavt_rs_tpu.ops.pallas.window_attn import window_attention_pallas


def _inputs(rng, b=2, nw=3, h=2, n=16, hd=8, dtype=np.float32):
    q = rng.standard_normal((b, nw, h, n, hd)).astype(dtype)
    k = rng.standard_normal((b, nw, h, n, hd)).astype(dtype)
    v = rng.standard_normal((b, nw, h, n, hd)).astype(dtype)
    bias = rng.standard_normal((h, n, n)).astype(np.float32)
    mask = np.where(rng.random((nw, n, n)) > 0.7, -100.0, 0.0
                    ).astype(np.float32)
    return map(jnp.asarray, (q, k, v, bias, mask))


def test_pallas_matches_xla_with_mask(rng):
    q, k, v, bias, mask = _inputs(rng)
    with pltpu.force_tpu_interpret_mode():
        got = window_attention_pallas(q, k, v, bias, mask)
    want = window_attention_xla(q, k, v, bias, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_matches_xla_no_mask(rng):
    q, k, v, bias, _ = _inputs(rng)
    with pltpu.force_tpu_interpret_mode():
        got = window_attention_pallas(q, k, v, bias, None)
    want = window_attention_xla(q, k, v, bias, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_grads_match_xla(rng):
    q, k, v, bias, mask = _inputs(rng, b=1, nw=2, h=2, n=8, hd=4)

    def loss_p(q, k, v, bias):
        with pltpu.force_tpu_interpret_mode():
            return (window_attention_pallas(q, k, v, bias, mask) ** 2).sum()

    def loss_x(q, k, v, bias):
        return (window_attention_xla(q, k, v, bias, mask) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():  # bwd is a Pallas kernel too
        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_msa_matches_ref(rng):
    from lavt_rs_tpu.ops.pallas.fused_msa import fused_window_msa, _ref_forward

    b, nw, n, c, h = 2, 3, 16, 32, 4
    x = jnp.asarray(rng.standard_normal((b, nw, n, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,)).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.1)
    bproj = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
    mask = jnp.asarray(np.where(rng.random((nw, n, n)) > 0.7, -100.0,
                                0.0).astype(np.float32))
    scale = (c // h) ** -0.5

    with pltpu.force_tpu_interpret_mode():
        got = fused_window_msa(x, wqkv, bqkv, wproj, bproj, bias, mask,
                               h, scale)
    want = _ref_forward(x, wqkv, bqkv, wproj, bproj, bias, mask, h, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    # no-mask path
    with pltpu.force_tpu_interpret_mode():
        got2 = fused_window_msa(x, wqkv, bqkv, wproj, bproj, bias, None,
                                h, scale)
    want2 = _ref_forward(x, wqkv, bqkv, wproj, bproj, bias, None, h, scale)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-4, atol=1e-4)


def test_fused_msa_grads(rng):
    from lavt_rs_tpu.ops.pallas.fused_msa import fused_window_msa, _ref_forward

    b, nw, n, c, h = 1, 2, 8, 16, 2
    x = jnp.asarray(rng.standard_normal((b, nw, n, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.2)
    bqkv = jnp.zeros((3 * c,))
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.2)
    bproj = jnp.zeros((c,))
    bias = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
    scale = (c // h) ** -0.5

    def loss_p(x, wqkv, wproj, bias):
        with pltpu.force_tpu_interpret_mode():
            return (fused_window_msa(x, wqkv, bqkv, wproj, bproj, bias,
                                     None, h, scale) ** 2).sum()

    def loss_r(x, wqkv, wproj, bias):
        return (_ref_forward(x, wqkv, bqkv, wproj, bproj, bias, None, h,
                             scale) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():  # bwd kernel traces in grad
        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(x, wqkv, wproj, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, wqkv, wproj, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)


def test_window_attention_module_pallas_matches_xla(rng):
    """The full WindowAttention module: fused path == XLA path with the
    same parameter tree."""
    from lavt_rs_tpu.models.swin2d import WindowAttention

    b, nw, n, c, h, ws = 2, 4, 16, 32, 4, 4
    x = jnp.asarray(rng.standard_normal((b, nw, n, c)).astype(np.float32))
    m_x = WindowAttention(dim=c, window_size=(ws, ws), num_heads=h)
    v = m_x.init(jax.random.PRNGKey(0), x)
    want = m_x.apply(v, x)
    m_p = WindowAttention(dim=c, window_size=(ws, ws), num_heads=h,
                          use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        got = m_p.apply(v, x)  # same variables!
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_msa_2d_matches_partitioned(rng):
    """The spatial-grid kernel (partition folded into BlockSpec) equals
    partition -> fused_window_msa -> reverse."""
    from lavt_rs_tpu.ops.pallas.experimental import (
        _ref_forward_2d, fused_window_msa_2d,
    )

    b, hp, wp_, c, h, ws = 2, 8, 12, 32, 4, 4
    x = jnp.asarray(rng.standard_normal((b, hp, wp_, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,)).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.1)
    bproj = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((h, ws * ws, ws * ws))
                       .astype(np.float32))
    nw = (hp // ws) * (wp_ // ws)
    mask = jnp.asarray(np.where(rng.random((nw, ws * ws, ws * ws)) > 0.7,
                                -100.0, 0.0).astype(np.float32))
    scale = (c // h) ** -0.5

    with pltpu.force_tpu_interpret_mode():
        got = fused_window_msa_2d(x, wqkv, bqkv, wproj, bproj, bias, mask,
                                  h, scale, ws)
    want = _ref_forward_2d(x, wqkv, bqkv, wproj, bproj, bias, mask, h,
                           scale, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_swin_block_pallas_full_path_matches_xla(rng):
    """Whole SwinBlock (shifted + padded) with the spatial fused kernel
    equals the XLA block using the same variables."""
    from lavt_rs_tpu.models.swin2d import SwinBlock

    dim, heads, ws, H, W, B = 32, 4, 4, 10, 7, 2
    x = jnp.asarray(rng.standard_normal((B, H * W, dim)).astype(np.float32))
    blk_x = SwinBlock(dim=dim, num_heads=heads, window_size=ws, shift_size=2)
    v = blk_x.init(jax.random.PRNGKey(0), x, (H, W))
    want = blk_x.apply(v, x, (H, W))
    blk_p = SwinBlock(dim=dim, num_heads=heads, window_size=ws, shift_size=2,
                      use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        got = blk_p.apply(v, x, (H, W))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_msa_grads_decomposed_fallback(rng, monkeypatch):
    """Grads through the decomposed backward (XLA GEMMs + attention-core
    kernel), used when the fully fused backward exceeds its VMEM gate."""
    import lavt_rs_tpu.ops.pallas.fused_msa as fm

    monkeypatch.setattr(fm, "fused_msa_bwd_supported",
                        lambda *a, **k: False)
    b, nw, n, c, h = 1, 2, 8, 16, 2
    x = jnp.asarray(rng.standard_normal((b, nw, n, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * .2)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,)).astype(np.float32) * .1)
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * .2)
    bproj = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * .1)
    bias = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
    mask = jnp.asarray(np.where(rng.random((nw, n, n)) > 0.6, -100.0,
                                0.0).astype(np.float32))
    scale = (c // h) ** -0.5

    def loss_p(x, wqkv, bqkv, wproj, bproj, bias):
        with pltpu.force_tpu_interpret_mode():
            return (fm.fused_window_msa(x, wqkv, bqkv, wproj, bproj, bias,
                                        mask, h, scale) ** 2).sum()

    def loss_r(x, wqkv, bqkv, wproj, bproj, bias):
        return (fm._ref_forward(x, wqkv, bqkv, wproj, bproj, bias, mask, h,
                                scale) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4, 5))(
            x, wqkv, bqkv, wproj, bproj, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5))(
        x, wqkv, bqkv, wproj, bproj, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_fused_msa_grads_head_group_split(rng, monkeypatch):
    """Grads through the head-group-split fused backward (the Swin-B
    stage-3 path: per-group weight slices + grad reassembly) must match
    the reference — forced here by pinning the group count to 2."""
    import lavt_rs_tpu.ops.pallas.fused_msa as fm

    monkeypatch.setattr(fm, "_pick_head_groups", lambda *a, **k: (2, 1))
    b, nw, n, c, h = 1, 2, 8, 16, 4
    x = jnp.asarray(rng.standard_normal((b, nw, n, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * .2)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,)).astype(np.float32) * .1)
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * .2)
    bproj = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * .1)
    bias = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
    mask = jnp.asarray(np.where(rng.random((nw, n, n)) > 0.6, -100.0,
                                0.0).astype(np.float32))
    scale = (c // h) ** -0.5

    def loss_p(x, wqkv, bqkv, wproj, bproj, bias):
        with pltpu.force_tpu_interpret_mode():
            return (fm.fused_window_msa(x, wqkv, bqkv, wproj, bproj, bias,
                                        mask, h, scale) ** 2).sum()

    def loss_r(x, wqkv, bqkv, wproj, bproj, bias):
        return (fm._ref_forward(x, wqkv, bqkv, wproj, bproj, bias, mask, h,
                                scale) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4, 5))(
            x, wqkv, bqkv, wproj, bproj, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5))(
        x, wqkv, bqkv, wproj, bproj, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_fused_msa_fwd_head_group_split(rng, monkeypatch):
    """Forward head-group splitting (the Swin-B stage-3 C=1024 path:
    per-group weight/bias slices, f32 partial outputs summed, bproj added
    once) must match the single-call kernel and the XLA reference —
    forced here by pinning the forward group count to 2."""
    import lavt_rs_tpu.ops.pallas.fused_msa as fm

    b, nw, n, c, h = 2, 3, 16, 32, 4
    x = jnp.asarray(rng.standard_normal((b, nw, n, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * .1)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,)).astype(np.float32) * .1)
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * .1)
    bproj = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * .1)
    bias = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
    mask = jnp.asarray(np.where(rng.random((nw, n, n)) > 0.7, -100.0,
                                0.0).astype(np.float32))
    scale = (c // h) ** -0.5

    want = fm._ref_forward(x, wqkv, bqkv, wproj, bproj, bias, mask, h, scale)
    monkeypatch.setattr(fm, "_pick_fwd_groups", lambda *a, **k: 2)
    for msk in (mask, None):
        w = want if msk is mask else fm._ref_forward(
            x, wqkv, bqkv, wproj, bproj, bias, None, h, scale)
        with pltpu.force_tpu_interpret_mode():
            got = fm.fused_window_msa(x, wqkv, bqkv, wproj, bproj, bias,
                                      msk, h, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(w),
                                   rtol=1e-4, atol=1e-4)

    # grads through the custom VJP with the grouped forward
    def loss_p(x, wqkv, bqkv, wproj, bproj, bias):
        with pltpu.force_tpu_interpret_mode():
            return (fm.fused_window_msa(x, wqkv, bqkv, wproj, bproj, bias,
                                        mask, h, scale) ** 2).sum()

    def loss_r(x, wqkv, bqkv, wproj, bproj, bias):
        return (fm._ref_forward(x, wqkv, bqkv, wproj, bproj, bias, mask, h,
                                scale) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4, 5))(
            x, wqkv, bqkv, wproj, bproj, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5))(
        x, wqkv, bqkv, wproj, bproj, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_fused_msa_grads_masked(rng):
    """Grads through the fully fused Pallas backward (dx + all weight/bias
    grads accumulated in one kernel) with an additive shift mask present."""
    from lavt_rs_tpu.ops.pallas.fused_msa import fused_window_msa, _ref_forward

    b, nw, n, c, h = 1, 4, 16, 32, 4
    x = jnp.asarray(rng.standard_normal((b, nw, n, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * .2)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,)).astype(np.float32) * .1)
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * .2)
    bproj = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * .1)
    bias = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
    mask = jnp.asarray(np.where(rng.random((nw, n, n)) > 0.6, -100.0,
                                0.0).astype(np.float32))
    scale = (c // h) ** -0.5

    def loss_p(x, wqkv, bqkv, wproj, bproj, bias):
        with pltpu.force_tpu_interpret_mode():
            return (fused_window_msa(x, wqkv, bqkv, wproj, bproj, bias,
                                     mask, h, scale) ** 2).sum()

    def loss_r(x, wqkv, bqkv, wproj, bproj, bias):
        return (_ref_forward(x, wqkv, bqkv, wproj, bproj, bias, mask, h,
                             scale) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4, 5))(
            x, wqkv, bqkv, wproj, bproj, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5))(
        x, wqkv, bqkv, wproj, bproj, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_fused_msa_fwd_and_grads_fat_gemm_path(rng):
    """C=256 routes through the head-concat scratch + fat-GEMM form
    (_use_fat_gemm) in both the forward and the fused backward; parity
    against the XLA reference, with a mask present."""
    from lavt_rs_tpu.ops.pallas.fused_msa import (
        _use_fat_gemm, fused_window_msa, _ref_forward)

    b, nw, n, c, h = 1, 2, 8, 256, 8
    assert _use_fat_gemm(c)
    x = jnp.asarray(rng.standard_normal((b, nw, n, c)).astype(np.float32))
    wqkv = jnp.asarray(
        rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.05)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,)).astype(np.float32) * .1)
    wproj = jnp.asarray(
        rng.standard_normal((c, c)).astype(np.float32) * 0.05)
    bproj = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * .1)
    bias = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
    mask = jnp.asarray(np.where(rng.random((nw, n, n)) > 0.6, -100.0,
                                0.0).astype(np.float32))
    scale = (c // h) ** -0.5

    with pltpu.force_tpu_interpret_mode():
        got = fused_window_msa(x, wqkv, bqkv, wproj, bproj, bias, mask,
                               h, scale)
    want = _ref_forward(x, wqkv, bqkv, wproj, bproj, bias, mask, h, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    def loss_p(x, wqkv, bqkv, wproj, bproj, bias):
        with pltpu.force_tpu_interpret_mode():
            return (fused_window_msa(x, wqkv, bqkv, wproj, bproj, bias,
                                     mask, h, scale) ** 2).sum()

    def loss_r(x, wqkv, bqkv, wproj, bproj, bias):
        return (_ref_forward(x, wqkv, bqkv, wproj, bproj, bias, mask, h,
                             scale) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4, 5))(
            x, wqkv, bqkv, wproj, bproj, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5))(
        x, wqkv, bqkv, wproj, bproj, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_fused_msa_padded_matches_ref(rng):
    """Window-7 geometry (n=49, sublane-misaligned): the pad-to-64 wrapper
    must match the unpadded XLA reference bit-for-tolerance, masked and
    unmasked."""
    from lavt_rs_tpu.ops.pallas.fused_msa import (_ref_forward,
                                                  fused_msa_padded_supported,
                                                  fused_window_msa_padded)

    b, nw, n, c, h = 1, 4, 49, 32, 4
    assert fused_msa_padded_supported(nw, n, c, h, itemsize=4)
    x = jnp.asarray(rng.standard_normal((b, nw, n, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,)).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.1)
    bproj = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
    mask = jnp.asarray(np.where(rng.random((nw, n, n)) > 0.7, -100.0,
                                0.0).astype(np.float32))
    scale = (c // h) ** -0.5

    for m in (mask, None):
        with pltpu.force_tpu_interpret_mode():
            got = fused_window_msa_padded(x, wqkv, bqkv, wproj, bproj, bias,
                                          m, h, scale)
        want = _ref_forward(x, wqkv, bqkv, wproj, bproj, bias, m, h, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_fused_msa_padded_grads(rng):
    """Grads through the padded wrapper: the pad/slice transposes must
    zero padded-row cotangents so weight/bias/x grads are exact."""
    from lavt_rs_tpu.ops.pallas.fused_msa import (_ref_forward,
                                                  fused_window_msa_padded)

    b, nw, n, c, h = 1, 2, 13, 16, 2  # n=13 pads to 16 at f32
    x = jnp.asarray(rng.standard_normal((b, nw, n, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.2)
    bqkv = jnp.zeros((3 * c,))
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.2)
    bproj = jnp.zeros((c,))
    bias = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
    scale = (c // h) ** -0.5

    def loss_p(x, wqkv, wproj, bias):
        with pltpu.force_tpu_interpret_mode():
            return (fused_window_msa_padded(x, wqkv, bqkv, wproj, bproj,
                                            bias, None, h, scale) ** 2).sum()

    def loss_r(x, wqkv, wproj, bias):
        return (_ref_forward(x, wqkv, bqkv, wproj, bproj, bias, None, h,
                             scale) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(x, wqkv, wproj, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, wqkv, wproj, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)


def test_fused_msa_ln_matches_ref(rng):
    """In-kernel pre-attention LayerNorm == explicit f32 row-LN + MSA."""
    from lavt_rs_tpu.ops.pallas.fused_msa import (
        _ref_forward, fused_window_msa_ln, layer_norm_f32)

    b, nw, n, c, h = 2, 3, 16, 32, 4
    x = jnp.asarray(rng.standard_normal((b, nw, n, c)).astype(np.float32))
    ln_s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * .1)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,)).astype(np.float32) * .1)
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * .1)
    bproj = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * .1)
    bias = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
    mask = jnp.asarray(np.where(rng.random((nw, n, n)) > 0.7, -100.0,
                                0.0).astype(np.float32))
    scale = (c // h) ** -0.5

    with pltpu.force_tpu_interpret_mode():
        got = fused_window_msa_ln(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                                  bias, mask, h, scale)
    want = _ref_forward(layer_norm_f32(x, ln_s, ln_b), wqkv, bqkv, wproj,
                        bproj, bias, mask, h, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_msa_ln_grads(rng):
    """The LN-fused VJP (XLA LN backward chained through the fused MSA
    VJP) matches the all-XLA reference, including d(ln_scale)/d(ln_bias)."""
    from lavt_rs_tpu.ops.pallas.fused_msa import (
        _ref_forward, fused_window_msa_ln, layer_norm_f32)

    b, nw, n, c, h = 1, 2, 8, 16, 2
    x = jnp.asarray(rng.standard_normal((b, nw, n, c)).astype(np.float32))
    ln_s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * .2)
    bqkv = jnp.zeros((3 * c,))
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * .2)
    bproj = jnp.zeros((c,))
    bias = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
    scale = (c // h) ** -0.5

    def loss_p(x, ln_s, ln_b, wqkv, wproj, bias):
        with pltpu.force_tpu_interpret_mode():
            return (fused_window_msa_ln(x, ln_s, ln_b, wqkv, bqkv, wproj,
                                        bproj, bias, None, h, scale)
                    ** 2).sum()

    def loss_r(x, ln_s, ln_b, wqkv, wproj, bias):
        return (_ref_forward(layer_norm_f32(x, ln_s, ln_b), wqkv, bqkv,
                             wproj, bproj, bias, None, h, scale) ** 2).sum()

    args = (x, ln_s, ln_b, wqkv, wproj, bias)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(6)))(*args)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)


def test_swin_block_ln_in_kernel_matches_xla(rng):
    """Unpadded SwinBlock routes the pre-attention LN into the fused MSA
    kernel (ln_in_attn); the result must match the XLA block (separate
    nn.LayerNorm) on the same variables, shifted and unshifted."""
    from lavt_rs_tpu.models.swin2d import SwinBlock

    dim, heads, ws, H, W, B = 32, 4, 4, 8, 8, 2
    for shift in (0, 2):
        x = jnp.asarray(rng.standard_normal((B, H * W, dim))
                        .astype(np.float32))
        blk_x = SwinBlock(dim=dim, num_heads=heads, window_size=ws,
                          shift_size=shift)
        v = blk_x.init(jax.random.PRNGKey(0), x, (H, W))
        want = blk_x.apply(v, x, (H, W))
        blk_p = SwinBlock(dim=dim, num_heads=heads, window_size=ws,
                          shift_size=shift, use_pallas=True)
        with pltpu.force_tpu_interpret_mode():
            vp = blk_p.init(jax.random.PRNGKey(0), x, (H, W))
            got = blk_p.apply(v, x, (H, W))
        # identical trees: LN params created by _LNParams == nn.LayerNorm
        assert jax.tree_util.tree_structure(vp) == \
            jax.tree_util.tree_structure(v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_fused_msa_grads_residual_vs_recompute(rng, monkeypatch):
    """The residual-consuming backward (q/k/v/p saved by the taped
    forward, _bwd_kernel_resid) must produce the same grads as the
    recompute backward (LAVT_MSA_RESIDUALS=0), for both the plain and
    the LN-fused entry points, with and without a shift mask."""
    import lavt_rs_tpu.ops.pallas.fused_msa as fm

    b, nw, n, c, h = 2, 4, 16, 64, 2
    x = jnp.asarray(rng.standard_normal((b, nw, n, c)).astype(np.float32))
    wqkv = jnp.asarray(
        rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.2)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,)).astype(np.float32))
    wproj = jnp.asarray(
        rng.standard_normal((c, c)).astype(np.float32) * 0.2)
    bproj = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
    ls = jnp.asarray(1 + 0.1 * rng.standard_normal((c,)).astype(np.float32))
    lb = jnp.asarray(0.1 * rng.standard_normal((c,)).astype(np.float32))
    mask = jnp.asarray(
        rng.choice([0.0, -100.0], (nw, n, n)).astype(np.float32))
    scale = (c // h) ** -0.5

    def grads(kind, msk):
        def loss(x, wqkv, bqkv, wproj, bias, ls, lb):
            with pltpu.force_tpu_interpret_mode():
                if kind == "ln":
                    y = fm.fused_window_msa_ln(x, ls, lb, wqkv, bqkv,
                                               wproj, bproj, bias, msk,
                                               h, scale)
                else:
                    y = fm.fused_window_msa(x, wqkv, bqkv, wproj, bproj,
                                            bias, msk, h, scale)
            return (y ** 2).sum()

        with pltpu.force_tpu_interpret_mode():
            return jax.grad(loss, argnums=tuple(range(7)))(
                x, wqkv, bqkv, wproj, bias, ls, lb)

    for kind in ("plain", "ln"):
        for msk in (None, mask):
            monkeypatch.delenv("LAVT_MSA_RESIDUALS", raising=False)
            assert fm._save_residuals_ok(b, nw, n, c, h, 4)
            g_res = grads(kind, msk)
            monkeypatch.setenv("LAVT_MSA_RESIDUALS", "0")
            g_rec = grads(kind, msk)
            monkeypatch.delenv("LAVT_MSA_RESIDUALS", raising=False)
            for a, b_ in zip(g_res, g_rec):
                # 1e-3 like the ref-grads tests: the two paths differ
                # only in f32 accumulation order (saved vs recomputed
                # intermediates), worth ~2e-4 relative on dwqkv/dbqkv
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-3,
                    err_msg=f"kind={kind} mask={msk is not None}")


def test_grouped_3d_fused_block_matches_xla(rng, monkeypatch):
    """SwinBlock3D's grouped fused route (pad+shift+partition+sublane
    pad as one unmasked-first gather, maskless kernel on the interior +
    small-mask call on boundary windows) must match the XLA path —
    outputs and input grads — for shifted, unshifted, and
    clamped-window geometries."""
    from lavt_rs_tpu.models.swin3d import SwinBlock3D

    monkeypatch.setenv("LAVT_FUSED3D", "all")
    for (D, H, W, wsz, shift) in [(4, 14, 14, (8, 7, 7), (4, 3, 3)),
                                  (4, 14, 14, (8, 7, 7), (0, 0, 0)),
                                  (2, 10, 12, (8, 7, 7), (4, 3, 3))]:
        x = jnp.asarray(
            rng.standard_normal((2, D, H, W, 48)).astype(np.float32))
        blk = SwinBlock3D(dim=48, num_heads=3, window_size=wsz,
                          shift_size=shift)
        blk_p = SwinBlock3D(dim=48, num_heads=3, window_size=wsz,
                            shift_size=shift, use_pallas=True)
        v = blk.init(jax.random.PRNGKey(0), x)
        want = blk.apply(v, x)
        gr = jax.grad(lambda v, x: (blk.apply(v, x) ** 2).sum(),
                      argnums=1)(v, x)
        with pltpu.force_tpu_interpret_mode():
            vp = blk_p.init(jax.random.PRNGKey(0), x)
            got = blk_p.apply(v, x)
            monkeypatch.setenv("LAVT_FUSED3D_TRAIN", "1")
            g = jax.grad(
                lambda v, x: (blk_p.apply(v, x) ** 2).sum(), argnums=1)(
                    v, x)
            monkeypatch.delenv("LAVT_FUSED3D_TRAIN")
        assert jax.tree_util.tree_structure(vp) == \
            jax.tree_util.tree_structure(v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3)
