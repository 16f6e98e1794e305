"""Fused LN->MLP->residual Pallas kernel vs the XLA reference, plus the
SwinBlock tail path (same parameter tree both ways)."""

import numpy as np


def test_fused_msa_gates_sublane_misaligned_windows():
    """Window-7 models (Swin-T/S, n=49) break Mosaic's (chunk, n, c) ->
    (chunk*n, c) shape cast for chunk > 1 (sublane pack 16 for bf16 /
    8 for f32; reproduced on v5e: 'unsupported shape cast
    vector<9x49x96xbf16> -> vector<441x96xbf16>').  A chunk-of-1 grid is
    always valid (the collapse is a unit-dim squeeze), so these
    geometries remain SUPPORTED (chunk forced to 1) but UNROUTED — they
    measured slower than XLA (tools/bench_msa_chunk1.py), so the model
    routing policy (fused_msa_routed) sends them down the
    attention-core/XLA path."""
    from lavt_rs_tpu.ops.pallas.fused_msa import (_pick_chunk,
                                                  _pick_head_groups,
                                                  fused_msa_bwd_supported,
                                                  fused_msa_routed,
                                                  fused_msa_supported)

    # n=49: compiles at chunk 1 but is not routed
    assert fused_msa_supported(64, 49, 96, 3)            # Swin-T stage 0
    assert _pick_chunk(64, 49, 96, 3, 2) == 1            # chunk forced to 1
    assert fused_msa_bwd_supported(64, 49, 96, 3)
    assert _pick_head_groups(64, 49, 96, 3, 2)[1] == 1
    assert not fused_msa_routed(64, 49, 96, 3)
    assert not fused_msa_routed(64, 49, 96, 3, itemsize=4)
    # Swin-B window 12 (n=144, sublane-aligned): supported AND routed,
    # with multi-window chunks
    assert fused_msa_supported(100, 144, 128, 4)
    assert fused_msa_bwd_supported(100, 144, 128, 4)
    assert fused_msa_routed(100, 144, 128, 4)
    assert _pick_chunk(100, 144, 128, 4, 2) > 1
    assert fused_msa_routed(100, 144, 128, 4, itemsize=4)
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from lavt_rs_tpu.ops.pallas.fused_mlp import _ref_forward, fused_ln_mlp


def test_fused_ln_mlp_matches_ref(rng):
    m, c, hidden = 48, 32, 128
    x = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c).astype(np.float32))
    be = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((c, hidden)).astype(np.float32) * .1)
    b1 = jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * .1)
    w2 = jnp.asarray(rng.standard_normal((hidden, c)).astype(np.float32) * .1)
    b2 = jnp.asarray(rng.standard_normal(c).astype(np.float32) * .1)

    with pltpu.force_tpu_interpret_mode():
        got = fused_ln_mlp(x, g, be, w1, b1, w2, b2)
    want = _ref_forward(x, g, be, w1, b1, w2, b2).astype(np.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_ln_mlp_grads(rng):
    m, c, hidden = 16, 16, 32
    x = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    g = jnp.ones((c,))
    be = jnp.zeros((c,))
    w1 = jnp.asarray(rng.standard_normal((c, hidden)).astype(np.float32) * .2)
    b1 = jnp.zeros((hidden,))
    w2 = jnp.asarray(rng.standard_normal((hidden, c)).astype(np.float32) * .2)
    b2 = jnp.zeros((c,))

    def loss_p(x, g, w1, w2):
        with pltpu.force_tpu_interpret_mode():
            return (fused_ln_mlp(x, g, be, w1, b1, w2, b2) ** 2).sum()

    def loss_r(x, g, w1, w2):
        return (_ref_forward(x, g, be, w1, b1, w2, b2).astype(x.dtype)
                ** 2).sum()

    with pltpu.force_tpu_interpret_mode():  # bwd is a Pallas kernel too
        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(x, g, w1, w2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, g, w1, w2)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_ln_mlp_grads_hidden_split(rng, monkeypatch):
    """The hidden-split backward (weight slices per group + XLA LN tail,
    used when the full kernel's accumulators exceed VMEM) matches the
    reference grads, with and without droppath."""
    import lavt_rs_tpu.ops.pallas.fused_mlp as fm

    monkeypatch.setattr(fm, "fused_ln_mlp_bwd_supported",
                        lambda *a, **k: False)
    monkeypatch.setattr(fm, "_pick_hidden_groups", lambda *a, **k: 2)
    b_, rows, c, hidden = 3, 16, 32, 128
    m = b_ * rows
    x = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c).astype(np.float32))
    be = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((c, hidden)).astype(np.float32) * .2)
    b1 = jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * .1)
    w2 = jnp.asarray(rng.standard_normal((hidden, c)).astype(np.float32) * .2)
    b2 = jnp.asarray(rng.standard_normal(c).astype(np.float32) * .1)
    keep = jnp.asarray([2.0, 0.0, 1.0], jnp.float32)

    def loss_p(x, g, be, w1, b1, w2, b2):
        with pltpu.force_tpu_interpret_mode():
            return (fm.fused_ln_mlp(x, g, be, w1, b1, w2, b2) ** 2).sum()

    def loss_r(x, g, be, w1, b1, w2, b2):
        return (fm._ref_forward(x, g, be, w1, b1, w2, b2).astype(x.dtype)
                ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=tuple(range(7)))(
            x, g, be, w1, b1, w2, b2)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(x, g, be, w1, b1, w2, b2)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    def loss_pd(x, w1, w2):
        with pltpu.force_tpu_interpret_mode():
            return (fm.fused_ln_mlp_droppath(
                x, g, be, w1, b1, w2, b2, keep, rows) ** 2).sum()

    def loss_rd(x, w1, w2):
        return (fm._ref_forward_droppath(
            x, g, be, w1, b1, w2, b2, keep, rows).astype(x.dtype) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pd, argnums=(0, 1, 2))(x, w1, w2)
    gr = jax.grad(loss_rd, argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_ln_mlp_grads_xla_fallback(rng, monkeypatch):
    """The XLA-recompute backward (used when the Pallas backward exceeds
    its VMEM gate) still matches the reference grads."""
    import lavt_rs_tpu.ops.pallas.fused_mlp as fm

    monkeypatch.setattr(fm, "fused_ln_mlp_bwd_supported",
                        lambda *a, **k: False)
    monkeypatch.setattr(fm, "_pick_hidden_groups", lambda *a, **k: None)
    m, c, hidden = 16, 16, 32
    x = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    g = jnp.ones((c,))
    be = jnp.zeros((c,))
    w1 = jnp.asarray(rng.standard_normal((c, hidden)).astype(np.float32) * .2)
    b1 = jnp.zeros((hidden,))
    w2 = jnp.asarray(rng.standard_normal((hidden, c)).astype(np.float32) * .2)
    b2 = jnp.zeros((c,))

    def loss_p(x, g, w1, w2):
        with pltpu.force_tpu_interpret_mode():
            return (fm.fused_ln_mlp(x, g, be, w1, b1, w2, b2) ** 2).sum()

    def loss_r(x, g, w1, w2):
        return (fm._ref_forward(x, g, be, w1, b1, w2, b2).astype(x.dtype)
                ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(x, g, w1, w2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, g, w1, w2)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_ln_mlp_droppath_matches_ref(rng):
    from lavt_rs_tpu.ops.pallas.fused_mlp import (
        _ref_forward_droppath, fused_ln_mlp_droppath)

    b, rows, c, hidden = 3, 16, 32, 128
    m = b * rows
    x = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c).astype(np.float32))
    be = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((c, hidden)).astype(np.float32) * .1)
    b1 = jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * .1)
    w2 = jnp.asarray(rng.standard_normal((hidden, c)).astype(np.float32) * .1)
    b2 = jnp.asarray(rng.standard_normal(c).astype(np.float32) * .1)
    keep = jnp.asarray([2.0, 0.0, 1.0], jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        got = fused_ln_mlp_droppath(x, g, be, w1, b1, w2, b2, keep, rows)
    want = _ref_forward_droppath(x, g, be, w1, b1, w2, b2, keep, rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # dropped sample (keep=0): output == LN-input residual only
    np.testing.assert_allclose(np.asarray(got[rows:2 * rows]),
                               np.asarray(x[rows:2 * rows]),
                               rtol=1e-6, atol=1e-6)

    def loss_p(x, w1, w2):
        with pltpu.force_tpu_interpret_mode():
            return (fused_ln_mlp_droppath(
                x, g, be, w1, b1, w2, b2, keep, rows) ** 2).sum()

    def loss_r(x, w1, w2):
        return (_ref_forward_droppath(
            x, g, be, w1, b1, w2, b2, keep, rows).astype(x.dtype) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():  # bwd is a Pallas kernel too
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w1, w2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w1, w2)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_swin_block_fused_tail_droppath_matches_xla(rng):
    """Training-mode SwinBlock (drop_path > 0) with use_pallas equals the
    XLA block under the same dropout rng — the fused tail draws the same
    per-sample Bernoulli mask the XLA drop_path does."""
    from lavt_rs_tpu.models.swin2d import SwinBlock

    dim, heads, ws, H, W, B = 32, 4, 4, 8, 8, 4
    x = jnp.asarray(rng.standard_normal((B, H * W, dim)).astype(np.float32))
    kw = dict(dim=dim, num_heads=heads, window_size=ws, shift_size=2,
              drop_path_rate=0.5)
    blk_x = SwinBlock(**kw)
    v = blk_x.init(jax.random.PRNGKey(0), x, (H, W))
    rngs = {"dropout": jax.random.PRNGKey(7)}
    want = blk_x.apply(v, x, (H, W), False, rngs=rngs)
    blk_p = SwinBlock(**kw, use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        got = blk_p.apply(v, x, (H, W), False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_swin_block_fused_tail_matches_xla(rng):
    """SwinBlock with use_pallas (fused MSA + fused LN/MLP tail) equals the
    XLA block on the same variables."""
    from lavt_rs_tpu.models.swin2d import SwinBlock

    dim, heads, ws, H, W, B = 32, 4, 4, 8, 8, 2
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
    # and init in the fused path yields the same tree as the XLA path
    with pltpu.force_tpu_interpret_mode():
        v_p = blk_p.init(jax.random.PRNGKey(0), x, (H, W))
    assert (jax.tree_util.tree_structure(v_p)
            == jax.tree_util.tree_structure(v))


def test_swin_block3d_pallas_matches_xla(rng):
    """SwinBlock3D with use_pallas (fused MSA + fused tail) equals the XLA
    block on the same variables, including a clamped window + shift."""
    from lavt_rs_tpu.models.swin3d import SwinBlock3D

    dim, heads = 32, 4
    x = jnp.asarray(rng.standard_normal((1, 3, 8, 8, dim)).astype(np.float32))
    blk_x = SwinBlock3D(dim=dim, num_heads=heads, window_size=(8, 4, 4),
                        shift_size=(4, 2, 2))
    v = blk_x.init(jax.random.PRNGKey(0), x)
    want = blk_x.apply(v, x)
    blk_p = SwinBlock3D(dim=dim, num_heads=heads, window_size=(8, 4, 4),
                        shift_size=(4, 2, 2), use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        got = blk_p.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fwd_falls_back_when_no_legal_row_block(rng):
    """m = 2700 (an sp=3-sentence eval batch at 30x30 tokens, C=512) has no
    divisor that is a multiple of 8, and the full-array block busts the
    VMEM budget: _pick_rows must return 0 (a (1, C) block is not legal on
    Mosaic) and fused_ln_mlp must produce the same values via the XLA
    fallback instead of crashing at compile."""
    from lavt_rs_tpu.ops.pallas.fused_mlp import (_pick_rows, _ref_forward,
                                                  fused_ln_mlp)

    m, c, hidden = 2700, 512, 2048
    assert _pick_rows(m, c, hidden, 2) == 0
    x = jnp.asarray(rng.standard_normal((m, c)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((c,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, hidden)) * 0.02, jnp.float32)
    b1 = jnp.zeros((hidden,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hidden, c)) * 0.02, jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)
    got = fused_ln_mlp(x, g, be, w1, b1, w2, b2)
    ref = _ref_forward(x, g, be, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_layer_norm_rows_matches_flax(rng):
    import flax.linen as nn

    from lavt_rs_tpu.ops.pallas.ln import layer_norm_rows

    rows, c = 48, 128
    x = jnp.asarray(rng.standard_normal((rows, c)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))

    ln = nn.LayerNorm(epsilon=1e-5)
    want = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    with pltpu.force_tpu_interpret_mode():
        got = layer_norm_rows(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_layer_norm_rows_grads_match_xla(rng):
    from lavt_rs_tpu.ops.pallas.ln import layer_norm_rows

    rows, c = 32, 128
    x = jnp.asarray(rng.standard_normal((rows, c)).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal((c,)).astype(
        np.float32))
    bias = jnp.asarray(0.1 * rng.standard_normal((c,)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((rows, c)).astype(np.float32))

    def ref_ln(x, s, b):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, 1, keepdims=True)
        var = jnp.mean(xf * xf, 1, keepdims=True) - mu * mu
        return (xf - mu) * jax.lax.rsqrt(var + 1e-5) * s[None] + b[None]

    def loss_p(x, s, b):
        return (layer_norm_rows(x, s, b) * w).sum()

    def loss_x(x, s, b):
        return (ref_ln(x, s, b) * w).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, scale, bias)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)
