"""Unit tests for core ops: resize, window utils, instance norm, attention."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from lavt_rs_tpu.ops.resize import resize_2d, resize_nchw
from lavt_rs_tpu.ops.norm import instance_norm_tokens
from lavt_rs_tpu.ops.window import (
    window_partition, window_reverse, shift_mask_2d,
    window_partition_3d, window_reverse_3d, shift_mask_3d,
    relative_position_index_2d, get_window_size_3d,
)
from lavt_rs_tpu.ops.attention import window_attention_xla


def test_resize_bilinear_align_corners_matches_torch(rng):
    x = rng.standard_normal((2, 15, 15, 7)).astype(np.float32)
    for out in [(30, 30), (60, 45), (13, 13), (120, 120), (1, 5)]:
        got = np.asarray(resize_2d(jnp.asarray(x), out))
        want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                             size=out, mode="bilinear",
                             align_corners=True).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_bilinear_half_pixel_matches_torch(rng):
    x = rng.standard_normal((2, 16, 12, 3)).astype(np.float32)
    got = np.asarray(resize_2d(jnp.asarray(x), (37, 29), align_corners=False))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         size=(37, 29), mode="bilinear",
                         align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_bicubic_matches_torch(rng):
    x = rng.standard_normal((1, 13, 13, 4)).astype(np.float32)
    for ac in (True, False):
        got = np.asarray(resize_2d(jnp.asarray(x), (23, 23), method="bicubic",
                                   align_corners=ac))
        want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                             size=(23, 23), mode="bicubic",
                             align_corners=ac).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resize_nchw_matches_nhwc(rng):
    x = rng.standard_normal((2, 5, 9, 11)).astype(np.float32)
    a = np.asarray(resize_nchw(jnp.asarray(x), (18, 22)))
    b = np.asarray(resize_2d(jnp.asarray(x).transpose(0, 2, 3, 1), (18, 22)))
    np.testing.assert_allclose(a, b.transpose(0, 3, 1, 2), rtol=1e-6, atol=1e-6)


def test_window_partition_roundtrip(rng):
    x = rng.standard_normal((2, 14, 21, 5)).astype(np.float32)
    w = window_partition(jnp.asarray(x), 7)
    assert w.shape == (2 * 2 * 3, 49, 5)
    back = window_reverse(w, 7, 14, 21)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_window_partition_matches_torch(rng):
    from torch_oracles import window_partition_t

    x = rng.standard_normal((2, 14, 14, 3)).astype(np.float32)
    got = np.asarray(window_partition(jnp.asarray(x), 7))
    want = window_partition_t(torch.from_numpy(x), 7).reshape(-1, 49, 3).numpy()
    np.testing.assert_array_equal(got, want)


def test_shift_mask_matches_torch():
    from torch_oracles import shift_mask_t

    got = np.asarray(shift_mask_2d(14, 21, 7, 3))
    want = shift_mask_t(14, 21, 7, 3).numpy()
    np.testing.assert_array_equal(got, want)


def test_relative_position_index_symmetric_diag():
    idx = relative_position_index_2d(7, 7)
    assert idx.shape == (49, 49)
    # all diagonal entries are the center of the table
    assert (np.diag(idx) == idx[0, 0]).all()
    assert idx.max() == 13 * 13 - 1 and idx.min() == 0


def test_window_partition_3d_roundtrip(rng):
    x = rng.standard_normal((2, 4, 8, 8, 3)).astype(np.float32)
    w = window_partition_3d(jnp.asarray(x), (2, 4, 4))
    assert w.shape == (2 * 2 * 2 * 2, 32, 3)
    back = window_reverse_3d(w, (2, 4, 4), 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_get_window_size_3d_clamps():
    ws, ss = get_window_size_3d((4, 16, 16), (8, 7, 7), (4, 3, 3))
    assert ws == (4, 7, 7) and ss == (0, 3, 3)
    assert get_window_size_3d((10, 5, 20), (8, 7, 7)) == (8, 5, 7)


def test_shift_mask_3d_zero_when_no_shift():
    assert shift_mask_3d(4, 8, 8, (2, 4, 4), (0, 0, 0)) is None
    m = shift_mask_3d(4, 8, 8, (2, 4, 4), (1, 2, 2))
    assert m is not None and m.shape == (8, 32, 32)
    vals = np.unique(np.asarray(m))
    assert set(vals.tolist()) <= {-100.0, 0.0}


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((3, 50, 16)).astype(np.float32)
    got = np.asarray(instance_norm_tokens(jnp.asarray(x)))
    # torch InstanceNorm1d over (B, C, L)
    want = F.instance_norm(torch.from_numpy(x).permute(0, 2, 1))
    want = want.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_window_attention_xla_matches_naive(rng):
    b, nw, h, n, d = 2, 3, 4, 9, 8
    q = rng.standard_normal((b, nw, h, n, d)).astype(np.float32)
    k = rng.standard_normal((b, nw, h, n, d)).astype(np.float32)
    v = rng.standard_normal((b, nw, h, n, d)).astype(np.float32)
    bias = rng.standard_normal((h, n, n)).astype(np.float32)
    mask = np.where(rng.random((nw, n, n)) > 0.8, -100.0, 0.0).astype(np.float32)

    got = np.asarray(window_attention_xla(*map(jnp.asarray, (q, k, v, bias)),
                                          mask=jnp.asarray(mask)))
    qt, kt, vt = map(torch.from_numpy, (q, k, v))
    attn = (qt * d**-0.5) @ kt.transpose(-2, -1)
    attn = attn + torch.from_numpy(bias)[None, None]
    attn = attn + torch.from_numpy(mask)[None, :, None]
    want = (attn.softmax(-1) @ vt).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_relative_bias_from_table_matches_gather(rng):
    from lavt_rs_tpu.ops.window import (relative_bias_from_table,
                                        relative_position_index_2d)

    for wh, ww in ((7, 7), (12, 12), (4, 6)):
        h = 5
        table = rng.standard_normal(((2 * wh - 1) * (2 * ww - 1), h)
                                    ).astype(np.float32)
        idx = relative_position_index_2d(wh, ww)
        want = table[idx.reshape(-1)].reshape(wh * ww, wh * ww, h
                                              ).transpose(2, 0, 1)
        got = np.asarray(relative_bias_from_table(jnp.asarray(table),
                                                  wh, ww))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_relative_bias_from_table_grad_matches_gather(rng):
    import jax

    from lavt_rs_tpu.ops.window import (relative_bias_from_table,
                                        relative_position_index_2d)

    wh, ww, h = 7, 5, 3
    table = jnp.asarray(rng.standard_normal(
        ((2 * wh - 1) * (2 * ww - 1), h)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal(
        (h, wh * ww, wh * ww)).astype(np.float32))
    idx = relative_position_index_2d(wh, ww)

    def loss(t):
        return (relative_bias_from_table(t, wh, ww) * cot).sum()

    def loss_ref(t):
        b = t[jnp.asarray(idx.reshape(-1))].reshape(wh * ww, wh * ww, h)
        return (b.transpose(2, 0, 1) * cot).sum()

    got = jax.grad(loss)(table)
    want = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_relative_bias_3d_grad_matches_gather(rng):
    import jax

    from lavt_rs_tpu.ops.window import (relative_bias_from_table_3d,
                                        relative_position_index_3d)

    wd, wh, ww, h = 3, 4, 4, 2
    nf = wd * wh * ww
    table = jnp.asarray(rng.standard_normal(
        ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), h)).astype(np.float32))
    for n in (nf, 2 * wh * ww):  # full and clamped ([:n,:n]) windows
        cot = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
        idx = relative_position_index_3d(wd, wh, ww)[:n, :n]

        fwd = relative_bias_from_table_3d(table, wd, wh, ww, n)
        want_fwd = np.asarray(table)[idx.reshape(-1)].reshape(n, n, h
                                                              ).transpose(2, 0, 1)
        np.testing.assert_allclose(np.asarray(fwd), want_fwd, rtol=0, atol=0)

        def loss(t):
            return (relative_bias_from_table_3d(t, wd, wh, ww, n) * cot).sum()

        def loss_ref(t):
            b = t[jnp.asarray(idx.reshape(-1))].reshape(n, n, h)
            return (b.transpose(2, 0, 1) * cot).sum()

        got = jax.grad(loss)(table)
        want = jax.grad(loss_ref)(table)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_partition_shifted_matches_roll_partition(rng):
    """partition_shifted / reverse_shifted (single static gather) must be
    the exact same permutation as roll -> window_partition and its
    inverse, for shifted and unshifted blocks."""
    import jax.numpy as jnp

    from lavt_rs_tpu.ops.window import (partition_shifted, reverse_shifted,
                                        window_partition, window_reverse)

    for (hp, wp, ws, ss) in ((24, 24, 12, 6), (24, 36, 12, 0),
                             (14, 14, 7, 3)):
        x = jnp.asarray(rng.standard_normal((2, hp, wp, 5)), jnp.float32)
        nw = (hp // ws) * (wp // ws)
        ref = jnp.roll(x, (-ss, -ss), (1, 2)) if ss else x
        ref_w = window_partition(ref, ws).reshape(2, nw, ws * ws, 5)
        got_w = partition_shifted(x, ws, ss)
        np.testing.assert_array_equal(np.asarray(ref_w), np.asarray(got_w))
        back = reverse_shifted(got_w, ws, ss, hp, wp)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_bias_einsum_matches_gather(rng):
    """The separable one-hot forward must equal the index gather EXACTLY
    (each output has a single nonzero term), 2D and 3D incl. clamp."""
    import jax.numpy as jnp

    from lavt_rs_tpu.ops.window import (
        relative_bias_from_table, relative_bias_from_table_3d,
        relative_position_index_2d, relative_position_index_3d)

    t = jnp.asarray(rng.standard_normal((13 * 13, 4)).astype(np.float32))
    got = relative_bias_from_table(t, 7, 7)
    idx = relative_position_index_2d(7, 7)
    want = np.asarray(t)[idx.reshape(-1)].reshape(49, 49, 4
                                                  ).transpose(2, 0, 1)
    np.testing.assert_array_equal(np.asarray(got), want)

    t3 = jnp.asarray(rng.standard_normal((3 * 5 * 5, 2)).astype(np.float32))
    got3 = relative_bias_from_table_3d(t3, 2, 3, 3, 18)  # full n
    idx3 = relative_position_index_3d(2, 3, 3)
    want3 = np.asarray(t3)[idx3.reshape(-1)].reshape(18, 18, 2
                                                     ).transpose(2, 0, 1)
    np.testing.assert_array_equal(np.asarray(got3), want3)
    # clamped n keeps the gather path
    got3c = relative_bias_from_table_3d(t3, 2, 3, 3, 12)
    np.testing.assert_array_equal(np.asarray(got3c), want3[:, :12, :12])


def test_partition_shifted_grads_are_inverse_permutation(rng):
    """The custom VJPs (inverse gather, not scatter-add) must equal the
    roll+transpose formulation's gradients exactly."""
    import jax
    import jax.numpy as jnp

    from lavt_rs_tpu.ops.window import (partition_shifted, reverse_shifted,
                                        window_partition, window_reverse)

    hp, wp, ws, ss, c = 24, 24, 12, 6, 5
    x = jnp.asarray(rng.standard_normal((2, hp, wp, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 4, ws * ws, c)), jnp.float32)
    nw = (hp // ws) * (wp // ws)

    def f_new(x):
        xw = partition_shifted(x, ws, ss)
        return (reverse_shifted(xw * w, ws, ss, hp, wp) ** 2).sum()

    def f_ref(x):
        r = jnp.roll(x, (-ss, -ss), (1, 2))
        xw = window_partition(r, ws).reshape(2, nw, ws * ws, c)
        y = window_reverse((xw * w).reshape(2 * nw, ws * ws, c), ws, hp, wp)
        return (jnp.roll(y, (ss, ss), (1, 2)) ** 2).sum()

    g_new = jax.grad(f_new)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_partition_shifted_padded_matches_pad_then_partition():
    """partition_shifted_padded folds jnp.pad into the gather (zero-row
    trick); it and its inverse/VJPs must be BIT-identical to
    pad -> partition_shifted / reverse_shifted -> unpad slice for both
    shifted and unshifted geometries (Swin-B 480² stage-3 shape)."""
    import jax
    import jax.numpy as jnp

    from lavt_rs_tpu.ops.window import (partition_shifted,
                                        partition_shifted_padded,
                                        reverse_shifted,
                                        reverse_shifted_unpadded)

    rng = np.random.default_rng(0)
    h = w = 30
    ws, hp, wp = 12, 36, 36
    x = jnp.asarray(rng.standard_normal((2, h, w, 5)), jnp.float32)
    pad = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
    for ss in (0, 6):
        ref = partition_shifted(jnp.pad(x, pad), ws, ss)
        got = partition_shifted_padded(x, ws, ss, hp, wp)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

        yw = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)
        ref_r = reverse_shifted(yw, ws, ss, hp, wp)[:, :h, :w, :]
        got_r = reverse_shifted_unpadded(yw, ws, ss, hp, wp, h, w)
        np.testing.assert_array_equal(np.asarray(got_r), np.asarray(ref_r))

        g_ref = jax.grad(lambda t: float(0) + (partition_shifted(
            jnp.pad(t, pad), ws, ss) * yw).sum())(x)
        g_new = jax.grad(lambda t: (partition_shifted_padded(
            t, ws, ss, hp, wp) * yw).sum())(x)
        np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_new))

        gr_ref = jax.grad(lambda t: (reverse_shifted(
            t, ws, ss, hp, wp)[:, :h, :w, :] * x).sum())(yw)
        gr_new = jax.grad(lambda t: (reverse_shifted_unpadded(
            t, ws, ss, hp, wp, h, w) * x).sum())(yw)
        np.testing.assert_array_equal(np.asarray(gr_ref), np.asarray(gr_new))


def test_microbatched_matches_plain():
    """eval/microbatch.py: chained micro-batches inside one jit must
    equal the plain batched apply (serving-grade large-batch path; XLA
    compiles large batches measurably slower per image on TPU)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lavt_rs_tpu.config import lavt_one_tiny
    from lavt_rs_tpu.eval.microbatch import microbatched
    from lavt_rs_tpu.models.factory import build_model

    cfg = lavt_one_tiny().replace(img_size=64, max_tokens=6)
    cfg = cfg.replace(bert=dataclasses.replace(cfg.bert, num_layers=1))
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(100, 2000, (4, 6)), jnp.int32)
    msk = jnp.ones((4, 6), jnp.int32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), img[:1], ids[:1],
                            msk[:1])
    plain = jax.jit(lambda v, *a: model.apply(v, *a))(v, img, ids, msk)
    mb = jax.jit(microbatched(lambda v, *a: model.apply(v, *a), 2))(
        v, img, ids, msk)
    assert mb.shape == plain.shape
    np.testing.assert_allclose(np.asarray(mb), np.asarray(plain),
                               rtol=2e-5, atol=2e-5)
    # non-multiple batches fall through to the plain path unchanged
    mb3 = jax.jit(microbatched(lambda v, *a: model.apply(v, *a), 3))(
        v, img, ids, msk)
    np.testing.assert_allclose(np.asarray(mb3), np.asarray(plain),
                               rtol=2e-5, atol=2e-5)
