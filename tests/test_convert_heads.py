"""Converter coverage for the VLT / LTS decoder heads: a torch module tree
with the reference's state_dict naming (lib/vlt.py, lib/mask_predictor.py)
converts into variables that exactly match the flax models' init trees and
drive a forward pass."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from lavt_rs_tpu.convert.torch2jax import (  # noqa: E402
    convert_lts_decoder,
    convert_vlt_decoder,
)


def _tree_shapes(t, prefix=()):
    out = {}
    for k, v in t.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def _cbr(cin, cout, k):
    return [tnn.Conv2d(cin, cout, k, padding=k // 2, bias=False),
            tnn.BatchNorm2d(cout), tnn.ReLU()]


def _build_vlt_torch(joint=64, d_model=32, nq=16, size=4, nhead=8,
                     nlayers=2, lang=48):
    """Reference VLTFuseAndClassify attribute/naming contract
    (lib/vlt.py:40-126) with small dims."""
    m = tnn.Module()
    m.vis_reduce_chann_1 = tnn.Sequential(*_cbr(joint, joint // 2, 1),
                                          *_cbr(joint // 2, joint, 3))
    m.vis_reduce_chann_2 = tnn.Sequential(*_cbr(joint // 2, joint // 2, 1))
    m.fuse_1_2 = tnn.Sequential(*_cbr(joint + joint // 2, joint // 2, 1))
    m.vis_reduce_chann_3 = tnn.Sequential(*_cbr(joint // 4, joint // 4, 1))
    m.fuse_2_3 = tnn.Sequential(*_cbr(joint // 2 + joint // 4, joint // 2, 1))
    m.hallucinate_result_of_23 = tnn.Sequential(
        *_cbr(joint // 2, joint // 4, 1), *_cbr(joint // 4, joint // 2, 3))
    m.project_again = tnn.Sequential(*_cbr(joint, joint // 2, 1))
    m.fuse_again = tnn.Sequential(*_cbr(joint + joint // 2, d_model, 1))
    m.last_project = tnn.Sequential(*_cbr(d_model, d_model, 1))
    m.lang_proj = tnn.Sequential(tnn.Linear(lang, joint),
                                 tnn.BatchNorm1d(joint), tnn.ReLU())
    m.joint_threshold = tnn.Sequential(tnn.BatchNorm2d(joint), tnn.ReLU())

    qg = tnn.Module()
    qg.project_1 = tnn.Sequential(*_cbr(joint // 2 + 6, joint // 2, 3),
                                  *_cbr(joint // 2, joint // 2, 3),
                                  *_cbr(joint // 2, joint // 2, 3))
    qg.project_2 = tnn.Conv2d(joint // 2, nq, 1, bias=False)
    qg.project_query = tnn.Sequential(
        tnn.Conv1d(size * size, d_model, 1, bias=False), tnn.ReLU())
    qg.project_lang = tnn.Sequential(
        tnn.Conv1d(lang, d_model, 1, bias=False), tnn.ReLU())
    qg.query_gen = tnn.MultiheadAttention(d_model, nhead)
    m.query_generation = qg

    tf = tnn.Module()
    tf.transformer_encoder = tnn.TransformerEncoder(
        tnn.TransformerEncoderLayer(d_model, nhead, d_model, dropout=0.0),
        nlayers)
    tf.transformer_decoder = tnn.TransformerDecoder(
        tnn.TransformerDecoderLayer(d_model, nhead, d_model, dropout=0.0),
        nlayers)
    m.transformer_fusion = tf

    qb = tnn.Module()
    qb.not_decoded_query_proj = tnn.Sequential(
        tnn.Conv1d(d_model, d_model, 1, bias=False), tnn.ReLU())
    qb.decoded_query_proj = tnn.Sequential(
        tnn.Conv1d(d_model, d_model, 1, bias=False), tnn.ReLU())
    qb.gate_proj = tnn.Sequential(tnn.Conv1d(2 * d_model, d_model, 1,
                                             bias=False), tnn.ReLU(),
                                  tnn.Conv1d(d_model, 1, 1, bias=False),
                                  tnn.Sigmoid())
    m.query_balancing = qb

    m.q_to_spatial = tnn.Sequential(
        tnn.Conv1d(d_model, size * size, 1, bias=False), tnn.ReLU())
    m.spatial_refine = tnn.Sequential(*_cbr(nq, d_model, 3))

    dec = tnn.Module()
    dec.conv1_4 = tnn.Conv2d(d_model, d_model, 3, padding=1, bias=False)
    dec.bn1_4 = tnn.BatchNorm2d(d_model)
    dec.conv2_4 = tnn.Conv2d(d_model, d_model, 3, padding=1, bias=False)
    dec.bn2_4 = tnn.BatchNorm2d(d_model)
    for s in ("3", "2", "1"):
        setattr(dec, f"conv1_{s}",
                tnn.Conv2d(d_model, d_model, 3, padding=1, bias=False))
        setattr(dec, f"bn1_{s}", tnn.BatchNorm2d(d_model))
    dec.classifier = tnn.Conv2d(d_model, 2, 1)
    m.decoding = dec
    return m


def test_convert_vlt_decoder_shapes_and_forward(rng):
    from lavt_rs_tpu.models.vlt import VLTFuseAndClassify

    # `size` is the reference's img//16 == the C3 (H/16) resolution
    # (lib/vlt.py:24); C4 sits at size//2.
    joint, d_model, lang, size = 64, 32, 48, 8
    t = _build_vlt_torch(joint=joint, d_model=d_model, lang=lang, size=size)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    params, stats = convert_vlt_decoder(sd, prefix="")

    model = VLTFuseAndClassify(d_model=d_model, d_hid=d_model,
                               img_size=16 * size)
    b = 2
    c4 = jnp.asarray(rng.standard_normal((b, size // 2, size // 2, joint)),
                     jnp.float32)
    c3 = jnp.asarray(rng.standard_normal((b, size, size, joint // 2)),
                     jnp.float32)
    c2 = jnp.asarray(
        rng.standard_normal((b, 2 * size, 2 * size, joint // 4)), jnp.float32)
    l = jnp.asarray(rng.standard_normal((b, 6, lang)), jnp.float32)
    lm = jnp.ones((b, 6), jnp.int32)
    ref = jax.jit(model.init)(jax.random.PRNGKey(0), c4, c3, c2, l, lm)

    got_p = _tree_shapes(params)
    want_p = _tree_shapes(jax.tree.map(np.asarray, ref["params"]))
    assert got_p == want_p, (set(want_p) ^ set(got_p)) or "shape mismatch"
    got_s = _tree_shapes(stats)
    want_s = _tree_shapes(jax.tree.map(np.asarray, ref["batch_stats"]))
    assert got_s == want_s

    out = model.apply({"params": params, "batch_stats": stats},
                      c4, c3, c2, l, lm)
    assert out.shape[0] == b and out.shape[-1] == 2
    assert np.isfinite(np.asarray(out)).all()


def _build_lts_torch(c4=64, lang=48):
    hidden, c3, c2 = c4 // 2, c4 // 2, c4 // 4
    m = tnn.Module()
    lg = tnn.Module()
    lg.project = tnn.Sequential(tnn.Linear(lang, c4), tnn.ReLU(),
                                tnn.Linear(c4, c4))
    m.lang_gen = lg
    m.lang_proj = tnn.Sequential(tnn.Linear(c4, c4), tnn.LeakyReLU())
    m.vis_proj = tnn.Sequential(tnn.Conv2d(c4, c4, 1, bias=False),
                                tnn.LeakyReLU())
    m.conv4 = tnn.Sequential(tnn.Conv2d(c4, hidden, 1, bias=False),
                             tnn.LeakyReLU())
    m.conv3_v = tnn.Sequential(tnn.Conv2d(c3, hidden, 1, bias=False),
                               tnn.LeakyReLU())
    m.conv3 = tnn.Sequential(tnn.Conv2d(2 * hidden, hidden, 1, bias=False),
                             tnn.LeakyReLU())
    m.conv2_v = tnn.Sequential(tnn.Conv2d(c2, c2, 1, bias=False),
                               tnn.LeakyReLU())
    m.lang_filter = tnn.Linear(c4, hidden + c2)
    aspp = tnn.Module()
    convs = tnn.ModuleList()
    ain, aout = hidden + c2 + 1, hidden // 2
    convs.append(tnn.Sequential(tnn.Conv2d(ain, aout, 1, bias=False),
                                tnn.BatchNorm2d(aout), tnn.ReLU()))
    for r in (12, 24, 36):
        convs.append(tnn.Sequential(
            tnn.Conv2d(ain, aout, 3, padding=r, dilation=r, bias=False),
            tnn.BatchNorm2d(aout), tnn.ReLU()))
    convs.append(tnn.Sequential(tnn.AdaptiveAvgPool2d(1),
                                tnn.Conv2d(ain, aout, 1, bias=False),
                                tnn.BatchNorm2d(aout), tnn.ReLU()))
    aspp.convs = convs
    aspp.project = tnn.Sequential(tnn.Conv2d(5 * aout, aout, 1, bias=False),
                                  tnn.BatchNorm2d(aout), tnn.ReLU())
    m.aspp = aspp
    m.conv1_1 = tnn.Conv2d(aout, 2, 1)
    return m


def test_convert_lts_decoder_shapes_and_forward(rng):
    from lavt_rs_tpu.models.lts import LTSDecoding

    c4, lang = 64, 48
    t = _build_lts_torch(c4=c4, lang=lang)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    params, stats = convert_lts_decoder(sd, prefix="")

    model = LTSDecoding(c4_dims=c4)
    b = 2
    x4 = jnp.asarray(rng.standard_normal((b, 4, 4, c4)), jnp.float32)
    x3 = jnp.asarray(rng.standard_normal((b, 8, 8, c4 // 2)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((b, 16, 16, c4 // 4)), jnp.float32)
    l = jnp.asarray(rng.standard_normal((b, 6, lang)), jnp.float32)
    lm = jnp.ones((b, 6), jnp.int32)
    ref = jax.jit(model.init)(jax.random.PRNGKey(0), x4, x3, x2, l, lm)

    got_p = _tree_shapes(params)
    want_p = _tree_shapes(jax.tree.map(np.asarray, ref["params"]))
    assert got_p == want_p, (set(want_p) ^ set(got_p)) or "shape mismatch"
    got_s = _tree_shapes(stats)
    want_s = _tree_shapes(jax.tree.map(np.asarray, ref["batch_stats"]))
    assert got_s == want_s

    out = model.apply({"params": params, "batch_stats": stats},
                      x4, x3, x2, l, lm)
    assert out.shape[0] == b and out.shape[-1] == 2
    assert np.isfinite(np.asarray(out)).all()


def test_resolve_checkpoint_path(tmp_path, monkeypatch):
    """URL checkpoints fetch into the cache once (reference mmcv
    load_checkpoint URL path, checkpoint.py:41-80); local paths pass
    through; model-zoo schemes error with guidance."""
    import pytest

    from lavt_rs_tpu.convert.torch2jax import resolve_checkpoint_path

    # local path: identity
    assert resolve_checkpoint_path("/x/y.pth") == "/x/y.pth"

    # URL: fetched via urllib into ~/.cache (fake urlretrieve — no egress)
    monkeypatch.setenv("HOME", str(tmp_path))
    calls = []

    def fake_retrieve(url, dst):
        calls.append(url)
        with open(dst, "wb") as f:
            f.write(b"ckpt-bytes")

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
    url = "https://example.com/swin_base.pth?dl=1"
    p1 = resolve_checkpoint_path(url)
    assert open(p1, "rb").read() == b"ckpt-bytes"
    assert p1.endswith("swin_base.pth")
    p2 = resolve_checkpoint_path(url)  # cached: no second fetch
    assert p1 == p2 and len(calls) == 1

    with pytest.raises(RuntimeError, match="model-zoo"):
        resolve_checkpoint_path("modelzoo://resnet50")
