"""End-to-end model forward: shapes, jit consistency, dtype policy."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lavt_rs_tpu.config import lavt_one_tiny
from lavt_rs_tpu.models.factory import build_model


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = lavt_one_tiny().replace(img_size=64, max_tokens=6)
    # shrink BERT so tests stay fast
    import dataclasses
    cfg = cfg.replace(bert=dataclasses.replace(
        cfg.bert, vocab_size=64, hidden_size=768, num_layers=2))
    model = build_model(cfg)
    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)).astype(np.float32))
    ids = jnp.ones((2, 6), jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, ids, mask)
    return cfg, model, variables, (img, ids, mask)


def test_forward_shape(tiny_setup):
    cfg, model, variables, (img, ids, mask) = tiny_setup
    out = model.apply(variables, img, ids, mask)
    assert out.shape == (2, 64, 64, 2)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_jit_matches_eager(tiny_setup):
    cfg, model, variables, args = tiny_setup
    eager = model.apply(variables, *args)
    jitted = jax.jit(lambda v, *a: model.apply(v, *a))(variables, *args)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                               rtol=1e-5, atol=1e-5)


def test_batch_independence(tiny_setup):
    """Each sample's output depends only on its own image/text."""
    cfg, model, variables, (img, ids, mask) = tiny_setup
    full = np.asarray(model.apply(variables, img, ids, mask))
    one = np.asarray(model.apply(variables, img[:1], ids[:1], mask[:1]))
    np.testing.assert_allclose(full[:1], one, rtol=1e-4, atol=1e-4)


def test_language_mask_matters(tiny_setup):
    cfg, model, variables, (img, ids, mask) = tiny_setup
    out1 = np.asarray(model.apply(variables, img, ids, mask))
    mask2 = jnp.ones_like(mask)
    out2 = np.asarray(model.apply(variables, img, ids, mask2))
    # sample 0 has padding in mask — changing it must change the output
    assert np.abs(out1[0] - out2[0]).max() > 1e-6


def test_bf16_forward_runs(tiny_setup):
    cfg, model, variables, (img, ids, mask) = tiny_setup
    cfg16 = cfg.replace(dtype="bfloat16")
    model16 = build_model(cfg16)
    out = model16.apply(variables, img, ids, mask)
    assert out.shape == (2, 64, 64, 2)
    assert out.dtype == jnp.float32  # final logits upcast for the resize
    assert np.isfinite(np.asarray(out)).all()


def test_folded_bias_matches_unfolded(tiny_setup):
    """fold_inference_variables precomputes the rel-pos biases into a
    'folded' collection; the folded apply must be numerically identical
    (the stored tensor IS the per-apply expansion's output)."""
    from lavt_rs_tpu.eval.fold import fold_inference_variables

    cfg, model, variables, args = tiny_setup
    folded = fold_inference_variables(model, variables, *args)
    assert "folded" in folded
    leaves = jax.tree_util.tree_leaves(folded["folded"])
    assert leaves and all(lf.ndim == 3 for lf in leaves)  # (h, N, N) each
    want = np.asarray(model.apply(variables, *args))
    got = np.asarray(model.apply(folded, *args))
    np.testing.assert_array_equal(got, want)


def test_bf16_param_cast_is_bit_identical(tiny_setup):
    """cast_matmul_params_bf16 pre-casts the >=2-D matmul weights to bf16;
    under a bf16 model every apply casts them anyway, so the outputs must
    be BIT-identical.  1-D leaves (biases, LN scales — consumed in f32 by
    the fused kernels) and the rel-pos tables must stay f32."""
    from lavt_rs_tpu.eval.fold import CAST_KEEP_NAMES, cast_matmul_params_bf16

    cfg, model, variables, args = tiny_setup
    model16 = build_model(cfg.replace(dtype="bfloat16"))
    cast = cast_matmul_params_bf16(variables)

    def leaves_named(tree, pred):
        out = []

        def walk(node, path):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, path + (k,))
                elif pred(k, v):
                    out.append((path + (k,), v))
        walk(tree, ())
        return out

    # big weights cast, 1-D + the shared keep-set (rel-pos tables, APE) kept
    assert all(v.dtype == jnp.bfloat16 for _, v in leaves_named(
        cast["params"], lambda k, v: v.ndim >= 2
        and k not in CAST_KEEP_NAMES))
    assert all(v.dtype == jnp.float32 for _, v in leaves_named(
        cast["params"], lambda k, v: v.ndim < 2
        or k in CAST_KEEP_NAMES))

    want = np.asarray(model16.apply(variables, *args))
    got = np.asarray(model16.apply(cast, *args))
    np.testing.assert_array_equal(got, want)
