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

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
