"""A/B: shifted-window partition as roll+reshape+transpose (current) vs a
single static-index take (one gather copy), and LayerNorm dtype variants.

The bs-32 inference profile shows the per-block layout ops (roll
concatenate, partition transpose, reshapes, norm1 converts) at ~0.5
ms/img — near HBM roofline as separate copies; collapsing them into
fewer copies is the only lever short of in-kernel windowing (blocked by
Mosaic sublane tiling, swin2d.py NOTE).

Usage: python tools/bench_partition.py [--batch 8]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_marginal(fn, args, iters=20):
    float(fn(*args))

    def run(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        float(r)
        return time.perf_counter() - t0

    t1 = run(1)
    tn = run(iters + 1)
    return max((tn - t1) / iters, 1e-9) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lavt_rs_tpu.ops.window import window_partition, window_reverse

    b = args.batch
    rng = np.random.default_rng(0)
    for (hp, wp, c, ws) in ((120, 120, 128, 12), (36, 36, 512, 12)):
        ss = ws // 2
        x = jnp.asarray(rng.standard_normal((b, hp, wp, c)), jnp.bfloat16)
        nw = (hp // ws) * (wp // ws)

        @jax.jit
        def cur(x):
            y = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
            yw = window_partition(y, ws).reshape(b, nw, ws * ws, c)
            # round-trip back (reverse + unroll), as in the block
            y2 = window_reverse(yw.reshape(b * nw, ws * ws, c), ws, hp, wp)
            y2 = jnp.roll(y2, shift=(ss, ss), axis=(1, 2))
            return (y2.astype(jnp.float32)).sum()

        # single-take variant
        hidx = (np.arange(hp).reshape(hp // ws, ws))  # window-major rows
        widx = (np.arange(wp).reshape(wp // ws, ws))
        flat = ((((hidx[:, None, :, None] ) ) ))
        # flat gather index: out[wi, wj, i, j] = ((wi*ws+i+ss)%hp)*wp + ((wj*ws+j+ss)%wp)
        wi, wj, i, j = np.meshgrid(np.arange(hp // ws), np.arange(wp // ws),
                                   np.arange(ws), np.arange(ws), indexing="ij")
        src = (((wi * ws + i + ss) % hp) * wp + ((wj * ws + j + ss) % wp))
        fwd_idx = jnp.asarray(src.reshape(-1), jnp.int32)
        inv = np.empty(hp * wp, np.int64)
        inv[src.reshape(-1)] = np.arange(hp * wp)
        inv_idx = jnp.asarray(inv, jnp.int32)

        @jax.jit
        def take(x):
            xf = x.reshape(b, hp * wp, c)
            yw = jnp.take(xf, fwd_idx, axis=1).reshape(b, nw, ws * ws, c)
            y2 = jnp.take(yw.reshape(b, hp * wp, c), inv_idx, axis=1)
            return (y2.astype(jnp.float32)).sum()

        # parity
        xs = jnp.asarray(rng.standard_normal((1, hp, wp, c)), jnp.float32)
        r1 = jnp.roll(xs, (-ss, -ss), (1, 2))
        w1 = window_partition(r1, ws).reshape(1, nw, ws * ws, c)
        w2 = jnp.take(xs.reshape(1, hp * wp, c), fwd_idx, axis=1
                      ).reshape(1, nw, ws * ws, c)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2))

        t_cur = time_marginal(cur, (x,))
        t_take = time_marginal(take, (x,))
        print(f"(hp={hp}, c={c}) bs={b}: roll+transpose {t_cur:.3f} ms | "
              f"single-take {t_take:.3f} ms", flush=True)

    # LayerNorm variants at L0 shape
    import flax.linen as nn

    for c in (128, 512):
        l = (120 * 120) if c == 128 else (30 * 30)
        x = jnp.asarray(rng.standard_normal((b, l, c)), jnp.bfloat16)
        ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
        v = ln.init(jax.random.PRNGKey(0), x)

        @jax.jit
        def f_flax(v, x):
            return ln.apply(v, x).astype(jnp.float32).sum()

        @jax.jit
        def f_manual(v, x):
            s = v["params"]["scale"].astype(jnp.float32)
            bb = v["params"]["bias"].astype(jnp.float32)
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * s + bb)
            return y.astype(jnp.bfloat16).astype(jnp.float32).sum()

        print(f"LN c={c} bs={b}: flax {time_marginal(f_flax, (v, x)):.3f} ms"
              f" | manual-f32 {time_marginal(f_manual, (v, x)):.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
