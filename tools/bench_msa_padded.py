"""Measure the sublane-padded fused MSA vs the XLA path at window-7
geometries (Swin-T/S 2D, n=49 -> padded 64), through the production
WindowAttention module so the routing decision stays measured.

Usage: python tools/bench_msa_padded.py [--batch 8] [--train]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Swin-T/S 480², window 7: (nw, n, c, heads) after padding each stage's
# H=W in {120, 60, 30, 15} up to a multiple of 7.
STAGES = {
    "0": (324, 49, 96, 3),
    "1": (81, 49, 192, 6),
    "2": (25, 49, 384, 12),
    "3": (9, 49, 768, 24),
}


def time_marginal(fn, args, iters=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters + 1):
        r = fn(*args)
    jax.block_until_ready(r)
    tn = time.perf_counter() - t0
    return max((tn - t1) / iters, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--train", action="store_true",
                    help="time fwd+bwd instead of fwd")
    args = ap.parse_args()

    from lavt_rs_tpu.models.swin2d import WindowAttention

    print("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    for name, (nw, n, c, h) in STAGES.items():
        x = jnp.asarray(rng.standard_normal((args.batch, nw, n, c)),
                        jnp.bfloat16)
        results = {}
        for use_pallas, label in ((True, "padded-fused"), (False, "xla")):
            m = WindowAttention(dim=c, window_size=(7, 7), num_heads=h,
                                use_pallas=use_pallas, dtype=jnp.bfloat16)
            v = jax.jit(m.init)(jax.random.PRNGKey(0), x)

            if args.train:
                def loss(v, x, m=m):
                    return (m.apply(v, x).astype(jnp.float32) ** 2).mean()

                f = jax.jit(jax.grad(loss))
            else:
                f = jax.jit(lambda v, x, m=m: m.apply(v, x))
            results[label] = time_marginal(f, (v, x)) * 1e3
        speed = results["xla"] / results["padded-fused"]
        print(f"stage {name} (nw={nw} n={n} c={c} h={h}): "
              f"fused {results['padded-fused']:.3f} ms  "
              f"xla {results['xla']:.3f} ms  ({speed:.2f}x)")


if __name__ == "__main__":
    main()
