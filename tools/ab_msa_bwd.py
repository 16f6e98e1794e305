"""Interleaved A/B of two (G, ch) picks for the fused MSA backward.

The relay-attached chip makes single-shot process-level comparisons noisy
(±30%); this compiles both variants in ONE process and alternates timing
rounds, reporting per-variant min/median — the only comparison that has
proven stable (see round-5 notes).

Usage: python tools/ab_msa_bwd.py --stage 2 --a 4,3 --b 2,3 [--batch 8]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_msa_bwd import STAGES  # noqa: E402  (same dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="2")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--a", default="")
    ap.add_argument("--b", default="2,3")
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mask", action="store_true")
    args = ap.parse_args()

    from lavt_rs_tpu.ops.pallas import fused_msa as fm

    nw, n, c, heads = STAGES[args.stage]
    hd = c // heads
    scale = hd ** -0.5
    b = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, nw, n, c)) * 0.1, jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.02, jnp.float32)
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.02, jnp.float32)
    bproj = jnp.zeros((c,), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.02, jnp.float32)
    mask = None
    if args.mask:
        mask = jnp.asarray(rng.choice([0.0, -100.0], (nw, n, n)), jnp.float32)

    def loss(x, wqkv, bqkv, wproj, bias):
        y = fm.fused_window_msa(x, wqkv, bqkv, wproj, bproj, bias, mask,
                                heads=heads, scale=scale)
        return (y.astype(jnp.float32) ** 2).sum()

    def build(pick):
        orig_pick, orig_chunk = fm._pick_head_groups, fm._pick_chunk_bwd
        try:
            if pick:
                g, ch = (int(v) for v in pick.split(","))
                fm._pick_head_groups = lambda *a: (g, ch)
                fm._pick_chunk_bwd = lambda *a: ch
            f = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
            jax.block_until_ready(f(x, wqkv, bqkv, wproj, bias))
            return f
        finally:
            fm._pick_head_groups, fm._pick_chunk_bwd = orig_pick, orig_chunk

    fa, fb = build(args.a), build(args.b)
    la = args.a or f"picked{fm._pick_head_groups(nw, n, c, heads, 2)}"
    times = {la: [], args.b: []}

    def one(f):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x, wqkv, bqkv, wproj, bias))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters + 1):
            r = f(x, wqkv, bqkv, wproj, bias)
        jax.block_until_ready(r)
        return max((time.perf_counter() - t0 - t1) / args.iters, 1e-9)

    one(fa), one(fb)  # warm
    for _ in range(args.rounds):
        times[la].append(one(fa))
        times[args.b].append(one(fb))
    for k, v in times.items():
        ms = [t * 1e3 for t in v]
        print(f"{k}: min {min(ms):.3f}  med {statistics.median(ms):.3f}  "
              f"all {['%.2f' % m for m in ms]}")


if __name__ == "__main__":
    main()
