"""Micro-benchmark for the fused window-MSA backward kernel, per stage.

Times fwd+bwd of ``fused_window_msa`` for each Swin-B 480/window-12 stage
geometry under (a) the production chunk/head-group picker, (b) forced
(G, chunk) alternatives within the real 16 MB VMEM ceiling, and (c) the
XLA fallback — to keep the routing decisions measured rather than assumed
(see _pick_chunk_bwd/_pick_head_groups in ops/pallas/fused_msa.py).

Usage: python tools/bench_msa_bwd.py [--batch 8] [--stages 0,1,2,3]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


# Swin-B 480², window 12: (nw, n, c, heads); every stage pads to full
# 12² windows (120->10², 60->5², 30->3² via pad to 36, 15->2² via pad 24).
# v0..v3: video Swin-T 8-frame 480² clips, window (8,7,7) (n=392; spatial
# pads 120->126, 60->63, 30->35, 15->21) — bench these with --batch 1.
STAGES = {
    "0": (100, 144, 128, 4),
    "1": (25, 144, 256, 8),
    "2": (9, 144, 512, 16),
    "3": (4, 144, 1024, 32),
    "v0": (324, 392, 96, 3),
    "v1": (81, 392, 192, 6),
    "v2": (25, 392, 384, 12),
    "v3": (9, 392, 768, 24),
}


def time_marginal(fn, args, iters=10):
    """Queue-k marginal timing (see bench.py): robust to relay dispatch."""
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
    ap.add_argument("--stages", default="0,1,2,3")
    ap.add_argument("--mask", action="store_true",
                    help="include the shift mask (half the blocks have one)")
    ap.add_argument("--no_sweep", action="store_true",
                    help="only time the production pick and the XLA path")
    ap.add_argument("--fwd_only", action="store_true",
                    help="time the forward only (no grad): fused vs XLA")
    ap.add_argument("--force", default="",
                    help="additionally time one forced 'G,ch' combo")
    args = ap.parse_args()

    from lavt_rs_tpu.ops.pallas import fused_msa as fm

    b = args.batch
    for si in args.stages.split(","):
        nw, n, c, heads = STAGES[si]
        hd = c // heads
        scale = hd ** -0.5
        rng = np.random.default_rng(abs(hash(si)) % 2 ** 31)
        dt = jnp.bfloat16
        x = jnp.asarray(rng.standard_normal((b, nw, n, c)) * 0.1, dt)
        wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.02,
                           jnp.float32)
        bqkv = jnp.zeros((3 * c,), jnp.float32)
        wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.02, jnp.float32)
        bproj = jnp.zeros((c,), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.02,
                           jnp.float32)
        mask = None
        if args.mask:
            mask = jnp.asarray(
                rng.choice([0.0, -100.0], (nw, n, n)), jnp.float32)

        def loss(x, wqkv, bqkv, wproj, bias):
            y = fm.fused_window_msa(x, wqkv, bqkv, wproj, bproj, bias, mask,
                                    heads=heads, scale=scale)
            return (y.astype(jnp.float32) ** 2).sum()

        if args.fwd_only:
            ff = jax.jit(lambda *a: fm._fwd(
                *a[:4], bproj, a[4], mask, heads, scale).sum())
            tf = time_marginal(ff, (x, wqkv, bqkv, wproj, bias))
            fx = jax.jit(lambda *a: fm._ref_forward(
                *a[:4], bproj, a[4], mask, heads, scale).sum())
            tx = time_marginal(fx, (x, wqkv, bqkv, wproj, bias))
            print(f"stage {si} fwd-only: fused {tf * 1e3:.3f} ms, "
                  f"XLA(f32) {tx * 1e3:.3f} ms", flush=True)
            continue

        grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))

        picked = fm._pick_head_groups(nw, n, c, heads, 2)
        base = time_marginal(grad_fn, (x, wqkv, bqkv, wproj, bias))
        flops = (2 * b * nw * (4 * n * c * c * 2
                               + 6 * heads * n * n * hd)) + \
            2 * b * nw * (4 * n * c * c + 2 * heads * n * n * hd)
        print(f"stage {si} (nw={nw} c={c} h={heads}) picked G,ch={picked}: "
              f"{base * 1e3:.3f} ms  (~{flops / base / 1e12:.0f} TF/s eff)",
              flush=True)

        # forced alternatives: every (G, ch) whose est. footprint fits 15 MB
        orig_pick = fm._pick_head_groups
        orig_chunk = fm._pick_chunk_bwd
        results = {}
        combos = []
        if not args.no_sweep:
            combos = [(g, ch) for g in (1, 2, 4, 8)
                      for ch in range(1, nw + 1)]
        if args.force:
            fg, fc = (int(v) for v in args.force.split(","))
            combos.append((fg, fc))
        forced = combos[-1:] if args.force else []
        for g, ch in combos:
            if heads % g or ((heads // g) * hd) % 32 or nw % ch:
                continue
            cq = (heads // g) * hd
            fixed = ((3 * c * cq + cq * c) * 2
                     + (3 * c * cq + cq * c) * 4
                     + 2 * (heads // g) * n * n * 4)
            buf = (ch * n * c * 2 * 2 + ch * n * c * 4 + ch * n * cq * 4
                   + 3 * ch * n * cq * 4
                   + (4 * ch * n * cq * 2 if fm._use_fat_gemm(c) else 0)
                   + ch * n * c * 4 + 4 * ch * n * n * 4 + ch * n * n * 4)
            if fixed + buf > 15 * 1024 * 1024 and (g, ch) not in forced:
                continue
            if (g, ch) == tuple(picked or ()):
                continue
            try:
                fm._pick_head_groups = lambda *a, _g=g, _c=ch: (_g, _c)
                fm._pick_chunk_bwd = lambda *a, _c=ch: _c
                gf = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
                t = time_marginal(gf, (x, wqkv, bqkv, wproj, bias))
                results[(g, ch)] = t
                print(f"  G={g} ch={ch}: {t * 1e3:.3f} ms", flush=True)
            except Exception as e:
                print(f"  G={g} ch={ch}: FAIL {type(e).__name__}",
                      flush=True)
            finally:
                fm._pick_head_groups = orig_pick
                fm._pick_chunk_bwd = orig_chunk

        # XLA fallback for comparison
        def loss_xla(x, wqkv, bqkv, wproj, bias):
            y = fm._ref_forward(x, wqkv, bqkv, wproj, bproj, bias, mask,
                                heads, scale)
            return (y.astype(jnp.float32) ** 2).sum()

        gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4)))
        tx = time_marginal(gx, (x, wqkv, bqkv, wproj, bias))
        print(f"  XLA fallback: {tx * 1e3:.3f} ms", flush=True)
        if results:
            (bg, bc), bt = min(results.items(), key=lambda kv: kv[1])
            print(f"  best forced: G={bg} ch={bc} {bt * 1e3:.3f} ms "
                  f"(picked {base * 1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
