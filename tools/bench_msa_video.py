"""Fused-padded MSA vs XLA at the VIDEO window geometries (n=392).

The sublane-padded wrapper (fused_window_msa_padded) lost at 2D window-7
because padding 49 -> 64 adds (64/49)^2 = 1.7x attention FLOPs.  Video
(8,7,7) windows pad 392 -> 400 — a 1.04x tax — so the fused kernel's
isolated 2-3x per-block win could survive here.  This measures it
directly per A2D Swin-T stage (b=1 clip), fwd and fwd+bwd.

Usage: python tools/bench_msa_video.py [--dtype bfloat16] [--mask]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A2D Swin-T, 8-frame 480^2 clip, window (8,7,7): (nW, n, C, heads)
STAGES = [
    ("v0", 324, 392, 96, 3),
    ("v1", 81, 392, 192, 6),
    ("v2", 25, 392, 384, 12),
    ("v3", 9, 392, 768, 24),
]


def time_ms(fn, *args, iters=10):
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
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--mask", action="store_true",
                   help="include a (nW, N, N) shift mask (shifted blocks)")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from lavt_rs_tpu.ops.pallas import fused_msa as fm

    print(f"device: {jax.devices()[0].device_kind}  dtype={args.dtype} "
          f"mask={args.mask}", flush=True)
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    for name, nw, n, c, h in STAGES:
        scale = (c // h) ** -0.5
        x = jnp.asarray(rng.standard_normal((1, nw, n, c)) * 0.1, dt)
        wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05, jnp.float32)
        bqkv = jnp.asarray(rng.standard_normal((3 * c,)) * 0.05, jnp.float32)
        wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32)
        bproj = jnp.asarray(rng.standard_normal((c,)) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((h, n, n)) * 0.1, jnp.float32)
        mask = None
        if args.mask:
            mask = jnp.asarray(
                np.where(rng.random((nw, n, n)) > 0.9, -100.0, 0.0),
                jnp.float32)

        def xla_fwd(x, wqkv, bqkv, wproj, bproj, bias):
            return fm._ref_forward(x, wqkv, bqkv, wproj, bproj, bias,
                                   mask, h, scale).sum()

        def pad_fwd(x, wqkv, bqkv, wproj, bproj, bias):
            return fm.fused_window_msa_padded(
                x, wqkv, bqkv, wproj, bproj, bias, mask, h, scale).sum()

        def grad_of(f):
            def loss(x, wqkv, bqkv, wproj, bproj, bias):
                return f(x, wqkv, bqkv, wproj, bproj, bias)
            g = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))

            def both(x, wqkv, bqkv, wproj, bproj, bias):
                gs = g(x, wqkv, bqkv, wproj, bproj, bias)
                return sum(t.sum().astype(jnp.float32) for t in gs)
            return both

        arms = {
            "xla  fwd": jax.jit(xla_fwd),
            "fused fwd": jax.jit(pad_fwd),
            "xla  f+b": jax.jit(grad_of(xla_fwd)),
            "fused f+b": jax.jit(grad_of(pad_fwd)),
        }
        argt = (x, wqkv, bqkv, wproj, bproj, bias)
        res = {}
        for an, fn in arms.items():
            try:
                res[an] = time_ms(fn, *argt, iters=args.iters)
            except Exception as e:
                res[an] = float("nan")
                print(f"  {name} {an}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
        line = f"{name} nW={nw:3d} n={n} C={c:3d} h={h:2d}: " + "  ".join(
            f"{an}={v:7.2f}ms" for an, v in res.items())
        if res.get("xla  fwd") and res.get("fused fwd"):
            line += (f"   speedup fwd {res['xla  fwd']/res['fused fwd']:.2f}x"
                     f" f+b {res['xla  f+b']/res['fused f+b']:.2f}x")
        print(line, flush=True)


if __name__ == "__main__":
    main()
