"""Full SwinBlock3D (LN + pad/roll/partition + attn + reverse + MLP)
fwd and fwd+bwd per A2D Swin-T stage, XLA vs fused-padded routing.

The fused MSA kernel wins 1.6-4.5x per ISOLATED attention call
(tools/bench_msa_video.py) yet loses 161 -> 228 ms at the model level.
This measures the block level — partition/reverse layout ops and the
shift mask included — to locate the boundary cost.

Usage: python tools/bench_block3d.py [--shift] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A2D Swin-T, 8-frame 480^2 clip: (name, D, H, W, C, heads)
STAGES = [
    ("s0", 8, 120, 120, 96, 3),
    ("s1", 8, 60, 60, 192, 6),
    ("s2", 8, 30, 30, 384, 12),
    ("s3", 8, 15, 15, 768, 24),
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
    p.add_argument("--shift", action="store_true")
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

    from lavt_rs_tpu.models.swin3d import SwinBlock3D
    from lavt_rs_tpu.ops.pallas import fused_msa as fm

    print(f"device: {jax.devices()[0].device_kind} shift={args.shift}",
          flush=True)
    rng = np.random.default_rng(0)
    routed = fm.fused_msa_padded_routed

    # (tag, use_pallas, route_fused)
    VARIANTS = [("xla ", False, False), ("attn", True, False),
                ("fuse", True, True)]

    for name, d, h, w, c, heads in STAGES:
        x = jnp.asarray(rng.standard_normal((1, d, h, w, c)) * 0.1,
                        jnp.bfloat16)
        row = f"{name} (D{d} {h}x{w} C{c}):"
        for tag, use_pallas, route in VARIANTS:
            fm.fused_msa_padded_routed = (
                routed if route else lambda *a, **k: False)
            blk = SwinBlock3D(
                dim=c, num_heads=heads, window_size=(8, 7, 7),
                shift_size=(4, 3, 3) if args.shift else (0, 0, 0),
                use_pallas=use_pallas, dtype=jnp.bfloat16)
            v = blk.init(jax.random.PRNGKey(0), x)
            fwd = jax.jit(lambda v, x, m=blk: m.apply(v, x).sum())
            g = jax.jit(jax.grad(
                lambda v, x, m=blk: m.apply(v, x).astype(jnp.float32).sum()))
            t_f = time_ms(fwd, v, x, iters=args.iters)
            t_b = time_ms(lambda v, x: jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum(), g(v, x), 0.0), v, x,
                iters=args.iters)
            row += f"   {tag} fwd {t_f:6.2f}  f+b {t_b:7.2f} ms"
        fm.fused_msa_padded_routed = routed
        print(row, flush=True)


if __name__ == "__main__":
    main()
