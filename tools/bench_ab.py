"""Quick A/B harness for flagship-inference env-flag experiments.

Runs ONLY the bench.py measurement loop at the given batch size (default 8)
with whatever LAVT_* env vars the caller set, and prints ms/step + img/s.
Keeps the persistent compile cache so repeat A/B runs of the same config
skip compilation.

Usage: LAVT_MSA_VMEM_MB=12 python tools/bench_ab.py [--batch 8] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    import numpy as np

    from lavt_rs_tpu.config import lavt_one_base
    from lavt_rs_tpu.models.factory import build_model

    cfg = lavt_one_base().replace(dtype="bfloat16", use_pallas=True)
    model = build_model(cfg)
    b = args.batch
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((b, 480, 480, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1000, 20000, (b, 20)), jnp.int32)
    mask = jnp.ones((b, 20), jnp.int32)
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), img[:1], ids[:1], mask[:1]))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    from lavt_rs_tpu.eval.fold import (cast_matmul_params_bf16,
                                       fold_rel_pos_bias_2d)
    variables = fold_rel_pos_bias_2d(variables)
    variables = cast_matmul_params_bf16(variables)

    fwd = jax.jit(lambda v, *a: model.apply(v, *a).sum())
    t0 = time.perf_counter()
    float(fwd(variables, img, ids, mask))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def run(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fwd(variables, img, ids, mask)
        float(r)
        return time.perf_counter() - t0

    t1 = run(1)
    tn = run(args.iters + 1)
    dt = max((tn - t1) / args.iters, 1e-9)
    flags = {k: v for k, v in os.environ.items() if k.startswith("LAVT_")}
    print(f"bs={b}: {dt * 1000:.2f} ms/step, {b / dt:.2f} img/s  flags={flags}")


if __name__ == "__main__":
    main()
