"""Capture a profiler trace of the flagship INFERENCE forward (the exact
bench.py path: jit(apply().sum()), bf16, Pallas routing) and aggregate it
with profile_train's segmenter.

Usage: python tools/profile_infer.py [--batch 8] [--steps 4] [--top 30]
       python tools/profile_infer.py --aggregate /tmp/jaxtrace_infer8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_train import aggregate  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--out", default="")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--aggregate", default="")
    args = p.parse_args()
    if args.aggregate:
        aggregate(args.aggregate, args.top)
        return
    out = args.out or f"/tmp/jaxtrace_infer{args.batch}"

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

    cfg = lavt_one_base().replace(dtype="bfloat16",
                                  use_pallas=not args.no_pallas)
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
    variables = fold_rel_pos_bias_2d(variables)  # match the bench path
    variables = cast_matmul_params_bf16(variables)

    fwd = jax.jit(lambda v, *a: model.apply(v, *a).sum())
    for _ in range(2):
        float(fwd(variables, img, ids, mask))
    print("warm; tracing...", file=sys.stderr)
    with jax.profiler.trace(out):
        r = None
        for _ in range(args.steps):
            r = fwd(variables, img, ids, mask)
        float(r)
    aggregate(out, args.top)


if __name__ == "__main__":
    main()
