"""Per-segment batch-scaling probe for the flagship inference path.

BENCH_r02 showed inference throughput DROPPING from bs=8 to bs=32
(229.7 -> 211.3 img/s) where a compute-bound model should be flat or
better. This times the full forward plus its three segments (BERT,
Swin+PWAM backbone, decoder+resize) separately across batch sizes to
locate the regression.

Sync methodology matches bench.py: on the axon relay,
jax.block_until_ready returns before remote execution finishes, so
every timed function reduces to a scalar and we force a host transfer
with float() — the only reliable sync. Marginal cost = (t(1+N) - t(1))/N.

Usage: python tools/bench_batch_scaling.py [--sizes 8,16,32,64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_marginal(fn, args, iters=10):
    """Marginal ms/call: queue k calls, sync once; subtract the k=1 run."""
    float(fn(*args))  # warmup / compile

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
    ap.add_argument("--sizes", default="8,16,32,64")
    ap.add_argument("--segments", action="store_true",
                    help="also time BERT/backbone/decoder separately")
    ap.add_argument("--xla_only", action="store_true",
                    help="use_pallas=False: bisect kernel-routing vs XLA "
                    "batch-scaling effects")
    args = ap.parse_args()

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

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    cfg = lavt_one_base().replace(dtype="bfloat16",
                                  use_pallas=not args.xla_only)
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.standard_normal((1, 480, 480, 3)), jnp.float32)
    ids1 = jnp.asarray(rng.integers(1000, 20000, (1, 20)), jnp.int32)
    msk1 = jnp.ones((1, 20), jnp.int32)
    t0 = time.perf_counter()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img1, ids1, msk1)
    jax.block_until_ready(variables)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    full = jax.jit(lambda v, i, t, m: model.apply(v, i, t, m).sum())

    seg_fns = {}
    if args.segments:
        # Independently-initialized submodules: same shapes/compute as the
        # segments inside the full model, so their marginal times locate
        # where batch scaling degrades even though params differ.
        from lavt_rs_tpu.models.bert import BertEncoder
        from lavt_rs_tpu.models.swin2d import MultiModalSwinTransformer
        dt = cfg.compute_dtype
        bert = BertEncoder(cfg.bert, dtype=dt)
        bert_v = jax.jit(bert.init)(jax.random.PRNGKey(1), ids1, msk1)
        seg_fns["bert"] = (
            jax.jit(lambda v, t, m: bert.apply(v, t, m).sum()),
            lambda img, ids, msk: (bert_v, ids, msk))

        backbone = MultiModalSwinTransformer(
            cfg=cfg.swin, fusion=cfg.fusion, out_indices=cfg.out_indices,
            use_checkpoint=False, use_pallas=cfg.use_pallas, dtype=dt)
        lf1 = jnp.zeros((1, 20, cfg.bert.hidden_size), dt)
        bb_v = jax.jit(backbone.init)(
            jax.random.PRNGKey(2), img1.astype(dt), lf1, msk1)
        seg_fns["backbone"] = (
            jax.jit(lambda v, i, lf, m: sum(
                x.sum() for x in backbone.apply(v, i.astype(dt), lf, m))),
            lambda img, ids, msk: (
                bb_v, img,
                jnp.zeros((img.shape[0], 20, cfg.bert.hidden_size), dt),
                msk))

    for bs in (int(s) for s in args.sizes.split(",")):
        img = jnp.asarray(rng.standard_normal((bs, 480, 480, 3)),
                          jnp.float32)
        ids = jnp.asarray(rng.integers(1000, 20000, (bs, 20)), jnp.int32)
        msk = jnp.ones((bs, 20), jnp.int32)
        t0 = time.perf_counter()
        float(full(variables, img, ids, msk))
        tc = time.perf_counter() - t0
        dt_ms = time_marginal(full, (variables, img, ids, msk))
        line = (f"bs={bs:3d}: compile+first {tc:6.1f}s   full {dt_ms:8.2f} ms"
                f"  ({bs / dt_ms * 1e3:7.1f} img/s, {dt_ms / bs:6.3f} ms/img)")
        for name, (fn, mk) in seg_fns.items():
            s_ms = time_marginal(fn, mk(img, ids, msk))
            line += f"   {name} {s_ms:7.2f} ms"
        print(line, flush=True)


if __name__ == "__main__":
    main()
