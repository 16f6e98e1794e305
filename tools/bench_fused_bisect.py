"""Bisect WHERE the fused-padded video MSA routing loses end-to-end.

Block-level (tools/bench_block3d.py) the fused kernel wins s0-s2 shifted
and unshifted, predicting a ~25 ms/clip win — yet the full train step
measured 161 -> 228 ms.  This times progressively larger slices with both
routings in one process:

  backbone       MMSwin3D fwd+bwd, deterministic=True
  backbone_drop  same with deterministic=False + dropout rng (drop_path)
  model          full LAVTVideo apply fwd+bwd
  train          full train step (loss + AdamW)

Usage: python tools/bench_fused_bisect.py [--modes backbone,model,train]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_ms(fn, *args, iters=8):
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
    p.add_argument("--modes", default="backbone,backbone_drop,model")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from lavt_rs_tpu.config import lavt_video_tiny
    from lavt_rs_tpu.models.factory import build_model
    from lavt_rs_tpu.models.swin3d import MultiModalSwinTransformer3D
    from lavt_rs_tpu.ops.pallas import fused_msa as fm

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    routed = fm.fused_msa_padded_routed
    rng = np.random.default_rng(0)

    cfg = lavt_video_tiny().replace(dtype="bfloat16", use_pallas=True)
    dt = cfg.compute_dtype
    video = jnp.asarray(rng.standard_normal((1, 8, 480, 480, 3)),
                        jnp.float32)
    ids = jnp.asarray(rng.integers(1000, 20000, (1, 22)), jnp.int32)
    mask = jnp.ones((1, 22), jnp.int32)
    lfeat = jnp.asarray(rng.standard_normal((1, 22, 768)) * 0.1, dt)

    modes = args.modes.split(",")
    for route in (False, True):
        fm.fused_msa_padded_routed = routed if route else (
            lambda *a, **k: False)
        tag = "fused" if route else "attn "

        if "backbone" in modes or "backbone_drop" in modes:
            bb = MultiModalSwinTransformer3D(
                cfg=cfg.swin, fusion=cfg.fusion, tpwam=cfg.tpwam,
                out_indices=cfg.out_indices, use_pallas=True, dtype=dt)
            v = bb.init(jax.random.PRNGKey(0), video.astype(dt), lfeat,
                        mask)

        if "backbone" in modes:
            g = jax.jit(jax.grad(lambda v, x, l, m: sum(
                o.astype(jnp.float32).sum()
                for o in bb.apply(v, x, l, m))))
            t = time_ms(lambda *a: jax.tree_util.tree_reduce(
                lambda acc, le: acc + le.sum(), g(*a), 0.0),
                v, video.astype(dt), lfeat, mask, iters=args.iters)
            print(f"{tag} backbone f+b: {t:7.2f} ms", flush=True)

        if "backbone_drop" in modes:
            key = jax.random.PRNGKey(1)
            g = jax.jit(jax.grad(lambda v, x, l, m, k: sum(
                o.astype(jnp.float32).sum()
                for o in bb.apply(v, x, l, m, deterministic=False,
                                  rngs={"dropout": k}))))
            t = time_ms(lambda *a: jax.tree_util.tree_reduce(
                lambda acc, le: acc + le.sum(), g(*a), 0.0),
                v, video.astype(dt), lfeat, mask, key, iters=args.iters)
            print(f"{tag} backbone_drop f+b: {t:7.2f} ms", flush=True)

        if "model" in modes:
            model = build_model(cfg)
            mv = jax.jit(model.init)(jax.random.PRNGKey(0), video, ids,
                                     mask)
            g = jax.jit(jax.grad(
                lambda v, x, i, m: model.apply(
                    v, x, i, m).astype(jnp.float32).sum()))
            t = time_ms(lambda *a: jax.tree_util.tree_reduce(
                lambda acc, le: acc + le.sum(), g(*a), 0.0),
                mv, video, ids, mask, iters=args.iters)
            print(f"{tag} model f+b: {t:7.2f} ms", flush=True)

        if "train" in modes:
            from lavt_rs_tpu.train.optim import TrainConfig
            from lavt_rs_tpu.train.step import (create_train_state,
                                                make_video_train_step)
            model = build_model(cfg, train=True)
            mv = jax.jit(model.init)(jax.random.PRNGKey(0), video, ids,
                                     mask)
            tcfg = TrainConfig(total_iters=1000)
            state, tx = create_train_state(model, mv, tcfg)
            step = jax.jit(make_video_train_step(model, tx, tcfg))
            batch = {"video": video, "ids": ids, "mask": mask,
                     "target": jnp.zeros((1, 480, 480), jnp.int32),
                     "valid_index": jnp.zeros((1,), jnp.int32)}
            key = jax.random.PRNGKey(2)

            def one(state):
                s2, m = step(state, batch, key)
                return m["loss"]

            t = time_ms(one, state, iters=args.iters)
            print(f"{tag} train step: {t:7.2f} ms", flush=True)

    fm.fused_msa_padded_routed = routed


if __name__ == "__main__":
    main()
