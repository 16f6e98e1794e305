"""Video (lavt_video, Swin-T, A2D config) train/infer microbench on TPU.

Usage: python tools/bench_video.py [--batch 1] [--frames 8] [--train]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=480)
    p.add_argument("--train", action="store_true")
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--profile", default="")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    import numpy as np

    from lavt_rs_tpu.config import lavt_video_tiny
    from lavt_rs_tpu.models.factory import build_model
    from lavt_rs_tpu.train.optim import TrainConfig
    from lavt_rs_tpu.train.step import (create_train_state,
                                        make_video_train_step)

    cfg = lavt_video_tiny().replace(dtype="bfloat16",
                                    use_pallas=not args.no_pallas)
    model = build_model(cfg)
    b, t, s = args.batch, args.frames, args.size
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((b, t, s, s, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1000, 20000, (b, 22)), jnp.int32)
    mask = jnp.ones((b, 22), jnp.int32)

    t0 = time.perf_counter()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), video, ids, mask)
    jax.block_until_ready(variables)
    print(f"init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    if not args.train:
        f = jax.jit(lambda v, *a: model.apply(v, *a).sum())
        t0 = time.perf_counter()
        float(f(variables, video, ids, mask))
        print(f"compile+first: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        def run(k):
            t0 = time.perf_counter()
            r = None
            for _ in range(k):
                r = f(variables, video, ids, mask)
            float(r)
            return time.perf_counter() - t0

        run(1)
        t1 = run(1)
        tn = run(args.iters + 1)
        dt = (tn - t1) / args.iters
        print(f"video infer: {dt * 1000:.1f} ms/clip "
              f"({b * t / dt:.1f} frames/s)")
        if args.profile:
            with jax.profiler.trace(args.profile):
                r = None
                for _ in range(3):
                    r = f(variables, video, ids, mask)
                float(r)
        return

    tcfg = TrainConfig(lr=6e-5, weight_decay=1e-2, epochs=20,
                       iters_per_epoch=500, loss="dice")
    state, tx = create_train_state(model, variables, tcfg)
    step = jax.jit(make_video_train_step(model, tx, tcfg),
                   donate_argnums=(0,))
    batch = {"video": video, "ids": ids, "mask": mask,
             "target": jnp.asarray(rng.integers(0, 2, (b, s, s)), jnp.int32),
             "valid_index": jnp.zeros((b,), jnp.int32)}
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, m = step(state, batch, key)
    jax.block_until_ready(m["loss"])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def run(k, state):
        t0 = time.perf_counter()
        mm = None
        for _ in range(k):
            state, mm = step(state, batch, key)
        float(mm["loss"])
        return time.perf_counter() - t0, state

    _, state = run(1, state)
    t1, state = run(1, state)
    tn, state = run(args.iters + 1, state)
    dt = (tn - t1) / args.iters
    print(f"video train step: {dt * 1000:.1f} ms "
          f"({b * t / dt:.1f} frames/s)")
    if args.profile:
        with jax.profiler.trace(args.profile):
            for _ in range(2):
                state, mm = step(state, batch, key)
            float(mm["loss"])


if __name__ == "__main__":
    main()
