"""Measure the pipelined video eval loop (eval/pipeline.py) vs the
strictly sequential form: evaluate_a2d on a synthetic in-memory dataset at
the A2D inference config (video Swin-T, 8-frame 480² clips, bf16).

Usage: python tools/bench_video_eval.py [--clips 16] [--depths 1,2,3]
"""

import argparse
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=16)
    ap.add_argument("--depths", default="1,2,3")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from lavt_rs_tpu.config import lavt_video_tiny
    from lavt_rs_tpu.eval.video_eval import evaluate_a2d
    from lavt_rs_tpu.models.factory import build_model

    cfg = lavt_video_tiny().replace(dtype="bfloat16",
                                    num_frames=args.frames)
    model = build_model(cfg)
    rng = np.random.default_rng(0)

    class DS:
        """Synthetic A2D-like items; decode cost simulated by building the
        uint8 clip on access (memcpy-ish, like a real decoded buffer)."""

        def __len__(self):
            return args.clips

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return SimpleNamespace(
                video=r.integers(0, 255, (args.frames, 480, 480, 3)
                                 ).astype(np.uint8),
                ids=r.integers(1, 20000, (22,)).astype(np.int32),
                mask=np.ones((22,), np.int32),
                target=(r.random((480, 480)) > 0.5).astype(np.uint8),
                valid_index=int(r.integers(args.frames)))

    ds = DS()
    ex = ds[0]
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + ex.video.shape, jnp.float32),
        jnp.ones((1, 22), jnp.int32), jnp.ones((1, 22), jnp.int32)))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    apply = lambda v, *a: model.apply(v, *a)  # noqa: E731

    for d in [int(x) for x in args.depths.split(",")]:
        evaluate_a2d(apply, variables, ds, max_items=4,
                     pipeline_depth=d)  # warm/compile
        t0 = time.perf_counter()
        evaluate_a2d(apply, variables, ds, pipeline_depth=d)
        el = time.perf_counter() - t0
        print(f"pipeline_depth={d}: {args.clips / el:.2f} clips/s "
              f"({1e3 * el / args.clips:.1f} ms/clip, {el:.1f}s total)",
              flush=True)


if __name__ == "__main__":
    main()
