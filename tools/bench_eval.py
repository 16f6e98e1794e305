"""RefCOCO per-sentence eval-loop throughput on the real TPU chip.

Synthetic RefCOCO-val-shaped dataset (1-3 sentences per ref, 480² images)
through eval/refcoco_eval.evaluate — the reference test.py:53-109 protocol.
Reports warm sent/s for refs_per_batch=1 vs the default multi-ref batching.
Default transfer mode is uint8 (the production pipeline: resized uint8
images, normalized on device); --bf16_transfer / --f32_transfer measure
the host-normalized float pipelines.

Usage: python tools/bench_eval.py [--refs 60] [--bf16_transfer|--f32_transfer]
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
    ap.add_argument("--refs", type=int, default=60)
    ap.add_argument("--f32_transfer", action="store_true",
                    help="host-normalized f32 image transfer")
    ap.add_argument("--bf16_transfer", action="store_true",
                    help="host-normalized bf16 image transfer")
    ap.add_argument("--rb", type=lambda s: [int(x) for x in s.split(",")],
                    default=[1, 0],
                    help="comma list of refs_per_batch arms (0 = default)")
    ap.add_argument("--depth", type=int, default=2,
                    help="pipeline_depth (in-flight dispatches)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lavt_rs_tpu.config import lavt_one_base
    from lavt_rs_tpu.models.factory import build_model
    from lavt_rs_tpu.eval.refcoco_eval import evaluate

    cfg = lavt_one_base().replace(dtype="bfloat16", use_pallas=True)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    img = jnp.zeros((1, 480, 480, 3))
    one = jnp.ones((1, 20), jnp.int32)
    t0 = time.perf_counter()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, one, one)
    jax.block_until_ready(variables)
    print(f"init {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    host_float = args.f32_transfer or args.bf16_transfer

    class DS:
        def __init__(self, n):
            cnt = rng.integers(1, 4, n)
            self.input_ids = [list(range(k)) for k in cnt]
            self.items = [SimpleNamespace(
                image=(rng.standard_normal((480, 480, 3)).astype(np.float32)
                       if host_float else
                       rng.integers(0, 256, (480, 480, 3)).astype(np.uint8)),
                target=(rng.random((480, 480)) > 0.5).astype(np.int64),
                ids=rng.integers(1, 30000, (k, 20)).astype(np.int64),
                mask=np.ones((k, 20), np.int64)) for k in cnt]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    ds = DS(args.refs)
    nsent = sum(len(x) for x in ds.input_ids)
    apply = lambda v, *a: model.apply(v, *a)
    dt = jnp.bfloat16 if args.bf16_transfer else None
    mode = ("f32" if args.f32_transfer
            else "bf16" if args.bf16_transfer else "uint8")
    for rb in args.rb:
        rb = None if rb == 0 else rb
        evaluate(apply, variables, ds, log_every=0, refs_per_batch=rb,
                 image_dtype=dt, pipeline_depth=args.depth)  # compile + warm
        t0 = time.perf_counter()
        evaluate(apply, variables, ds, log_every=0, refs_per_batch=rb,
                 image_dtype=dt, pipeline_depth=args.depth)
        el = time.perf_counter() - t0
        print(f"refs_per_batch={rb} depth={args.depth}: {nsent / el:.1f} "
              f"sent/s ({el:.1f}s warm, transfer={mode})", flush=True)


if __name__ == "__main__":
    main()
