"""Capture a profiler trace of the train step and print top device ops.

Usage: python tools/profile_train.py [--batch 8] [--drop_path 0.3]
                                     [--no_pallas] [--fwd_only] [--video]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate(trace_dir, top=40):
    path = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # find TPU device pids (process names containing 'TPU' / 'Axon' / device)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "Device" in n}
    print("processes:", pid_names, file=sys.stderr)
    tot = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        d = e.get("dur", 0) / 1e3  # ms
        tot[e["name"]] += d
        cnt[e["name"]] += 1
        total += d
    print(f"\ntotal device time: {total:.1f} ms across {sum(cnt.values())} events")
    for name, d in tot.most_common(top):
        print(f"{d:9.2f} ms  x{cnt[name]:<4d} {name[:110]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--drop_path", type=float, default=0.3)
    p.add_argument("--fwd_only", action="store_true")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--out", default="/tmp/jaxtrace_train")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lavt_rs_tpu.config import lavt_one_base
    from lavt_rs_tpu.models.factory import build_model
    from lavt_rs_tpu.train.optim import TrainConfig
    from lavt_rs_tpu.train.step import create_train_state, make_train_step

    cfg = lavt_one_base().replace(dtype="bfloat16",
                                  use_pallas=not args.no_pallas)
    cfg = cfg.replace(swin=dataclasses.replace(
        cfg.swin, drop_path_rate=args.drop_path))
    model = build_model(cfg)

    b = args.batch
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((b, 480, 480, 3)),
                             jnp.float32),
        "ids": jnp.asarray(rng.integers(1000, 20000, (b, 20)), jnp.int32),
        "mask": jnp.ones((b, 20), jnp.int32),
        "target": jnp.asarray(rng.integers(0, 2, (b, 480, 480)), jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"][:1],
                                    batch["ids"][:1], batch["mask"][:1])
    jax.block_until_ready(variables)
    print("init done", file=sys.stderr)

    tcfg = TrainConfig(lr=5e-5, weight_decay=1e-2, epochs=40,
                       iters_per_epoch=250, loss="dice")
    state, tx = create_train_state(model, variables, tcfg)
    key = jax.random.PRNGKey(1)

    if args.fwd_only:
        def fwd(params, bstats, batch):
            out = model.apply(
                {"params": params, "batch_stats": bstats},
                batch["image"], batch["ids"], batch["mask"],
                deterministic=False, rngs={"dropout": key},
                mutable=["batch_stats"])[0]
            return out.sum()

        jf = jax.jit(fwd)
        for _ in range(2):
            float(jf(state.params, state.batch_stats, batch))
        with jax.profiler.trace(args.out):
            r = None
            for _ in range(args.steps):
                r = jf(state.params, state.batch_stats, batch)
            float(r)
    else:
        jstep = jax.jit(make_train_step(model, tx, tcfg), donate_argnums=(0,))
        for _ in range(2):
            state, m = jstep(state, batch, key)
        float(m["loss"])
        with jax.profiler.trace(args.out):
            for _ in range(args.steps):
                state, m = jstep(state, batch, key)
            float(m["loss"])
    print("trace captured", file=sys.stderr)
    aggregate(args.out, args.top)


if __name__ == "__main__":
    main()
