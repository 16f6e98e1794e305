"""Capture a profiler trace of the train step and print a per-segment
(ms/step by model stage, fwd/bwd split) + top-op breakdown.

Usage: python tools/profile_train.py [--batch 8] [--drop_path 0.3]
                                     [--no_pallas] [--fwd_only]
       python tools/profile_train.py --aggregate <trace_dir>   # re-group an
           existing trace (e.g. one captured by bench_video.py --profile)
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


def _segment(ev):
    """Coarse per-segment bucket for a device event.

    Uses the XLA metadata (tf_op = the jax name-stack, e.g.
    ``jit(step)/.../swin/layers_2/blocks_5/attn/...``) to attribute each
    fusion to a model segment, and ``transpose(jvp`` to split fwd/bwd.
    """
    import re

    args = ev.get("args") or {}
    op = args.get("tf_op") or ""
    name = ev.get("name", "")
    direction = "bwd" if "transpose(jvp" in op else "fwd"
    if (name.startswith(("%copy", "%bitcast", "%slice", "%all-reduce"))
            or "copy-done" in name or "slice-done" in name):
        return "copy/layout", direction
    m = re.search(r"layers_(\d)", op)
    stage = f":L{m.group(1)}" if m else ""
    hay = op + "/" + name
    for pat, seg in (
        ("pallas_call", None),  # refine below by kernel name
        ("text_encoder", "bert"),
        ("fusion_", "pwam"),
        ("res_gate", "pwam"),
        ("classifier", "decoder"),
        ("decoder", "decoder"),
        ("patch_embed", "patch_embed"),
        ("downsample", "patch_merge"),
        ("attn", "attn"),
        ("mlp", "mlp"),
        ("norm", "norm"),
        ("adamw", "optimizer"),
        ("opt_update", "optimizer"),
        ("pool", "loss/metrics"),
        ("losses", "loss/metrics"),
    ):
        if pat in hay:
            if seg is None:
                kn = name.split(".")[0]
                if kn.startswith("blocks"):
                    kn = "mlp_tail"
                return f"pallas:{kn}{stage}", direction
            return f"{seg}{stage}" if seg in ("attn", "mlp", "norm") else seg, \
                direction
    # module path fallback: first informative component of the name stack
    parts = [p for p in op.split("/") if p and not p.startswith(("jit", "jvp",
             "transpose", "checkpoint", "remat", "while", "body"))]
    if parts:
        return parts[0][:40], direction
    return "other", direction


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
    seg_tot = collections.Counter()
    total = 0.0
    nsteps = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or name.isdigit():
            # umbrella rows: "jit_step(...)" spans, and per-step "0"/"1"
            # markers on the steps row; don't double count device time
            if name.isdigit():
                nsteps += 1
            continue
        d = e.get("dur", 0) / 1e3  # ms
        tot[name] += d
        cnt[name] += 1
        total += d
        seg, direction = _segment(e)
        seg_tot[f"{seg}:{direction}"] += d
    steps = max(nsteps, 1)
    print(f"\ntotal device time: {total:.1f} ms across {sum(cnt.values())} "
          f"events ({steps} step umbrellas -> {total / steps:.1f} ms/step)")
    print("\n== per-segment (ms/step) ==")
    for key, d in seg_tot.most_common():
        if d / steps < 0.05:
            continue
        print(f"{d / steps:9.3f} ms/step  {key}")
    print(f"{sum(seg_tot.values()) / steps:9.3f} ms/step  TOTAL")
    print("\n== top ops ==")
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
    p.add_argument("--aggregate", default="",
                   help="just aggregate this existing trace dir and exit")
    args = p.parse_args()

    if args.aggregate:
        aggregate(args.aggregate, args.top)
        return

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
