"""Interleaved A/B of two env-keyed train-step variants in ONE process.

The relay-attached chip makes separate-process comparisons noisy (±4%);
this builds two jitted train steps under different env settings (read at
trace time, e.g. LAVT_SOFTMAX) and alternates timing rounds.

Usage: python tools/ab_train.py --key LAVT_SOFTMAX --a exact --b clamp
       python tools/ab_train.py --key LAVT_MSA_CHUNK --a "" --b 6
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--key", default="LAVT_SOFTMAX")
    ap.add_argument("--a", default="exact")
    ap.add_argument("--b", default="clamp")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--fwd_only", action="store_true")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lavt_rs_tpu.config import lavt_one_base
    from lavt_rs_tpu.models.factory import build_model
    from lavt_rs_tpu.train.optim import TrainConfig
    from lavt_rs_tpu.train.step import create_train_state, make_train_step

    cfg = lavt_one_base().replace(dtype="bfloat16")
    cfg = cfg.replace(swin=dataclasses.replace(cfg.swin, drop_path_rate=0.3))
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
    key = jax.random.PRNGKey(1)

    def build(val):
        old = os.environ.pop(args.key, None)
        try:
            if val:
                os.environ[args.key] = val
            # per-leg device copy: donation would otherwise consume the
            # shared `variables` buffers and break the second build()
            state, tx = create_train_state(
                model, jax.tree.map(jnp.array, variables), tcfg)
            # donate: two legs of non-donated f32 state (old+new params
            # and moments live at once) exhaust the 16 GB chip
            step = jax.jit(make_train_step(model, tx, tcfg),
                           donate_argnums=(0,))
            state, m = step(state, batch, key)
            float(m["loss"])
            state, m = step(state, batch, key)  # donated-aval retrace
            float(m["loss"])
            return step, state
        finally:
            if old is None:
                os.environ.pop(args.key, None)
            else:
                os.environ[args.key] = old

    (fa, sa), (fb, sb) = build(args.a), build(args.b)
    print("compiled", file=sys.stderr)

    def one(f, s):
        # Relay-timing rules (hard-won): (1) THREAD the state through
        # every call and across rounds — identical replayed calls return
        # relay-cached results; (2) sync with float(m["loss"]) — a real
        # transfer.  jax.block_until_ready on one output buffer returns
        # when THAT buffer materializes (the loss is ready after the
        # forward), reporting ~7 ms for a 120 ms step.
        t0 = time.perf_counter()
        s, m = f(s, batch, key)
        float(m["loss"])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters + 1):
            s, m = f(s, batch, key)
        float(m["loss"])
        return max((time.perf_counter() - t0 - t1) / args.iters, 1e-9), s

    (_, sa), (_, sb) = one(fa, sa), one(fb, sb)
    ta, tb = [], []
    for _ in range(args.rounds):
        dt, sa = one(fa, sa)
        ta.append(dt * 1e3)
        dt, sb = one(fb, sb)
        tb.append(dt * 1e3)
    for lbl, ts in ((args.a or "(default)", ta), (args.b or "(default)", tb)):
        print(f"{args.key}={lbl}: min {min(ts):.2f}  "
              f"med {statistics.median(ts):.2f} ms  "
              f"({args.batch / min(ts) * 1e3:.1f} img/s at min)")


if __name__ == "__main__":
    main()
