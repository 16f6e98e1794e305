"""Training-step microbenchmark on the real TPU chip.

Measures the full jitted train step (fwd + bwd + AdamW) for the flagship
lavt_one Swin-B 480 config, with the reference's training hyperparameters
(drop_path 0.3, dice loss). Marginal-cost timing as in bench.py: queue k
steps, sync once, subtract the k=1 run.

Usage: python tools/bench_train.py [--batch 8] [--no_pallas] [--drop_path X]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--drop_path", type=float, default=0.3)
    p.add_argument("--swin", default="base")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--fwd_only", action="store_true")
    p.add_argument("--with_input", action="store_true",
                   help="end-to-end steps/s INCLUDING the host input "
                        "pipeline (JPEG decode + resize + normalize via "
                        "PrefetchLoader), not just the device step")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--host_normalize", action="store_true",
                   help="with --with_input: normalize on host (old f32 "
                        "pipeline) instead of shipping uint8 and "
                        "normalizing on device")
    args = p.parse_args()

    from lavt_rs_tpu.config import lavt_one_base
    from lavt_rs_tpu.models.factory import build_model
    from lavt_rs_tpu.train.optim import TrainConfig
    from lavt_rs_tpu.train.step import create_train_state, make_train_step

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    cfg = lavt_one_base().replace(dtype="bfloat16",
                                  use_pallas=not args.no_pallas)
    import dataclasses
    cfg = cfg.replace(swin=dataclasses.replace(
        cfg.swin, drop_path_rate=args.drop_path))
    model = build_model(cfg)
    model_train = build_model(cfg)

    b = args.batch
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((b, 480, 480, 3)),
                             jnp.float32),
        "ids": jnp.asarray(rng.integers(1000, 20000, (b, 20)), jnp.int32),
        "mask": jnp.ones((b, 20), jnp.int32),
        "target": jnp.asarray(rng.integers(0, 2, (b, 480, 480)), jnp.int32),
    }

    t0 = time.perf_counter()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"][:1],
                                    batch["ids"][:1], batch["mask"][:1])
    jax.block_until_ready(variables)
    print(f"init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    tcfg = TrainConfig(lr=5e-5, weight_decay=1e-2, epochs=40,
                       iters_per_epoch=250, loss="dice")
    state, tx = create_train_state(model, variables, tcfg)
    step = make_train_step(model_train, tx, tcfg)

    if args.fwd_only:
        def fwd(params, bstats, batch):
            out = model_train.apply(
                {"params": params, "batch_stats": bstats},
                batch["image"], batch["ids"], batch["mask"],
                deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])[0]
            return out.sum()

        jf = jax.jit(fwd)
        t0 = time.perf_counter()
        float(jf(state.params, state.batch_stats, batch))
        print(f"fwd compile+first: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        def run(k):
            t0 = time.perf_counter()
            r = None
            for _ in range(k):
                r = jf(state.params, state.batch_stats, batch)
            float(r)
            return time.perf_counter() - t0

        t1 = run(1)
        tn = run(args.iters + 1)
        dt = (tn - t1) / args.iters
        print(f"fwd-only (train mode): {dt * 1000:.1f} ms/step "
              f"({b / dt:.2f} img/s)")
        return

    jstep = jax.jit(step, donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, m = jstep(state, batch, key)
    jax.block_until_ready(m["loss"])
    print(f"step compile+first: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    def run(k, state):
        t0 = time.perf_counter()
        m = None
        for _ in range(k):
            state, m = jstep(state, batch, key)
        float(m["loss"])
        return time.perf_counter() - t0, state

    _, state = run(1, state)  # second call can retrace (donated avals)
    t1, state = run(1, state)
    tn, state = run(args.iters + 1, state)
    print(f"t1={t1:.2f}s t(n+1)={tn:.2f}s", file=sys.stderr)
    dt = (tn - t1) / args.iters
    print(f"train step: {dt * 1000:.1f} ms/step ({b / dt:.2f} img/s) "
          f"[pallas={not args.no_pallas} drop_path={args.drop_path} bs={b}]")

    if args.with_input:
        # end-to-end: threaded JPEG decode + resize + normalize through
        # PrefetchLoader, overlapped with the device step (the number the
        # reference's DataLoader-workers pipeline would be judged on)
        import io
        from types import SimpleNamespace

        from PIL import Image as PILImage

        from lavt_rs_tpu.data.loader import PrefetchLoader, collate_refer
        from lavt_rs_tpu.data.transforms import normalize, resize_pair

        rng2 = np.random.default_rng(1)
        raw = (rng2.standard_normal((520, 640, 3)) * 40 + 128).clip(
            0, 255).astype(np.uint8)
        bio = io.BytesIO()
        PILImage.fromarray(raw).save(bio, format="JPEG", quality=90)
        jpeg = bio.getvalue()
        ids_np = np.asarray(rng2.integers(1000, 20000, (20,)), np.int32)
        tgt = rng2.integers(0, 2, (480, 480)).astype(np.int32)

        host_norm = args.host_normalize

        from lavt_rs_tpu import native as lnative

        print(f"native loader: {lnative.available()}", file=sys.stderr)

        class JpegDS:
            use_native = True

            def __len__(self):
                return 100000

            def __getitem__(self, i):
                arr = (lnative.decode_resize_jpeg(jpeg, 480, 480)
                       if self.use_native else None)
                if arr is None:
                    img = PILImage.open(io.BytesIO(jpeg)).convert("RGB")
                    im, _ = resize_pair(img, None, (480, 480))
                    arr = np.asarray(im)
                return SimpleNamespace(
                    image=normalize(arr) if host_norm else arr,
                    target=tgt, ids=ids_np,
                    mask=np.ones(20, np.int32))

        # A/B the decode paths in ONE process so relay/thermal drift
        # cannot masquerade as a decode difference
        for use_native in ((True, False) if lnative.available()
                           else (False,)):
            ds = JpegDS()
            ds.use_native = use_native
            loader = PrefetchLoader(ds, b, collate_refer, shuffle=False,
                                    num_workers=args.workers, prefetch=4,
                                    device_put=jax.device_put)
            it = iter(loader)
            # warm (decode threads spin up + possible dtype retrace)
            for _ in range(2):
                state, m = jstep(state, next(it), key)
            float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, m = jstep(state, next(it), key)
            float(m["loss"])
            dt_e2e = (time.perf_counter() - t0) / args.iters
            tag = "native" if use_native else "PIL"
            print(f"train step WITH input ({tag} decode): "
                  f"{dt_e2e * 1000:.1f} ms/step ({b / dt_e2e:.2f} img/s) "
                  f"[workers={args.workers}]")


if __name__ == "__main__":
    main()
