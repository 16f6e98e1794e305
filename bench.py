"""Benchmark: flagship RefCOCO inference throughput on one TPU chip.

Measures lavt_one (Swin-Base, 480x480, window 12, bf16) single-chip
inference images/sec — the BASELINE.json north-star config ("test.py path").

vs_baseline is measured against the north-star target of
5 x PyTorch-CPU images/sec (BASELINE.md): vs_baseline = ips / (5 * cpu_ips).
The PyTorch-CPU throughput is measured once with the full torch LAVT-one
oracle (tests/torch_lavt.py) and cached in .bench_baseline.json.

Prints ONE JSON line on stdout; all diagnostics go to stderr.
"""

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_torch_cpu_ips(iters: int = 3) -> float:
    import numpy as np
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from torch_lavt import LAVTOneOracle

    torch.set_num_threads(os.cpu_count() or 8)
    with torch.no_grad():
        m = LAVTOneOracle(embed_dim=128, depths=(2, 2, 18, 2),
                          heads=(4, 8, 16, 32), window=12)
        m.eval()
        img = torch.randn(1, 3, 480, 480)
        ids = torch.randint(1000, 20000, (1, 20))
        mask = torch.ones(1, 20, dtype=torch.long)
        m(img, ids, mask)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            m(img, ids, mask)
        dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt


def get_cpu_baseline() -> float:
    path = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)["torch_cpu_images_per_sec"]
    log("measuring PyTorch-CPU baseline (one-time)...")
    ips = measure_torch_cpu_ips()
    with open(path, "w") as f:
        json.dump({"torch_cpu_images_per_sec": ips,
                   "config": "lavt_one swin-base 480 window12 batch1"}, f)
    log(f"torch CPU: {ips:.3f} images/sec")
    return ips


def main():
    import jax

    # Persistent compile cache: first-compile of the 480px Swin-B forward
    # is 20-60s (and BENCH_r02 recorded one unexplained 464s outlier);
    # with the cache, repeat bench runs skip compilation entirely. TPU
    # executables are tens of MB, so this dir is gitignored (unlike the
    # committed CPU-dryrun cache .jax_cache/).
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache_tpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception as e:
        log(f"compile cache unavailable: {e!r}")
    import jax.numpy as jnp
    import numpy as np

    from lavt_rs_tpu.config import lavt_one_base
    from lavt_rs_tpu.models.factory import build_model

    dev = jax.devices()[0]
    log(f"device: {dev}")

    cfg = lavt_one_base().replace(dtype="bfloat16", use_pallas=True)
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    ids_np = rng.integers(1000, 20000, (64, 20)).astype(np.int32)

    best_ips, best_bs = 0.0, 0
    variables = None
    # Timing methodology: on the axon relay, jax.block_until_ready returns
    # before remote execution finishes, so naive loop timing is bogus.
    # We jit a forward that reduces to a scalar (forcing a tiny device->host
    # transfer per call, which DOES synchronize) and report the marginal
    # cost between 1 and 1+N calls (subtracts fixed dispatch overhead).
    for bs in (8, 16, 32):
        img = jnp.asarray(rng.standard_normal((bs, 480, 480, 3)), jnp.float32)
        ids = jnp.asarray(ids_np[:bs])
        mask = jnp.ones((bs, 20), jnp.int32)
        if variables is None:
            # eval_shape + zeros instead of jit(model.init): compiling the
            # full-model initializer cost 40-205s on the relay box and the
            # bench only measures apply() (param VALUES don't change the
            # runtime of a static-shape forward).
            t0 = time.perf_counter()
            shapes = jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0),
                                   img[:1], ids[:1], mask[:1]))
            variables = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes)
            jax.block_until_ready(variables)
            log("param alloc (eval_shape+zeros): "
                f"{time.perf_counter() - t0:.1f}s")
            # Inference-prep: precompute the 24 rel-pos bias expansions
            # once (they are param-only; recomputing them inside every
            # jitted apply measured ~0.6 ms/step at bs 8).
            from lavt_rs_tpu.eval.fold import (cast_matmul_params_bf16,
                                               fold_rel_pos_bias_2d)
            variables = fold_rel_pos_bias_2d(variables)
            # bf16 model: pre-cast matmul weights once (bit-identical;
            # saves the per-step f32->bf16 weight-convert passes)
            variables = cast_matmul_params_bf16(variables)

        fwd_sum = jax.jit(lambda v, *a: model.apply(v, *a).sum())
        t0 = time.perf_counter()
        float(fwd_sum(variables, img, ids, mask))
        log(f"bs={bs} compile+first: {time.perf_counter() - t0:.1f}s")

        def run(k):
            """Queue k steps back-to-back, sync once at the end.

            Submission is async through the relay, so queued steps pipeline
            on the device; syncing every call (float() per step) would add
            the ~28ms dispatch round-trip to every step and underreport
            throughput by ~25%. The k=1 subtraction removes the single
            final sync + fixed overhead.
            """
            t0 = time.perf_counter()
            r = None
            for _ in range(k):
                r = fwd_sum(variables, img, ids, mask)
            float(r)
            return time.perf_counter() - t0

        t1 = run(1)
        n_iter = 10
        tn = run(n_iter + 1)
        dt = max((tn - t1) / n_iter, 1e-9)
        ips = bs / dt
        log(f"bs={bs}: {dt * 1000:.1f} ms/step marginal, {ips:.2f} images/sec")
        if ips > best_ips:
            best_ips, best_bs = ips, bs

        if bs > 8:
            # serving-grade large-batch path: chained micro-batches of 8
            # inside one jitted program (eval/microbatch.py) — XLA's
            # large-batch compilation is measurably SLOWER per image
            # (gather emitter, fusion choices), so big offline batches
            # should run at the measured-optimal micro-batch
            from lavt_rs_tpu.eval.microbatch import microbatched

            mb_sum = jax.jit(microbatched(
                lambda v, *a: model.apply(v, *a), 8))
            fwd_sum = jax.jit(
                lambda v, *a, _f=mb_sum: _f(v, *a).sum())
            t0 = time.perf_counter()
            float(fwd_sum(variables, img, ids, mask))
            log(f"bs={bs} microbatched compile+first: "
                f"{time.perf_counter() - t0:.1f}s")
            t1 = run(1)
            tn = run(n_iter + 1)
            dt = max((tn - t1) / n_iter, 1e-9)
            ips = bs / dt
            log(f"bs={bs} (microbatched 8x{bs // 8}): {dt * 1000:.1f} "
                f"ms/step marginal, {ips:.2f} images/sec")
            if ips > best_ips:
                best_ips, best_bs = ips, bs

    try:
        cpu_ips = get_cpu_baseline()
    except Exception as e:  # baseline measurement must never kill the bench
        log(f"cpu baseline failed: {e!r}")
        cpu_ips = None

    result = {
        "metric": "refcoco_infer_images_per_sec_per_chip",
        "value": round(best_ips, 3),
        "unit": "images/sec",
        "vs_baseline": (round(best_ips / (5.0 * cpu_ips), 3)
                        if cpu_ips else None),
    }
    log(f"best: bs={best_bs}")
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
