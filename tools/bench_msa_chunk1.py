"""Measure the fused-MSA kernel family at sublane-MISALIGNED window
geometries (window-7: Swin-T/S 2D n=49, video (8,7,7) n=392), where the
fused kernels are forced to chunk-of-1 grids (ops/pallas/fused_msa.py
_chunk_ok).  The numbers drive the fused_msa_routed policy.

Arms (all computing the same windowed-MSA function on raw weights):
  fused     fused_window_msa            (qkv+attn+proj in one kernel)
  padded    fused_window_msa_padded     (zero-pad n to the sublane pack,
                                         multi-window chunks)
  attncore  XLA qkv/proj GEMMs + the attention-only Pallas kernel
  xla       everything XLA

This supersedes tools/bench_msa_padded.py, whose 'padded-fused' arm went
through WindowAttention and silently measured the attncore routing, not
the padded kernel.

Usage: python tools/bench_msa_chunk1.py [--batch 8] [--train] [--video]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# (nw, n, c, heads). 2D: Swin-T/S 480² window 7, stage H=W in
# {120, 60, 30, 15} padded to a multiple of 7.  Video: Swin-T A2D clip
# (8 frames, 480², window (8,7,7)) -> n = 8*7*7 = 392.
STAGES_2D = [
    ("t0", 324, 49, 96, 3),
    ("t1", 81, 49, 192, 6),
    ("t2", 25, 49, 384, 12),
    ("t3", 9, 49, 768, 24),
]
STAGES_VIDEO = [
    ("v0", 324, 392, 96, 3),
    ("v1", 81, 392, 192, 6),
    ("v2", 25, 392, 384, 12),
    ("v3", 9, 392, 768, 24),
]


def time_marginal(fn, args, iters=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters + 1):
        r = fn(*args)
    jax.block_until_ready(r)
    tn = time.perf_counter() - t0
    return max((tn - t1) / iters, 1e-9)


def attncore_msa(x, wqkv, bqkv, wproj, bproj, bias, mask, heads, scale,
                 use_pallas=True):
    """The WindowAttention else-branch: XLA GEMMs around the
    attention-only kernel (swin2d.py routing for misaligned n)."""
    from lavt_rs_tpu.ops.attention import window_attention

    b, nw, n, c = x.shape
    qkv = (jnp.einsum("bwnc,cd->bwnd", x, wqkv.astype(x.dtype))
           + bqkv.astype(x.dtype))
    qkv = qkv.reshape(b, nw, n, 3, heads, c // heads)
    q, k, v = (qkv[..., i, :, :].transpose(0, 1, 3, 2, 4) for i in range(3))
    out = window_attention(q, k, v, bias, mask=mask, scale=scale,
                           use_pallas=use_pallas)
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, nw, n, c)
    return (jnp.einsum("bwnc,cd->bwnd", out, wproj.astype(x.dtype))
            + bproj.astype(x.dtype))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--train", action="store_true",
                    help="time fwd+bwd instead of fwd")
    ap.add_argument("--video", action="store_true",
                    help="bench the n=392 video geometries (batch 1)")
    args = ap.parse_args()

    from lavt_rs_tpu.ops.pallas.fused_msa import (
        fused_msa_padded_supported, fused_msa_supported, fused_window_msa,
        fused_window_msa_padded)

    stages = STAGES_VIDEO if args.video else STAGES_2D
    batch = 1 if args.video else args.batch
    print(f"device: {jax.devices()[0].device_kind}  batch: {batch}  "
          f"{'fwd+bwd' if args.train else 'fwd'}")
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    for name, nw, n, c, h in stages:
        scale = (c // h) ** -0.5
        x = jnp.asarray(rng.standard_normal((batch, nw, n, c)), dt)
        wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05,
                           jnp.float32)
        bqkv = jnp.asarray(rng.standard_normal(3 * c) * 0.05, jnp.float32)
        wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32)
        bproj = jnp.zeros((c,), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((h, n, n)) * 0.05,
                           jnp.float32)
        mask = jnp.asarray(
            np.where(rng.random((nw, n, n)) > 0.7, -100.0, 0.0), jnp.float32)

        arms = {}
        if fused_msa_supported(nw, n, c, h, 2):
            arms["fused"] = fused_window_msa
        if fused_msa_padded_supported(nw, n, c, h, 2):
            arms["padded"] = fused_window_msa_padded
        arms["attncore"] = functools.partial(attncore_msa, use_pallas=True)
        arms["xla"] = functools.partial(attncore_msa, use_pallas=False)

        results = {}
        for label, fn in arms.items():
            if args.train:
                def loss(x, wqkv, bqkv, wproj, fn=fn):
                    y = fn(x, wqkv, bqkv, wproj, bproj, bias, mask, h,
                           scale)
                    return (y.astype(jnp.float32) ** 2).mean()

                f = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
            else:
                f = jax.jit(lambda x, wqkv, bqkv, wproj, fn=fn: fn(
                    x, wqkv, bqkv, wproj, bproj, bias, mask, h, scale))
            try:
                results[label] = time_marginal(f, (x, wqkv, bqkv, wproj)) * 1e3
            except Exception as e:  # noqa: BLE001 - report and keep going
                results[label] = None
                print(f"  {name}/{label}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}")
        ref = results.get("xla")
        parts = []
        for label, t in results.items():
            if t is None:
                parts.append(f"{label} FAIL")
            else:
                rel = f" ({ref / t:.2f}x)" if ref and label != "xla" else ""
                parts.append(f"{label} {t:.3f} ms{rel}")
        print(f"stage {name} (nw={nw} n={n} c={c} h={h}): "
              + "  ".join(parts))


if __name__ == "__main__":
    main()
