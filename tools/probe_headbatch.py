"""Probe: per-head looped geometry dots vs head-batched dots in Pallas.

Validates the round-5 hypothesis that the fused MSA backward's ~29% MFU
is per-op overhead from the (windows x heads x 6) small dots, not MXU
underutilization per se.  Two toy kernels over stage-2-like shapes do the
same attention-geometry math (s = q@k^T, o = softmax(s)@v — fwd only,
enough to compare op-count scaling):

  loop : python-unrolled per-head dots, chunk-batched (production shape)
  batch: ONE batched dot per tensor with batch dim = chunk*heads, fed by
         per-head lane-slice relayout into (ch*h, n, hd) buffers

Usage: python tools/probe_headbatch.py [--ch 3] [--heads 4]
"""

import argparse
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def loop_kernel(x_ref, o_ref, *, heads, n, hd):
    ch = x_ref.shape[0] // n
    cq = heads * hd
    x = x_ref[...]
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        q = x[:, sl].reshape(ch, n, hd)
        k = q
        v = q
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        e = jnp.exp(jnp.minimum(s, 80.0))
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[:, sl] = o.reshape(ch * n, hd).astype(x.dtype)


def batch_kernel(x_ref, o_ref, qb_scr, *, heads, n, hd):
    ch = x_ref.shape[0] // n
    x = x_ref[...]
    # relayout: (ch*n, h*hd) -> (h*ch, n, hd) via static lane slices
    for h in range(heads):
        qb_scr[h * ch:(h + 1) * ch] = \
            x[:, h * hd:(h + 1) * hd].reshape(ch, n, hd)
    qb = qb_scr[...]
    s = jax.lax.dot_general(qb, qb, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    e = jnp.exp(jnp.minimum(s, 80.0))
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
    o = jax.lax.dot_general(p, qb, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    for h in range(heads):
        o_ref[:, h * hd:(h + 1) * hd] = \
            o[h * ch:(h + 1) * ch].reshape(ch * n, hd).astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ch", type=int, default=3)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--n", type=int, default=144)
    ap.add_argument("--hd", type=int, default=32)
    ap.add_argument("--grid", type=int, default=96)
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()
    ch, heads, n, hd = args.ch, args.heads, args.n, args.hd
    cq = heads * hd

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.grid * ch * n, cq)) * 0.1,
                    jnp.bfloat16)

    blk = pl.BlockSpec((ch * n, cq), lambda i: (i, 0))

    from jax.experimental.pallas import tpu as pltpu

    fl = jax.jit(pl.pallas_call(
        functools.partial(loop_kernel, heads=heads, n=n, hd=hd),
        grid=(args.grid,), in_specs=[blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)))
    fb = jax.jit(pl.pallas_call(
        functools.partial(batch_kernel, heads=heads, n=n, hd=hd),
        grid=(args.grid,), in_specs=[blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((heads * ch, n, hd), jnp.bfloat16)]))

    ra, rb = fl(x), fb(x)
    np.testing.assert_allclose(np.asarray(ra, np.float32),
                               np.asarray(rb, np.float32), atol=1e-2)

    def one(f):
        jax.block_until_ready(f(x))
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(11):
            r = f(x)
        jax.block_until_ready(r)
        return max((time.perf_counter() - t0 - t1) / 10, 1e-9)

    one(fl), one(fb)
    ta, tb = [], []
    for _ in range(args.rounds):
        ta.append(one(fl) * 1e3)
        tb.append(one(fb) * 1e3)
    print(f"loop : min {min(ta):.3f}  med {statistics.median(ta):.3f} ms")
    print(f"batch: min {min(tb):.3f}  med {statistics.median(tb):.3f} ms")


if __name__ == "__main__":
    main()
