"""Micro-batched inference: run big batches as chained optimal-size chunks.

Measured on v5e (round 5, Swin-B 480² bf16): per-image throughput is NOT
monotone in batch — bs 8 runs 30.4 ms/step (263 img/s) while bs 32 runs
127.9 ms (250 img/s).  The regression is spread across XLA's large-batch
compilation (batched-gather partition ops at ~1/3 HBM roofline, slower
convert/norm fusions, a 3x-per-image decoder reshape; see
tools/profile_infer.py at --batch 32 vs 8), and the isolated fixes lose
e2e (ops/window.py _partition_impl notes).  The serving-grade fix is to
keep the compiler at its measured-optimal micro-batch and loop inside the
jitted program: `lax.map` over (k, micro_bs, ...) chunks compiles the
body ONCE and runs the chunks back-to-back on-device — per-image
throughput then equals the micro-batch optimum for any multiple of it.

Reference context: the reference serves test.py at batch 1 per GPU
(README.md:232); this wrapper is TPU-native beyond-parity for
large-batch offline scoring.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def microbatched(apply_fn: Callable, micro_bs: int = 8) -> Callable:
    """Wrap `apply_fn(variables, img, ids, mask) -> out` so batches that
    are a multiple of `micro_bs` run as chained micro-batch calls inside
    one jitted program.  Batches <= micro_bs (or not a multiple) run the
    plain path unchanged.  Extra leading outputs dims are flattened back
    to the caller's batch."""

    def wrapped(variables, img, ids, mask):
        b = img.shape[0]
        if b <= micro_bs or b % micro_bs:
            return apply_fn(variables, img, ids, mask)
        k = b // micro_bs

        def chunk(args):
            return apply_fn(variables, *args)

        out = jax.lax.map(chunk, (
            img.reshape(k, micro_bs, *img.shape[1:]),
            ids.reshape(k, micro_bs, *ids.shape[1:]),
            mask.reshape(k, micro_bs, *mask.shape[1:])))
        return jax.tree.map(
            lambda o: o.reshape(b, *o.shape[2:]), out)

    return wrapped
