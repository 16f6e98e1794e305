"""Pipeline parallelism (GPipe-style) over a 'stage' mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.4: DDP is its only
strategy) and no LAVT config needs it — every model family fits on one
chip.  This module is the TPU-native building block for when one doesn't:
a homogeneous layer stack is split into S stages, each stage owning
depth/S layers, and microbatches flow through the ring with
`jax.lax.ppermute` inside a `shard_map` — the collectives ride ICI, the
per-stage layer loop is a `lax.scan` (compiler-friendly control flow,
params stacked on a leading axis, one trace for all layers).

The demonstration target is the BERT encoder: 12 identical `layer_{i}`
blocks (models/bert.py:111-113) make the canonical pipelined stack.
`bert_pipelined` reproduces `BertEncoder.__call__` with the layer loop
pipelined; `tests/test_train.py::test_bert_pipeline_parity` checks it
against the plain forward on a CPU mesh.

Schedule: plain GPipe forward fill-and-drain — tick t runs microbatch
(t - s) on stage s, so M microbatches finish in M + S - 1 ticks with
bubble fraction (S-1)/(M+S-1).  No 1F1B is needed for inference/feature
extraction; under `jax.grad` the whole schedule differentiates (the
backward replays the ring in reverse through ppermute's transpose).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)


if hasattr(jax.lax, "pcast"):  # jax >= 0.9: pvary is deprecated

    def _pvary(x, axes):
        return jax.lax.pcast(x, axes, to="varying")
else:  # pragma: no cover - older jax
    _pvary = jax.lax.pvary


def make_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_stages:
        raise ValueError(
            f"pipeline needs {n_stages} devices, got {len(devices)}")
    return Mesh(np.asarray(devices[:n_stages]), ("stage",))


def stack_layer_params(params: dict, prefix: str, num_layers: int):
    """Stack `{prefix}{i}` param subtrees into one pytree with a leading
    layer axis — the scan-friendly layout."""
    layers = [params[f"{prefix}{i}"] for i in range(num_layers)]
    return jax.tree.map(lambda *ls: jnp.stack(ls), *layers)


def pipeline_apply(layer_fn: Callable[[Any, jnp.ndarray, Any], jnp.ndarray],
                   stacked_params, x: jnp.ndarray, extra,
                   *, mesh: Mesh, axis: str = "stage",
                   n_microbatches: int) -> jnp.ndarray:
    """Run a stack of identical layers as an S-stage pipeline.

    layer_fn(params_one_layer, h, extra_mb) -> h' applies ONE layer.
    stacked_params: pytree with leading layer axis (depth, ...);
    depth % S == 0 — stage s owns layers [s*depth/S, (s+1)*depth/S).
    x: (B, ...) input; extra: pytree of per-sample tensors (B, ...) that
    every layer consumes unchanged (e.g. the attention bias).
    B % n_microbatches == 0.
    """
    s_count = mesh.shape[axis]
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    if depth % s_count:
        raise ValueError(f"depth {depth} not divisible by {s_count} stages")
    per_stage = depth // s_count
    b = x.shape[0]
    m = n_microbatches
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    mb = b // m

    staged = jax.tree.map(
        lambda p: p.reshape(s_count, per_stage, *p.shape[1:]),
        stacked_params)
    xs = x.reshape(m, mb, *x.shape[1:])
    extras = jax.tree.map(lambda e: e.reshape(m, mb, *e.shape[1:]), extra)

    def run(stage_params, xs, extras):
        # in_specs puts one (1, per_stage, ...) slice on each device
        stage_params = jax.tree.map(lambda p: p[0], stage_params)
        s = jax.lax.axis_index(axis)
        # the loop carry becomes stage-varying after one tick; mark the
        # initial zeros as varying so the fori_loop carry types match
        state = _pvary(jnp.zeros_like(xs[0]), (axis,))
        ys = _pvary(jnp.zeros_like(xs), (axis,))

        def stage(h, extra_mb):
            def body(h, p):
                return layer_fn(p, h, extra_mb), None

            return jax.lax.scan(body, h, stage_params)[0]

        def tick(t, carry):
            state, ys = carry
            # stage 0 ingests a fresh microbatch; others take the ring
            feed = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, m - 1), 0, keepdims=False)
            h = jnp.where(s == 0, feed, state)
            # stage s processes microbatch (t - s) at tick t
            e_mb = jax.tree.map(
                lambda e: jax.lax.dynamic_index_in_dim(
                    e, jnp.clip(t - s, 0, m - 1), 0, keepdims=False),
                extras)
            out = stage(h, e_mb)
            # the last stage commits microbatch (t - (S-1)) to the output
            oidx = jnp.clip(t - (s_count - 1), 0, m - 1)
            prev = jax.lax.dynamic_index_in_dim(ys, oidx, 0, keepdims=False)
            keep = jnp.logical_and(s == s_count - 1, t >= s_count - 1)
            ys = jax.lax.dynamic_update_index_in_dim(
                ys, jnp.where(keep, out, prev), oidx, 0)
            # ring: stage i -> i+1 (last -> 0 is ignored by the feed)
            state = jax.lax.ppermute(
                out, axis,
                [(i, (i + 1) % s_count) for i in range(s_count)])
            return state, ys

        _, ys = jax.lax.fori_loop(0, m + s_count - 1, tick, (state, ys))
        # replicate the last stage's result (out_specs P(None))
        return jax.lax.psum(
            jnp.where(s == s_count - 1, ys, jnp.zeros_like(ys)), axis)

    ys = shard_map(run, mesh,
                   in_specs=(P(axis), P(None), P(None)),
                   out_specs=P(None))(staged, xs, extras)
    return ys.reshape(b, *x.shape[1:])


def bert_pipelined(variables, cfg, input_ids, attention_mask,
                   *, mesh: Mesh, axis: str = "stage",
                   n_microbatches: int = 4, dtype=jnp.float32):
    """BertEncoder forward with the 12-layer stack pipelined over `mesh`.

    Matches models/bert.py `BertEncoder.__call__` (deterministic mode):
    embeddings + LN run replicated, the layer loop runs as a GPipe ring,
    stage s holding num_layers/S consecutive layers.
    """
    from ..models.bert import BertLayer

    params = variables["params"]
    b, n = input_ids.shape

    # --- embeddings (replicated; tiny next to the layer stack) ---
    word = params["word_embeddings"]["embedding"][input_ids]
    pos = params["position_embeddings"]["embedding"][
        jnp.arange(n, dtype=jnp.int32)][None]
    typ = params["token_type_embeddings"]["embedding"][
        jnp.zeros_like(input_ids)]
    x = (word + pos + typ).astype(dtype)
    ln = params["embeddings_layernorm"]
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    x = (x - mu) / jnp.sqrt(var + cfg.layer_norm_eps)
    x = x * ln["scale"] + ln["bias"]

    bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :]
    bias = bias * -10000.0

    layer = BertLayer(cfg, dtype=dtype)

    def layer_fn(p, h, bias_mb):
        return layer.apply({"params": p}, h, bias_mb, deterministic=True)

    stacked = stack_layer_params(params, "layer_", cfg.num_layers)
    return pipeline_apply(layer_fn, stacked, x, bias, mesh=mesh, axis=axis,
                          n_microbatches=n_microbatches)
