"""Tensor-parallel parameter sharding over the mesh's 'model' axis.

The reference has no tensor parallelism (SURVEY.md §2.4: DDP only) — LAVT
models fit on one chip — but the framework is written against a
('data', 'model') mesh, and for larger deployments the big projection
weights shard Megatron-style here: column-parallel into a hidden/head
dimension, row-parallel out of it. Only the *parameter* shardings are
declared; GSPMD propagates activation shardings and inserts the
all-reduces over ICI (no hand-written collectives — the scaling-book
recipe: annotate, let XLA place the psums).

Pairs that shard together (column then row — one all-reduce per pair):
  * Swin block MLP:     mlp/fc1 (col) -> mlp/fc2 (row)
  * Window attention:   attn/qkv (col, head-aligned) -> attn/proj (row)
  * BERT encoder:       attention qkv (col) -> attention output (row);
                        intermediate (col) -> output (row)
  * PWAM cross-attn:    f_key/f_value/f_query (col) -> W (row)

Everything else (embeddings, norms, decoder convs with their BN stats,
biases of row-parallel layers, the language gate) stays replicated —
convs + SyncBN interact with spatial halos and are left to the 'data'
axis, which is where their FLOPs already scale.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec factory keyed by param rank).
# Dense kernels are (in, out); col-parallel = split out, row-parallel =
# split in. Matching is on the flattened '/'-joined param path.
_COL = ("mlp/fc1/kernel", "attn/qkv/kernel", "attention/query/kernel",
        "attention/key/kernel", "attention/value/kernel",
        "intermediate/kernel", "f_key/kernel", "f_value/kernel",
        "f_query/kernel")
_ROW = ("mlp/fc2/kernel", "attn/proj/kernel", "attention_output/kernel",
        "output/kernel", "image_lang_att/W/kernel")
_COL_BIAS = ("mlp/fc1/bias", "attn/qkv/bias", "attention/query/bias",
             "attention/key/bias", "attention/value/bias",
             "intermediate/bias", "f_key/bias", "f_value/bias",
             "f_query/bias")


def param_spec(path: str, ndim: int) -> P:
    """PartitionSpec for a parameter at `path` ('/'-joined)."""
    if ndim == 2:
        if any(path.endswith(s) or s in path for s in _COL):
            return P(None, "model")
        if any(path.endswith(s) or s in path for s in _ROW):
            return P("model", None)
    if ndim == 1 and any(path.endswith(s) or s in path for s in _COL_BIAS):
        return P("model")
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def shard_params_tp(mesh: Mesh, tree):
    """Place a params/variables pytree onto the mesh with tensor-parallel
    shardings on 'model' (replicated where no rule matches)."""

    def put(key_path, leaf):
        spec = param_spec(_path_str(key_path), getattr(leaf, "ndim", 0))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)


def tp_sharding_tree(mesh: Mesh, tree):
    """The NamedSharding pytree matching shard_params_tp (for jit
    in_shardings/out_shardings)."""

    def spec(key_path, leaf):
        return NamedSharding(
            mesh, param_spec(_path_str(key_path), getattr(leaf, "ndim", 0)))

    return jax.tree_util.tree_map_with_path(spec, tree)


def zero1_spec(shape, data_axis_size: int) -> P:
    """ZeRO-1 PartitionSpec for one moment leaf: shard the LARGEST axis
    divisible by dp (dim0-only sharding left every 3x3/1x1 conv kernel
    moment replicated — their dim0 is the kernel height, 3 or 1)."""
    if not shape:
        return P()
    divisible = [(n, i) for i, n in enumerate(shape)
                 if n > 1 and n % data_axis_size == 0]
    if not divisible:
        return P()
    _, axis = max(divisible)
    spec = [None] * len(shape)
    spec[axis] = "data"
    return P(*spec)


def shard_opt_state_zero1(mesh: Mesh, opt_state, data_axis_size: int,
                          report: bool = False):
    """Shard AdamW's first/second moments over the 'data' axis (ZeRO-1:
    params and grads stay replicated/psum'd; only the optimizer state is
    partitioned — an 8x memory cut on the moments at dp=8). GSPMD keeps
    the update math identical; each shard updates its slice and the new
    params are all-gathered by the consumer.

    report=True logs the sharded fraction of moment bytes to stderr so a
    silently-replicated state is visible; the fraction is also returned
    as (tree, fraction)."""
    stats = {"sharded": 0, "total": 0}

    def put(leaf):
        shape = getattr(leaf, "shape", ())
        spec = zero1_spec(shape, data_axis_size)
        nbytes = getattr(leaf, "nbytes", 0)
        stats["total"] += nbytes
        if spec != P():
            stats["sharded"] += nbytes
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    tree = jax.tree.map(put, opt_state)
    frac = stats["sharded"] / max(stats["total"], 1)
    if report:
        import sys

        print(f"ZeRO-1: {stats['sharded'] / 2**20:.1f} / "
              f"{stats['total'] / 2**20:.1f} MiB of optimizer state "
              f"sharded over dp={data_axis_size} ({100 * frac:.1f}%)",
              file=sys.stderr)
        return tree, frac
    return tree
