"""Inference-time parameter folding.

Some per-apply computations depend only on the parameters, not the
inputs — the relative-position bias table -> (h, N, N) expansions in
every window-attention block (24 of them in Swin-B).  Inside a jitted
apply they re-run every step because params are traced inputs; measured
~0.6 ms/step at Swin-B 480² bs 8 on v5e (tools/profile_infer.py, the
``uik,vjl,uvh->ijklh`` contractions).

``fold_inference_variables`` runs ONE forward with the ``folded``
collection mutable; each attention module stores its expanded bias
(swin2d.WindowAttention / swin3d.WindowAttention3D), and subsequent
applies that receive the returned variables read the stored tensor
instead of expanding the table.

Use for inference/eval only: the folded biases are snapshots, so a
training step that updates the tables must NOT pass the folded
collection (the modules would keep using stale biases).

Reference parity note: the torch reference recomputes the bias lookup
per forward too (lib/backbone.py windowed attention); folding is the
TPU-idiomatic equivalent of moving that lookup to checkpoint-load time.
"""

from __future__ import annotations


def fold_inference_variables(model, variables, *example_args, **apply_kw):
    """Return ``variables`` extended with a ``folded`` collection.

    Runs one forward of ``model.apply`` on ``example_args`` (use the real
    eval input shapes: 3D windows clamp to the input dims, and the folded
    bias is only reused when its N matches).  Any extra ``apply_kw`` are
    forwarded to ``model.apply`` (e.g. ``method=``).
    """
    mutable = apply_kw.pop("mutable", [])
    mutable = list(mutable) + ["folded"]
    _, mut = model.apply(variables, *example_args, mutable=mutable,
                         **apply_kw)
    return {**variables, **mut}


def fold_rel_pos_bias_2d(variables):
    """Tree-walk fast path for 2D models (no forward pass, no compile).

    Finds every ``relative_position_bias_table`` param, recovers the
    (square) window from the table length ((2w-1)² rows), and expands it
    with the same ops.window routine the module uses — bit-identical by
    construction.  2D only: 3D tables have (2wd-1)(2wh-1)(2ww-1) rows,
    which this cannot factor — use ``fold_inference_variables`` there.
    Raises ValueError on a non-(2w-1)² table.
    """
    import math
    from collections.abc import Mapping

    import numpy as np
    import jax.numpy as jnp

    from ..ops.window import relative_position_index_2d

    def expand(tbl):
        s = math.isqrt(tbl.shape[0])
        if s * s != tbl.shape[0] or s % 2 == 0:
            raise ValueError("table rows not (2w-1)^2 — 3D window? use "
                             "fold_inference_variables")
        w = (s + 1) // 2
        # Host-side gather (bit-exact: pure indexing; the module's
        # one-hot contraction has exactly one nonzero term per output).
        # Doing this on host avoids 24 per-op relay dispatches —
        # unjitted device ops cost ~1 s each on a remote-attached TPU.
        t = np.asarray(tbl)
        bias = t[relative_position_index_2d(w, w)]       # (N, N, h)
        return jnp.asarray(bias.transpose(2, 0, 1))      # (h, N, N)

    def walk(node):
        out = {}
        for key, val in node.items():
            if isinstance(val, Mapping):
                sub = walk(val)
                if sub:
                    out[key] = sub
        tbl = node.get("relative_position_bias_table")
        if tbl is not None:
            out["rel_pos_bias"] = expand(tbl)
        return out

    return {**variables, "folded": walk(variables["params"])}


# >=2-D params that cast_matmul_params_bf16 keeps in f32 (shared with the
# dtype assertions in tests/test_model_forward.py so both exemptions stay
# asserted): the rel-pos tables feed the f32 bias expansion; the absolute
# position embedding is bicubic-resized in f32 before its cast.
CAST_KEEP_NAMES = frozenset(
    {"relative_position_bias_table", "absolute_pos_embed"})


def cast_matmul_params_bf16(variables):
    """Pre-cast the big matmul weights to bf16 for bf16 inference.

    Under ``dtype=bfloat16`` every flax Dense/Conv/Embed casts its f32
    kernel to bf16 inside EVERY jitted apply — for Swin-B + BERT-base
    that is ~110M params of f32 reads + bf16 writes per step (~0.7 ms
    on v5e, batch-independent; the weight-convert fusions dominated the
    top-level tail in tools/profile_infer.py).  Casting once here is
    bit-identical: bf16(w) == bf16(bf16(w)), and the compute path
    consumes the bf16 value either way.

    Only >=2-D ``params`` leaves are cast (kernels, attention/MLP weight
    matrices, embedding tables).  Kept in f32:

    - 1-D leaves (biases, LN/BN scales): the fused Pallas kernels add
      these in f32 (``b*_ref[...].astype(f32)``), so casting them WOULD
      change numerics;
    - ``relative_position_bias_table`` (feeds the f32 bias expansion)
      and ``absolute_pos_embed`` (bicubic-resized in f32 before cast);
    - every non-``params`` collection (batch_stats, folded biases).

    Training must NOT use this (f32 master weights live in the optimizer
    contract); it is inference-prep like fold_rel_pos_bias_2d.
    """
    from collections.abc import Mapping

    import jax.numpy as jnp

    keep_names = CAST_KEEP_NAMES

    def walk(node):
        out = {}
        for key, val in node.items():
            if isinstance(val, Mapping):
                out[key] = walk(val)
            elif (hasattr(val, "ndim") and val.ndim >= 2
                    and val.dtype == jnp.float32 and key not in keep_names):
                out[key] = val.astype(jnp.bfloat16)
            else:
                out[key] = val
        return out

    return {**variables, "params": walk(variables["params"])}
