"""Intermediate-feature extraction — the reference's `forward_feats` paths
(lib/mask_predictor.py:102-144, lib/_utils.py:110-130) used by --save_feats
visualization.

The TPU-native mechanism is flax's capture_intermediates: one apply returns
the logits plus every requested submodule output, still inside a single
jitted program.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax


def forward_with_features(model, variables, *args,
                          filter_prefix: str = "classifier"
                          ) -> Tuple[jax.Array, Dict]:
    """Run the model and also return intermediates whose module path starts
    with `filter_prefix` (default: the decoder, like the reference's
    SimpleDecoding.forward_feats)."""

    def keep(mdl, method_name):
        return mdl.path and mdl.path[0] == filter_prefix

    out, state = model.apply(variables, *args,
                             capture_intermediates=keep,
                             mutable=["intermediates"])
    feats = state["intermediates"]
    return out, feats
