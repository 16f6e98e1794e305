"""Checkpoint save/restore with the reference's retention policies.

Behavioral contract (reference train.py:738-829, utils.py:200-212):
  * checkpoint contents: model params/batch_stats, optimizer state, epoch,
    config — one file per epoch;
  * RefCOCO: save every epoch, named with epoch + metrics
    (train.py:761-762);
  * YTVOS: keep only the last `keep` checkpoints
    (remove_extra_checkpoints_on_master, utils.py:205-212);
  * A2D: save only on best train mIoU (train.py:775-789) — callers pass
    `only_if_best`;
  * save on process 0 only (save_on_master equivalent).

Uses orbax-checkpoint (the TPU-native torch.save replacement).
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(ckpt_dir: str, epoch: int, state, extra: Optional[dict]
                    = None, metrics_tag: str = "", keep: Optional[int] = None):
    """Save `state` (any pytree) under ckpt_dir/epoch_<N>[_<tag>]."""
    if jax.process_index() != 0:
        return None
    ocp = _ocp()
    os.makedirs(ckpt_dir, exist_ok=True)
    name = f"epoch_{epoch:04d}" + (f"_{metrics_tag}" if metrics_tag else "")
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    with ocp.StandardCheckpointer() as ckptr:
        payload = {"state": jax.device_get(state), "epoch": epoch}
        ckptr.save(path, payload, force=True)
    # extra metadata (args, tags — may contain strings orbax can't store)
    # goes to a JSON sidecar.
    if extra:
        import json

        with open(path + ".extra.json", "w") as f:
            json.dump(extra, f, default=str)
    if keep:
        prune_checkpoints(ckpt_dir, keep)
    return path


def list_checkpoints(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for d in sorted(os.listdir(ckpt_dir)):
        m = re.match(r"epoch_(\d+)", d)
        if m and os.path.isdir(os.path.join(ckpt_dir, d)):
            out.append((int(m.group(1)), os.path.join(ckpt_dir, d)))
    return sorted(out)


def prune_checkpoints(ckpt_dir: str, keep: int):
    """Keep only the newest `keep` checkpoints (reference keeps last 8 for
    YTVOS, utils.py:205-212)."""
    import shutil

    ckpts = list_checkpoints(ckpt_dir)
    for _, path in ckpts[:-keep]:
        shutil.rmtree(path, ignore_errors=True)


def restore_checkpoint(path: str, target=None):
    """Restore a checkpoint saved by save_checkpoint.

    `target` (a concrete or abstract pytree, e.g. a TrainState) supplies the
    structure to restore INTO — without it orbax returns plain nested dicts
    and the dataclass wrapper (TrainState) would be lost.  Returns
    (state, extra, epoch); the reference's resume restores model/opt/epoch
    the same way (reference train.py:607-612, 723-735).
    """
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            def _abstract(x):
                x = np.asarray(x) if not hasattr(x, "dtype") else x
                return jax.ShapeDtypeStruct(x.shape, x.dtype)

            abstract = jax.tree.map(_abstract,
                                    {"state": target, "epoch": 0})
            restored = ckptr.restore(path, abstract)
        else:
            restored = ckptr.restore(path)
    extra = None
    if os.path.exists(path + ".extra.json"):
        import json

        with open(path + ".extra.json") as f:
            extra = json.load(f)
    return restored["state"], extra, int(restored["epoch"])


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    ckpts = list_checkpoints(ckpt_dir)
    return ckpts[-1][1] if ckpts else None
