"""Device mesh and sharding rules.

The reference's distributed story is one-process-per-GPU DDP over NCCL
(reference train.py:591-592, utils.py:215-232).  The TPU-native equivalent is
a single jitted program over a `jax.sharding.Mesh`:
  * 'data'  — batch-axis data parallelism (DDP equivalent; gradient mean
    falls out of sharded loss averaging, XLA inserts the psum over ICI).
  * 'model' — reserved tensor-parallel axis for larger configs (the LAVT
    model families fit on one chip, so the default is model=1, but the
    train step is written against the mesh so tp>1 compiles today).

Batches are sharded on 'data'; params/optimizer state are replicated
(LAVT-scale models; ZeRO-style sharding would shard them on 'data').
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, data: Optional[int] = None,
              model: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    devs = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis of every batch leaf on 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-local batch pytree onto the mesh, batch-axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def shard_video_frames(mesh: Mesh, video):
    """Shard a (B, T, H, W, 3) clip along the FRAME axis on 'data'.

    Whole-video YTVOS clips (T up to ~70 at 480²) can exceed one chip's HBM
    (SURVEY.md §5 long-context note); 3D windows are local in T, so the
    frame axis shards cleanly — XLA inserts halo exchanges for the
    temporal rolls/convs and the language cross-attention is per-frame.
    """
    return jax.device_put(video, NamedSharding(mesh, P(None, "data")))
