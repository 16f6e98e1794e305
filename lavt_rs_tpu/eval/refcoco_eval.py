"""RefCOCO evaluation loop — behavioral contract: reference test.py:53-109.

Per image, per sentence j: forward -> argmax -> IoU against the 480² target;
accumulate cum_I/cum_U (oIoU), per-prediction IoU list (mIoU), and P@K.
The reference evaluates every sentence of every ref object (eval_mode
datasets stack all sentences).

TPU-native twists over the reference's per-sentence python loop:
  * sentences are PADDED to one fixed S so the whole eval runs through a
    single compiled program (RefCOCO refs carry 1-3+ sentences; jitting per
    count caused a compile per distinct S and batch-1-style utilization);
  * multiple refs are BATCHED per forward (refs_per_batch, default sized
    so the device batch is ~8 — the measured single-chip throughput knee),
  * the loop is PIPELINED: a producer thread prepares batches (dataset
    decode + padding) while up to `pipeline_depth` dispatches stay in
    flight on the device, so host prep / host->device transfer / compute
    overlap instead of strictly alternating (the loop is transfer-bound on
    a remote-attached TPU; the sequential form measured 47 sent/s vs the
    34.8 ms/batch device rate);
  * the jitted forward is cached per model_apply object, so per-epoch eval
    during training does not recompile.
"""

from __future__ import annotations

import queue
import sys
import threading
import time
import weakref
from collections import deque
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..data.refcoco import ReferDataset
from ..metrics import SegMetrics
from ..ops.norm import maybe_normalize_image

_FWD_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _fwd_iou_for(model_apply: Callable):
    fn = _FWD_CACHE.get(model_apply)
    if fn is None:
        @jax.jit
        def fwd_iou(variables, image, ids, mask, target):
            """image (R, H, W, 3) is per-REF; ids / mask (R, S, L) per
            sentence; target is the BIT-PACKED binary mask
            (R, ceil(H*W/8)) uint8 (np.packbits big-endian, zero-padded
            tail) — 8x fewer target bytes over the relay, unpacked here
            with a shift-and-mask (elementwise, negligible vs the
            forward).  The xS broadcast happens ON DEVICE — shipping each
            ref's image/target once instead of S times cuts host->device
            transfer ~3x (the eval loop is transfer-bound on a
            remote-attached TPU)."""
            r, s = ids.shape[:2]
            h, w = image.shape[1:3]
            p8 = target.shape[1]
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # big-endian
            bits = (target[:, :, None] >> shifts[None, None]) & jnp.uint8(1)
            target = bits.reshape(r, p8 * 8)[:, :h * w].reshape(r, h, w)
            # uint8 pipeline: normalize the R per-ref images on device
            # BEFORE the xS broadcast (cheapest point in the graph)
            image = maybe_normalize_image(image)
            img = jnp.broadcast_to(image[:, None], (r, s, h, w, 3))
            logits = model_apply(variables, img.reshape(r * s, h, w, 3),
                                 ids.reshape(r * s, -1),
                                 mask.reshape(r * s, -1))
            pred = jnp.argmax(logits, axis=-1).reshape(r, s, h, w)
            gt = target.astype(jnp.float32)[:, None]
            predf = pred.astype(jnp.float32)
            inter = jnp.sum(predf * gt, axis=(2, 3))
            union = jnp.sum(jnp.maximum(predf, gt), axis=(2, 3))
            return inter, union

        _FWD_CACHE[model_apply] = fwd_iou
        fn = fwd_iou
    return fn


def evaluate(model_apply: Callable, variables, ds: ReferDataset,
             log_every: int = 100, max_items: Optional[int] = None,
             pad_sentences: Optional[int] = None,
             refs_per_batch: Optional[int] = None,
             image_dtype=None, out_stream=None,
             pipeline_depth: int = 2, cast_bf16: bool = False,
             shard_across_processes: bool = True) -> dict:
    """model_apply(variables, image, ids, mask) -> NHWC logits.

    image_dtype: ship images to the device in this dtype (pass bfloat16
    for a bf16 model — its first op casts anyway, so this is lossless and
    halves the dominant host->device transfer on remote-attached TPUs).

    pipeline_depth: number of dispatched batches kept in flight before
    blocking on the oldest result (1 = the old strictly-sequential loop).

    shard_across_processes: under multi-host jax.distributed, each
    process evaluates items [process_index::process_count] and the
    sufficient statistics are all-gathered at the end (mirrors
    cli/test_ytvos.py's video sharding; the reference shards via
    DistributedSampler + torch.distributed all-reduce).  The per-chip
    loop is relay-transfer-bound (~70-74 sent/s), so hosts scale it
    near-linearly."""
    if out_stream is None:  # resolve at call time, not import time
        out_stream = sys.stderr
    metrics = SegMetrics()
    try:
        # Inference-prep: precompute the param-only rel-pos bias
        # expansions once for the whole eval (~0.6 ms/apply at Swin-B).
        # RefCOCO eval models are 2D; anything the tree-walk can't factor
        # (no tables, 3D tables) just runs unfolded.
        from .fold import fold_rel_pos_bias_2d
        variables = fold_rel_pos_bias_2d(variables)
    except (ValueError, KeyError, TypeError):
        # no/odd params tree (stub model_apply in tests), 3D tables, ...
        pass
    if cast_bf16:
        # bf16 models: pre-cast the matmul weights once (bit-identical —
        # every apply casts them anyway; see fold.cast_matmul_params_bf16).
        try:
            from .fold import cast_matmul_params_bf16
            variables = cast_matmul_params_bf16(variables)
        except (KeyError, TypeError, AttributeError):
            pass
    fwd_iou = _fwd_iou_for(model_apply)

    # one fixed sentence count -> one compile for the whole eval
    smax = pad_sentences
    if smax is None and hasattr(ds, "input_ids"):
        smax = max(len(x) for x in ds.input_ids)

    n = len(ds) if max_items is None else min(len(ds), max_items)
    if shard_across_processes and jax.process_count() > 1:
        my_items = list(range(n))[jax.process_index()::jax.process_count()]
    else:
        my_items = list(range(n))
    sp0 = max(smax or 1, 1)
    # Device batch ~24 sentences: marginally slower per image on-device
    # than the bs=8 knee (tools/bench_batch_scaling.py), but the loop is
    # relay-transfer + per-batch-sync bound, and 3x more sentences per
    # round-trip is a large net win (measured 53 -> 74 sent/s).
    rb = refs_per_batch or max(1, -(-24 // sp0))

    def host_batches():
        """Prepared numpy batches: (last_index, sent_counts, arrays...)."""
        buf = []
        for pos, i in enumerate(my_items):
            buf.append(ds[i])
            if len(buf) < rb and pos + 1 < len(my_items):
                continue
            real = len(buf)
            buf.extend([buf[-1]] * (rb - real))  # pad final batch
            sp = max([sp0] + [ex.ids.shape[0] for ex in buf])
            ids = np.zeros((rb, sp) + buf[0].ids.shape[1:], np.int32)
            mask = np.zeros((rb, sp) + buf[0].mask.shape[1:], np.int32)
            for j, ex in enumerate(buf):
                ids[j, :ex.ids.shape[0]] = ex.ids
                mask[j, :ex.mask.shape[0]] = ex.mask
            image = np.stack([ex.image for ex in buf])
            if image_dtype is not None and image.dtype != np.uint8:
                # uint8 images ship as-is (already the smallest transfer);
                # the bf16 cast only applies to host-normalized floats
                image = image.astype(image_dtype)
            # Bit-pack targets (big-endian, zero-padded tail) to match
            # fwd_iou's on-device unpack: 8x fewer target bytes over the
            # relay than raw uint8 masks.
            raw = np.stack([ex.target for ex in buf]).astype(np.uint8)
            target = np.packbits(raw.reshape(rb, -1), axis=1)
            scounts = [ex.ids.shape[0] for ex in buf[:real]]
            yield i, scounts, image, ids, mask, target
            buf = []

    # Producer thread: dataset decode + batch assembly AND the
    # host->device transfer (jnp.asarray) happen here, so the dominant
    # relay transfer overlaps the consumer's dispatch + result syncs
    # instead of serializing with them.  Queue depth bounds host+device
    # memory (each slot ~ rb 480² uint8 images + targets).
    q: "queue.Queue" = queue.Queue(maxsize=max(pipeline_depth, 1))

    def produce():
        try:
            for i, scounts, image, ids, mask, target in host_batches():
                q.put((i, scounts, jnp.asarray(image), jnp.asarray(ids),
                       jnp.asarray(mask), jnp.asarray(target)))
            q.put(None)
        except BaseException as e:  # surface in the consumer
            q.put(e)

    threading.Thread(target=produce, daemon=True).start()

    t0 = time.time()
    inflight: "deque" = deque()
    next_log = log_every

    def drain_one():
        nonlocal next_log
        i, scounts, inter_d, union_d = inflight.popleft()
        inter, union = np.asarray(inter_d), np.asarray(union_d)
        for j, s in enumerate(scounts):
            metrics.update(inter[j, :s], union[j, :s])
        if log_every and i + 1 >= next_log:
            next_log += log_every
            el = time.time() - t0
            print(f"eval [{i + 1}/{n}] {el:.1f}s "
                  f"({metrics.n / el:.2f} sent/s)", file=out_stream)

    while True:
        b = q.get()
        if b is None:
            break
        if isinstance(b, BaseException):
            raise b
        i, scounts, image, ids, mask, target = b
        inter_d, union_d = fwd_iou(variables, image, ids, mask, target)
        inflight.append((i, scounts, inter_d, union_d))
        if len(inflight) >= max(pipeline_depth, 1):
            drain_one()
    while inflight:
        drain_one()

    if shard_across_processes and jax.process_count() > 1:
        # all-gather each host's sufficient statistics and rebuild
        # global metrics (SegMetrics.merge_stats) — same totals as the
        # reference's torch.distributed all-reduce
        from jax.experimental import multihost_utils

        rows = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(metrics.stats_row())))
        metrics = SegMetrics()
        metrics.merge_stats(rows)

    summary = metrics.summary()
    prec = " ".join(f"P@{t}={summary[f'P@{t}']:.2f}"
                    for t in (0.5, 0.6, 0.7, 0.8, 0.9))
    print(f"Final: mIoU={summary['mIoU']:.2f} oIoU={summary['oIoU']:.2f} "
          f"{prec} (n={metrics.n})", file=out_stream)
    return summary
