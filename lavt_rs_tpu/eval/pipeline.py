"""Producer/consumer pipelining for eval loops.

Eval on a remote-attached TPU is transfer + host-prep bound: a strictly
sequential loop alternates [dataset decode] -> [host->device transfer] ->
[dispatch] -> [result sync], leaving the device idle most of the time.
This helper runs the dataset decode AND the host->device transfer
(jnp.asarray) in a producer thread while up to `depth` dispatches stay in
flight, so all three overlap.  First used by the RefCOCO loop
(refcoco_eval.py, measured 53 -> 74 sent/s); shared here for the video
loops (video_eval.py, cli/test_ytvos.py).
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from typing import Callable, Iterable


def run_pipelined(produce: Callable[[], Iterable], dispatch: Callable,
                  sink: Callable, depth: int = 2) -> None:
    """produce() yields host-prepared items (do jnp.asarray INSIDE the
    generator so the transfer overlaps compute); dispatch(item) enqueues
    device work and returns futures without blocking; sink(item, result)
    blocks on the result (np.asarray) and consumes it.

    Exceptions raised in the producer surface in the caller."""
    depth = max(depth, 1)
    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def _produce():
        try:
            for item in produce():
                q.put(item)
            q.put(None)
        except BaseException as e:  # surface in the consumer
            q.put(e)

    threading.Thread(target=_produce, daemon=True).start()

    inflight: "deque" = deque()
    while True:
        b = q.get()
        if b is None:
            break
        if isinstance(b, BaseException):
            raise b
        inflight.append((b, dispatch(b)))
        if len(inflight) >= depth:
            item, res = inflight.popleft()
            sink(item, res)
    while inflight:
        item, res = inflight.popleft()
        sink(item, res)
