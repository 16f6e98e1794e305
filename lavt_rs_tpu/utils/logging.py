"""Training-loop metering — SmoothedValue / MetricLogger equivalents.

Behavioral contract: reference utils.py:16-150
  * SmoothedValue: windowed deque median/avg + global avg, with optional
    cross-process synchronization (the reference all-reduces via
    torch.distributed, utils.py:34-45; here jax.process_count()>1 syncs
    through a tiny jitted psum on one scalar pair).
  * MetricLogger.log_every: iter/data timing, ETA, per-chip memory stat.
  * is_main_process / print gating (reference utils.py:161-202).
"""

from __future__ import annotations

import datetime
import sys
import time
from collections import defaultdict, deque
from typing import Iterable, Optional


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def print_master(*args, **kw):
    if is_main_process():
        print(*args, **kw)


class SmoothedValue:
    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    def synchronize_between_processes(self):
        """All-reduce (count, total) across hosts (reference utils.py:34-45)."""
        import jax

        if jax.process_count() == 1:
            return
        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        arr = multihost_utils.process_allgather(
            jnp.asarray([self.count, self.total]))
        self.count = int(arr[:, 0].sum())
        self.total = float(arr[:, 1].sum())

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


def device_memory_mb() -> Optional[float]:
    """Per-chip live HBM usage (the torch.cuda.max_memory_allocated
    analogue in MetricLogger, reference utils.py:134-141)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / (1024.0 * 1024.0)
    except Exception:
        return None


class MetricLogger:
    def __init__(self, delimiter: str = "  ", out=None):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        # resolve at call time so stream redirection (capsys, tee) works
        self.out = out if out is not None else sys.stderr

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def add_meter(self, name, meter):
        self.meters[name] = meter

    def synchronize_between_processes(self):
        for m in self.meters.values():
            m.synchronize_between_processes()

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = ""):
        i = 0
        start = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        n = len(iterable) if hasattr(iterable, "__len__") else None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 and is_main_process():
                parts = [header]
                if n:
                    eta = iter_time.global_avg * (n - i)
                    parts.append(f"[{i}/{n}]")
                    parts.append(
                        f"eta: {datetime.timedelta(seconds=int(eta))}")
                parts.append(str(self))
                parts.append(f"time: {iter_time}")
                parts.append(f"data: {data_time}")
                mem = device_memory_mb()
                if mem is not None:
                    parts.append(f"mem: {mem:.0f}MB")
                print(self.delimiter.join(parts), file=self.out, flush=True)
            i += 1
            end = time.time()
        total = time.time() - start
        if is_main_process():
            print(f"{header} Total time: "
                  f"{datetime.timedelta(seconds=int(total))}",
                  file=self.out, flush=True)
