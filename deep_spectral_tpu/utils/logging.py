"""Training/eval observability: smoothed metrics with cross-device sync, timing
loggers, seeding, and accuracy helpers.

Replaces the reference's shared `util.py` (byte-identical copies at
object-segmentation/util.py and semantic-segmentation/util.py):
  * SmoothedValue + MetricLogger with distributed synchronization
    (reference: util.py:91-234) — the torch.distributed `all_reduce` there
    becomes a `jax.lax.psum`-style global sum computed with `process_allgather`
    semantics; under single-controller JAX every host already sees global
    metrics, so sync is a cheap device reduction when values live on device.
  * master-only printing (util.py:310-322), rank-offset seeding (util.py:333-345),
    top-k accuracy (util.py:70-88).
"""
from __future__ import annotations

import builtins
import datetime
import time
from collections import defaultdict, deque
from typing import Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp


class SmoothedValue:
    """Track a series of values with window-smoothed and global statistics
    (reference: util.py:91-150)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        """Global (count, total) across JAX processes. A no-op for one process;
        with jax.distributed initialized, sums over hosts via a device psum
        (the reference's dist.all_reduce, util.py:109-121)."""
        if jax.process_count() == 1:
            return
        # Host numpy array (like parallel.distributed.all_sum_scalar): jnp
        # would truncate the explicit float64 to f32 with a warning when x64
        # is off; process_allgather accepts host arrays directly.
        arr = np.asarray([self.count, self.total], np.float64)
        from jax.experimental import multihost_utils
        summed = multihost_utils.process_allgather(arr).sum(axis=0)
        self.count = int(summed[0])
        self.total = float(summed[1])

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


class MetricLogger:
    """Iteration logger with per-metric smoothing and iter/data timing
    (reference: util.py:153-234)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def synchronize_between_processes(self):
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(f"{n}: {m}" for n, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: Optional[str] = None):
        header = header or ""
        i, start = 0, time.time()
        iter_time, data_time = SmoothedValue(fmt="{avg:.4f}"), SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if print_freq and i % print_freq == 0:
                eta = ""
                if total is not None:
                    eta_s = iter_time.global_avg * (total - i)
                    eta = f" eta: {datetime.timedelta(seconds=int(eta_s))}"
                print(f"{header} [{i}{'/' + str(total) if total else ''}]{eta} "
                      f"{self} time: {iter_time} data: {data_time}")
            i += 1
            end = time.time()
        elapsed = time.time() - start
        print(f"{header} Total time: {datetime.timedelta(seconds=int(elapsed))} "
              f"({elapsed / max(i, 1):.4f} s / it)")


def setup_distributed_print(is_master: bool):
    """Silence print on non-master processes (reference: util.py:310-322)."""
    orig_print = builtins.print

    def maybe_print(*args, force: bool = False, **kwargs):
        if is_master or force:
            orig_print(*args, **kwargs)

    builtins.print = maybe_print


def set_seed(seed: int, process_offset: bool = True) -> np.random.Generator:
    """Seed numpy/python with a per-process offset (reference: util.py:333-345).
    Returns a numpy Generator; JAX code should fold the same seed into PRNGKeys."""
    import random
    s = seed + (jax.process_index() if process_offset else 0)
    random.seed(s)
    np.random.seed(s % (2 ** 32))
    return np.random.default_rng(s)


class MetricWriter:
    """Append-only JSONL metric log (the role wandb plays in the reference,
    train.py:33-35, :241-242 — wandb is unavailable offline, and a JSONL file
    is greppable/plottable without a service)."""

    def __init__(self, path):
        from pathlib import Path
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a")

    def log(self, step: int, **metrics):
        import json
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self):
        self._fh.close()


def topk_accuracy(logits, targets, topk=(1,)):
    """Top-k accuracy in percent (reference: util.py:70-88)."""
    logits = jnp.asarray(logits)
    targets = jnp.asarray(targets)
    maxk = max(topk)
    pred = jnp.argsort(-logits, axis=-1)[..., :maxk]
    correct = pred == targets[..., None]
    res = []
    for k in topk:
        acc = jnp.any(correct[..., :k], axis=-1).astype(jnp.float32).mean() * 100.0
        res.append(float(acc))
    return res
