"""Multi-host initialization and cross-host helpers.

The reference's multi-process story is torch.distributed/NCCL via HF Accelerate
(SURVEY.md section 2.3). The TPU-native equivalent is single-controller JAX:
`jax.distributed.initialize` joins hosts over DCN, after which `jax.devices()`
spans the full slice and every pjit program's collectives ride ICI within the
slice. These helpers wrap initialization and the few host-level utilities the
tasks need (master detection, metric aggregation across hosts).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join a multi-host JAX runtime. With no arguments, relies on the TPU
    environment's auto-bootstrap (the normal path on Cloud TPU slices)."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # Single-process environment (tests, one-host runs): nothing to join.
        pass


def is_master() -> bool:
    return jax.process_index() == 0


def all_sum_scalar(x: float) -> float:
    """Sum a host scalar across processes (metric sync; the reference's
    dist.all_reduce at object-segmentation/util.py:117-119)."""
    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils
    return float(multihost_utils.process_allgather(
        np.asarray([x], np.float64)).sum())


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (the reference's accelerator.wait_for_everyone,
    extract/extract.py:114)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
