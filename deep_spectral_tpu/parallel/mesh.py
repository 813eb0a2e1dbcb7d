"""Device-mesh construction and sharding helpers.

The reference's parallelism is (a) DDP/NCCL for self-training and (b) a CPU
process pool over images (SURVEY.md section 2.3). The TPU-native equivalent is a
single-controller `jax.sharding.Mesh` over ICI: the per-image pipeline becomes a
batch sharded along a `data` axis (replacing both DDP and the process pool), and
a single huge graph can be row-sharded along a `model` axis for the distributed
eigensolver (the sequence-parallel-shaped component; see parallel/sharded.py).
Collectives are compiled into the XLA program — there is no NCCL-like API.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[tuple[str, int]] = None) -> Mesh:
    """Build a mesh over the first `n_devices` devices.

    Default: 1-D ('data', n). Pass axes=[('data', a), ('model', b)] for a 2-D
    mesh (a*b must equal the device count used).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if axes is None:
        axes = [(DATA_AXIS, n)]
    names = [a[0] for a in axes]
    shape = [a[1] for a in axes]
    assert int(np.prod(shape)) == n, f"mesh {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=names)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharding(mesh: Mesh, ndim: int, axis: str = MODEL_AXIS) -> NamedSharding:
    """Shard the first dim of a (N, ...) matrix over `axis` (row-block layout)."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))
