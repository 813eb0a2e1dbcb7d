"""Iterative smallest-K Laplacian eigensolver (LOBPCG) — mesh-shardable wrapper.

The LOBPCG math itself lives in ops/eigen.py (`solver='lobpcg'`): block LOBPCG
on the Gershgorin-shifted whitened operator via
jax.experimental.sparse.linalg.lobpcg_standard. This module keeps the
single-graph entry point used by parallel/sharded.py, where the (N, N) affinity
is row-block-sharded over the mesh and XLA partitions every matvec with psum
collectives over ICI.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax

from ..ops.eigen import laplacian_eigs


@partial(jax.jit, static_argnames=("K", "iters", "apply_sign_fix"))
def lobpcg_laplacian_eigs(
    W: jax.Array,
    K: int,
    *,
    iters: int = 120,
    mask: Optional[jax.Array] = None,
    apply_sign_fix: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Smallest-K generalized eigenpairs of (D - W, D) via LOBPCG.

    Same contract as ops.eigen.laplacian_eigs(lapnorm=True): returns
    (eigenvalues (K,), eigenvectors (K, N)) ascending, x^T D x = 1.
    """
    return laplacian_eigs(W, K, lapnorm=True, mask=mask,
                          apply_sign_fix=apply_sign_fix, solver="lobpcg",
                          lobpcg_iters=iters)
