"""Iterative smallest-K eigensolver (LOBPCG) for large graph Laplacians.

The dense batched `eigh` in ops/eigen.py is the right tool for the pipeline's
default graphs (N ~ 400-4000 nodes). For the matting-laplacian configuration at
small downsample factors the graph grows to N = (H/4)*(W/4) ~ 10-50k nodes and
O(N^3) dense decomposition stops being sensible; LOBPCG finds the K smallest
eigenpairs with O(iters * N^2 * m) matmuls that XLA shards across the mesh when
W is row-sharded (see parallel/sharded.py).

We reduce the generalized problem (D - W) x = lam D x to the whitened standard
problem A v = lam v, A = I - D^{-1/2} W D^{-1/2}, and find the smallest-K of A as
the largest-K of (c I - A) with Gershgorin bound c, via
jax.experimental.sparse.linalg.lobpcg_standard (callable form, so the matvec can
carry any sharding).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.affinity import degree_vector
from ..ops.eigen import sign_fix


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
    from jax.experimental.sparse.linalg import lobpcg_standard

    W = W.astype(jnp.float32)
    N = W.shape[-1]
    if mask is not None:
        m = mask.astype(W.dtype)
        W = W * m[:, None] * m[None, :]
    d = degree_vector(W)
    inv_sqrt_d = jax.lax.rsqrt(d)

    # Gershgorin upper bound for A = I - D^-1/2 W D^-1/2 (spectrum within [0, 2],
    # but compute the data-dependent bound to keep the shift tight).
    A_offdiag_rowsum = jnp.sum(
        jnp.abs(inv_sqrt_d[:, None] * W * inv_sqrt_d[None, :]), axis=1)
    c = 1.0 + jnp.max(A_offdiag_rowsum)

    def shifted_matvec(X):
        # (cI - A) X = (c - 1) X + D^-1/2 W D^-1/2 X
        WX = jnp.dot(W, inv_sqrt_d[:, None] * X,
                     preferred_element_type=jnp.float32)
        return (c - 1.0) * X + inv_sqrt_d[:, None] * WX

    # Deterministic start block (key fixed): LOBPCG needs n >= 4m; clamp m.
    m_block = min(max(K, 1), max(N // 4 - 1, 1))
    X0 = jax.random.normal(jax.random.PRNGKey(0), (N, m_block), jnp.float32)
    if mask is not None:
        X0 = X0 * mask.astype(jnp.float32)[:, None]
    theta, V, _ = lobpcg_standard(shifted_matvec, X0, m=iters)

    evals = (c - theta)[:K]                    # largest of (cI-A) -> smallest of A
    V = V[:, :K]
    X = inv_sqrt_d[:, None] * V                # unwhiten
    # D-normalize: LOBPCG returns V^T V = I => X^T D X = I already.
    vectors = X.T
    if mask is not None:
        vectors = vectors * mask.astype(vectors.dtype)[None, :]
    if apply_sign_fix:
        vectors = sign_fix(vectors, mask)
    return evals, vectors
