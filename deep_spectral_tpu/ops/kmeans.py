"""K-means and PCA, jit-compiled and batchable.

Replaces the reference's sklearn calls:
  * per-image KMeans over eigenvector rows (reference: extract/extract.py:320-329)
  * dataset-wide MiniBatchKMeans over bbox features (reference: extract/extract.py:581)
  * PCA-32 before clustering (reference: extract/extract.py:575-577)

TPU-first: k-means++ seeding with a fixed PRNG key + full-batch Lloyd iterations.
The assignment step is a single (n, k) distance matmul on the MXU and the update
step a one-hot matmul — at this pipeline's scales (n up to ~100k, d <= 768,
k <= 32) a full-batch Lloyd sweep costs microseconds per iteration on a TPU chip,
so sklearn's minibatch approximation is strictly unnecessary; we run exact Lloyd
for both call sites. Exact reproduction of sklearn's cluster assignments is
impossible anyway (seeded randomized init); parity is metric-level, as the
reference itself warns (semantic-segmentation/README.md:64).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class KMeansResult(NamedTuple):
    labels: jax.Array     # (n,) int32
    centers: jax.Array    # (k, d) float32
    inertia: jax.Array    # () float32


def _sq_dists(X: jax.Array, C: jax.Array) -> jax.Array:
    """(n, k) squared euclidean distances via one MXU matmul.

    HIGHEST precision: XLA:TPU would otherwise run the f32 dot at bf16
    (~4e-3 relative), flipping borderline assignments vs the sklearn-parity
    CPU oracle (see the ops/eigen.py TPU-numerics note). These matmuls are
    tiny (k <= ~30 columns)."""
    xn = jnp.sum(X * X, axis=1, keepdims=True)
    cn = jnp.sum(C * C, axis=1)
    return xn + cn[None, :] - 2.0 * jnp.dot(
        X, C.T, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _kmeanspp_init(key: jax.Array, X: jax.Array, k: int,
                   mask: Optional[jax.Array]) -> jax.Array:
    """k-means++ seeding (D^2-weighted sampling), fixed-key deterministic."""
    n = X.shape[0]
    valid = jnp.ones(n, bool) if mask is None else mask.astype(bool)
    keys = jax.random.split(key, k)

    probs0 = valid.astype(jnp.float32)
    first = jax.random.categorical(keys[0], jnp.log(probs0 + 1e-30))
    centers0 = jnp.zeros((k, X.shape[1]), X.dtype).at[0].set(X[first])
    mind0 = jnp.where(valid, jnp.sum((X - X[first]) ** 2, axis=1), 0.0)

    def body(i, carry):
        centers, mind = carry
        logits = jnp.log(jnp.where(valid, mind, 0.0) + 1e-30)
        idx = jax.random.categorical(keys[i], logits)
        c = X[idx]
        centers = centers.at[i].set(c)
        d = jnp.where(valid, jnp.sum((X - c) ** 2, axis=1), 0.0)
        return centers, jnp.minimum(mind, d)

    centers, _ = jax.lax.fori_loop(1, k, body, (centers0, mind0))
    return centers


def _lloyd(X: jax.Array, centers: jax.Array, max_iter: int,
           mask: Optional[jax.Array], tol: float) -> KMeansResult:
    n, d = X.shape
    k = centers.shape[0]
    valid = (jnp.ones(n, bool) if mask is None else mask.astype(bool))
    vf = valid.astype(jnp.float32)

    def step(carry):
        centers, _, it, _ = carry
        d2 = _sq_dists(X, centers)
        labels = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32) * vf[:, None]
        counts = jnp.sum(onehot, axis=0)
        sums = jnp.dot(onehot.T, X, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        new_centers = jnp.where(counts[:, None] > 0,
                                sums / jnp.maximum(counts[:, None], 1.0),
                                centers)
        shift = jnp.sum((new_centers - centers) ** 2)
        inertia = jnp.sum(jnp.min(d2, axis=1) * vf)
        return new_centers, labels, it + 1, jnp.array([shift, inertia])

    def cond(carry):
        _, _, it, stats = carry
        return (it < max_iter) & (stats[0] > tol)

    init = (centers, jnp.zeros(n, jnp.int32), jnp.array(0),
            jnp.array([jnp.inf, jnp.inf], jnp.float32))
    centers, labels, _, stats = jax.lax.while_loop(cond, step, init)
    # One final assignment against the converged centers.
    d2 = _sq_dists(X, centers)
    labels = jnp.argmin(d2, axis=1).astype(jnp.int32)
    inertia = jnp.sum(jnp.min(d2, axis=1) * vf)
    labels = jnp.where(valid, labels, -1)
    return KMeansResult(labels, centers, inertia)


@partial(jax.jit, static_argnames=("k", "n_init", "max_iter"))
def kmeans(
    X: jax.Array,
    k: int,
    key: jax.Array,
    *,
    n_init: int = 10,
    max_iter: int = 300,
    mask: Optional[jax.Array] = None,
    tol: float = 1e-8,
) -> KMeansResult:
    """Exact Lloyd k-means with k-means++ init, best of `n_init` restarts
    (sklearn KMeans defaults: n_init=10, max_iter=300)."""
    X = X.astype(jnp.float32)

    def one(run_key):
        c0 = _kmeanspp_init(run_key, X, k, mask)
        return _lloyd(X, c0, max_iter, mask, tol)

    results = jax.vmap(one)(jax.random.split(key, n_init))
    best = jnp.argmin(results.inertia)
    return KMeansResult(results.labels[best], results.centers[best],
                        results.inertia[best])


@partial(jax.jit, static_argnames=("dim",))
def pca(X: jax.Array, dim: int) -> jax.Array:
    """PCA projection to `dim` components (centered SVD), matching sklearn's
    `PCA(dim).fit_transform` up to per-component sign
    (reference: extract/extract.py:574-577)."""
    X = X.astype(jnp.float32)
    Xc = X - jnp.mean(X, axis=0, keepdims=True)
    # TPU svd is an expansion built on matmuls that run bf16 at DEFAULT
    # precision; pin for sklearn-parity singular vectors (tiny matrices).
    with jax.default_matmul_precision("highest"):
        U, S, Vt = jnp.linalg.svd(Xc, full_matrices=False)
    # Deterministic sign convention (svd_flip-style): largest-|.| entry of each
    # right singular vector is positive. Signs are a free choice of the
    # decomposition; downstream k-means is sign-invariant in effect.
    max_idx = jnp.argmax(jnp.abs(Vt), axis=1)
    signs = jnp.sign(Vt[jnp.arange(Vt.shape[0]), max_idx])
    return (U * S[None, :] * signs[None, :])[:, :dim]
