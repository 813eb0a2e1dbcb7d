"""Affinity-graph construction kernels (pure JAX, jit/vmap-friendly).

Three affinity families, mirroring the reference's graph construction:

  * `feature_affinity` — dense semantic affinity from L2-normalized ViT patch
    features, thresholded at zero and max-normalized
    (reference: extract/extract.py:146-148, :191-194).
  * `knn_affinity` — pixel color+position KNN graph. The reference uses a kd-tree
    (pymatting) and scatters into a sparse CSR matrix
    (reference: extract/extract_utils.py:151-188) which it immediately densifies
    (reference: extract/extract.py:213). On TPU we compute the exact same graph with
    a brute-force pairwise-distance `top_k` (n = H_lr*W_lr is ~1-4k, so the (n, n)
    distance matrix is a single MXU-friendly matmul) and scatter into a dense (n, n)
    matrix directly. Entry values match the reference's duplicate-summing CSR
    construction exactly: W[a, b] = (#knn-lists of a containing b) + (#knn-lists of
    b containing a), i.e. values in {0, 1, 2, 3, 4}.
  * `rw_affinity` — random-walk color affinity over a local window
    (reference: extract/extract_utils.py:191-204, via pymatting's rw Laplacian:
    w_ij = 1 - ||c_i - c_j|| / sigma clipped below at 0 ... see docstring).

All kernels accept an optional validity `mask` over nodes so images of different
sizes can be padded to a common bucket shape and batched with `vmap`: padded nodes
get zero affinity everywhere and therefore do not perturb the valid subgraph.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

# XLA:TPU runs f32 dots at DEFAULT precision as one bf16 pass (~4e-3 relative
# error). The reference builds these graphs in true f32, and a 4e-3 relative
# perturbation of W moves eigenvectors by ~||dW||/gap ~ 5e-2 on typical image
# graphs — below the >=0.999 parity bar. Pin graph construction to HIGHEST
# (the (N, N) matmul is a small share of pipeline FLOPs; see ops/eigen.py
# for the full TPU-numerics note).
_EXACT = jax.lax.Precision.HIGHEST


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Torch-style F.normalize(p=2): x / max(||x||, eps) (reference: extract/extract.py:148)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def feature_affinity(
    feats: jax.Array,
    *,
    normalize: bool = True,
    threshold_at_zero: bool = True,
    max_normalize: bool = True,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Dense semantic affinity W = relu(feats @ feats.T) / max(W).

    feats: (N, D) patch features. mask: optional (N,) bool validity.
    Matches reference: extract/extract.py:191-194 (laplacian branch) and :167-169
    (affinity branch, where max_normalize=False).
    """
    f = feats.astype(jnp.float32)
    if normalize:
        f = l2_normalize(f, axis=-1)
    if mask is not None:
        # Mask the FEATURES, not the Gram matrix: (m*f)(m*f)^T equals
        # (m m^T) * (f f^T) exactly, and relu commutes with the zero mask.
        # The feature pass is (N, D) and fuses into the dot's operand prep;
        # masking W afterward costs two full (N, N) broadcast-multiply
        # streams that XLA materializes separately (measured in the round-4
        # eigs-phase HLO dump — the dominant HBM traffic of the solve).
        f = f * mask.astype(f.dtype)[:, None]
    W = jnp.dot(f, f.T, precision=_EXACT, preferred_element_type=jnp.float32)
    if threshold_at_zero:
        W = jnp.maximum(W, 0.0)
    if max_normalize:
        W = W / jnp.maximum(jnp.max(W), 1e-12)
    return W


def degree_vector(W: jax.Array, threshold: float = 1e-12) -> jax.Array:
    """Row sums with the reference's divide-by-zero clamp: d[d < 1e-12] = 1
    (reference: extract/extract_utils.py:207-220)."""
    d = jnp.sum(W, axis=-1)
    return jnp.where(d < threshold, 1.0, d)


def _pixel_coord_features(h: int, w: int, distance_weight: float, dtype=jnp.float32):
    """The reference's 5-D KNN feature uses x = tile(linspace(0,1,w), h) and
    y = repeat(linspace(0,1,h), w) (reference: extract/extract_utils.py:165-166)."""
    x = jnp.tile(jnp.linspace(0.0, 1.0, w, dtype=dtype), (h, 1)).reshape(-1)
    y = jnp.repeat(jnp.linspace(0.0, 1.0, h, dtype=dtype), w)
    return distance_weight * x, distance_weight * y


def _knn_indices(f: jax.Array, k: int, valid: Optional[jax.Array]) -> jax.Array:
    """Exact k-nearest-neighbor indices under squared L2, self included.

    Brute force: one (n, n) matmul for the pairwise distances (MXU), then `top_k`.
    Equivalent to the reference's kd-tree KNN (exact nearest neighbors; kd-trees
    return the self-point as its own nearest neighbor, as does this).
    """
    sq = jnp.sum(f * f, axis=-1)
    # ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b ; monotone in the true distance.
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.dot(
        f, f.T, precision=_EXACT, preferred_element_type=jnp.float32)
    if valid is not None:
        big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
        d2 = jnp.where(valid[None, :], d2, big)
    _, idx = jax.lax.top_k(-d2, k)
    return idx


def knn_affinity(
    image_lr: jax.Array,
    n_neighbors: Sequence[int] = (20, 10),
    distance_weights: Sequence[float] = (2.0, 0.1),
    *,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Dense KNN color affinity over low-res pixels.

    image_lr: (h, w, 3) float image in [0, 1] (the reference bilinearly downsamples
    the RGB image to the patch grid first, extract/extract.py:202-204).
    mask: optional (h*w,) bool validity for bucketed batching.
    Returns W: (h*w, h*w) float32, symmetric, values in {0..2*len(n_neighbors)}.

    Reference: extract/extract_utils.py:151-188.
    """
    h, w = image_lr.shape[:2]
    n = h * w
    rgb = image_lr.reshape(n, 3).astype(jnp.float32)
    valid = None if mask is None else mask.astype(bool)

    W = jnp.zeros((n, n), dtype=jnp.float32)
    eye = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # row ids, (n, 1)
    for k, distance_weight in zip(n_neighbors, distance_weights):
        xw, yw = _pixel_coord_features(h, w, float(distance_weight))
        f = jnp.concatenate([rgb, xw[:, None], yw[:, None]], axis=1)
        if valid is not None:
            # Push invalid rows far away so they are never anyone's neighbor.
            f = jnp.where(valid[:, None], f, 1e6)
        idx = _knn_indices(f, int(k), valid)  # (n, k)
        # one-hot scatter: A[i, idx[i, j]] = 1  (neighbors within a list are unique)
        A = jnp.zeros((n, n), dtype=jnp.float32).at[eye, idx].set(1.0)
        if valid is not None:
            A = A * valid[:, None].astype(jnp.float32) * valid[None, :].astype(jnp.float32)
        W = W + A + A.T  # duplicate-summing CSR semantics (extract_utils.py:182-187)
    return W


def rw_affinity(
    image_lr: jax.Array,
    sigma: float = 0.033,
    radius: int = 1,
    *,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Dense random-walk color affinity, matching pymatting's `_rw_laplacian`.

    Semantics reproduced from pymatting/laplacian/rw_laplacian.py (the function
    the reference delegates to at extract/extract_utils.py:191-204):

      * for every pixel i and every offset (dy, dx) in the (2r+1)^2 window,
        the neighbor coordinate is CLAMPED into the image (not dropped), so
        border pixels contribute duplicate (i, j) and self (i, i) entries;
      * each entry's value is exp(-||c_i - c_j||^2 / (2*sigma^2));
      * the CSR constructor sums duplicates, so W[i, j] = w_ij * #{d : clamp(i+d) = j};
      * the result is NOT explicitly symmetrized (clamp counts happen to be
        mirror-symmetric, so W is symmetric anyway).

    With a validity `mask` (bucketed padding, valid region = top-left rectangle),
    neighbors are clamped to the VALID rectangle — reproducing what pymatting
    would compute on the unpadded image — and padded rows contribute nothing.
    """
    h, w = image_lr.shape[:2]
    n = h * w
    img = image_lr.astype(jnp.float32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    flat_idx = (rows * w + cols).reshape(-1)

    if mask is None:
        vh, vw = h, w
        valid2d = None
    else:
        m2 = mask.reshape(h, w)
        # Padding is bottom/right, so the valid region is [0, vh) x [0, vw).
        vh = jnp.sum(m2[:, 0].astype(jnp.int32))
        vw = jnp.sum(m2[0, :].astype(jnp.int32))
        valid2d = m2.astype(jnp.float32)

    W = jnp.zeros((n, n), dtype=jnp.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            ny = jnp.clip(rows + dy, 0, vh - 1)
            nx = jnp.clip(cols + dx, 0, vw - 1)
            neighbor = img[ny, nx]  # (h, w, 3)
            d2 = jnp.sum((img - neighbor) ** 2, axis=-1)
            wgt = jnp.exp(-d2 / (2.0 * sigma * sigma))
            if valid2d is not None:
                wgt = wgt * valid2d  # rows outside the valid region emit nothing
            nbr_idx = (ny * w + nx).reshape(-1)
            W = W.at[flat_idx, nbr_idx].add(wgt.reshape(-1))
    return W


@partial(jax.jit, static_argnames=("n_neighbors", "distance_weights"))
def knn_affinity_batched(
    images_lr: jax.Array,
    masks: Optional[jax.Array] = None,
    n_neighbors: tuple = (20, 10),
    distance_weights: tuple = (2.0, 0.1),
) -> jax.Array:
    """vmap of `knn_affinity` over a leading batch dim of same-bucket images."""
    fn = partial(knn_affinity, n_neighbors=n_neighbors, distance_weights=distance_weights)
    if masks is None:
        return jax.vmap(lambda im: fn(im))(images_lr)
    return jax.vmap(lambda im, m: fn(im, mask=m))(images_lr, masks)
