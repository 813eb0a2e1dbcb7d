"""Binary morphology and connected-component labeling on patch grids, in JAX.

Replaces the reference's skimage/scipy native routines:
  * binary erosion/dilation with the default cross footprint
    (reference: extract/extract_utils.py:115-121) — here 3x3 min/max windows via
    `lax.reduce_window`;
  * connected-component labeling (skimage measure_label, 8-connectivity, at
    extract_utils.py:107-112 / object_discovery.py:280-287; scipy.ndimage.label,
    4-connectivity, at object_discovery.py:196) — here iterative min-label
    propagation to a fixpoint with `lax.while_loop`. Patch grids are small
    (<= ~8k nodes), so propagation converges in O(grid diameter) cheap steps and
    the whole thing stays on device and vmappable.

A C++ host fallback (two-pass union-find) lives in `native/` for very large
full-resolution masks.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _erode_dilate_once(mask: jax.Array, erode: bool) -> jax.Array:
    """One step with the cross (connectivity-1) structuring element — the default
    footprint of skimage.morphology.binary_erosion/dilation."""
    m = mask.astype(jnp.float32)
    if erode:
        # min over the cross: pad with 1s so borders follow skimage (pad=True edge
        # handling: erosion treats outside as 1? scipy's default border_value=0 for
        # erosion shrinks at borders; skimage binary_erosion pads with 1 so borders
        # are preserved unless a 0 is inside the footprint).
        padded = jnp.pad(m, 1, constant_values=1.0)
    else:
        padded = jnp.pad(m, 1, constant_values=0.0)
    c = padded[1:-1, 1:-1]
    up = padded[:-2, 1:-1]
    down = padded[2:, 1:-1]
    left = padded[1:-1, :-2]
    right = padded[1:-1, 2:]
    stack = jnp.stack([c, up, down, left, right])
    out = jnp.min(stack, 0) if erode else jnp.max(stack, 0)
    return out.astype(bool)


def binary_erode(mask: jax.Array, iterations: int = 1) -> jax.Array:
    for _ in range(iterations):
        mask = _erode_dilate_once(mask, erode=True)
    return mask


def binary_dilate(mask: jax.Array, iterations: int = 1) -> jax.Array:
    for _ in range(iterations):
        mask = _erode_dilate_once(mask, erode=False)
    return mask


def erode_or_dilate_mask(mask: jax.Array, r: int, erode: bool = True) -> jax.Array:
    """r applications, each skipped if it would empty the mask — the reference's
    "do not erode the entire mask away" guard (extract/extract_utils.py:115-121)."""
    def body(_, m):
        new = _erode_dilate_once(m, erode)
        keep_new = jnp.sum(new) > 0
        return jnp.where(keep_new, new, m)
    if r == 0:
        return mask
    return jax.lax.fori_loop(0, r, body, mask.astype(bool))


@partial(jax.jit, static_argnames=("connectivity",))
def label_components(mask: jax.Array, connectivity: int = 2) -> jax.Array:
    """Connected-component labels of a 2-D boolean mask.

    connectivity=1 -> 4-neighborhood (scipy.ndimage.label default);
    connectivity=2 -> 8-neighborhood (skimage measure_label default).
    Returns int32 labels with 0 = background; positive labels are NOT guaranteed
    to be consecutive (use `largest_component`/`relabel_consecutive` downstream).
    """
    h, w = mask.shape
    m = mask.astype(bool)
    n = h * w
    # Unique seed label per pixel (1-based), background = big sentinel.
    seeds = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
             + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + 1)
    BIG = jnp.int32(n + 2)
    labels0 = jnp.where(m, seeds, BIG)

    shifts = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    if connectivity == 2:
        shifts += [(1, 1), (1, -1), (-1, 1), (-1, -1)]

    def propagate(labels):
        out = labels
        for dy, dx in shifts:
            shifted = jnp.roll(labels, (dy, dx), axis=(0, 1))
            # roll wraps around; mask out wrapped rows/cols
            if dy == 1:
                shifted = shifted.at[0, :].set(BIG)
            elif dy == -1:
                shifted = shifted.at[-1, :].set(BIG)
            if dx == 1:
                shifted = shifted.at[:, 0].set(BIG)
            elif dx == -1:
                shifted = shifted.at[:, -1].set(BIG)
            out = jnp.minimum(out, shifted)
        return jnp.where(m, out, BIG)

    def cond(carry):
        labels, changed = carry
        return changed

    def body(carry):
        labels, _ = carry
        new = propagate(labels)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.array(True)))
    return jnp.where(m, labels, 0).astype(jnp.int32)


def component_sizes(labels: jax.Array, max_labels: int) -> jax.Array:
    """Histogram of component sizes over label ids [0, max_labels)."""
    flat = labels.reshape(-1)
    return jnp.zeros(max_labels, jnp.int32).at[jnp.clip(flat, 0, max_labels - 1)].add(
        jnp.ones_like(flat, jnp.int32))


@jax.jit
def largest_component(mask: jax.Array) -> jax.Array:
    """Boolean mask of the largest 8-connected component
    (reference: extract/extract_utils.py:107-112)."""
    labels = label_components(mask, connectivity=2)
    h, w = mask.shape
    n = h * w
    sizes = jnp.zeros(n + 2, jnp.int32).at[labels.reshape(-1)].add(1)
    sizes = sizes.at[0].set(0)  # exclude background
    best = jnp.argmax(sizes)
    return (labels == best) & mask.astype(bool)


@jax.jit
def largest_component_bbox(mask: jax.Array) -> jax.Array:
    """[xmin, ymin, xmax, ymax] of the largest 8-connected component, exclusive
    max (+1), int32 (reference: object-localization/object_discovery.py:280-287).
    Returns zeros if the mask is empty."""
    cc = largest_component(mask)
    return mask_bbox(cc)


@jax.jit
def mask_bbox(mask: jax.Array) -> jax.Array:
    """[xmin, ymin, xmax, ymax] with exclusive max of a boolean mask; zeros if empty."""
    h, w = mask.shape
    m = mask.astype(bool)
    any_row = jnp.any(m, axis=1)
    any_col = jnp.any(m, axis=0)
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    ymin = jnp.min(jnp.where(any_row, rows, h))
    ymax = jnp.max(jnp.where(any_row, rows, -1)) + 1
    xmin = jnp.min(jnp.where(any_col, cols, w))
    xmax = jnp.max(jnp.where(any_col, cols, -1)) + 1
    empty = ~jnp.any(m)
    box = jnp.array([xmin, ymin, xmax, ymax], jnp.int32)
    return jnp.where(empty, jnp.zeros(4, jnp.int32), box)


def get_border_fraction(segmap: jax.Array, num_segments: int) -> Tuple[jax.Array, jax.Array]:
    """Per-segment fraction of border pixels (corners counted twice, like the
    reference's four 1-D borders — extract/extract_utils.py:124-135).

    Returns (counts (num_segments,), normalized fractions)."""
    h, w = segmap.shape
    border_vals = jnp.concatenate([
        segmap[:, 0], segmap[:, -1], segmap[0, :], segmap[-1, :]])
    counts = jnp.zeros(num_segments, jnp.int32).at[
        jnp.clip(border_vals, 0, num_segments - 1)].add(1)
    denom = 2 * (h + w)
    return counts, counts.astype(jnp.float32) / denom


@partial(jax.jit, static_argnames=("num_segments",))
def infer_background_swap(segmap: jax.Array, num_segments: int) -> jax.Array:
    """Relabel so the segment with the most border pixels becomes 0, swapping
    labels with the old 0 (reference: extract/extract.py:342-348)."""
    _, frac = get_border_fraction(segmap, num_segments)
    bg = jnp.argmax(frac)
    out = jnp.where(segmap == bg, 0, segmap)
    out = jnp.where(segmap == 0, bg, out)
    return out
