"""Dense CRF mean-field refinement, TPU-native.

Replaces SimpleCRF's C++ `denseCRF.densecrf(image, unary, (w1, alpha, beta, w2,
gamma, it))` (reference: extract/extract.py:688-710) with a pure-JAX mean-field
loop whose bilateral message passing runs through a 5-D bilateral grid
(splat -> separable 3-tap blur -> slice), the classical fast approximation to the
permutohedral lattice. All steps are static-shape XLA ops: the splat is an
8-color-corner scatter-add from a box-downsampled image, the blur is five
separable [1,2,1] convolutions, the slice an 8-color-corner gather at the splat
resolution followed by a dense joint-bilateral upsample — everything fuses and
runs on device.

Energy model (Krahenbuhl & Koltun dense CRF with Potts compatibility):
    E(x) = sum_i -log P(x_i)
         + sum_{i<j} mu(x_i, x_j) [ w1 exp(-|p_i-p_j|^2/2a^2 - |I_i-I_j|^2/2b^2)
                                  + w2 exp(-|p_i-p_j|^2/2g^2) ]
Defaults (w1=10, alpha=80, beta=13, w2=3, gamma=3, it=5) follow the reference's
CRF recipe (extract/extract.py:705-710).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

CRFParams = Tuple[float, float, float, float, float, float]
DEFAULT_CRF_PARAMS: CRFParams = (10.0, 80.0, 13.0, 3.0, 3.0, 5.0)

# Self-gain of the bilateral grid (splat -> unnormalized [1,2,1] blur -> slice)
# per unit of exact kernel mass. Analytic estimate: per-dim self response of
# the trilinear/blur chain is 2(1 - f + f^2), expectation 5/3, so (5/3)^5
# ~= 12.86 over the 5 grid dims. EMPIRICALLY CALIBRATED on piecewise-constant
# +noise images across (alpha, beta) in {(80,13),(16,13),(8,20)} and three
# image sizes (scripts/calibrate_crf_gain.py): median gain 14.4, mean 14.2
# (the blur also widens the kernel, which raises the realized gain above the
# analytic self-response). tests/test_crf.py asserts >= 95% label agreement
# with an exact O(N^2) mean-field oracle at this value.
GRID_SELF_GAIN = 14.2


def _gaussian_kernel_1d(sigma: float) -> jax.Array:
    radius = max(int(2.5 * sigma + 0.5), 1)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k


def _conv_axis(x: jax.Array, kernel: jax.Array, axis: int) -> jax.Array:
    """1-D convolution along `axis` of an N-D array (zero padding).

    Implemented as shifted-slice multiply-adds: the moveaxis+reshape+
    1-channel-conv formulation relayouts the whole array per axis, which
    profiled as most of the CRF's device time on a v5e (the 5-D grid blur
    runs this 5x per mean-field iteration). Slices along non-minor axes
    preserve layout and the taps fuse into one elementwise kernel."""
    r = (kernel.shape[0] - 1) // 2
    n = x.shape[axis]
    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[axis] = (r, r)
    xp = jnp.pad(x, pad_cfg)
    out = None
    for t in range(kernel.shape[0]):
        term = jax.lax.slice_in_dim(xp, t, t + n, axis=axis) * kernel[t]
        out = term if out is None else out + term
    return out


def gaussian_filter_2d(x: jax.Array, sigma: float) -> jax.Array:
    """Separable unnormalized Gaussian filter over the two leading spatial dims of
    (H, W, C) — the CRF's smoothness kernel (std gamma)."""
    k = _gaussian_kernel_1d(sigma)
    x = _conv_axis(x, k, 0)
    x = _conv_axis(x, k, 1)
    return x


def _bilateral_grid_shape(H: int, W: int, alpha: float, beta: float):
    gy = int(H / alpha) + 3
    gx = int(W / alpha) + 3
    gc = int(255.0 / beta) + 3
    return gy, gx, gc


def _grid_coords(image: jax.Array, alpha: float, beta: float) -> jax.Array:
    """(H, W, 5) continuous bilateral-grid coordinates (+1 cell margin)."""
    H, W = image.shape[:2]
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) / alpha + 1.0
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) / alpha + 1.0
    col = image.astype(jnp.float32) / beta + 1.0
    return jnp.stack([yy, xx, col[..., 0], col[..., 1], col[..., 2]], axis=-1)


def _box_downsample(x: jax.Array, s: int) -> jax.Array:
    """Mean-pool (H, W, C) by factor s (pads bottom/right by edge replication)."""
    if s == 1:
        return x
    H, W, C = x.shape
    Hp, Wp = -(-H // s) * s, -(-W // s) * s
    x = jnp.pad(x, ((0, Hp - H), (0, Wp - W), (0, 0)), mode="edge")
    return x.reshape(Hp // s, s, Wp // s, s, C).mean(axis=(1, 3))


@partial(jax.jit, static_argnames=("alpha", "beta"))
def bilateral_filter(values: jax.Array, image: jax.Array,
                     alpha: float, beta: float) -> jax.Array:
    """Approximate bilateral filtering of per-pixel vectors through a 5-D grid.

    values: (H, W, C) quantities to filter (mean-field marginals Q).
    image:  (H, W, 3) guide image, values in [0, 255].
    Kernel: exp(-|dp|^2/2alpha^2 - |dI|^2/2beta^2), normalized via a homogeneous
    ones-channel.

    Fast formulation: SPLAT from a box-downsampled image (factor ~ alpha/8 —
    the grid's spatial resolution is alpha, so pre-aggregating pixels that land
    in the same cell neighborhood loses nothing), one fused scatter-add for all
    32 trilinear corners; separable [1,2,1] BLUR over the 5 grid dims; SLICE at
    the SPLAT resolution (8 color-corner gathers over n_lr points instead of
    H*W — the full-res gather was ~2/3 of the CRF's device time on a v5e),
    then JOINT-BILATERAL UPSAMPLE to full resolution: each pixel blends its
    4 low-res neighbors' messages weighted by bilinear distance x color
    similarity to the full-res guide. The neighbor access pattern is a
    static-index nearest upsample, so the upsample is pure dense VPU work —
    no full-resolution gathers remain. (alpha < 16 keeps the exact full-res
    slice: the splat grid is already near full resolution.)
    """
    H, W, C = values.shape
    # Pad the channel dim so (C + homogeneous 1) is a multiple of 8: every
    # grid tensor's minor dim is C+1, and a 7-wide minor dim made XLA relayout
    # the (G, C+1) <-> 5-D blur views on every mean-field iteration (~28 ms of
    # reshape/copy per 10-iteration CRF at 320x480 on a v5e). Zero channels
    # pass through the linear filter exactly (they stay zero) and are sliced
    # off below.
    C_pad = (-(C + 1) % 8)
    if C_pad:
        values = jnp.concatenate(
            [values, jnp.zeros((H, W, C_pad), values.dtype)], axis=-1)
    C_in = C + C_pad
    gy, gx, gc = _bilateral_grid_shape(H, W, alpha, beta)
    grid_shape = (gy, gx, gc, gc, gc)
    G = gy * gx * gc * gc * gc
    dims = jnp.asarray(grid_shape, jnp.int32)
    strides = jnp.asarray([gx * gc * gc * gc, gc * gc * gc, gc * gc, gc, 1],
                          jnp.int32)

    # ---- splat (low-res) ----
    s = max(1, int(alpha / 8.0))
    img_lr = _box_downsample(image.astype(jnp.float32), s)
    vals_lr = _box_downsample(
        jnp.concatenate([values, jnp.ones((H, W, 1), jnp.float32)], axis=-1), s)
    hl, wl = img_lr.shape[:2]
    # Coordinates of low-res cell centers in the ORIGINAL pixel frame.
    yy = (jax.lax.broadcasted_iota(jnp.float32, (hl, wl), 0) * s + (s - 1) / 2.0) \
        / alpha + 1.0
    xx = (jax.lax.broadcasted_iota(jnp.float32, (hl, wl), 1) * s + (s - 1) / 2.0) \
        / alpha + 1.0
    col = img_lr / beta + 1.0
    coords = jnp.stack([yy, xx, col[..., 0], col[..., 1], col[..., 2]],
                       axis=-1).reshape(-1, 5)
    n_lr = hl * wl
    # Trilinear in the 3 color dims, spatial rounded to nearest — mirroring
    # the slice's approximation (spatial cells are alpha wide and both ends of
    # the transform smooth spatially; color placement is the signal). 8
    # scatter corners instead of the 32-corner quintilinear: the fused
    # scatter-add was the largest single op of the CRF step on a v5e
    # (2.0 ms/iter of 7.3), and scatter cost scales with update count.
    sp_idx = jnp.clip(jnp.round(coords[:, :2]).astype(jnp.int32), 0,
                      dims[None, :2] - 1)
    sp_flat = jnp.sum(sp_idx * strides[None, :2], axis=1)       # (n_lr,)
    lo_c = jnp.floor(coords[:, 2:])
    frac_c = coords[:, 2:] - lo_c
    lo_c = lo_c.astype(jnp.int32)
    c_offs = jnp.asarray([[(c >> 2) & 1, (c >> 1) & 1, c & 1]
                          for c in range(8)], jnp.int32)        # (8, 3)
    c_idx = jnp.clip(lo_c[None] + c_offs[:, None, :], 0,
                     dims[None, None, 2:] - 1)
    flat = sp_flat[None] + jnp.sum(c_idx * strides[None, None, 2:], axis=-1)
    w = jnp.prod(jnp.where(c_offs[:, None, :] == 1, frac_c[None],
                           1.0 - frac_c[None]), axis=-1)        # (8, n_lr)
    updates = (vals_lr.reshape(1, n_lr, C_in + 1) * w[..., None] *
               float(s * s)).reshape(8 * n_lr, C_in + 1)
    grid = jnp.zeros((G, C_in + 1), jnp.float32).at[flat.reshape(-1)].add(updates)

    # ---- blur: separable 3-tap [1, 2, 1] along each of the 5 grid dims ----
    g5 = grid.reshape(*grid_shape, C_in + 1)
    k = jnp.asarray([1.0, 2.0, 1.0], jnp.float32)
    for axis in range(5):
        g5 = _conv_axis(g5, k, axis)
    grid = g5.reshape(G, C_in + 1)

    # ---- slice ----
    # Trilinear in the 3 color dims (the boundary-sharpening signal), bilinear
    # spatial rounded to nearest: 8 gathers instead of the 32-corner
    # quintilinear. Spatial cells are alpha (80px) wide and the message field
    # is smooth at that scale, so spatial-nearest costs little; color
    # interpolation is what distinguishes labels across an edge.
    def slice_at(coords_pts):
        n = coords_pts.shape[0]
        sp_idx = jnp.clip(jnp.round(coords_pts[:, :2]).astype(jnp.int32), 0,
                          dims[None, :2] - 1)
        sp_flat = jnp.sum(sp_idx * strides[None, :2], axis=1)
        lo_c = jnp.floor(coords_pts[:, 2:])
        frac_c = coords_pts[:, 2:] - lo_c
        lo_c = lo_c.astype(jnp.int32)
        out = jnp.zeros((n, C_in + 1), jnp.float32)
        for corner in range(8):
            o = jnp.asarray([(corner >> 2) & 1, (corner >> 1) & 1, corner & 1],
                            jnp.int32)
            c_idx = jnp.clip(lo_c + o[None, :], 0, dims[None, 2:] - 1)
            idx = sp_flat + jnp.sum(c_idx * strides[None, 2:], axis=1)
            wc = jnp.prod(jnp.where(o[None, :] == 1, frac_c, 1.0 - frac_c),
                          axis=1)
            out = out + grid[idx] * wc[:, None]
        return out

    if s == 1:
        out = slice_at(_grid_coords(image, alpha, beta).reshape(-1, 5))
        filtered, density = out[:, :C], out[:, C_in:]
        return (filtered / jnp.maximum(density, 1e-20)).reshape(H, W, C), \
            density.reshape(H, W, 1)

    # Low-res slice at the splat points' own coordinates (colors included) ...
    M_lr = slice_at(coords).reshape(hl, wl, C_in + 1)

    # ... then joint-bilateral upsample to full res. Neighbor indices are
    # STATIC (numpy at trace time): each full-res row/col maps to a fixed
    # pair of low-res rows/cols, so the 4 neighbor reads are axis-takes with
    # constant indices (XLA lowers them to cheap row copies, not gathers).
    import numpy as np
    c0 = (s - 1) / 2.0
    ty = np.clip((np.arange(H) - c0) / s, 0, hl - 1)
    tx = np.clip((np.arange(W) - c0) / s, 0, wl - 1)
    iy0 = np.floor(ty).astype(np.int32)
    ix0 = np.floor(tx).astype(np.int32)
    iy1 = np.minimum(iy0 + 1, hl - 1)
    ix1 = np.minimum(ix0 + 1, wl - 1)
    ry = jnp.asarray((ty - iy0)[:, None], jnp.float32)   # (H, 1)
    rx = jnp.asarray((tx - ix0)[None, :], jnp.float32)   # (1, W)
    img_f = image.astype(jnp.float32)
    inv_2b2 = 1.0 / (2.0 * beta * beta)
    acc = jnp.zeros((H, W, C_in + 1), jnp.float32)
    wsum = jnp.zeros((H, W), jnp.float32)
    for a, iy, wy in ((0, iy0, 1.0 - ry), (1, iy1, ry)):
        M_row = jnp.take(M_lr, iy, axis=0)
        C_row = jnp.take(img_lr, iy, axis=0)
        for b, ix, wx in ((0, ix0, 1.0 - rx), (1, ix1, rx)):
            Mn = jnp.take(M_row, ix, axis=1)             # (H, W, C_in+1)
            Cn = jnp.take(C_row, ix, axis=1)             # (H, W, 3)
            d2 = jnp.sum((img_f - Cn) ** 2, axis=-1)
            # color similarity x bilinear distance; the small floor keeps a
            # plain-bilinear fallback when no neighbor matches the pixel's
            # color (thin structures smaller than the splat box)
            w = (jnp.exp(-d2 * inv_2b2) + 1e-3) * (wy * wx)
            acc = acc + Mn * w[..., None]
            wsum = wsum + w
    M_full = acc / jnp.maximum(wsum, 1e-20)[..., None]
    filtered, density = M_full[..., :C], M_full[..., C_in:]
    return filtered / jnp.maximum(density, 1e-20), density


@partial(jax.jit, static_argnames=("num_classes", "params", "gt_prob"))
def dense_crf(image: jax.Array, segmap: jax.Array, *, num_classes: int,
              params: CRFParams = DEFAULT_CRF_PARAMS,
              gt_prob: float = 0.7) -> jax.Array:
    """Refine a hard segmentation with dense-CRF mean field.

    image:  (H, W, 3) uint8/float RGB in [0, 255].
    segmap: (H, W) int initial labels (the upsampled patch segmap,
            reference: extract/extract.py:679-690).
    Hard labels are softened to `gt_prob` for the labeled class and
    (1-gt_prob)/(C-1) elsewhere (pydensecrf's `unary_from_labels` convention) —
    with exact one-hot unaries the -log gap exceeds any normalized pairwise
    message and mean field cannot move any pixel.
    Returns (H, W) int32 refined labels.
    """
    onehot = jax.nn.one_hot(segmap.astype(jnp.int32), num_classes, dtype=jnp.float32)
    other = (1.0 - gt_prob) / max(num_classes - 1, 1)
    probs = onehot * gt_prob + (1.0 - onehot) * other
    return dense_crf_from_probs(image, probs, params=params)


@partial(jax.jit, static_argnames=("params",))
def dense_crf_from_probs(image: jax.Array, probs: jax.Array, *,
                         params: CRFParams = DEFAULT_CRF_PARAMS) -> jax.Array:
    """Mean-field dense CRF from soft unary probabilities (H, W, C)."""
    w1, alpha, beta, w2, gamma, it = params
    H, W, C = probs.shape
    img = image.astype(jnp.float32)

    unary = -jnp.log(jnp.clip(probs, 1e-8, 1.0))
    Q0 = jax.nn.softmax(-unary, axis=-1)

    # Krahenbuhl-style mean field uses UNNORMALIZED kernel sums: a pixel's
    # message is the total kernel-weighted label mass of its (spatial x color)
    # neighborhood — typically hundreds of units, so the pairwise term drives
    # the dynamics and the unary acts mainly through the initialization.
    # Dividing the grid sum by its measured self-gain calibrates it to a
    # unit-peak Gaussian kernel, commensurate with the exact unit-peak spatial
    # Gaussian of the w2 term (see GRID_SELF_GAIN above for the calibration).
    K0 = GRID_SELF_GAIN

    def step(_, Q):
        # Bilateral (appearance) message: unnormalized kernel-weighted label
        # mass, self-interaction removed.
        bilat_avg, density = bilateral_filter(Q, img, alpha, beta)
        bilat = bilat_avg * density / K0 - Q
        # Spatial (smoothness) message, exact unit-peak separable Gaussian.
        gauss = gaussian_filter_2d(Q, gamma) - Q
        msg = w1 * bilat + w2 * gauss
        # Potts compatibility: penalty for label l = sum_{m != l} msg_m.
        penalty = jnp.sum(msg, axis=-1, keepdims=True) - msg
        return jax.nn.softmax(-unary - penalty, axis=-1)

    Q = jax.lax.fori_loop(0, int(it), step, Q0)
    return jnp.argmax(Q, axis=-1).astype(jnp.int32)
