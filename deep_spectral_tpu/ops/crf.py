"""Dense CRF mean-field refinement, TPU-native.

Replaces SimpleCRF's C++ `denseCRF.densecrf(image, unary, (w1, alpha, beta, w2,
gamma, it))` (reference: extract/extract.py:688-710) with a pure-JAX mean-field
loop. The bilateral message passing has two regimes:

  * EXACT DENSE (the default at reference params): the guide image is
    box-downsampled by s ~ alpha/8 (the kernel's own spatial resolution), and
    the bilateral kernel K_ij = exp(-|dp|^2/2a^2 - |dI|^2/2b^2) over the
    n_lr = (H/s)*(W/s) low-res points is materialized ONCE per image; each
    mean-field iteration is then a single (n_lr, n_lr) @ (n_lr, C) MXU
    matmul followed by a joint-bilateral upsample back to full resolution.
    At 320x480/alpha=80 that is n_lr = 1536 — a trivial matmul — versus the
    5-D bilateral grid's per-iteration splat-scatter + five 3-tap blurs over
    a ~0.7M-cell grid that is >98% empty. Exact kernel values (no grid
    quantization, unit self-gain by construction), ~10x less HBM traffic.
  * BILATERAL GRID (fallback for n_lr > _DENSE_MAX_POINTS, i.e. small alpha
    on large images): splat -> separable 3-tap blur -> slice through a 5-D
    bilateral grid, the classical fast approximation to the permutohedral
    lattice. All steps are static-shape XLA ops; the slice runs at the splat
    resolution followed by the same joint-bilateral upsample.

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

import numpy as np

import jax
import jax.numpy as jnp

CRFParams = Tuple[float, float, float, float, float, float]
DEFAULT_CRF_PARAMS: CRFParams = (10.0, 80.0, 13.0, 3.0, 3.0, 5.0)

# Exact-dense regime bound: the (n_lr, n_lr) kernel is materialized once per
# image (f32), so cap its footprint (~268 MB at 8192). Above this the 5-D
# bilateral grid is the better trade (its cost scales with the grid, not
# n_lr^2). At the reference params (alpha=80) a 320x480 image has n_lr=1536.
_DENSE_MAX_POINTS = 8192

# Kernel construction is once-per-image and quality-facing; TPU runs default
# f32 dots as one bf16 pass (see ops/eigen.py TPU-numerics note), so pin the
# pairwise-distance matmul. The per-iteration message matmul stays default:
# ~4e-3 relative noise on message magnitudes cannot flip an argmax decision
# that the +-1 unit self-interaction term doesn't already dominate.
_EXACT = jax.lax.Precision.HIGHEST

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


def _jbu_upsample(M_lr: jax.Array, img_lr: jax.Array, image: jax.Array,
                  s: int, beta: float) -> jax.Array:
    """Joint-bilateral upsample of low-res messages to full resolution.

    Each full-res pixel blends its 4 low-res neighbors' messages weighted by
    bilinear distance x color similarity to the full-res guide. Neighbor
    indices are STATIC (numpy at trace time): each full-res row/col maps to a
    fixed pair of low-res rows/cols, so the 4 neighbor reads are axis-takes
    with constant indices (XLA lowers them to cheap row copies, not gathers).
    """
    return _jbu_apply(M_lr, _jbu_plan(img_lr, image, s, beta))


def _lowres_setup(image: jax.Array, alpha: float, beta: float):
    """Box-downsample the guide by s ~ alpha/8 (the kernel's own spatial
    resolution) and return (s, img_lr, (n_lr, 5) bilateral coordinates of the
    low-res cell centers in the original pixel frame)."""
    s = max(1, int(alpha / 8.0))
    img_lr = _box_downsample(image.astype(jnp.float32), s)
    hl, wl = img_lr.shape[:2]
    yy = (jax.lax.broadcasted_iota(jnp.float32, (hl, wl), 0) * s + (s - 1) / 2.0) \
        / alpha + 1.0
    xx = (jax.lax.broadcasted_iota(jnp.float32, (hl, wl), 1) * s + (s - 1) / 2.0) \
        / alpha + 1.0
    col = img_lr / beta + 1.0
    coords = jnp.stack([yy, xx, col[..., 0], col[..., 1], col[..., 2]],
                       axis=-1).reshape(-1, 5)
    return s, img_lr, coords


def _dense_kernel(coords: jax.Array) -> jax.Array:
    """Exact bilateral kernel K_ij = exp(-0.5 |f_i - f_j|^2) over (n, 5)
    (pos/alpha, col/beta) features — exactly the CRF's pairwise kernel at the
    aggregated points (the +1 grid margins cancel in differences). Image-only,
    so mean field builds it once per image, not per iteration."""
    sq = jnp.sum(coords * coords, axis=-1)
    d2 = jnp.maximum(
        sq[:, None] + sq[None, :] - 2.0 * jnp.dot(
            coords, coords.T, precision=_EXACT,
            preferred_element_type=jnp.float32), 0.0)
    return jnp.exp(-0.5 * d2)


def _jbu_plan(img_lr: jax.Array, image: jax.Array, s: int, beta: float):
    """Image-only part of the JBU: static neighbor indices + the 4 combined
    (color similarity x bilinear distance) weight maps, pre-normalized.
    Loop-invariant under mean field — dense_crf_from_probs hoists it out of
    the iteration instead of recomputing 4 exp maps per step."""
    H, W = image.shape[:2]
    hl, wl = img_lr.shape[:2]
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
    taps = []
    wsum = jnp.zeros((H, W), jnp.float32)
    for iy, wy in ((iy0, 1.0 - ry), (iy1, ry)):
        C_row = jnp.take(img_lr, iy, axis=0)
        for ix, wx in ((ix0, 1.0 - rx), (ix1, rx)):
            Cn = jnp.take(C_row, ix, axis=1)             # (H, W, 3)
            d2 = jnp.sum((img_f - Cn) ** 2, axis=-1)
            # color similarity x bilinear distance; the small floor keeps a
            # plain-bilinear fallback when no neighbor matches the pixel's
            # color (thin structures smaller than the splat box)
            w = (jnp.exp(-d2 * inv_2b2) + 1e-3) * (wy * wx)
            taps.append((iy, ix, w))
            wsum = wsum + w
    inv_wsum = 1.0 / jnp.maximum(wsum, 1e-20)
    return [(iy, ix, w * inv_wsum) for iy, ix, w in taps]


def _jbu_apply(M_lr: jax.Array, plan) -> jax.Array:
    """Apply a _jbu_plan to low-res messages: 4 static-index neighbor takes
    (XLA lowers them to row copies, not gathers) blended with the
    pre-normalized weights."""
    acc = None
    for iy, ix, w in plan:
        Mn = jnp.take(jnp.take(M_lr, iy, axis=0), ix, axis=1)
        term = Mn * w[..., None]
        acc = term if acc is None else acc + term
    return acc


@partial(jax.jit, static_argnames=("alpha", "beta"))
def bilateral_filter(values: jax.Array, image: jax.Array,
                     alpha: float, beta: float) -> jax.Array:
    """Bilateral filtering of per-pixel vectors (exact-dense or 5-D grid).

    values: (H, W, C) quantities to filter (mean-field marginals Q).
    image:  (H, W, 3) guide image, values in [0, 255].
    Kernel: exp(-|dp|^2/2alpha^2 - |dI|^2/2beta^2), normalized via a homogeneous
    ones-channel.

    Returns (average, density) where `average` is the kernel-weighted mean of
    `values` at each pixel and `density` is the kernel mass CALIBRATED to a
    unit-peak exact kernel (the raw grid mass divided by GRID_SELF_GAIN on
    the grid path; exact mass as-is on the dense path) — so
    `average * density` is the unnormalized mean-field message.

    Both paths aggregate pixels at the kernel's own spatial resolution first
    (box downsample by s ~ alpha/8; the kernel cannot distinguish pixels
    within a cell) and joint-bilaterally upsample the messages back (see
    _jbu_upsample). What differs is the middle:

      * n_lr <= _DENSE_MAX_POINTS: materialize the EXACT (n_lr, n_lr)
        bilateral kernel once; the filtering is one small MXU matmul. No
        grid quantization, unit self-gain by construction.
      * larger: SPLAT into the 5-D bilateral grid (one fused 8-color-corner
        scatter-add), separable [1,2,1] BLUR over the 5 grid dims, SLICE at
        the splat resolution (8 color-corner gathers over n_lr points;
        the full-res gather was ~2/3 of the CRF's device time on a v5e).
        (alpha < 16 keeps the exact full-res slice when n_lr is also too
        big for the dense path: the splat grid is already near full
        resolution.)
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
    # ---- common low-res aggregation ----
    s, img_lr, coords = _lowres_setup(image, alpha, beta)
    vals_lr = _box_downsample(
        jnp.concatenate([values, jnp.ones((H, W, 1), jnp.float32)], axis=-1), s)
    hl, wl = img_lr.shape[:2]
    n_lr = hl * wl

    if n_lr <= _DENSE_MAX_POINTS:
        # ---- exact dense kernel at the splat resolution ----
        Km = _dense_kernel(coords)
        # Each low-res point carries s^2 pixels of mass (matches the splat's
        # * s*s); the homogeneous channel makes column C_in the exact kernel
        # density. Default-precision matmul: see the _EXACT note at the top.
        M_lr = jnp.dot(Km, vals_lr.reshape(n_lr, C_in + 1) * float(s * s),
                       preferred_element_type=jnp.float32)
        if s == 1:
            out = M_lr
            filtered, density = out[:, :C], out[:, C_in:]
            return (filtered / jnp.maximum(density, 1e-20)).reshape(H, W, C), \
                density.reshape(H, W, 1)
        M_full = _jbu_upsample(M_lr.reshape(hl, wl, C_in + 1), img_lr, image,
                               s, beta)
        filtered, density = M_full[..., :C], M_full[..., C_in:]
        return filtered / jnp.maximum(density, 1e-20), density

    # ---- 5-D bilateral grid (n_lr too large to materialize the kernel) ----
    gy, gx, gc = _bilateral_grid_shape(H, W, alpha, beta)
    grid_shape = (gy, gx, gc, gc, gc)
    G = gy * gx * gc * gc * gc
    dims = jnp.asarray(grid_shape, jnp.int32)
    strides = jnp.asarray([gx * gc * gc * gc, gc * gc * gc, gc * gc, gc, 1],
                          jnp.int32)

    # ---- splat (low-res) ----
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
            density.reshape(H, W, 1) / GRID_SELF_GAIN

    # Low-res slice at the splat points' own coordinates (colors included),
    # then the shared joint-bilateral upsample to full res.
    M_lr = slice_at(coords).reshape(hl, wl, C_in + 1)
    M_full = _jbu_upsample(M_lr, img_lr, image, s, beta)
    filtered, density = M_full[..., :C], M_full[..., C_in:]
    return filtered / jnp.maximum(density, 1e-20), density / GRID_SELF_GAIN


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
    # The bilateral message's density is calibrated to a unit-peak exact
    # kernel (the dense path is exact; bilateral_filter's grid path divides
    # out its measured self-gain — see GRID_SELF_GAIN), commensurate with
    # the exact unit-peak spatial Gaussian of the w2 term.

    # Hoist the image-only (loop-invariant) work out of the mean-field loop:
    # the exact dense kernel and the JBU weight maps depend on the guide
    # image alone, so each iteration is just [box-downsample Q -> one
    # (n_lr, n_lr) matmul -> JBU blend -> spatial Gaussian -> softmax].
    s, img_lr, coords = _lowres_setup(img, alpha, beta)
    hl, wl = img_lr.shape[:2]
    n_lr = hl * wl
    dense = n_lr <= _DENSE_MAX_POINTS
    if dense:
        Km = _dense_kernel(coords) * float(s * s)
        plan = None if s == 1 else _jbu_plan(img_lr, img, s, beta)

    def bilat_message(Q):
        """Unnormalized bilateral message (kernel-weighted label mass)."""
        if not dense:  # grid fallback; calibrated density (see above)
            avg, density = bilateral_filter(Q, img, alpha, beta)
            return avg * density
        # Raw kernel sums need no homogeneous channel: the message IS the
        # unnormalized mass (avg * density in the old formulation — the JBU
        # weight normalization cancels out of that product).
        M_lr = jnp.dot(Km, _box_downsample(Q, s).reshape(n_lr, C),
                       preferred_element_type=jnp.float32)
        if s == 1:
            return M_lr.reshape(H, W, C)
        return _jbu_apply(M_lr.reshape(hl, wl, C), plan)

    def step(_, Q):
        # Bilateral (appearance) message, self-interaction removed.
        bilat = bilat_message(Q) - Q
        # Spatial (smoothness) message, exact unit-peak separable Gaussian.
        gauss = gaussian_filter_2d(Q, gamma) - Q
        msg = w1 * bilat + w2 * gauss
        # Potts compatibility: penalty for label l = sum_{m != l} msg_m.
        penalty = jnp.sum(msg, axis=-1, keepdims=True) - msg
        return jax.nn.softmax(-unary - penalty, axis=-1)

    Q = jax.lax.fori_loop(0, int(it), step, Q0)
    return jnp.argmax(Q, axis=-1).astype(jnp.int32)
