"""Resize kernels with exact torch/cv2 index semantics.

The reference mixes three resize conventions that all affect parity:
  * `F.interpolate(mode='bilinear', align_corners=False)` for feature upsampling
    (reference: extract/extract.py:184-188) — half-pixel centers, no antialias;
  * `F.interpolate(mode='bicubic')` for DINO positional-embedding interpolation
    (torch cubic kernel, a = -0.75);
  * `cv2.resize(interpolation=INTER_NEAREST)` for segmap up/downsampling
    (reference: extract/extract.py:679-680) — src = floor(dst * in/out).

`jax.image.resize` differs from all three in edge cases (antialiasing on
downsample, Keys a=-0.5 cubic, round-half nearest), so we implement them as
explicit gather kernels. All are jit/vmap-friendly and operate on (..., H, W, C)
or (..., H, W) arrays over the trailing spatial dims given by `axis` convention:
spatial dims are the LAST TWO unless the array has a trailing channel dim, in
which case pass `channels_last=True`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _half_pixel_sources(out_size: int, in_size: int, dtype=jnp.float32) -> jax.Array:
    """torch align_corners=False source coordinates: (i + 0.5) * in/out - 0.5."""
    scale = in_size / out_size
    i = jnp.arange(out_size, dtype=dtype)
    return (i + 0.5) * scale - 0.5


def _linear_weights(out_size: int, in_size: int):
    src = _half_pixel_sources(out_size, in_size)
    i0 = jnp.clip(jnp.floor(src), 0, in_size - 1).astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    frac = jnp.clip(src - jnp.floor(src), 0.0, 1.0)
    # At the clamped left edge src < 0 => torch clamps the coordinate (uses x0 twice
    # with weight from the unclamped fraction); replicate by clamping frac via src.
    frac = jnp.where(src < 0, 0.0, frac)
    frac = jnp.where(src > in_size - 1, 1.0, frac)
    return i0, i1, frac


def _resize_axis_linear(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    i0, i1, frac = _linear_weights(out_size, in_size)
    x0 = jnp.take(x, i0, axis=axis)
    x1 = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = frac.reshape(shape)
    return x0 * (1.0 - w) + x1 * w


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int], *, channels_last: bool = True) -> jax.Array:
    """Separable bilinear resize matching F.interpolate(align_corners=False).

    x: (..., H, W, C) if channels_last else (..., H, W).
    """
    h_axis = x.ndim - 3 if channels_last else x.ndim - 2
    w_axis = h_axis + 1
    x = _resize_axis_linear(x.astype(jnp.float32), out_hw[0], h_axis)
    x = _resize_axis_linear(x, out_hw[1], w_axis)
    return x


def _linear_resize_matrix(out_size: int, in_size: int) -> jax.Array:
    """(out_size, in_size) f32 interpolation matrix R with R @ x ==
    _resize_axis_linear(x): two nonzeros per row ((1-frac) at i0, frac at i1,
    summed when i0 == i1 at clamped edges)."""
    i0, i1, frac = _linear_weights(out_size, in_size)
    rows = jnp.arange(out_size)
    R = jnp.zeros((out_size, in_size), jnp.float32)
    R = R.at[rows, i0].add(1.0 - frac)
    R = R.at[rows, i1].add(frac)
    return R


def resize_bilinear_mm(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear upsample as two MXU matmuls: einsum(R_h, einsum(R_w, x)).

    Numerically ~equal to `resize_bilinear` (exactly equal where the matmul
    is true f32; on TPU HIGHEST-precision is ~1e-7 relative) but a far
    better TPU program for LARGE channel-last tensors under autodiff: the
    gather formulation materializes layout-transposed intermediates — on the
    b96 crop224 train step the two (224,96,224,21) copies alone cost
    3.3 ms/step (scripts/profile_train_step.py --top-ops, r5d session) —
    while the matmul form writes the upsampled tensor once and its
    transpose (the backward pass) is again a matmul. FLOPs are negligible
    (2*H_out*H_in*B*W*C ~ 3 GFLOP vs the step's 1207). Use for the
    TRAIN-TIME logits upsample; keep `resize_bilinear` for torch-bit-exact
    inference/pipeline paths.

    x: (B, H, W, C) -> (B, out_h, out_w, C).
    """
    B, H, W, C = x.shape
    out_h, out_w = out_hw
    x = x.astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST  # r3 trap: default f32 dot = one bf16 pass
    if W != out_w:
        Rw = _linear_resize_matrix(out_w, W)
        x = jnp.einsum("Ww,bhwc->bhWc", Rw, x, precision=hp)
    if H != out_h:
        Rh = _linear_resize_matrix(out_h, H)
        x = jnp.einsum("Hh,bhWc->bHWc", Rh, x, precision=hp)
    return x


def _cubic_kernel(t: jax.Array, a: float = -0.75) -> jax.Array:
    """torch's bicubic convolution kernel (a = -0.75)."""
    at = jnp.abs(t)
    at2, at3 = at * at, at * at * at
    w1 = (a + 2) * at3 - (a + 3) * at2 + 1
    w2 = a * at3 - 5 * a * at2 + 8 * a * at - 4 * a
    return jnp.where(at <= 1, w1, jnp.where(at < 2, w2, 0.0))


def _resize_axis_cubic(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    src = _half_pixel_sources(out_size, in_size)
    base = jnp.floor(src).astype(jnp.int32)
    out = None
    for tap in range(-1, 3):
        idx = jnp.clip(base + tap, 0, in_size - 1)
        w = _cubic_kernel(src - (base + tap).astype(src.dtype))
        shape = [1] * x.ndim
        shape[axis] = out_size
        contrib = jnp.take(x, idx, axis=axis) * w.reshape(shape)
        out = contrib if out is None else out + contrib
    return out


def resize_bicubic(x: jax.Array, out_hw: tuple[int, int], *, channels_last: bool = True) -> jax.Array:
    """Separable bicubic resize matching F.interpolate(mode='bicubic',
    align_corners=False) with torch's a=-0.75 kernel (used for DINO pos-embed
    interpolation at non-224 input sizes)."""
    h_axis = x.ndim - 3 if channels_last else x.ndim - 2
    w_axis = h_axis + 1
    x = _resize_axis_cubic(x.astype(jnp.float32), out_hw[0], h_axis)
    x = _resize_axis_cubic(x, out_hw[1], w_axis)
    return x


def resize_nearest(x: jax.Array, out_hw: tuple[int, int], *, channels_last: bool = False) -> jax.Array:
    """Nearest-neighbor resize with cv2 INTER_NEAREST semantics:
    src = floor(dst * in/out) (reference: extract/extract.py:679-680)."""
    h_axis = x.ndim - 3 if channels_last else x.ndim - 2
    w_axis = h_axis + 1
    H_in, W_in = x.shape[h_axis], x.shape[w_axis]
    H_out, W_out = out_hw
    iy = jnp.floor(jnp.arange(H_out) * (H_in / H_out)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(W_out) * (W_in / W_out)).astype(jnp.int32)
    x = jnp.take(x, jnp.clip(iy, 0, H_in - 1), axis=h_axis)
    x = jnp.take(x, jnp.clip(ix, 0, W_in - 1), axis=w_axis)
    return x
