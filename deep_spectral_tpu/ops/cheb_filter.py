"""VMEM-resident Chebyshev filter chain — Pallas TPU kernel.

The Chebyshev eigensolver's hot loop (ops/eigen.py `_chebyshev_laplacian`)
applies a degree-d Chebyshev polynomial of the whitened affinity operator
A = I - S to a thin (N, m) block: d sequential matvecs T_{j+1} = 2*A'T_j -
T_{j-1} with A' = (A - c)/e. Under XLA each matvec is a separate dot that
streams the (N, N) operator from HBM, so the chain costs d full operator
reads per outer iteration — the dominant HBM traffic of the eigs phase
(CLAUDE.md: 68% HBM-bound fusions, streaming the operator 43x per solve).

This kernel keeps S resident in VMEM for the WHOLE chain: one HBM read of
the operator per outer iteration instead of d. With the raised scoped-VMEM
limit (see _VMEM_LIMIT_BYTES) it admits bf16 operators up to N ~ 3700 under
the measured compiler accounting; `fits_vmem` guards the caller and the
pipeline wraps the call in a compile-failure fallback to the XLA chain. The matvec itself runs
on the MXU with f32 accumulation over a bf16 operator — exactly the XLA
path's `A_mv_fast` semantics (ops/eigen.py), so the residual guard and
Rayleigh-Ritz quality contract are unchanged.

Replaces host ARPACK's repeated sparse matvecs (reference:
extract/extract.py:227-234) at the memory hierarchy level the TPU actually
has — there is no reference counterpart to cite for the kernel itself.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Scoped-VMEM accounting, measured on v5e (round-3 session log): at N=2025
# bf16 the Mosaic compiler reported a 25.78 MB scoped allocation against the
# raw 8.2 MB operator — i.e. ~3.25x the TILE-PADDED operator bytes (operand
# copies around the dot), plus a handful of f32 (N, 128)-padded thin blocks.
# The default scoped-VMEM limit is 16 MB, so the old "operator <= 12 MB"
# guard admitted shapes the compiler then rejected (hard compile error for
# 1600 < N <= 2048, squarely inside the auto-chebyshev regime). Fix, both
# sides: raise the kernel's scoped limit via CompilerParams (v5e has 128 MB
# VMEM/core) and model admission on the measured accounting.
_VMEM_LIMIT_BYTES = 110 * 1024 * 1024
_SCOPED_OPERATOR_FACTOR = 3.25  # measured 25.78 MB / 7.93 MB padded at N=2025


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def scoped_vmem_bytes(n: int, m: int = 8, dtype=jnp.bfloat16) -> int:
    """Estimate of the kernel's scoped-VMEM footprint for an (n, n) operator
    and an (n, m) block, per the measured v5e accounting above. Mosaic pads
    the second-minor dim to the sublane tile (16 for bf16, 8 for f32) and the
    minor dim to 128 lanes."""
    itemsize = jnp.dtype(dtype).itemsize
    sub = 16 if itemsize == 2 else 8
    op = _pad_to(n, sub) * _pad_to(n, 128) * itemsize
    # f32 thin blocks: X/T0/T1/T2 + dot output + bf16 cast of the operand,
    # all (n_pad, m_pad); stay generous (8 copies) — they are small.
    blocks = 8 * _pad_to(n, 8) * _pad_to(m, 128) * 4
    return int(_SCOPED_OPERATOR_FACTOR * op) + blocks


def fits_vmem(n: int, dtype=jnp.bfloat16, m: int = 8) -> bool:
    """Whether the (n, n) operator fits the kernel's raised scoped-VMEM limit
    under the measured compiler accounting (NOT just the raw operator bytes —
    that was the round-3 bug). Callers that pass this guard are still wrapped
    in a compile-failure fallback to the XLA chain (pipeline/extract.py,
    ops/eigen.laplacian_eigs callers), matching ARPACK's never-crash contract
    (reference: extract/extract.py:227-234)."""
    return scoped_vmem_bytes(n, m, dtype) <= _VMEM_LIMIT_BYTES


def _cheb_kernel(ce_ref, s_ref, x_ref, o_ref, *, degree):
    """T_degree((A - c)/e) @ x with A = I - s, s VMEM-resident.

    ce_ref: (1, 2) SMEM — [c, e] for this image.
    s_ref:  (N, N) operator (bf16 or f32), VMEM.
    x_ref:  (N, m) f32 start block, VMEM.
    o_ref:  (N, m) f32 output, VMEM.
    """
    c = ce_ref[0, 0]
    inv_e = 1.0 / ce_ref[0, 1]
    s = s_ref[...]
    x = x_ref[...]

    def a_shift(t):
        # ((I - s) t - c t) / e, f32 accumulation over the operator dtype.
        st = jnp.dot(s, t.astype(s.dtype),
                     preferred_element_type=jnp.float32)
        return ((1.0 - c) * t - st) * inv_e

    def rescale(t0, t1):
        # Joint per-column shrink: the recurrence is linear and per-column
        # independent, so scaling (T_{j-1}, T_j) of one column by the same
        # positive factor scales the whole chain's output — which the
        # caller's Rayleigh-Ritz normalizes away. Keeps |T_j| ~ 1 so long
        # chains cannot overflow f32 (|T_d| at the bottom of a tight window
        # reaches ~1e15 at d=10 and overflows by d~30 unscaled).
        m = jnp.max(jnp.abs(t1), axis=0, keepdims=True)
        sc = 1.0 / jnp.maximum(m, 1.0)
        return t0 * sc, t1 * sc

    t0 = x
    t1 = a_shift(x)
    for _ in range(degree - 1):
        t0, t1 = rescale(t1, 2.0 * a_shift(t1) - t0)
    o_ref[...] = t1


@functools.partial(jax.jit, static_argnames=("degree", "interpret"))
def chebyshev_filter(S: jax.Array, X: jax.Array, c: jax.Array, e: jax.Array,
                     *, degree: int, interpret: bool = False) -> jax.Array:
    """Apply the degree-`degree` Chebyshev filter of A' = ((I - S) - c)/e to X.

    S: (N, N) whitened affinity operator (bf16 recommended — MXU-native).
    X: (N, m) f32. c, e: scalar window parameters (per image; traced).
    Returns (N, m) f32 = T_degree(A') X, bitwise-equivalent math to the XLA
    chain in ops/eigen.py `_chebyshev_laplacian.filt` (same operation order
    up to the fused (1-c) shift).

    vmap-safe: batching lifts to a leading Pallas grid dimension, so a
    batched solve still loads each image's operator into VMEM exactly once
    per chain.
    """
    if degree < 1:
        raise ValueError("degree must be >= 1")
    N, m = X.shape
    ce = jnp.stack([jnp.asarray(c, jnp.float32).reshape(()),
                    jnp.asarray(e, jnp.float32).reshape(())]).reshape(1, 2)
    return pl.pallas_call(
        functools.partial(_cheb_kernel, degree=degree),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, m), jnp.float32),
        # Raise the scoped-VMEM limit from the 16 MB default: the whole point
        # of this kernel is keeping the operator VMEM-resident, and v5e has
        # 128 MB/core. Without this the compiler rejected N > ~1600 bf16
        # operators that comfortably fit the hardware (round-3 blocker).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(ce, S, X)
