"""VMEM-resident Chebyshev filter chain — Pallas TPU kernel.

The Chebyshev eigensolver's hot loop (ops/eigen.py `_chebyshev_laplacian`)
applies a degree-d Chebyshev polynomial of the whitened affinity operator
A = I - S to a thin (N, m) block: d sequential matvecs T_{j+1} = 2*A'T_j -
T_{j-1} with A' = (A - c)/e. Under XLA each matvec is a separate dot that
streams the (N, N) operator from HBM, so the chain costs d full operator
reads per outer iteration — the dominant HBM traffic of the eigs phase
(CLAUDE.md: 68% HBM-bound fusions, streaming the operator 43x per solve).

This kernel keeps S resident in VMEM for the WHOLE chain: one HBM read of
the operator per outer iteration instead of d. Fits for N <= ~2500 at bf16
(VMEM ~16 MB/core); `fits_vmem` guards the caller. The matvec itself runs
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

# Leave headroom for X/T0/T1/T2 blocks, semaphores and double-buffering.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_vmem(n: int, dtype=jnp.bfloat16) -> bool:
    """Whether the (n, n) operator fits the kernel's VMEM budget."""
    return n * n * jnp.dtype(dtype).itemsize <= _VMEM_BUDGET_BYTES


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
        interpret=interpret,
    )(ce, S, X)
