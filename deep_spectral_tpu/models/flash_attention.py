"""Masked flash attention in Pallas (TPU) for the ViT backbone — forward and
backward kernels.

For P=16 backbones the attention matrices are small (~900 tokens), but the P=8
configs the pipeline supports (dino_vits8 / dino_vitb8 — the reference's
stretch recipe) run 3.6k-4.7k tokens at 480-540px inputs, where XLA's naive
attention materializes (T, T) score tensors per head in HBM
(3601^2 * 6 heads * 4 B ~ 311 MB per layer). These kernels tile Q against K/V
blocks with an online softmax so scores never leave VMEM, and apply the
framework's token-validity mask (bucketed batching) as a KV-side mask inside
the kernel — numerically identical to the masked-softmax reference path.

Backward follows the standard flash scheme: the forward saves the per-row
log-sum-exp; the backward recomputes probability tiles from (q, k, lse) and
runs two kernels with transposed iteration orders — dKV (KV tiles outer,
accumulate over Q tiles) and dQ (Q tiles outer, accumulate over KV tiles) —
with di = sum(o * do) precomputed once.

Non-causal, mask-only variant written for this framework following the public
JAX Pallas flash-attention tiling scheme.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


# ------------------------------------------------------------------- forward

def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                  m_scratch, l_scratch, acc_scratch,
                  *, sm_scale: float, num_kv_blocks: int):
    """One (batch, head, q-block, kv-block) grid cell: online-softmax update of
    the running (m, l, acc) statistics held in VMEM scratch; final store writes
    the normalized output and the per-row log-sum-exp residual."""
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    kv_mask = mask_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * sm_scale
    s = jnp.where(kv_mask, s, MASK_VALUE)

    m_prev = m_scratch[...]
    l_prev = l_scratch[...]
    m_curr = jnp.max(s, axis=1)[:, None]
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    alpha = jnp.exp(m_prev - m_next)                 # (block_q, LANES), replicated
    p = jnp.exp(s - m_next[:, :1])
    p = jnp.where(kv_mask, p, 0.0)
    l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
    m_scratch[...] = m_next
    l_scratch[...] = l_next

    o_curr = jax.lax.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
    acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + o_curr

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l_final = l_scratch[...][:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        lse = m_scratch[...] + jnp.log(jnp.maximum(l_scratch[...], 1e-30))
        lse_ref[0, 0] = lse.astype(lse_ref.dtype)


# ------------------------------------------------------------------ backward

def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                          di_ref, dk_ref, dv_ref, dk_scratch, dv_scratch,
                          *, sm_scale: float, num_q_blocks: int):
    """dK/dV: KV tile fixed per (b, h, kv) cell, accumulate over Q tiles.

    p~ = exp(s - lse) are the normalized attention weights;
    dv = p~^T do ; ds = p~ * (do v^T - di) ; dk = sm_scale * ds^T q.
    """
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[...] = jnp.zeros(dk_scratch.shape, jnp.float32)
        dv_scratch[...] = jnp.zeros(dv_scratch.shape, jnp.float32)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    kv_mask = mask_ref[0]                    # (1, block_k)
    lse = lse_ref[0, 0][:, :1]               # (block_q, 1)
    di = di_ref[0, 0][:, :1]                 # (block_q, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    s = jnp.where(kv_mask, s, MASK_VALUE)
    p = jnp.exp(s - lse)
    p = jnp.where(kv_mask, p, 0.0)           # (block_q, block_k)

    dv_scratch[...] = dv_scratch[...] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - di)
    dk_scratch[...] = dk_scratch[...] + sm_scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(q_idx == num_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[...].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                         di_ref, dq_ref, dq_scratch,
                         *, sm_scale: float, num_kv_blocks: int):
    """dQ: Q tile fixed per (b, h, q) cell, accumulate over KV tiles:
    dq = sm_scale * ds k."""
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[...] = jnp.zeros(dq_scratch.shape, jnp.float32)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    kv_mask = mask_ref[0]
    lse = lse_ref[0, 0][:, :1]
    di = di_ref[0, 0][:, :1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    s = jnp.where(kv_mask, s, MASK_VALUE)
    p = jnp.exp(s - lse)
    p = jnp.where(kv_mask, p, 0.0)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - di)
    dq_scratch[...] = dq_scratch[...] + sm_scale * jax.lax.dot(
        ds, k.astype(jnp.float32), preferred_element_type=jnp.float32)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_scratch[...].astype(dq_ref.dtype)


def _einsum_attention(q, k, v, kv_mask):
    """Reference masked attention in plain jnp (differentiable); the numerical
    oracle for the kernels in tests."""
    hd = q.shape[-1]
    s = jnp.einsum("bhtd,bhsd->bhts", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# ----------------------------------------------------------------- dispatch

def _pad_inputs(q, k, v, kv_mask, block_q, block_k):
    B, H, T, hd = q.shape
    # Pad to a common multiple of BOTH block sizes: the grid uses floor
    # division per axis, so a padded length only one of them divides would
    # silently drop trailing valid tokens (e.g. block_q=256, block_k=192).
    blk = math.lcm(block_q, block_k)
    Tp = -(-T // blk) * blk
    if kv_mask is None:
        kv_mask = jnp.ones((B, T), dtype=bool)
    pad = Tp - T
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad)))
    return q, k, v, kv_mask[:, None, :], Tp


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret",
                                             "save_residuals"))
def _flash_forward(q, k, v, kv_mask=None, *, block_q=512, block_k=1024,
                   interpret=False, save_residuals=False):
    B, H, T, hd = q.shape
    sm_scale = 1.0 / math.sqrt(hd)
    qp, kp, vp, mp, Tp = _pad_inputs(q, k, v, kv_mask, block_q, block_k)
    block_q = min(block_q, Tp)
    block_k = min(block_k, Tp)
    assert Tp % block_q == 0 and Tp % block_k == 0, (Tp, block_q, block_k)
    num_q_blocks = Tp // block_q
    num_kv_blocks = Tp // block_k

    kernel = functools.partial(_flash_kernel, sm_scale=sm_scale,
                               num_kv_blocks=num_kv_blocks)
    out, lse = pl.pallas_call(
        kernel,
        grid=(B, H, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, hd), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, j)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, hd), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, i, j: (b, h, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, hd), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tp, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, mp)
    if save_residuals:
        return out[:, :, :T], lse
    return out[:, :, :T]


def flash_attention(q, k, v, kv_mask=None, *, block_q=512, block_k=1024,
                    interpret=False):
    """softmax(q k^T / sqrt(hd) + mask) v without materializing scores.

    T is padded to the block size internally; padded KV positions are masked,
    padded Q rows are dropped from the output.

    Default blocks (512, 1024) come from an on-hardware sweep at the ViT-S/8
    workload (T=3601, hd=64, bf16, one v5e): 39-41 ms/fwd at B=8 vs 46 ms for
    (256, 256); (1024, 1024)/(512, 2048) tie within noise
    (scripts/sweep_flash_blocks.py). Blocks are clamped to the padded T for
    short sequences, so the larger defaults cost nothing there.
    """
    return _flash_forward(q, k, v, kv_mask, block_q=block_q, block_k=block_k,
                          interpret=interpret)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_backward(q, k, v, kv_mask, o, lse, do, *, block_q=512, block_k=1024,
                    interpret=False):
    B, H, T, hd = q.shape
    sm_scale = 1.0 / math.sqrt(hd)
    qp, kp, vp, mp, Tp = _pad_inputs(q, k, v, kv_mask, block_q, block_k)
    dop = jnp.pad(do, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    # lse comes padded from the forward residual (B, H, Tp, LANES).
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.pad(di, ((0, 0), (0, 0), (0, Tp - T)))
    di = jnp.broadcast_to(di[..., None], (B, H, Tp, LANES))
    block_q = min(block_q, Tp)
    block_k = min(block_k, Tp)
    assert Tp % block_q == 0 and Tp % block_k == 0, (Tp, block_q, block_k)
    num_q_blocks = Tp // block_q
    num_kv_blocks = Tp // block_k

    dkv_kernel = functools.partial(_flash_bwd_dkv_kernel, sm_scale=sm_scale,
                                   num_q_blocks=num_q_blocks)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B, H, num_kv_blocks, num_q_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, hd), lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, j, i: (b, 0, j)),
            pl.BlockSpec((1, 1, block_q, hd), lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, j, i: (b, h, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, j, i: (b, h, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, hd), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tp, hd), q.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, hd), jnp.float32),
            pltpu.VMEM((block_k, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, mp, dop, lse, di)

    dq_kernel = functools.partial(_flash_bwd_dq_kernel, sm_scale=sm_scale,
                                  num_kv_blocks=num_kv_blocks)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(B, H, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, hd), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, j)),
            pl.BlockSpec((1, 1, block_q, hd), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, hd),
                               lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, mp, dop, lse, di)

    return dq[:, :, :T], dk[:, :, :T], dv[:, :, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention_trainable(q, k, v, kv_mask, interpret=False):
    """Differentiable flash attention: flash kernels on both passes. The
    forward saves the per-row log-sum-exp; dK/dV and dQ run as separate Pallas
    kernels with transposed iteration orders — no (T, T) tensor is ever
    materialized in either direction."""
    return flash_attention(q, k, v, kv_mask, interpret=interpret)


def _fat_fwd(q, k, v, kv_mask, interpret):
    out, lse = _flash_forward(q, k, v, kv_mask, interpret=interpret,
                              save_residuals=True)
    return out, (q, k, v, kv_mask, out, lse)


def _fat_bwd(interpret, residuals, g):
    q, k, v, kv_mask, o, lse = residuals
    dq, dk, dv = _flash_backward(q, k, v, kv_mask, o, lse, g,
                                 interpret=interpret)
    return dq, dk, dv, None


flash_attention_trainable.defvjp(_fat_fwd, _fat_bwd)
