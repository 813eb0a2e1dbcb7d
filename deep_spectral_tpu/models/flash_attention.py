"""Masked flash attention in Pallas (TPU) for the ViT backbone.

For P=16 backbones the attention matrices are small (~900 tokens), but the P=8
configs the pipeline supports (dino_vits8 / dino_vitb8 — the reference's
stretch recipe) run 3.6k-4.7k tokens at 480-540px inputs, where XLA's naive
attention materializes (T, T) score tensors per head in HBM
(3601^2 * 6 heads * 4 B ~ 311 MB per layer). This kernel tiles Q against K/V
blocks with an online softmax so scores never leave VMEM, and applies the
framework's token-validity mask (bucketed batching) as a KV-side mask inside
the kernel — numerically identical to the masked-softmax reference path.

Non-causal, mask-only variant written for this framework following the public
JAX Pallas flash-attention tiling scheme (online softmax with running
m/l/acc scratch in VMEM, f32 statistics, -0.7*float_max mask value).
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


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                  m_scratch, l_scratch, acc_scratch,
                  *, sm_scale: float, num_kv_blocks: int):
    """One (batch, head, q-block, kv-block) grid cell: online-softmax update of
    the running (m, l, acc) statistics held in VMEM scratch."""
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


def _einsum_attention(q, k, v, kv_mask):
    """Reference masked attention in plain jnp (differentiable); used for the
    recomputation backward pass of `flash_attention_trainable`."""
    hd = q.shape[-1]
    s = jnp.einsum("bhtd,bhsd->bhts", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention_trainable(q, k, v, kv_mask, interpret=False):
    """Differentiable flash attention: the Pallas kernel on the forward pass,
    gradient by attention recomputation (einsum) on the backward pass. The
    backward materializes one (T, T) score tensor per head — the standard
    recompute-in-backward trade; a fused flash backward kernel can replace it
    without changing this interface."""
    return flash_attention(q, k, v, kv_mask, interpret=interpret)


def _fat_fwd(q, k, v, kv_mask, interpret):
    return flash_attention(q, k, v, kv_mask, interpret=interpret), (q, k, v, kv_mask)


def _fat_bwd(interpret, residuals, g):
    q, k, v, kv_mask = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _einsum_attention(q_, k_, v_, kv_mask),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention_trainable.defvjp(_fat_fwd, _fat_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jax.Array,                 # (B, H, T, hd)
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,   # (B, T) bool; True = attend
    *,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q k^T / sqrt(hd) + mask) v without materializing scores.

    T is padded to the block size internally; padded KV positions are masked,
    padded Q rows are dropped from the output.
    """
    B, H, T, hd = q.shape
    sm_scale = 1.0 / math.sqrt(hd)
    blk = max(block_q, block_k)
    Tp = -(-T // blk) * blk
    block_q = min(block_q, Tp)
    block_k = min(block_k, Tp)

    if kv_mask is None:
        kv_mask = jnp.ones((B, T), dtype=bool)
    pad = Tp - T
    if pad:
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        mp = jnp.pad(kv_mask, ((0, 0), (0, pad)))
    else:
        qp, kp, vp, mp = q, k, v, kv_mask
    mp = mp[:, None, :]  # (B, 1, Tp) -> blockable on the last dim

    num_q_blocks = Tp // block_q
    num_kv_blocks = Tp // block_k
    grid = (B, H, num_q_blocks, num_kv_blocks)

    kernel = functools.partial(_flash_kernel, sm_scale=sm_scale,
                               num_kv_blocks=num_kv_blocks)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, hd), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, hd),
                               lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, hd), q.dtype),
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
    return out[:, :, :T]
