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

Layouts. Two kernel families:

  * "bhtd" — classic (B, H, T, hd) per-head kernels, grid (B, H, Tq, Tkv).
  * "bthd" — a PACKED kernel that reads q/k/v straight from the fused qkv
    projection's native (B, T, H, hd) layout (viewed as (B, T, H*hd)): grid
    (B, Tq, Tkv), heads unrolled inside the kernel with per-head online-
    softmax scratch. Mosaic requires a block's last two dims to be 8/128-
    aligned or full, which forbids per-head blocking of a (B, T, H, hd)
    array — packing the whole head dim into lanes satisfies it, and deletes
    the (B,T,H,hd)->(B,H,T,hd) transposes around every attention call
    (profiled at ~0.9 ms/layer of pure HBM traffic at b64/T=1024 on a v5e,
    ~16% of the whole ViT forward).

The differentiable wrapper uses the packed kernel for the primal "bthd" call;
under autodiff it transposes to "bhtd" for the residual-saving forward and the
two backward kernels (training pays the transposes, inference does not).

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
# Default (block_q, block_k); VisionTransformer pads its token sequence to a
# multiple of this once up front so the per-layer kernels never pad/slice.
DEFAULT_BLOCK = 1024
# The packed (bthd) kernel holds per-head online-softmax scratch plus one
# score tile in VMEM; (512, 1024) is the largest default that fits the 16 MB
# scoped-VMEM budget at 6 heads x hd 64.
PACKED_BLOCK_Q = 512
PACKED_BLOCK_K = 1024


# ------------------------------------------------------------- bhtd kernels

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


# ------------------------------------------------------------ packed kernel

def _flash_kernel_packed(q_ref, k_ref, v_ref, mask_ref, o_ref,
                         m_scratch, l_scratch, acc_scratch,
                         *, sm_scale: float, num_kv_blocks: int,
                         num_heads: int, head_dim: int, block_k_minor: int,
                         pad_scores_hd: bool = False):
    """One (batch, q-block, kv-block) cell covering ALL heads: q/k/v blocks are
    (block, H*hd) lane-packed; heads unroll as static lane slices with
    per-head (m, l, acc) scratch rows.

    Two-level KV tiling: the grid's kv axis moves a LARGE (block_k-row) k/v
    block per step (DMA granularity), but scores compute on (block_q,
    block_k_minor) sub-tiles — the fp32 score/probability temporaries no
    longer scale with the transfer block, so block_q stays at 512 where the
    single-level kernel was VMEM-forced down to 256 at T=4096 (the ViT-S/8
    stretch config).

    pad_scores_hd (MXU-utilization DIAGNOSTIC, off by default): zero-pad the
    scores matmul's contraction dim from head_dim (64) to 128. The output is
    bitwise-identical (padded zeros contribute nothing); what changes is the
    MXU mapping — if a K=64 contraction only fills half the 128-deep
    systolic array, the padded variant runs 2x the (half-zero) FLOPs in the
    SAME time, while if K=64 already runs at full rate the variant is ~2x
    slower. Distinguishes 'hd=64 halves the MXU, nothing to win' from 'the
    scores matmul has headroom' on real hardware
    (scripts/probe_vits8_attn.py; VERDICT r3 #7)."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    block_k = k_ref.shape[1]
    num_minor = block_k // block_k_minor

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, sl]
        for mi in range(num_minor):
            rows = slice(mi * block_k_minor, (mi + 1) * block_k_minor)
            k = k_ref[0, rows, sl]
            v = v_ref[0, rows, sl]
            kv_mask = mask_ref[0][:, rows]

            if pad_scores_hd:
                qp = jnp.concatenate([q, jnp.zeros_like(q)], axis=1)
                kp = jnp.concatenate([k, jnp.zeros_like(k)], axis=1)
                s = jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            else:
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            s = s * sm_scale
            s = jnp.where(kv_mask, s, MASK_VALUE)

            m_prev = m_scratch[h]
            l_prev = l_scratch[h]
            m_curr = jnp.max(s, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            p = jnp.where(kv_mask, p, 0.0)
            l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
            m_scratch[h] = m_next
            l_scratch[h] = l_next

            o_curr = jax.lax.dot(p.astype(v.dtype), v,
                                 preferred_element_type=jnp.float32)
            acc_scratch[h] = acc_scratch[h] * alpha[:, :1] + o_curr

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            l_final = l_scratch[h][:, :1]
            l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
            o_ref[0, :, sl] = (acc_scratch[h] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q", "block_k",
                                             "block_k_minor", "interpret",
                                             "pad_scores_hd"))
def _flash_forward_packed(q, k, v, kv_mask, *, num_heads,
                          block_q=PACKED_BLOCK_Q, block_k=PACKED_BLOCK_K,
                          block_k_minor=None, interpret=False,
                          pad_scores_hd=False):
    """q/k/v: (B, T, H, hd). Returns (B, T, H, hd). No transposes, no
    residuals — the inference fast path. block_k_minor < block_k enables
    two-level KV tiling (see _flash_kernel_packed)."""
    B, T, H, hd = q.shape
    D = H * hd
    sm_scale = 1.0 / math.sqrt(hd)
    q2, k2, v2 = (x.reshape(B, T, D) for x in (q, k, v))
    blk = math.lcm(block_q, block_k)
    Tp = -(-T // blk) * blk
    if kv_mask is None:
        kv_mask = jnp.ones((B, T), dtype=bool)
    if Tp != T:
        pad = Tp - T
        q2 = jnp.pad(q2, ((0, 0), (0, pad), (0, 0)))
        k2 = jnp.pad(k2, ((0, 0), (0, pad), (0, 0)))
        v2 = jnp.pad(v2, ((0, 0), (0, pad), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad)))
    mp = kv_mask[:, None, :]
    block_q = min(block_q, Tp)
    block_k = min(block_k, Tp)
    if block_k_minor is None or block_k_minor > block_k:
        block_k_minor = block_k
    assert block_k % block_k_minor == 0, (block_k, block_k_minor)
    num_q_blocks = Tp // block_q
    num_kv_blocks = Tp // block_k

    kernel = functools.partial(_flash_kernel_packed, sm_scale=sm_scale,
                               num_kv_blocks=num_kv_blocks, num_heads=H,
                               head_dim=hd, block_k_minor=block_k_minor,
                               pad_scores_hd=pad_scores_hd)
    out = pl.pallas_call(
        kernel,
        grid=(B, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((H, block_q, LANES), jnp.float32),
            pltpu.VMEM((H, block_q, LANES), jnp.float32),
            pltpu.VMEM((H, block_q, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q2, k2, v2, mp)
    return out[:, :T].reshape(B, T, H, hd)


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
def _flash_forward(q, k, v, kv_mask=None, *, block_q=DEFAULT_BLOCK,
                   block_k=DEFAULT_BLOCK, interpret=False,
                   save_residuals=False):
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


def flash_attention(q, k, v, kv_mask=None, *, block_q=None, block_k=None,
                    interpret=False, layout="bhtd"):
    """softmax(q k^T / sqrt(hd) + mask) v without materializing scores.

    q/k/v are (B, H, T, hd) for layout="bhtd" or (B, T, H, hd) for "bthd"
    (the packed transpose-free kernel; see module docstring). T is padded to
    the block size internally; padded KV positions are masked, padded Q rows
    are dropped from the output.

    Default blocks (1024, 1024) come from an on-hardware DEVICE-TIME sweep at
    the ViT-S/8 workload (T=3601, hd=64, bf16, one v5e), timed as a jit'd
    fori_loop with a data dependency so the remote tunnel's dispatch+fetch
    overhead cancels (scripts/bench_device_time.py): 2.96 ms/call = 53.8
    TFLOP/s (~54% of the hd=64-limited MXU ceiling) vs 3.42 ms for (512,
    1024), 5.33 ms for (512, 512) and 10.4 ms for the old (256, 256).
    (1024, 2048)/(2048, 1024) exceed the 16 MB scoped-VMEM limit. Blocks are
    clamped to the padded T for short sequences, so the larger defaults cost
    nothing there. The packed kernel defaults to (512, 1024) — its per-head
    scratch uses part of the VMEM budget.
    """
    if layout == "bthd":
        B, T, H, hd = q.shape
        bq, bk, bkm = pick_packed_blocks(T, H, hd, block_q, block_k)
        return _flash_forward_packed(
            q, k, v, kv_mask, num_heads=H, block_q=bq, block_k=bk,
            block_k_minor=bkm, interpret=interpret)
    return _flash_forward(q, k, v, kv_mask,
                          block_q=block_q or DEFAULT_BLOCK,
                          block_k=block_k or DEFAULT_BLOCK,
                          interpret=interpret)


def will_use_flash(impl: str, T: int, want_attn: bool = False) -> bool:
    """Single source of truth for the flash dispatch rule. Used by BOTH the
    Attention module and VisionTransformer's pad-once pre-padding — a drifted
    copy would either pre-pad for an einsum layer (wasted rows through every
    block) or skip the pre-pad while flash runs (reinstating ~24 ms/call of
    per-layer pad/slice), both silently.

    'auto' takes flash on TPU from T >= 768: at T=901 (vits16 @480, b64) the
    whole-model forward measures 903 img/s flash vs 863 einsum on a v5e; the
    materialized path pays VPU softmax + (T, T) HBM traffic. Below that,
    blocks clamp to the padded T and einsum compiles faster for no measured
    loss. want_attn always forces einsum (flash never materializes the
    attention map)."""
    if want_attn:
        return False
    if impl == "flash":
        return True
    return impl == "auto" and jax.default_backend() == "tpu" and T >= 768


def pick_packed_blocks(T, H, hd, block_q=None, block_k=None,
                       block_k_minor=None):
    """VMEM-fitting (block_q, block_k, block_k_minor) for the packed kernel.

    Scoped-VMEM estimate: q/k/v/out blocks (double-buffered only when an axis
    has more than one block — Pallas single-buffers a revisited block),
    per-head m/l/acc scratch, one fp32 score tile + its bf16 copy. Measured
    reality runs ~40% above the naive sum (compiler temporaries), so the
    16 MB budget is checked against est * 1.4.

    Two-level KV tiling (block_k_minor < block_k) exists because the fp32
    score temporaries scale with the MINOR tile while the k/v DMA buffers
    scale with block_k — but an on-hardware device-time sweep (T=3601, H=6,
    b16, v5e) showed the minor-tile split is a net LOSS at this workload:
    (512, 1024, m512) runs 10.89 ms vs (256, 1024) single-level at 6.68 ms
    (47.7 TFLOP/s) — the per-subtile online-softmax rescales cost more than
    the larger q-block saves. So the fit order is: shrink block_q FIRST
    (keeping single-level), then block_k, and only reach for the minor tile
    when block_q is already at its floor. T=4096/H=6 lands on (256, 1024)
    single-level; ViT-S T=1024 keeps (512, 1024); ViT-B/8 T=4096 (H=12)
    lands on (128, 1024) single-level."""
    bq = block_q or PACKED_BLOCK_Q
    bk = block_k or PACKED_BLOCK_K
    bkm = block_k_minor or bk
    D = H * hd

    def _est(bq, bk, bkm):
        Tp = -(-T // math.lcm(bq, bk)) * math.lcm(bq, bk)
        buf_q = 2 if Tp > bq else 1
        buf_k = 2 if Tp > bk else 1
        return (2 * (buf_q * 2 * bq * D + buf_k * 2 * bk * D)
                + H * bq * (2 * LANES + hd) * 4
                + bq * bkm * 6)

    def fits():
        return _est(bq, bk, bkm) * 1.4 <= 15 * 2 ** 20

    if block_k_minor is None:
        while bq > 128 and not fits():
            bq //= 2
        while bkm > 256 and not fits():
            bkm //= 2
    else:  # caller forced a minor tile: honor it, fit with bq
        while bq > 128 and not fits():
            bq //= 2
    while bk > 256 and not fits():
        bk //= 2
        bkm = min(bkm, bk)
    return bq, bk, min(bkm, bk)


def _einsum_attention(q, k, v, kv_mask):
    """Reference masked attention in plain jnp (differentiable); the numerical
    oracle for the kernels in tests. (B, H, T, hd) layout."""
    hd = q.shape[-1]
    s = jnp.einsum("bhtd,bhsd->bhts", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def pick_bwd_blocks(T, hd, block_q=None, block_k=None):
    """VMEM-fitting (block_q, block_k) for the backward kernels. The dKV/dQ
    cells hold FOUR (block_q, block_k) fp32 score-sized tiles (s, p, dp, ds)
    plus bf16 matmul casts — far more than the forward's one — so the forward
    default (1024, 1024) cannot fit the 16 MB scoped-VMEM budget (the forward
    itself OOM'd at two such tiles). Start at (512, 512) (~6 MB naive, ~9 MB
    with the measured ~1.4x compiler overhead) and halve until it fits."""
    bq = block_q or 512
    bk = block_k or 512

    def est(bq, bk):
        blk = math.lcm(bq, bk)
        Tp = -(-T // blk) * blk
        buf_q = 2 if Tp > bq else 1
        buf_k = 2 if Tp > bk else 1
        return (bq * bk * 14                               # s/p/dp/ds + casts
                + buf_q * 2 * (2 * bq * hd + bq * LANES * 4 * 2)
                + buf_k * 2 * 2 * bk * hd
                + 2 * bk * hd * 4)                         # dk/dv scratch

    while bq > 128 and est(bq, bk) * 1.4 > 15 * 2 ** 20:
        bq //= 2
    while bk > 128 and est(bq, bk) * 1.4 > 15 * 2 ** 20:
        bk //= 2
    return bq, bk


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_backward(q, k, v, kv_mask, o, lse, do, *, block_q=None,
                    block_k=None, interpret=False):
    B, H, T, hd = q.shape
    block_q, block_k = pick_bwd_blocks(T, hd, block_q, block_k)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention_trainable(q, k, v, kv_mask, interpret=False,
                              layout="bhtd"):
    """Differentiable flash attention: flash kernels on both passes. The
    primal "bthd" call runs the packed transpose-free kernel; under autodiff
    both layouts use the per-head kernels (the forward saves the per-row
    log-sum-exp; dK/dV and dQ run as separate Pallas kernels with transposed
    iteration orders) — no (T, T) tensor is ever materialized either way."""
    return flash_attention(q, k, v, kv_mask, interpret=interpret,
                           layout=layout)


def _t(x):
    return x.transpose(0, 2, 1, 3)


def _fat_fwd(q, k, v, kv_mask, interpret, layout):
    if layout == "bthd":
        q, k, v = _t(q), _t(k), _t(v)
    out, lse = _flash_forward(q, k, v, kv_mask, interpret=interpret,
                              save_residuals=True)
    res = (q, k, v, kv_mask, out, lse)
    return (_t(out) if layout == "bthd" else out), res


def _fat_bwd(interpret, layout, residuals, g):
    q, k, v, kv_mask, o, lse = residuals
    if layout == "bthd":
        g = _t(g)
    dq, dk, dv = _flash_backward(q, k, v, kv_mask, o, lse, g,
                                 interpret=interpret)
    if layout == "bthd":
        dq, dk, dv = _t(dq), _t(dk), _t(dv)
    return dq, dk, dv, None


flash_attention_trainable.defvjp(_fat_fwd, _fat_bwd)
