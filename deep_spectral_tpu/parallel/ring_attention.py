"""Ring attention: sequence-parallel masked attention over a device mesh.

The framework's long-context plan (SURVEY.md section 5) shards the token
dimension: the row-block-sharded eigensolve covers the spectral stage, and
this module covers the ViT attention stage for sequences too long for one
chip's HBM (e.g. P=8 backbones beyond 540px, where even flash attention's
K/V residency per chip becomes the ceiling).

Scheme (the standard ring / "blockwise parallel" attention, expressed with
`shard_map` + `jax.lax.ppermute` so XLA schedules the ICI transfers):

  * q, k, v are (B, H, T, hd) with T sharded over the mesh axis: each device
    holds one token shard of all three plus its KV validity-mask shard.
  * Each of the `n_shards` steps, every device updates an fp32 online-softmax
    accumulator (m, l, acc) for ITS q shard against the K/V shard currently
    resident, then rotates K/V (and the mask shard) one hop around the ring.
    After n hops every q row has attended to every kv position; no device
    ever materializes more than one (T/n, T/n) score tile, and the rotation
    overlaps with compute on the ICI torus.
  * Numerics match the masked-softmax oracle exactly up to fp32 associativity
    (same online-softmax recurrence as the flash kernel,
    models/flash_attention.py).

On one device this degrades to a single local attention (no collectives).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.flash_attention import MASK_VALUE, _flash_forward
from .mesh import MODEL_AXIS


def ring_attention_local(q_l, k_l, v_l, m_l, *, axis: str, n_shards: int,
                         impl: str = "einsum", interpret: bool = False):
    """The per-device body of ring attention, for use INSIDE a `shard_map`
    over `axis`: q_l/k_l/v_l (B, H, Tl, hd) local token shards, m_l (B, Tl)
    the local KV validity shard. Runs the n_shards-hop K/V rotation with an
    fp32 online-softmax accumulator and returns the local attention output
    (B, H, Tl, hd). Also reused by the sequence-parallel ViT
    (parallel/sp_vit.py), whose blocks run entirely inside one shard_map.

    impl='flash' computes each hop's (Tl, Tl) tile with the Pallas flash
    kernel instead of a materialized einsum score tile (see
    _ring_attention_local_flash) — the TPU path for long-context shards."""
    if impl == "flash":
        return _ring_attention_local_flash(q_l, k_l, v_l, m_l, axis=axis,
                                           n_shards=n_shards,
                                           interpret=interpret)
    B, H, Tl, hd = q_l.shape
    sm_scale = 1.0 / math.sqrt(hd)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    # Derive the accumulators from q_l so they carry shard_map's
    # varying-over-axis type (freshly created constants are 'replicated'
    # and would not typecheck as scan carries against ppermuted values).
    zero = (q_l[..., :1] * 0).astype(jnp.float32)       # (B, H, Tl, 1)
    m_run = zero - jnp.inf
    l_run = zero
    acc = jnp.broadcast_to(zero, (*zero.shape[:3], hd)).astype(jnp.float32)

    def hop(carry, _):
        k_c, v_c, m_c, m_run, l_run, acc = carry
        s = jnp.einsum("bhtd,bhsd->bhts", q_l, k_c,
                       preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(m_c[:, None, None, :], s, MASK_VALUE)
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_run - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(m_c[:, None, None, :], p, 0.0)
        l_new = alpha * l_run + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhts,bhsd->bhtd", p.astype(v_c.dtype), v_c,
            preferred_element_type=jnp.float32)
        # rotate the resident K/V (+ mask) shard one hop around the ring
        k_n = jax.lax.ppermute(k_c, axis, perm)
        v_n = jax.lax.ppermute(v_c, axis, perm)
        m_n = jax.lax.ppermute(m_c, axis, perm)
        return (k_n, v_n, m_n, m_new, l_new, acc_new), None

    (k_l, v_l, m_l, m_run, l_run, acc), _ = jax.lax.scan(
        hop, (k_l, v_l, m_l, m_run, l_run, acc), None, length=n_shards)
    l_inv = jnp.where(l_run == 0.0, 1.0, 1.0 / l_run)
    return (acc * l_inv).astype(q_l.dtype)


def _ring_attention_local_flash(q_l, k_l, v_l, m_l, *, axis: str,
                                n_shards: int, interpret: bool = False):
    """Flash-tile ring hops: each hop runs the Pallas online-softmax kernel
    over the resident (Tl, Tl) tile (MXU-tiled, no materialized score matrix,
    bf16 inputs welcome) and returns a NORMALIZED output plus its per-row
    log-sum-exp; hops merge by the standard two-softmax combination
        m = max(lse_a, lse_b); w_i = exp(lse_i - m)
        o = (w_a o_a + w_b o_b) / (w_a + w_b); lse = m + log(w_a + w_b).
    Fully-masked hops yield lse ~ MASK_VALUE (finite), so their weight
    underflows to exactly 0 — padding shards stay provably inert."""
    B, H, Tl, hd = q_l.shape
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    # Derive accumulators from q_l for shard_map's varying-over-axis typing.
    zero = (q_l[..., :1] * 0).astype(jnp.float32)       # (B, H, Tl, 1)
    o_run = jnp.broadcast_to(zero, (*zero.shape[:3], hd)).astype(jnp.float32)
    lse_run = zero + MASK_VALUE

    def hop(carry, _):
        k_c, v_c, m_c, o_run, lse_run = carry
        o_i, lse_i = _flash_forward(q_l, k_c, v_c, m_c,
                                    interpret=interpret, save_residuals=True)
        lse_i = lse_i[:, :, :Tl, :1]                    # (B, H, Tl, 1) fp32
        m = jnp.maximum(lse_run, lse_i)
        w_a = jnp.exp(lse_run - m)
        w_b = jnp.exp(lse_i - m)
        denom = w_a + w_b
        o_new = (w_a * o_run + w_b * o_i.astype(jnp.float32)) / denom
        lse_new = m + jnp.log(denom)
        k_n = jax.lax.ppermute(k_c, axis, perm)
        v_n = jax.lax.ppermute(v_c, axis, perm)
        m_n = jax.lax.ppermute(m_c, axis, perm)
        return (k_n, v_n, m_n, o_new, lse_new), None

    (_, _, _, o_run, _), _ = jax.lax.scan(
        hop, (k_l, v_l, m_l, o_run, lse_run), None, length=n_shards)
    return o_run.astype(q_l.dtype)


def ring_attention(
    mesh: Mesh,
    q: jax.Array,                     # (B, H, T, hd)
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,   # (B, T)
    *,
    axis: str = MODEL_AXIS,
    impl: str = "einsum",
    interpret: bool = False,
) -> jax.Array:
    """softmax(q k^T / sqrt(hd) + mask) v with T sharded over `axis`.

    T must be divisible by the axis size (pad and mask the tail — padding is
    provably inert via the KV mask, like everywhere else in the framework).
    impl='flash' runs each hop's resident tile through the Pallas flash
    kernel (MXU-tiled; the TPU long-context path). Returns (B, H, T, hd)
    sharded like q.
    """
    B, H, T, hd = q.shape
    n_shards = int(mesh.shape[axis])
    if T % n_shards:
        raise ValueError(f"T={T} not divisible by {axis} axis ({n_shards}); "
                         "pad tokens and extend kv_mask")
    if kv_mask is None:
        kv_mask = jnp.ones((B, T), dtype=bool)

    def local(q_l, k_l, v_l, m_l):
        return ring_attention_local(q_l, k_l, v_l, m_l, axis=axis,
                                    n_shards=n_shards, impl=impl,
                                    interpret=interpret)

    tok = P(None, None, axis, None)
    # pallas_call outputs carry no varying-mesh-axis (vma) annotation, so the
    # flash-hop path disables shard_map's vma check (the einsum path keeps it)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(tok, tok, tok, P(None, axis)),
                   out_specs=tok, check_vma=(impl != "flash"))
    return fn(q, k, v, kv_mask)


def ring_attention_sharded(mesh: Mesh, q, k, v, kv_mask=None, *,
                           axis: str = MODEL_AXIS, impl: str = "einsum",
                           interpret: bool = False):
    """`ring_attention` with explicit input placement: shards host arrays over
    the token axis first (convenience for drivers/tests)."""
    if q.shape[2] % int(mesh.shape[axis]):
        raise ValueError(f"T={q.shape[2]} not divisible by {axis} axis "
                         f"({int(mesh.shape[axis])}); pad tokens and extend "
                         "kv_mask")
    tok = NamedSharding(mesh, P(None, None, axis, None))
    q, k, v = (jax.device_put(x, tok) for x in (q, k, v))
    if kv_mask is not None:
        kv_mask = jax.device_put(kv_mask, NamedSharding(mesh, P(None, axis)))
    return ring_attention(mesh, q, k, v, kv_mask, axis=axis, impl=impl,
                          interpret=interpret)
