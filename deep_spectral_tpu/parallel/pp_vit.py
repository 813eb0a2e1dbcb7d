"""Pipeline-parallel ViT forward — GPipe schedule inside one `shard_map`.

Completes the framework's parallelism matrix (DP / TP / SP already exist):
the transformer's `depth` blocks are split into S = mesh['model'] stages,
each device holds ONLY its stage's parameters (the stacked per-stage param
tree is sharded over the mesh axis — per-device parameter memory is
O(depth / S)), and microbatched activations flow device-to-device over ICI
with `lax.ppermute`. The whole schedule — M + S - 1 ticks for M
microbatches, the classic GPipe bubble — runs inside ONE `shard_map`-ed
`lax.fori_loop`, so XLA sees a single compiled program with point-to-point
collectives, not a host-driven stage loop.

TPU-first choices:
  * stage compute is dense full-attention einsum per device (tokens are NOT
    sharded here — that is SP's job; PP shards the LAYER dimension), so
    every tick is pure MXU work on resident activations;
  * the bubble is traded for simplicity: every device computes every tick
    and the output mask keeps only valid microbatches — no data-dependent
    control flow, XLA-friendly;
  * outputs are psum-merged (only the last stage writes non-zeros), giving
    a replicated result without a gather of per-device buffers.

Apply-parity: uses the SAME flax parameter tree as models/vit.py and
returns the single-chip forward's {x_norm, cls}; equality is oracle-tested
on the virtual CPU mesh (tests/test_pp_vit.py).

Reference provenance: the forward mirrors /root/reference/extract/extract.py
:96-98's backbone application; the reference has no pipeline parallelism —
this is a TPU-native addition (SURVEY.md §2.3 'beyond the reference').
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.vit import VisionTransformer
from .mesh import MODEL_AXIS
from .sp_vit import _embed_tokens, _ln, _dense


def _block_apply(x, bp, mask, dtype, num_heads, attn_impl="einsum",
                 interpret=False):
    """One pre-norm transformer block, functional, full masked attention.
    x: (mb, T, D); bp: the `blocks_i` param subtree; mask: (mb, T) bool.
    attn_impl='flash' runs the packed Pallas kernel on the (mb, T, H, hd)
    qkv layout (no transposes) — the TPU path for P=8 token counts."""
    mb, T, D = x.shape
    hd = D // num_heads
    h = _ln(x, bp["norm1"], dtype)
    qkv = _dense(h, bp["attn"]["qkv"], dtype).reshape(mb, T, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]      # (mb, T, H, hd)
    if attn_impl == "flash":
        from ..models.flash_attention import flash_attention
        o = flash_attention(q, k, v, mask, layout="bthd",
                            interpret=interpret).astype(dtype)
    else:
        s = jnp.einsum("bthd,bshd->bhts", q, k,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        s = jnp.where(mask[:, None, None, :], s, -1e30)
        p_attn = jax.nn.softmax(s, axis=-1).astype(dtype)
        o = jnp.einsum("bhts,bshd->bthd", p_attn, v,
                       preferred_element_type=jnp.float32).astype(dtype)
    x = x + _dense(o.reshape(mb, T, D), bp["attn"]["proj"], dtype)
    x = x + _dense(
        jax.nn.gelu(_dense(_ln(x, bp["norm2"], dtype), bp["mlp"]["fc1"], dtype),
                    approximate=(dtype == jnp.bfloat16)),
        bp["mlp"]["fc2"], dtype)
    return x


def pp_vit_forward(
    mesh: Mesh,
    model: VisionTransformer,
    params,
    images: jax.Array,                       # (B, H, W, 3) normalized
    token_mask: Optional[jax.Array] = None,  # (B, N) patch validity
    *,
    n_microbatches: Optional[int] = None,
    axis: str = MODEL_AXIS,
    data_axis: Optional[str] = None,
    precision: str = "fp32",
    attn_impl: str = "einsum",
    interpret: bool = False,
):
    """Pipeline-parallel full ViT forward over the `axis` mesh dimension.

    Returns {"x_norm": (B, 1+N, D) fp32, "cls": (B, D) fp32} — the
    single-chip `vit_forward` semantics for the outputs the self-training
    and bbox-feature paths need. depth must divide by the axis size; B must
    divide by n_microbatches (default: the axis size, a full pipeline).

    data_axis: optionally ALSO shard each microbatch over a second mesh
    axis (PP x DP — the production composition): every data shard runs its
    own pipeline over the model axis; nothing crosses the data axis."""
    if precision not in ("fp32", "bf16"):
        raise ValueError(f"precision must be 'fp32' or 'bf16', got {precision!r}")
    cfg = model.cfg
    p = params["params"]
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    S = int(mesh.shape[axis])
    if cfg.depth % S:
        raise ValueError(f"depth {cfg.depth} not divisible by {S} stages")
    L = cfg.depth // S
    B = images.shape[0]
    M = n_microbatches or min(S, B)
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mb = B // M
    H = cfg.num_heads

    # Replicated front end (patch embed + CLS + pos); n_shards=1: no padding.
    tokens, mask, T = _embed_tokens(model, params, images, token_mask, 1)
    mbs = tokens.reshape(M, mb, T, -1).astype(dtype)
    mask_mb = mask.reshape(M, mb, T)

    # Stack block params into a (S, L, ...) staged tree, sharded over `axis`
    # on the leading dim — each device materializes only its own L blocks.
    blocks = [p[f"blocks_{i}"] for i in range(cfg.depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    staged = jax.tree.map(
        lambda x: x.reshape(S, L, *x.shape[1:]).astype(
            dtype if x.dtype == jnp.float32 else x.dtype), stacked)

    def local(staged_l, mbs_r, mask_r):
        my = jax.tree.map(lambda x: x[0], staged_l)      # this stage's (L, ...)
        s_idx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def stage_apply(x, m):
            def body(cx, bp):
                return _block_apply(cx, bp, m, dtype, H, attn_impl,
                                    interpret), None
            y, _ = jax.lax.scan(body, x, my)
            return y

        def tick(t, carry):
            cur, out = carry
            # device 0 injects microbatch t (clip keeps indices static-safe;
            # injections past M-1 are bubble garbage, masked at the output)
            inj = mbs_r[jnp.clip(t, 0, M - 1)]
            cur = jnp.where(s_idx == 0, inj, cur)
            m = mask_r[jnp.clip(t - s_idx, 0, M - 1)]
            y = stage_apply(cur, m)
            idx = t - (S - 1)
            ci = jnp.clip(idx, 0, M - 1)
            valid = (s_idx == S - 1) & (idx >= 0) & (idx < M)
            out = out.at[ci].set(jnp.where(valid, y.astype(jnp.float32),
                                           out[ci]))
            cur = jax.lax.ppermute(y, axis, perm)
            return cur, out

        # carries become device-varying inside tick (axis_index selects); the
        # initial values must carry the same varying-over-axis type.
        def _vary(x):
            if hasattr(jax.lax, "pcast"):
                return jax.lax.pcast(x, axis, to="varying")
            return jax.lax.pvary(x, axis)
        # zeros_like (not zeros): the carry must inherit the inputs' full
        # varying-axis type (e.g. the data axis under PP x DP composition).
        out0 = _vary(jnp.zeros_like(mbs_r, dtype=jnp.float32))
        cur0 = _vary(jnp.zeros_like(mbs_r[0]))
        _, out = jax.lax.fori_loop(0, M + S - 1, tick, (cur0, out0))
        # only the last stage wrote non-zeros; psum replicates the result
        return jax.lax.psum(out, axis)

    if data_axis is not None and data_axis in mesh.axis_names:
        dp = int(mesh.shape[data_axis])
        if mb % dp:
            raise ValueError(f"microbatch {mb} not divisible by "
                             f"{dp}-way data axis {data_axis!r}")
        mb_spec = P(None, data_axis)          # shard each microbatch's rows
    else:
        mb_spec = P()
    # pallas_call outputs carry no varying-mesh-axis annotation, so the
    # flash path disables shard_map's vma check (same as ring_attention).
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), mb_spec, mb_spec),
                   out_specs=mb_spec, check_vma=(attn_impl != "flash"))
    staged = jax.device_put(
        staged, jax.tree.map(lambda _: NamedSharding(mesh, P(axis)), staged))
    out = fn(staged, mbs, mask_mb)                        # (M, mb, T, D)
    x = out.reshape(B, T, -1)
    x_norm = _ln(x, p["norm"], jnp.float32)
    return {"x_norm": x_norm, "cls": x_norm[:, 0]}
