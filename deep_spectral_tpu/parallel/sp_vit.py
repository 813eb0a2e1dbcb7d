"""Sequence-parallel ViT forward: the token dimension sharded over the mesh.

For inputs whose token count outgrows one chip (P=8 backbones beyond ~540px,
or matting-scale graphs), the framework's long-context plan shards tokens:
every row-wise op of the transformer (LayerNorm, qkv/proj/MLP matmuls with
replicated weights) runs on each device's token shard untouched, and
attention runs as ring attention — an n-hop K/V rotation over the mesh axis
with an online-softmax accumulator (parallel/ring_attention.py). The entire
block stack executes inside ONE `shard_map`, so no activation is ever
gathered; per-device memory is O(T / n_devices).

`sp_vit_forward` applies the SAME flax parameter tree as `models/vit.py`'s
VisionTransformer functionally and returns the single-chip forward's full
output dict — x_norm / cls / head-merged qkv of a chosen block /
final-normed intermediates — so the bbox-feature and self-training paths can
run at SP scale, not just the patch-feature extraction. Options:
  precision='bf16'  bf16 matmul chains (fp32 LayerNorm + fp32 online-softmax
                    accumulators, tanh GELU — mirrors the single-chip bf16
                    path), halving ICI ring traffic and HBM residency.
  attn_impl='flash' each ring hop runs the Pallas flash kernel over its
                    resident tile instead of a materialized einsum score
                    tile (MXU-tiled; see ring_attention_local).
Equality with the single-device model is oracle-tested on the virtual CPU
mesh (tests/test_sp_vit.py).

Reference provenance: the single-device forward mirrors
/root/reference/extract/extract.py:96-98 (qkv hook, CLS dropped); this file
only re-expresses it under token sharding.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vit import VisionTransformer, interpolate_pos_embed
from .mesh import MODEL_AXIS
from .ring_attention import ring_attention_local


def _ln(x, p, out_dtype=jnp.float32, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(out_dtype)


def _dense(x, p, dtype=jnp.float32):
    return x.astype(dtype) @ p["kernel"].astype(dtype) + p["bias"].astype(dtype)


def _embed_tokens(model, params, images, token_mask, n_shards):
    """Replicated front end (patch embed + CLS + interpolated pos embeds),
    padded to a multiple of the mesh axis; returns (tokens, mask, T_valid)."""
    cfg = model.cfg
    p = params["params"]
    Pz = cfg.patch_size
    B, Hi, Wi, _ = images.shape
    h, w = Hi // Pz, Wi // Pz
    N = h * w
    D = cfg.embed_dim

    patches = jax.lax.conv_general_dilated(
        images.astype(jnp.float32), p["patch_embed"]["kernel"],
        (Pz, Pz), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["patch_embed"]["bias"]
    tokens = patches.reshape(B, N, D)
    pos = interpolate_pos_embed(p["pos_embed"], cfg.pos_grid, h, w)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(p["cls_token"], (B, 1, D)), tokens], axis=1) + pos

    if token_mask is None:
        token_mask = jnp.ones((B, N), dtype=bool)
    mask = jnp.concatenate([jnp.ones((B, 1), bool), token_mask], axis=1)

    T = 1 + N
    Tp = -(-T // n_shards) * n_shards
    if Tp != T:
        tokens = jnp.pad(tokens, ((0, 0), (0, Tp - T), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, Tp - T)))
    return tokens, mask, T


def sp_vit_forward(
    mesh: Mesh,
    model: VisionTransformer,
    params,
    images: jax.Array,                      # (B, H, W, 3) normalized
    token_mask: Optional[jax.Array] = None,  # (B, N) patch validity
    *,
    qkv_block: int = -1,
    n_intermediates: int = 1,
    axis: str = MODEL_AXIS,
    precision: str = "fp32",
    attn_impl: str = "einsum",
    interpret: bool = False,
):
    """Token-sharded full ViT forward. Returns the single-chip output dict:
    {"x_norm": (B, 1+N, D), "cls": (B, D), "qkv": {"q","k","v"} each
    (B, 1+N, D) head-merged, "intermediates": tuple of final-normed last-n
    block outputs} — models/vit.py:284-292 semantics under SP.

    precision: 'fp32' | 'bf16' (bf16 matmuls, fp32 LN/softmax accumulators,
    tanh GELU — the single-chip bf16 recipe). attn_impl: 'einsum' | 'flash'
    ring hops (flash = Pallas kernel per resident tile; TPU path)."""
    if precision not in ("fp32", "bf16"):
        raise ValueError(f"precision must be 'fp32' or 'bf16', got {precision!r}")
    cfg = model.cfg
    p = params["params"]
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    B = images.shape[0]
    D = cfg.embed_dim
    H = cfg.num_heads
    hd = D // H
    n_shards = int(mesh.shape[axis])
    qkv_block = qkv_block % cfg.depth

    tokens, mask, T = _embed_tokens(model, params, images, token_mask, n_shards)

    def local(tok_l, mask_l):
        tok_l = tok_l.astype(dtype)
        Tl = tok_l.shape[1]
        qkv_l = None
        inters = []
        for i in range(cfg.depth):
            blk = p[f"blocks_{i}"]
            hh = _ln(tok_l, blk["norm1"], dtype)
            qkv = _dense(hh, blk["attn"]["qkv"], dtype)
            qkv = qkv.reshape(B, Tl, 3, H, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, Tl, H, hd)
            if i == qkv_block:
                qkv_l = (q.reshape(B, Tl, D), k.reshape(B, Tl, D),
                         v.reshape(B, Tl, D))
            o = ring_attention_local(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), mask_l, axis=axis,
                n_shards=n_shards, impl=attn_impl, interpret=interpret)
            o = o.transpose(0, 2, 1, 3).reshape(B, Tl, D)
            tok_l = tok_l + _dense(o, blk["attn"]["proj"], dtype)
            tok_l = tok_l + _dense(
                jax.nn.gelu(_dense(_ln(tok_l, blk["norm2"], dtype),
                                   blk["mlp"]["fc1"], dtype),
                            approximate=(dtype == jnp.bfloat16)),
                blk["mlp"]["fc2"], dtype)
            if cfg.depth - i <= n_intermediates:
                inters.append(_ln(tok_l, p["norm"], jnp.float32))
        x_norm_l = inters[-1] if inters else _ln(tok_l, p["norm"], jnp.float32)
        return (x_norm_l, *qkv_l, *inters)

    tok_spec = P(None, axis, None)
    n_out = 4 + n_intermediates
    fn = shard_map(local, mesh=mesh,
                   in_specs=(tok_spec, P(None, axis)),
                   out_specs=(tok_spec,) * n_out,
                   check_vma=(attn_impl != "flash"))
    tokens = jax.device_put(tokens, NamedSharding(mesh, tok_spec))
    mask = jax.device_put(mask, NamedSharding(mesh, P(None, axis)))
    outs = fn(tokens, mask)
    x_norm, q, k, v = (o[:, :T] for o in outs[:4])
    inters = tuple(o[:, :T].astype(jnp.float32) for o in outs[4:])
    return {
        "x_norm": x_norm,
        "cls": x_norm[:, 0],
        "qkv": {"q": q.astype(jnp.float32), "k": k.astype(jnp.float32),
                "v": v.astype(jnp.float32)},
        "intermediates": inters,
    }


def sp_patch_features(
    mesh: Mesh,
    model: VisionTransformer,
    params,
    images: jax.Array,                      # (B, H, W, 3) normalized
    token_mask: Optional[jax.Array] = None,  # (B, N) patch validity
    *,
    which_block: int = -1,
    axis: str = MODEL_AXIS,
    precision: str = "fp32",
    attn_impl: str = "einsum",
    interpret: bool = False,
) -> jax.Array:
    """Token-sharded `extract_patch_keys`: (B, N, D) head-merged keys of
    `which_block`, CLS dropped. Early-exits the block stack at `which_block`
    (the extracted keys come from its qkv projection; its attention/MLP and
    all later blocks cannot affect them) — the fast path when only stage-1
    features are needed. For cls/intermediates/full outputs use
    `sp_vit_forward`."""
    cfg = model.cfg
    p = params["params"]
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    if precision not in ("fp32", "bf16"):
        raise ValueError(f"precision must be 'fp32' or 'bf16', got {precision!r}")
    B = images.shape[0]
    D = cfg.embed_dim
    H = cfg.num_heads
    hd = D // H
    n_shards = int(mesh.shape[axis])
    which_block = which_block % cfg.depth

    tokens, mask, T = _embed_tokens(model, params, images, token_mask, n_shards)

    def local(tok_l, mask_l):
        tok_l = tok_l.astype(dtype)
        Tl = tok_l.shape[1]
        for i in range(cfg.depth):
            blk = p[f"blocks_{i}"]
            hh = _ln(tok_l, blk["norm1"], dtype)
            qkv = _dense(hh, blk["attn"]["qkv"], dtype)
            qkv = qkv.reshape(B, Tl, 3, H, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, Tl, H, hd)
            if i == which_block:
                return k.reshape(B, Tl, D).astype(jnp.float32)
            o = ring_attention_local(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), mask_l, axis=axis,
                n_shards=n_shards, impl=attn_impl, interpret=interpret)
            o = o.transpose(0, 2, 1, 3).reshape(B, Tl, D)
            tok_l = tok_l + _dense(o, blk["attn"]["proj"], dtype)
            tok_l = tok_l + _dense(
                jax.nn.gelu(_dense(_ln(tok_l, blk["norm2"], dtype),
                                   blk["mlp"]["fc1"], dtype),
                            approximate=(dtype == jnp.bfloat16)),
                blk["mlp"]["fc2"], dtype)
        raise AssertionError("unreachable: which_block in range(depth)")

    tok_spec = P(None, axis, None)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(tok_spec, P(None, axis)),
                   out_specs=tok_spec, check_vma=(attn_impl != "flash"))
    tokens = jax.device_put(tokens, NamedSharding(mesh, tok_spec))
    mask = jax.device_put(mask, NamedSharding(mesh, P(None, axis)))
    k_all = fn(tokens, mask)
    return k_all[:, 1:T]                     # drop CLS + padding
