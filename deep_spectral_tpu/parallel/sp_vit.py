"""Sequence-parallel ViT forward: the token dimension sharded over the mesh.

For inputs whose token count outgrows one chip (P=8 backbones beyond ~540px,
or matting-scale graphs), the framework's long-context plan shards tokens:
every row-wise op of the transformer (LayerNorm, qkv/proj/MLP matmuls with
replicated weights) runs on each device's token shard untouched, and
attention runs as ring attention — an n-hop K/V rotation over the mesh axis
with an online-softmax accumulator (parallel/ring_attention.py). The entire
12-block stack executes inside ONE `shard_map`, so no activation is ever
gathered; per-device memory is O(T / n_devices).

This module applies the SAME flax parameter tree as `models/vit.py`'s
VisionTransformer functionally (fp32 compute) and returns the head-merged
attention keys of a chosen block — the `extract_patch_keys` tensor — sharded
back to the caller. Equality with the single-device einsum model is
oracle-tested on the virtual CPU mesh (tests/test_sp_vit.py).

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


def _ln(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dense(x, p):
    return x @ p["kernel"] + p["bias"]


def sp_patch_features(
    mesh: Mesh,
    model: VisionTransformer,
    params,
    images: jax.Array,                      # (B, H, W, 3) normalized
    token_mask: Optional[jax.Array] = None,  # (B, N) patch validity
    *,
    which_block: int = -1,
    axis: str = MODEL_AXIS,
) -> jax.Array:
    """Token-sharded `extract_patch_keys`: (B, N, D) head-merged keys of
    `which_block`, CLS dropped. Fp32 compute (the SP path exists for
    correctness at scales a single chip cannot hold; use the single-chip bf16
    path otherwise)."""
    cfg = model.cfg
    p = params["params"]
    Pz = cfg.patch_size
    B, Hi, Wi, _ = images.shape
    h, w = Hi // Pz, Wi // Pz
    N = h * w
    D = cfg.embed_dim
    H = cfg.num_heads
    hd = D // H
    n_shards = int(mesh.shape[axis])

    # ---- replicated front end: patch embed + CLS + pos ----
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

    # pad tokens to a multiple of the axis size; padding is masked inert
    T = 1 + N
    Tp = -(-T // n_shards) * n_shards
    if Tp != T:
        tokens = jnp.pad(tokens, ((0, 0), (0, Tp - T), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, Tp - T)))

    which_block = which_block % cfg.depth

    def local(tok_l, mask_l):
        for i in range(cfg.depth):
            blk = p[f"blocks_{i}"]
            hh = _ln(tok_l, blk["norm1"])
            qkv = _dense(hh, blk["attn"]["qkv"])
            Tl = tok_l.shape[1]
            qkv = qkv.reshape(B, Tl, 3, H, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, Tl, H, hd)
            if i == which_block:
                # the extracted keys come from this block's qkv projection;
                # its attention/MLP (and all later blocks) cannot affect them
                return k.reshape(B, Tl, D)
            o = ring_attention_local(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), mask_l, axis=axis, n_shards=n_shards)
            o = o.transpose(0, 2, 1, 3).reshape(B, Tl, D)
            tok_l = tok_l + _dense(o, blk["attn"]["proj"])
            tok_l = tok_l + _dense(
                jax.nn.gelu(_dense(_ln(tok_l, blk["norm2"]), blk["mlp"]["fc1"]),
                            approximate=False), blk["mlp"]["fc2"])
        raise AssertionError("unreachable: which_block in range(depth)")

    tok_spec = P(None, axis, None)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(tok_spec, P(None, axis)),
                   out_specs=tok_spec)
    tokens = jax.device_put(tokens, NamedSharding(mesh, tok_spec))
    mask = jax.device_put(mask, NamedSharding(mesh, P(None, axis)))
    k_all = fn(tokens, mask)
    return k_all[:, 1:T]                     # drop CLS + padding
