"""Mesh-sharded entry points for the heavy pipeline kernels.

Two axes of scale, matching SURVEY.md section 2.3's TPU-native plan:

  * data axis — many images per step: the batched ViT forward and the batched
    spectral decomposition shard their leading batch dim across the mesh. This
    single mechanism replaces BOTH the reference's DDP (NCCL) data parallelism
    and its CPU `multiprocessing.Pool` over images.

  * model axis — one huge graph: for very large N the (N, N) affinity is
    row-block-sharded and the LOBPCG matvec's matmul is partitioned by XLA,
    which inserts the psum/all-gather collectives over ICI. This is the
    framework's sequence-parallel-shaped component: the patch-token dimension is
    sharded exactly where a ring-attention design would shard sequence.

All functions are thin `jax.jit` wrappers with explicit `in_shardings`/
`out_shardings`; the math lives in ops/ and parallel/lobpcg.py unchanged.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vit import VisionTransformer, extract_patch_keys
from ..ops.eigen import spectral_decompose_batched
from .lobpcg import lobpcg_laplacian_eigs
from .mesh import DATA_AXIS, MODEL_AXIS, batch_sharding, replicate_sharding


def sharded_spectral_decompose(
    mesh: Mesh,
    feats: jax.Array,                 # (B, N, D)
    masks: Optional[jax.Array] = None,  # (B, N)
    color_W: Optional[jax.Array] = None,  # (B, N, N)
    *,
    K: int = 5,
    **kwargs,
) -> Tuple[jax.Array, jax.Array]:
    """Data-parallel batched eigendecomposition: batch sharded over the mesh's
    data axis, results replicated to host. B must be a multiple of the data-axis
    size (pad with masked dummy rows)."""
    fn = partial(spectral_decompose_batched, K=K, **kwargs)
    in_shardings = (
        batch_sharding(mesh, 3),
        None if masks is None else batch_sharding(mesh, 2),
        None if color_W is None else batch_sharding(mesh, 3),
    )
    jitted = jax.jit(fn, in_shardings=in_shardings,
                     out_shardings=batch_sharding(mesh, 2))
    return jitted(feats, masks, color_W)


def sharded_patch_features(
    mesh: Mesh,
    model: VisionTransformer,
    params,
    images: jax.Array,       # (B, H, W, 3)
    token_mask: jax.Array,   # (B, N)
    which_block: int = -1,
) -> jax.Array:
    """Data-parallel ViT feature extraction: params replicated, batch sharded."""
    def fn(p, x, m):
        return extract_patch_keys(model, p, x, which_block=which_block,
                                  token_mask=m)
    jitted = jax.jit(fn, in_shardings=(replicate_sharding(mesh),
                                       batch_sharding(mesh, 4),
                                       batch_sharding(mesh, 2)),
                     out_shardings=batch_sharding(mesh, 3))
    return jitted(params, images, token_mask)


def tensor_parallel_param_shardings(mesh: Mesh, params, axis: str = MODEL_AXIS):
    """Megatron-style tensor-parallel sharding tree for the ViT parameters.

    Column-parallel qkv / mlp.fc1 (output dim sharded over `axis`) and
    row-parallel proj / mlp.fc2 (input dim sharded): each block then needs one
    psum per sublayer, which XLA inserts automatically from these annotations.
    Everything else (norms, embeddings) is replicated.

    Returns a pytree of NamedSharding matching `params`' structure.
    """
    def spec_for(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(str(n) for n in names)
        if leaf.ndim == 2:
            if "attn/qkv/kernel" in joined or "mlp/fc1/kernel" in joined:
                return NamedSharding(mesh, P(None, axis))   # column parallel
            if "attn/proj/kernel" in joined or "mlp/fc2/kernel" in joined:
                return NamedSharding(mesh, P(axis, None))   # row parallel
        if leaf.ndim == 1 and ("attn/qkv/bias" in joined
                               or "mlp/fc1/bias" in joined):
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def tp_sharded_patch_features(
    mesh: Mesh,
    model: VisionTransformer,
    params,
    images: jax.Array,
    token_mask: jax.Array,
    which_block: int = -1,
    axis: str = MODEL_AXIS,
):
    """ViT feature extraction with tensor-parallel weights over `axis` and the
    batch over the data axis (2-D mesh): the reference has no TP at all; here
    it lets one big model span chips while the batch also scales."""
    if axis not in mesh.axis_names:
        axis = mesh.axis_names[-1]  # 1-D mesh: TP over the only axis
    p_shardings = tensor_parallel_param_shardings(mesh, params, axis)
    params_sharded = jax.device_put(params, p_shardings)

    def fn(p, x, m):
        return extract_patch_keys(model, p, x, which_block=which_block,
                                  token_mask=m)

    data_axis = DATA_AXIS if (DATA_AXIS in mesh.axis_names
                              and DATA_AXIS != axis) else None
    x_spec = (NamedSharding(mesh, P(data_axis, None, None, None))
              if data_axis else replicate_sharding(mesh))
    m_spec = (NamedSharding(mesh, P(data_axis, None))
              if data_axis else replicate_sharding(mesh))
    jitted = jax.jit(fn, in_shardings=(p_shardings, x_spec, m_spec),
                     out_shardings=(NamedSharding(mesh, P(data_axis, None, None))
                                    if data_axis else replicate_sharding(mesh)))
    return jitted(params_sharded, images, token_mask)


def row_sharded_laplacian_eigs(
    mesh: Mesh,
    W: jax.Array,    # (N, N) affinity of ONE huge graph
    K: int,
    *,
    iters: int = 120,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Distributed smallest-K Laplacian eigensolve for a single graph too large
    for one chip: W is row-block-sharded over the model axis; every LOBPCG
    matvec is a sharded matmul with an XLA-inserted psum over ICI."""
    axis = MODEL_AXIS if MODEL_AXIS in mesh.axis_names else mesh.axis_names[0]
    w_sharding = NamedSharding(mesh, P(axis, None))
    m_sharding = None if mask is None else NamedSharding(mesh, P(axis))
    fn = partial(lobpcg_laplacian_eigs, K=K, iters=iters)
    jitted = jax.jit(lambda w, m: fn(w, mask=m),
                     in_shardings=(w_sharding, m_sharding),
                     out_shardings=replicate_sharding(mesh))
    return jitted(W, mask)
