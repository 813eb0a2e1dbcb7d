"""DINO Vision Transformer, TPU-native (flax.linen).

Replaces the reference's torch.hub DINO backbone + forward-hook feature tap
(reference: extract/extract.py:49-53, extract/extract_utils.py:40-50). Forward
hooks are a PyTorch idiom; in JAX the forward simply *returns* what is requested:
per-block q/k/v (head-merged, exactly the tensors the reference's qkv hook
produces), the last-n normalized intermediate layers (DINO's
`get_intermediate_layers`), the CLS embedding, and optionally the last block's
attention map (for the DINO-seg baseline,
reference: object-localization/main.py:292-303).

TPU-first notes:
  * NHWC layout end-to-end; patch embedding is a strided conv that XLA maps to
    the MXU.
  * All shapes static per (H, W) bucket; variable-resolution images are handled
    by the bucketing batcher in `deep_spectral_tpu.utils.bucketing`, with a token
    validity mask — never by dynamic shapes.
  * bfloat16 compute with float32 accumulation/normalization is supported via
    `compute_dtype`.
  * Positional embeddings are interpolated with an exact torch-bicubic kernel
    (a = -0.75) so features match the reference at any resolution.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bicubic


@dataclass(frozen=True)
class ViTConfig:
    patch_size: int
    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    img_size: int = 224  # pretraining resolution (defines stored pos_embed grid)

    @property
    def pos_grid(self) -> int:
        return self.img_size // self.patch_size


VIT_CONFIGS: dict[str, ViTConfig] = {
    # reference model names (extract/extract_utils.py:40-50, torch.hub dino)
    "dino_vits16": ViTConfig(16, 384, 12, 6),
    "dino_vits8": ViTConfig(8, 384, 12, 6),
    "dino_vitb16": ViTConfig(16, 768, 12, 12),
    "dino_vitb8": ViTConfig(8, 768, 12, 12),
    # tiny config for tests/CI smoke only — not a reference model
    "test_vit_tiny": ViTConfig(8, 32, 2, 2, img_size=32),
}


def get_model_config(name: str) -> ViTConfig:
    name = name.lower()
    if name not in VIT_CONFIGS:
        raise ValueError(f"unknown model {name!r}; have {sorted(VIT_CONFIGS)}")
    return VIT_CONFIGS[name]


class Attention(nn.Module):
    """Pre-norm multi-head self-attention that also exposes q/k/v and the
    attention probabilities.

    attention_impl: 'einsum' — materialized masked softmax (exact, returns
    attention maps); 'flash' — the Pallas flash kernel (scores never leave
    VMEM; the hot path for P=8 backbones at 3.6k+ tokens); 'auto' — flash on
    TPU for long sequences when attention maps aren't requested.
    """
    dim: int
    num_heads: int
    compute_dtype: Any = jnp.float32
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, token_mask: Optional[jax.Array] = None,
                 want_attn: bool = False):
        B, T, D = x.shape
        H = self.num_heads
        head_dim = D // H
        qkv = nn.Dense(3 * D, use_bias=True, name="qkv", dtype=self.compute_dtype)(x)
        qkv = qkv.reshape(B, T, 3, H, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, T, H, hd)

        from .flash_attention import will_use_flash
        impl = self.attention_impl
        if impl == "auto":
            # shared predicate with VisionTransformer's pad-once pre-padding
            # (see will_use_flash's docstring for the measured threshold)
            impl = "flash" if will_use_flash(impl, T, want_attn) else "einsum"

        if impl == "flash" and not want_attn:
            from .flash_attention import flash_attention_trainable
            # 'bthd' layout: the kernel gathers per-head blocks straight from
            # the qkv projection's (B, T, H, hd) output via its BlockSpec
            # index maps — no (B,H,T,hd) transposes in either direction
            # (profiled at ~0.9 ms/layer of pure HBM traffic at b64/T=1024).
            out = flash_attention_trainable(
                q, k, v, token_mask, jax.default_backend() != "tpu", "bthd")
            out = out.astype(self.compute_dtype)
            attn = None
        else:
            scale = 1.0 / math.sqrt(head_dim)
            logits = jnp.einsum("bthd,bshd->bhts", q, k,
                                preferred_element_type=jnp.float32) * scale
            if token_mask is not None:
                neg = jnp.asarray(-1e30, logits.dtype)
                logits = jnp.where(token_mask[:, None, None, :], logits, neg)
            attn = jax.nn.softmax(logits, axis=-1).astype(self.compute_dtype)
            out = jnp.einsum("bhts,bshd->bthd", attn, v,
                             preferred_element_type=jnp.float32).astype(self.compute_dtype)
        out = out.reshape(B, T, D)
        out = nn.Dense(D, use_bias=True, name="proj", dtype=self.compute_dtype)(out)

        # Head-merged q/k/v, identical to the reference's hook post-processing
        # (extract/extract.py:96-98): (B, T, D) with heads re-interleaved.
        qkv_merged = {
            "q": q.reshape(B, T, D),
            "k": k.reshape(B, T, D),
            "v": v.reshape(B, T, D),
        }
        return out, qkv_merged, (attn if want_attn else None)


class Mlp(nn.Module):
    dim: int
    hidden: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1", dtype=self.compute_dtype)(x)
        # torch nn.GELU default is exact erf — kept for the fp32 parity path.
        # Under bf16 compute the tanh approximation is used instead: its error
        # (|d| <= ~3e-3 near |x|~1) is below bf16's own resolution (~8e-3),
        # and erf is markedly more VPU work on the (B, T, 4D) intermediate —
        # the MLP fusions are the largest single cost of the ViT forward.
        approx = self.compute_dtype == jnp.bfloat16
        x = nn.gelu(x, approximate=approx)
        return nn.Dense(self.dim, name="fc2", dtype=self.compute_dtype)(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    compute_dtype: Any = jnp.float32
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, token_mask=None, want_attn=False):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1", dtype=jnp.float32)(x)
        h, qkv, attn = Attention(self.dim, self.num_heads, self.compute_dtype,
                                 self.attention_impl,
                                 name="attn")(h, token_mask, want_attn)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2", dtype=jnp.float32)(x)
        x = x + Mlp(self.dim, int(self.dim * self.mlp_ratio), self.compute_dtype,
                    name="mlp")(h)
        return x, qkv, attn


class VisionTransformer(nn.Module):
    """DINO ViT. Input: (B, H, W, 3) normalized image, H/W multiples of patch_size.

    Returns a dict with:
      'x_norm'         final LayerNorm'd tokens (B, 1+N, D)
      'cls'            final CLS embedding (B, D) — the reference's `model(x)` output
                       used for bbox features (extract/extract.py:538)
      'qkv'            {'q','k','v'}: head-merged qkv of block `qkv_block`
                       (B, 1+N, D) — the reference's hook tensor (extract.py:96-98)
      'intermediates'  tuple of the last `n_intermediates` blocks' outputs, each
                       LayerNorm'd, ascending block order — DINO's
                       get_intermediate_layers (used by the DeepLab wrapper,
                       reference: semantic-segmentation/model/model.py:68-77)
      'attn'           last-block attention (B, heads, 1+N, 1+N) if want_attn
    """
    cfg: ViTConfig
    compute_dtype: Any = jnp.float32
    attention_impl: str = "auto"
    # Rematerialize block activations in the backward pass (jax.checkpoint):
    # trades ~30% more FLOPs for O(depth) less activation memory — the standard
    # lever for large-batch training (see TrainConfig.remat).
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, qkv_block: int = -1,
                 n_intermediates: int = 1, want_attn: bool = False,
                 token_mask: Optional[jax.Array] = None,
                 pos_embed_override: Optional[jax.Array] = None):
        cfg = self.cfg
        B, H, W, C = x.shape
        P = cfg.patch_size
        if H % P or W % P:
            raise ValueError(f"input {H}x{W} not a multiple of patch size {P}")
        h, w = H // P, W // P
        N = h * w

        patches = nn.Conv(cfg.embed_dim, (P, P), strides=(P, P), padding="VALID",
                          name="patch_embed", dtype=self.compute_dtype)(
                              x.astype(self.compute_dtype))
        tokens = patches.reshape(B, N, cfg.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, cfg.embed_dim))
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, 1 + cfg.pos_grid * cfg.pos_grid, cfg.embed_dim),
        )
        if pos_embed_override is not None:
            # Caller-supplied (B or 1, 1+N, D) positional embeddings. Used by
            # bucket-padded evaluation: each image's pos embeds are interpolated
            # to ITS OWN valid grid (as an unpadded forward would) and placed at
            # the valid token positions of the bucket, so padding stays exactly
            # inert despite the grid-size-dependent interpolation below.
            pos = pos_embed_override
        else:
            pos = interpolate_pos_embed(pos_embed, cfg.pos_grid, h, w)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, cfg.embed_dim)), tokens], axis=1)
        tokens = (tokens + pos).astype(self.compute_dtype)

        if token_mask is not None:
            cls_mask = jnp.ones((B, 1), dtype=bool)
            token_mask = jnp.concatenate([cls_mask, token_mask], axis=1)

        # Pad the token sequence ONCE to the flash kernel's block multiple and
        # run every block at the padded length. Without this, each of the 12
        # blocks pads q/k/v going into the kernel and slices the output coming
        # out — profiled at ~24 ms of pure pad/slice/copy HBM traffic per
        # b64@T=901 forward on a v5e (~34% of the whole call) vs ~+14% extra
        # row count through LN/matmuls, a large net win. Padded tokens are
        # masked out of attention (kv_mask) and sliced off at the end; all
        # other ops are row-wise, so padding stays inert (pad-invariance
        # tests enforce this).
        T_valid = 1 + N
        padded_to = None
        if not want_attn:
            from .flash_attention import DEFAULT_BLOCK, will_use_flash
            will_flash = will_use_flash(self.attention_impl, T_valid, want_attn)
            Tp = -(-T_valid // DEFAULT_BLOCK) * DEFAULT_BLOCK
            if will_flash and Tp != T_valid:
                tokens = jnp.pad(tokens, ((0, 0), (0, Tp - T_valid), (0, 0)))
                if token_mask is None:
                    token_mask = jnp.ones((B, T_valid), dtype=bool)
                token_mask = jnp.pad(token_mask, ((0, 0), (0, Tp - T_valid)))
                padded_to = Tp

        qkv_block = qkv_block % cfg.depth
        final_norm = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=jnp.float32)

        qkv_out = None
        attn_out = None
        intermediates = []
        block_cls = nn.remat(Block, static_argnums=(3,)) if self.remat else Block
        for i in range(cfg.depth):
            want_this_attn = want_attn and (i == cfg.depth - 1)
            tokens, qkv, attn = block_cls(
                cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, self.compute_dtype,
                self.attention_impl,
                name=f"blocks_{i}")(tokens, token_mask, want_this_attn)
            if i == qkv_block:
                qkv_out = qkv
            if want_this_attn:
                attn_out = attn
            if cfg.depth - i <= n_intermediates:
                intermediates.append(final_norm(tokens))

        if padded_to is not None:
            intermediates = [t[:, :T_valid] for t in intermediates]
            tokens = tokens[:, :T_valid]
            if qkv_out is not None:
                qkv_out = {k2: v2[:, :T_valid] for k2, v2 in qkv_out.items()}

        x_norm = intermediates[-1] if intermediates else final_norm(tokens)
        out = {
            "x_norm": x_norm,
            "cls": x_norm[:, 0],
            "qkv": qkv_out,
            "intermediates": tuple(intermediates),
        }
        if want_attn:
            out["attn"] = attn_out
        return out


def interpolate_pos_embed(pos_embed: jax.Array, grid: int, h: int, w: int) -> jax.Array:
    """Bicubic-resample stored (1, 1+grid^2, D) positional embeddings to an (h, w)
    patch grid, DINO-style (torch bicubic, a=-0.75, align_corners=False)."""
    if h == grid and w == grid:
        return pos_embed
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:].reshape(1, grid, grid, -1)
    patch_pos = resize_bicubic(patch_pos, (h, w), channels_last=True)
    patch_pos = patch_pos.reshape(1, h * w, -1)
    return jnp.concatenate([cls_pos, patch_pos], axis=1)


def init_vit_params(name_or_cfg, seed: int = 0, compute_dtype=jnp.float32):
    """Deterministically initialize ViT params (for tests / before loading weights).

    Flax eager init dispatches hundreds of tiny ops; through a remote backend
    (the axon tunnel) each op is an RPC, and a random init measured 45-50 s of
    fixed wall per call (r5d session). Run the init on the host CPU backend and
    ship the finished pytree to the default device in one bulk transfer.
    """
    cfg = get_model_config(name_or_cfg) if isinstance(name_or_cfg, str) else name_or_cfg
    model = VisionTransformer(cfg, compute_dtype)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    default = jax.devices()[0]
    with jax.default_device(cpu if cpu is not None else default):
        dummy = jnp.zeros((1, cfg.patch_size * 2, cfg.patch_size * 2, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(seed), dummy)
    if cpu is not None and default.platform != "cpu":
        params = jax.device_put(params, default)
    return model, params


def vit_forward(model: VisionTransformer, params, images: jax.Array, **kwargs):
    """Functional forward; jit/vmap/pjit-friendly.

    fp32 compute runs under matmul precision 'highest': XLA:TPU would
    otherwise execute f32 matmuls as single bf16 MXU passes, making the
    'fp32 parity path' silently bf16 on hardware (see ops/eigen.py's TPU
    numerics note). bf16 compute keeps DEFAULT — one pass IS its contract.
    """
    if model.compute_dtype == jnp.float32:
        with jax.default_matmul_precision("highest"):
            return model.apply(params, images, **kwargs)
    return model.apply(params, images, **kwargs)


def extract_patch_keys(model: VisionTransformer, params, images: jax.Array,
                       which_block: int = -1, which_features: str = "k",
                       token_mask: Optional[jax.Array] = None) -> jax.Array:
    """Stage-1 feature kernel: head-merged attention keys of `which_block`, CLS
    dropped — the exact tensor the reference saves as features
    (reference: extract/extract.py:96-98, CLS dropped at :98).

    Returns (B, N, D).
    """
    out = vit_forward(model, params, images, qkv_block=which_block,
                      n_intermediates=0, token_mask=token_mask)
    return out["qkv"][which_features][:, 1:, :]
