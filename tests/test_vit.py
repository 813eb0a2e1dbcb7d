"""Cross-framework parity: the flax DINO ViT vs an independent torch
implementation of the same architecture (DINO ViT-S: pre-norm blocks, single qkv
linear, exact GELU, LN eps 1e-6, bicubic pos-embed interpolation).

The torch model below is written from the published DINO architecture as a test
oracle; random weights are converted with `convert_dino_torch_checkpoint` and both
forwards must agree to float tolerance — this validates the converter AND the flax
forward in one shot, including the reference's hooked-qkv tensor
(reference: extract/extract.py:96-98) and get_intermediate_layers semantics
(reference: semantic-segmentation/model/model.py:68-77).
"""
import math

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from deep_spectral_tpu.models import (
    VisionTransformer, ViTConfig, convert_dino_torch_checkpoint,
)
from deep_spectral_tpu.models.vit import extract_patch_keys

CFG = ViTConfig(patch_size=8, embed_dim=64, depth=3, num_heads=4, img_size=32)


class TorchBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn_qkv = nn.Linear(dim, dim * 3)
        self.attn_proj = nn.Linear(dim, dim)
        self.heads = heads
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.fc2 = nn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x):
        B, T, D = x.shape
        h = self.norm1(x)
        qkv = self.attn_qkv(h).reshape(B, T, 3, self.heads, D // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)  # (3, B, H, T, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (1.0 / math.sqrt(D // self.heads))
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, T, D)
        x = x + self.attn_proj(out)
        h = self.norm2(x)
        x = x + self.fc2(F.gelu(self.fc1(h)))
        # the reference's hook tensor: head-merged k (extract/extract.py:96-98)
        k_merged = k.transpose(1, 2).reshape(B, T, D)
        return x, k_merged


class TorchViT(nn.Module):
    def __init__(self, cfg: ViTConfig):
        super().__init__()
        self.cfg = cfg
        grid = cfg.img_size // cfg.patch_size
        self.proj = nn.Conv2d(3, cfg.embed_dim, cfg.patch_size, cfg.patch_size)
        self.cls_token = nn.Parameter(torch.randn(1, 1, cfg.embed_dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, 1 + grid * grid, cfg.embed_dim) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchBlock(cfg.embed_dim, cfg.num_heads) for _ in range(cfg.depth)])
        self.norm = nn.LayerNorm(cfg.embed_dim, eps=1e-6)

    def interpolate_pos(self, h, w):
        grid = self.cfg.img_size // self.cfg.patch_size
        if (h, w) == (grid, grid):
            return self.pos_embed
        cls_pos = self.pos_embed[:, :1]
        patch_pos = self.pos_embed[:, 1:].reshape(1, grid, grid, -1).permute(0, 3, 1, 2)
        patch_pos = F.interpolate(patch_pos, size=(h, w), mode="bicubic",
                                  align_corners=False)
        patch_pos = patch_pos.permute(0, 2, 3, 1).reshape(1, h * w, -1)
        return torch.cat([cls_pos, patch_pos], dim=1)

    def forward(self, x, n_intermediates=1):
        B = x.shape[0]
        h, w = x.shape[2] // self.cfg.patch_size, x.shape[3] // self.cfg.patch_size
        t = self.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(B, -1, -1), t], dim=1)
        t = t + self.interpolate_pos(h, w)
        k_last = None
        inters = []
        for i, blk in enumerate(self.blocks):
            t, k_merged = blk(t)
            if i == len(self.blocks) - 1:
                k_last = k_merged
            if len(self.blocks) - i <= n_intermediates:
                inters.append(self.norm(t))
        return self.norm(t), k_last, inters

    def state_dict_dino_style(self):
        sd = {
            "cls_token": self.cls_token.data,
            "pos_embed": self.pos_embed.data,
            "patch_embed.proj.weight": self.proj.weight.data,
            "patch_embed.proj.bias": self.proj.bias.data,
            "norm.weight": self.norm.weight.data,
            "norm.bias": self.norm.bias.data,
        }
        for i, blk in enumerate(self.blocks):
            b = f"blocks.{i}."
            sd[b + "norm1.weight"] = blk.norm1.weight.data
            sd[b + "norm1.bias"] = blk.norm1.bias.data
            sd[b + "norm2.weight"] = blk.norm2.weight.data
            sd[b + "norm2.bias"] = blk.norm2.bias.data
            sd[b + "attn.qkv.weight"] = blk.attn_qkv.weight.data
            sd[b + "attn.qkv.bias"] = blk.attn_qkv.bias.data
            sd[b + "attn.proj.weight"] = blk.attn_proj.weight.data
            sd[b + "attn.proj.bias"] = blk.attn_proj.bias.data
            sd[b + "mlp.fc1.weight"] = blk.fc1.weight.data
            sd[b + "mlp.fc1.bias"] = blk.fc1.bias.data
            sd[b + "mlp.fc2.weight"] = blk.fc2.weight.data
            sd[b + "mlp.fc2.bias"] = blk.fc2.bias.data
        return sd


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tmodel = TorchViT(CFG).eval()
    params = convert_dino_torch_checkpoint(tmodel.state_dict_dino_style(), CFG)
    jmodel = VisionTransformer(CFG)
    return tmodel, jmodel, params


def _forward_both(models, H, W, n_intermediates=1, seed=0):
    tmodel, jmodel, params = models
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((2, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        t_norm, t_k, t_inters = tmodel(torch.from_numpy(x),
                                       n_intermediates=n_intermediates)
    out = jmodel.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       qkv_block=-1, n_intermediates=n_intermediates)
    return (t_norm.numpy(), t_k.numpy(), [i.numpy() for i in t_inters]), out


def test_vit_forward_native_resolution(models):
    (t_norm, t_k, _), out = _forward_both(models, CFG.img_size, CFG.img_size)
    np.testing.assert_allclose(np.asarray(out["x_norm"]), t_norm, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["qkv"]["k"]), t_k, atol=2e-4)


def test_vit_forward_odd_resolution_pos_interp(models):
    """Non-square, non-pretraining resolution exercises bicubic pos interpolation."""
    (t_norm, t_k, _), out = _forward_both(models, 40, 56)
    np.testing.assert_allclose(np.asarray(out["x_norm"]), t_norm, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["qkv"]["k"]), t_k, atol=5e-4)


def test_vit_intermediate_layers(models):
    (_, _, t_inters), out = _forward_both(models, 32, 32, n_intermediates=3)
    assert len(out["intermediates"]) == 3
    for ti, ji in zip(t_inters, out["intermediates"]):
        np.testing.assert_allclose(np.asarray(ji), ti, atol=2e-4)


def test_extract_patch_keys_drops_cls(models):
    _, jmodel, params = models
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((1, 32, 32, 3)).astype(np.float32))
    k = extract_patch_keys(jmodel, params, x)
    N = (32 // CFG.patch_size) ** 2
    assert k.shape == (1, N, CFG.embed_dim)
    out = jmodel.apply(params, x, qkv_block=-1, n_intermediates=0)
    np.testing.assert_allclose(np.asarray(k), np.asarray(out["qkv"]["k"][:, 1:]), atol=1e-6)
