"""Checkpoint-converter coverage for ALL FOUR reference DINO variants
(VERDICT r4 #8): synthetically build a torch-hub-style state dict with the
exact key naming and tensor shapes `torch.hub.load('facebookresearch/dino')`
checkpoints carry (reference: extract/extract_utils.py:40-50), convert, and
pin the resulting flax tree against the model's own init tree — so the
converter's key map and transposes cannot bit-rot while the real-weight
parity test (tests/test_real_weights.py) stays environment-gated.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deep_spectral_tpu.models.convert import (convert_dino_torch_checkpoint,
                                              load_params)
from deep_spectral_tpu.models.vit import (VIT_CONFIGS, get_model_config,
                                          init_vit_params, vit_forward)

VARIANTS = ["dino_vits16", "dino_vits8", "dino_vitb16", "dino_vitb8"]


def synthetic_dino_state_dict(cfg, seed=0):
    """A random state dict with exactly the DINO ViT checkpoint schema:
    cls_token / pos_embed / patch_embed.proj.* / blocks.{i}.{norm1,attn.qkv,
    attn.proj,norm2,mlp.fc1,mlp.fc2}.* / norm.* (torch Linear = (out, in))."""
    g = torch.Generator().manual_seed(seed)
    D, P, H = cfg.embed_dim, cfg.patch_size, int(cfg.mlp_ratio * cfg.embed_dim)
    t = lambda *s: (torch.randn(*s, generator=g) * 0.02)
    sd = {
        "cls_token": t(1, 1, D),
        "pos_embed": t(1, 1 + cfg.pos_grid ** 2, D),
        "patch_embed.proj.weight": t(D, 3, P, P),
        "patch_embed.proj.bias": t(D),
        "norm.weight": t(D), "norm.bias": t(D),
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        sd.update({
            b + "norm1.weight": t(D), b + "norm1.bias": t(D),
            b + "norm2.weight": t(D), b + "norm2.bias": t(D),
            b + "attn.qkv.weight": t(3 * D, D), b + "attn.qkv.bias": t(3 * D),
            b + "attn.proj.weight": t(D, D), b + "attn.proj.bias": t(D),
            b + "mlp.fc1.weight": t(H, D), b + "mlp.fc1.bias": t(H),
            b + "mlp.fc2.weight": t(D, H), b + "mlp.fc2.bias": t(D),
        })
    return sd


def _shape_map(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(kp): tuple(np.shape(v)) for kp, v in flat}


@pytest.mark.parametrize("name", VARIANTS)
def test_converted_tree_matches_init_tree(name):
    cfg = get_model_config(name)
    converted = convert_dino_torch_checkpoint(
        synthetic_dino_state_dict(cfg), cfg)
    _, ref = init_vit_params(cfg, seed=0)
    assert _shape_map(converted) == _shape_map(ref)


@pytest.mark.parametrize("name", VARIANTS)
def test_converted_params_run_forward(name):
    """Converted params must drive the flax forward (catches transpose-map
    regressions the shape check alone can't — e.g. a square attn.proj)."""
    cfg = get_model_config(name)
    params = convert_dino_torch_checkpoint(synthetic_dino_state_dict(cfg), cfg)
    from deep_spectral_tpu.models.vit import VisionTransformer
    model = VisionTransformer(cfg, jnp.float32)
    s = 2 * cfg.patch_size
    out = vit_forward(model, params, jnp.ones((1, s, s, 3), jnp.float32),
                      qkv_block=-1, n_intermediates=0)
    k = out["qkv"]["k"]
    assert k.shape == (1, 5, cfg.embed_dim)  # CLS + 2x2 patches
    assert np.isfinite(np.asarray(k)).all()


def test_load_params_strips_module_and_head(tmp_path, monkeypatch):
    """load_params must route a found checkpoint through the converter,
    stripping DDP 'module.' prefixes and projection-head keys the hub
    checkpoints sometimes carry (models/convert.py:95-96)."""
    name = "dino_vits16"
    cfg = get_model_config(name)
    sd = synthetic_dino_state_dict(cfg)
    wrapped = {"module." + k: v for k, v in sd.items()}
    wrapped["head.mlp.weight"] = torch.zeros(4, 4)
    torch.save({"state_dict": wrapped}, tmp_path / f"{name}.pth")
    monkeypatch.delenv("DSS_TPU_DINO_CKPT_DIR", raising=False)
    _, params = load_params(name, ckpt_dir=str(tmp_path))
    expect = convert_dino_torch_checkpoint(sd, cfg)
    got = params["params"]["blocks_0"]["attn"]["qkv"]["kernel"]
    want = expect["params"]["blocks_0"]["attn"]["qkv"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_all_reference_variants_registered():
    """The four torch.hub names the reference supports
    (extract/extract_utils.py:40-50) must stay registered with the published
    architectures (S=384/6h, B=768/12h; P in {8, 16})."""
    for name in VARIANTS:
        cfg = VIT_CONFIGS[name]
        assert cfg.depth == 12
        if "vits" in name:
            assert (cfg.embed_dim, cfg.num_heads) == (384, 6)
        else:
            assert (cfg.embed_dim, cfg.num_heads) == (768, 12)
        assert cfg.patch_size == (8 if name.endswith("8") else 16)
        assert cfg.img_size == 224
