"""Real-DINO-weight readiness (VERDICT round-1 item #9).

These tests run ONLY when a real torch DINO checkpoint is available locally
(`DSS_TPU_DINO_CKPT_DIR/dino_vits16.pth` — this environment has no network
egress, so torch.hub is not an option; reference loads the same weights via
`torch.hub.load('facebookresearch/dino:main', ...)`,
extract/extract_utils.py:40-50).

What they check when weights land:
  * the converter maps every tensor of the published checkpoint (shape-exact,
    no unconsumed keys besides the projection head);
  * the flax forward on the REAL weights agrees with the independent torch
    oracle (tests/test_vit.py's TorchViT) loaded with the SAME weights:
    per-patch k-feature cosine >= 0.9999 — the feature tensor the whole
    spectral pipeline consumes (reference hook: extract/extract.py:96-98).

See README "Real-weight parity recipe" for the one-command VOC07 CorLoc
parity run once a checkpoint is present.
"""
import os

import numpy as np
import pytest

from deep_spectral_tpu.models import convert_dino_torch_checkpoint
from deep_spectral_tpu.models.vit import get_model_config
from deep_spectral_tpu.models.convert import find_local_checkpoint

MODEL = "dino_vits16"

pytestmark = pytest.mark.skipif(
    find_local_checkpoint(MODEL) is None,
    reason="no real DINO checkpoint (set DSS_TPU_DINO_CKPT_DIR "
           f"with {MODEL}.pth to enable real-weight parity tests)",
)


def _real_state_dict():
    import torch
    path = find_local_checkpoint(MODEL)
    sd = torch.load(str(path), map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k.removeprefix("module."): v for k, v in sd.items()
            if not k.startswith("head.")}


def test_converter_consumes_full_checkpoint():
    sd = _real_state_dict()
    cfg = get_model_config(MODEL)
    params = convert_dino_torch_checkpoint(sd, cfg)["params"]
    # Every block present, embedding dims as published.
    assert params["pos_embed"].shape[-1] == cfg.embed_dim == 384
    assert params["patch_embed"]["kernel"].shape == (16, 16, 3, 384)
    for i in range(cfg.depth):
        assert f"blocks_{i}" in params
    # No architecture keys left unconsumed (the converter would have KeyError'd
    # on missing ones; check the reverse direction).
    consumed_prefixes = ("cls_token", "pos_embed", "patch_embed.", "norm.",
                         "blocks.")
    leftover = [k for k in sd if not k.startswith(consumed_prefixes)]
    assert not leftover, f"unconverted checkpoint keys: {leftover}"


def test_real_weight_feature_parity_vs_torch_oracle():
    """Flax forward with REAL weights vs the independent torch oracle with the
    SAME weights — golden-checks the k-feature tensor the pipeline consumes."""
    import torch
    import jax.numpy as jnp
    from test_vit import TorchViT  # the from-scratch oracle

    sd = _real_state_dict()
    cfg = get_model_config(MODEL)

    tmodel = TorchViT(cfg).eval()
    tsd = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "proj.weight": sd["patch_embed.proj.weight"],
        "proj.bias": sd["patch_embed.proj.bias"],
        "norm.weight": sd["norm.weight"],
        "norm.bias": sd["norm.bias"],
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        tsd[b + "norm1.weight"] = sd[b + "norm1.weight"]
        tsd[b + "norm1.bias"] = sd[b + "norm1.bias"]
        tsd[b + "norm2.weight"] = sd[b + "norm2.weight"]
        tsd[b + "norm2.bias"] = sd[b + "norm2.bias"]
        tsd[b + "attn_qkv.weight"] = sd[b + "attn.qkv.weight"]
        tsd[b + "attn_qkv.bias"] = sd[b + "attn.qkv.bias"]
        tsd[b + "attn_proj.weight"] = sd[b + "attn.proj.weight"]
        tsd[b + "attn_proj.bias"] = sd[b + "attn.proj.bias"]
        tsd[b + "fc1.weight"] = sd[b + "mlp.fc1.weight"]
        tsd[b + "fc1.bias"] = sd[b + "mlp.fc1.bias"]
        tsd[b + "fc2.weight"] = sd[b + "mlp.fc2.weight"]
        tsd[b + "fc2.bias"] = sd[b + "mlp.fc2.bias"]
    tmodel.load_state_dict({k: torch.as_tensor(np.asarray(v))
                            for k, v in tsd.items()})

    from deep_spectral_tpu.models import VisionTransformer
    params = convert_dino_torch_checkpoint(sd, cfg)
    jmodel = VisionTransformer(cfg)

    rng = np.random.default_rng(0)
    x = rng.uniform(-2.0, 2.0, (1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        t_norm, t_k, _ = tmodel(torch.from_numpy(x))
    out = jmodel.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       qkv_block=-1, n_intermediates=1)
    j_k = np.asarray(out["qkv"]["k"])[0, 1:]   # per-patch keys, CLS dropped
    t_k = t_k.numpy()[0, 1:]
    cos = np.sum(j_k * t_k, -1) / (
        np.linalg.norm(j_k, axis=-1) * np.linalg.norm(t_k, axis=-1) + 1e-12)
    assert cos.min() > 0.9999, f"min per-patch k cosine {cos.min()}"
    np.testing.assert_allclose(np.asarray(out["x_norm"]), t_norm.numpy(),
                               atol=5e-3)
