"""Sequence-parallel ViT forward (ring attention inside one shard_map) vs the
single-device einsum model, on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_spectral_tpu.models import ViTConfig, VisionTransformer, init_vit_params
from deep_spectral_tpu.models.vit import extract_patch_keys
from deep_spectral_tpu.parallel import make_mesh
from deep_spectral_tpu.parallel.mesh import MODEL_AXIS
from deep_spectral_tpu.parallel.sp_vit import sp_patch_features

CFG = ViTConfig(patch_size=8, embed_dim=64, depth=3, num_heads=4, img_size=32)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(axes=[(MODEL_AXIS, len(jax.devices()))])


@pytest.fixture(scope="module")
def model_params():
    model, params = (VisionTransformer(CFG, attention_impl="einsum"),
                     init_vit_params(CFG, seed=0)[1])
    return model, params


def test_sp_matches_single_device(rng, mesh, model_params):
    model, params = model_params
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    ref = np.asarray(extract_patch_keys(model, params, x))
    got = np.asarray(sp_patch_features(mesh, model, params, x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_sp_matches_with_ragged_mask(rng, mesh, model_params):
    """Bucketed batching: invalid tokens (including entire ring shards) must
    be inert, matching the masked single-device forward on valid tokens."""
    model, params = model_params
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    n = (64 // 8) ** 2
    mask = np.ones((2, n), bool)
    mask[0, 40:] = False
    mask[1, 61:] = False
    m = jnp.asarray(mask)
    ref = np.asarray(extract_patch_keys(model, params, x, token_mask=m))
    got = np.asarray(sp_patch_features(mesh, model, params, x, m))
    for b in range(2):
        valid = mask[b]
        np.testing.assert_allclose(got[b][valid], ref[b][valid],
                                   atol=2e-4, rtol=1e-4)


def test_sp_middle_block(rng, mesh, model_params):
    model, params = model_params
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(extract_patch_keys(model, params, x, which_block=1))
    got = np.asarray(sp_patch_features(mesh, model, params, x, which_block=1))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_sp_full_forward_matches_single_device(rng, mesh, model_params):
    """sp_vit_forward returns the single-chip output dict (x_norm, cls, qkv,
    intermediates) under token sharding — so the bbox-feature (CLS) and
    self-training (intermediates) paths can run at SP scale."""
    from deep_spectral_tpu.models.vit import vit_forward
    from deep_spectral_tpu.parallel.sp_vit import sp_vit_forward
    model, params = model_params
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    ref = vit_forward(model, params, x, qkv_block=1, n_intermediates=2)
    got = sp_vit_forward(mesh, model, params, x, qkv_block=1,
                         n_intermediates=2)
    np.testing.assert_allclose(np.asarray(got["x_norm"]),
                               np.asarray(ref["x_norm"]), atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["cls"]),
                               np.asarray(ref["cls"]), atol=5e-4, rtol=1e-4)
    for name in ("q", "k", "v"):
        np.testing.assert_allclose(np.asarray(got["qkv"][name]),
                                   np.asarray(ref["qkv"][name]),
                                   atol=5e-4, rtol=1e-4)
    assert len(got["intermediates"]) == len(ref["intermediates"]) == 2
    for a, b in zip(got["intermediates"], ref["intermediates"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


def test_sp_full_forward_masked(rng, mesh, model_params):
    from deep_spectral_tpu.models.vit import vit_forward
    from deep_spectral_tpu.parallel.sp_vit import sp_vit_forward
    model, params = model_params
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    n = (64 // 8) ** 2
    mask = np.ones((2, n), bool)
    mask[0, 40:] = False
    mask[1, 61:] = False
    m = jnp.asarray(mask)
    ref = vit_forward(model, params, x, token_mask=m)
    got = sp_vit_forward(mesh, model, params, x, m)
    full = np.concatenate([np.ones((2, 1), bool), mask], axis=1)
    for b in range(2):
        np.testing.assert_allclose(
            np.asarray(got["x_norm"])[b][full[b]],
            np.asarray(ref["x_norm"])[b][full[b]], atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["cls"]), np.asarray(ref["cls"]),
                               atol=5e-4, rtol=1e-4)


def test_sp_flash_hops_match_einsum_hops(rng, mesh, model_params):
    """attn_impl='flash' (Pallas tile per ring hop, interpret mode on CPU)
    must match the einsum-hop SP forward."""
    from deep_spectral_tpu.parallel.sp_vit import sp_patch_features
    model, params = model_params
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(sp_patch_features(mesh, model, params, x))
    got = np.asarray(sp_patch_features(mesh, model, params, x,
                                       attn_impl="flash", interpret=True))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


def test_sp_bf16(rng, mesh, model_params):
    """bf16 SP forward: per-token cosine vs the fp32 path must stay high
    (the long-context path is no longer correctness-grade fp32-only)."""
    from deep_spectral_tpu.parallel.sp_vit import sp_patch_features, sp_vit_forward
    model, params = model_params
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    ref = np.asarray(sp_patch_features(mesh, model, params, x))
    got = np.asarray(sp_patch_features(mesh, model, params, x,
                                       precision="bf16"))
    cos = np.sum(ref * got, -1) / (np.linalg.norm(ref, axis=-1) *
                                   np.linalg.norm(got, axis=-1) + 1e-12)
    assert cos.min() > 0.99, cos.min()
    out = sp_vit_forward(mesh, model, params, x, precision="bf16")
    from deep_spectral_tpu.models.vit import vit_forward
    reffull = vit_forward(model, params, x)
    ca = np.asarray(out["cls"])[0]
    cb = np.asarray(reffull["cls"])[0]
    cosc = float(np.dot(ca, cb) / (np.linalg.norm(ca) * np.linalg.norm(cb) + 1e-12))
    assert cosc > 0.99, cosc
