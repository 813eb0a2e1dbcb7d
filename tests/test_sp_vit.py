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
