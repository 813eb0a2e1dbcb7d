"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_spectral_tpu.parallel import (
    make_mesh, lobpcg_laplacian_eigs, sharded_spectral_decompose,
    sharded_patch_features, row_sharded_laplacian_eigs,
)
from deep_spectral_tpu.models import ViTConfig, VisionTransformer, init_vit_params
from deep_spectral_tpu.ops import laplacian_eigs


def _affinity(rng, n, d=32):
    f = rng.standard_normal((n, d)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    W = f @ f.T
    W = W * (W > 0)
    return (W / W.max()).astype(np.float32), f


def _cos(a, b):
    return abs(float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_lobpcg_matches_dense(rng):
    n, K = 300, 5
    W, _ = _affinity(rng, n)
    dv, dx = laplacian_eigs(jnp.asarray(W), K, apply_sign_fix=False)
    lv, lx = lobpcg_laplacian_eigs(jnp.asarray(W), K, iters=200,
                                   apply_sign_fix=False)
    np.testing.assert_allclose(np.asarray(lv), np.asarray(dv), atol=1e-3)
    for k in range(K):
        assert _cos(np.asarray(lx)[k], np.asarray(dx)[k]) > 0.99


def test_lobpcg_with_mask(rng):
    n, pad, K = 200, 56, 4
    W, _ = _affinity(rng, n)
    Wp = np.zeros((n + pad, n + pad), np.float32)
    Wp[:n, :n] = W
    mask = np.zeros(n + pad, bool)
    mask[:n] = True
    dv, dx = laplacian_eigs(jnp.asarray(W), K, apply_sign_fix=False)
    lv, lx = lobpcg_laplacian_eigs(jnp.asarray(Wp), K, iters=200,
                                   mask=jnp.asarray(mask), apply_sign_fix=False)
    np.testing.assert_allclose(np.asarray(lv), np.asarray(dv), atol=1e-3)
    for k in range(K):
        assert _cos(np.asarray(lx)[k, :n], np.asarray(dx)[k]) > 0.99
    assert np.abs(np.asarray(lx)[:, n:]).max() < 1e-6


def test_sharded_spectral_decompose_matches_single_device(rng):
    B, n, d, K = 8, 96, 24, 4
    feats = rng.standard_normal((B, n, d)).astype(np.float32)
    masks = np.ones((B, n), bool)
    mesh = make_mesh()
    sv, sx = sharded_spectral_decompose(mesh, jnp.asarray(feats),
                                        jnp.asarray(masks), K=K)
    from deep_spectral_tpu.ops.eigen import spectral_decompose_batched
    rv, rx = spectral_decompose_batched(jnp.asarray(feats), jnp.asarray(masks), K=K)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(rv), atol=1e-4)
    for b in range(B):
        for k in range(K):
            assert _cos(np.asarray(sx)[b, k], np.asarray(rx)[b, k]) > 0.999


def test_sharded_patch_features_matches_single_device(rng):
    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, img_size=32)
    model, params = init_vit_params(cfg)
    B, H, W = 8, 32, 32
    x = rng.standard_normal((B, H, W, 3)).astype(np.float32)
    mask = np.ones((B, (H // 8) * (W // 8)), bool)
    mesh = make_mesh()
    out = sharded_patch_features(mesh, model, params, jnp.asarray(x),
                                 jnp.asarray(mask))
    from deep_spectral_tpu.models.vit import extract_patch_keys
    ref = extract_patch_keys(model, params, jnp.asarray(x),
                             token_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_tensor_parallel_vit_matches_replicated(rng):
    """Megatron-style TP shardings produce identical features to replicated
    execution (XLA inserts the per-sublayer collectives)."""
    from deep_spectral_tpu.parallel.sharded import tp_sharded_patch_features
    from deep_spectral_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    from deep_spectral_tpu.models.vit import extract_patch_keys

    cfg = ViTConfig(patch_size=8, embed_dim=64, depth=2, num_heads=4, img_size=32)
    model, params = init_vit_params(cfg)
    mesh = make_mesh(8, axes=[(DATA_AXIS, 4), (MODEL_AXIS, 2)])
    B = 4
    x = rng.standard_normal((B, 32, 32, 3)).astype(np.float32)
    mask = np.ones((B, 16), bool)
    out = tp_sharded_patch_features(mesh, model, params, jnp.asarray(x),
                                    jnp.asarray(mask))
    ref = extract_patch_keys(model, params, jnp.asarray(x),
                             token_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_row_sharded_lobpcg_matches_dense(rng):
    n, K = 320, 4  # divisible by 8 for clean row blocks
    W, _ = _affinity(rng, n)
    mesh = make_mesh()
    dv, dx = laplacian_eigs(jnp.asarray(W), K, apply_sign_fix=False)
    sv, sx = row_sharded_laplacian_eigs(mesh, jnp.asarray(W), K, iters=200)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(dv), atol=1e-3)
    for k in range(K):
        assert _cos(np.asarray(sx)[k], np.asarray(dx)[k]) > 0.99
