"""Pipeline-parallel ViT (GPipe schedule in one shard_map) vs single-device."""
import numpy as np
import jax.numpy as jnp
import pytest

from deep_spectral_tpu.models.vit import ViTConfig, VisionTransformer, \
    init_vit_params, vit_forward
from deep_spectral_tpu.parallel.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from deep_spectral_tpu.parallel.pp_vit import pp_vit_forward


@pytest.fixture(scope="module")
def mesh():
    # 4-stage pipeline axis (depth 4 -> 1 block per stage) x 2 data
    return make_mesh(8, axes=[(DATA_AXIS, 2), (MODEL_AXIS, 4)])


@pytest.fixture(scope="module")
def model_params():
    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=4, num_heads=2,
                    img_size=32)
    model = VisionTransformer(cfg, attention_impl="einsum")
    _, params = init_vit_params(cfg, seed=0)
    return model, params


def test_pp_matches_single_device(rng, mesh, model_params):
    model, params = model_params
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    ref = vit_forward(model, params, x)
    got = pp_vit_forward(mesh, model, params, x, n_microbatches=2)
    np.testing.assert_allclose(np.asarray(got["x_norm"]),
                               np.asarray(ref["x_norm"]), atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["cls"]),
                               np.asarray(ref["cls"]), atol=5e-4, rtol=1e-4)


def test_pp_single_microbatch_and_full(rng, mesh, model_params):
    """M=1 (pure bubble) and M=B (deepest pipeline) both match."""
    model, params = model_params
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(vit_forward(model, params, x)["x_norm"])
    for m in (1, 4):
        got = np.asarray(pp_vit_forward(mesh, model, params, x,
                                        n_microbatches=m)["x_norm"])
        np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


def test_pp_masked(rng, mesh, model_params):
    """Padded tokens stay inert through the pipeline (validity-mask contract)."""
    model, params = model_params
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    n = (32 // 8) ** 2
    mask = np.ones((2, n), bool)
    mask[0, 10:] = False
    mask[1, 13:] = False
    m = jnp.asarray(mask)
    ref = vit_forward(model, params, x, token_mask=m)
    got = pp_vit_forward(mesh, model, params, x, m, n_microbatches=2)
    full = np.concatenate([np.ones((2, 1), bool), mask], axis=1)
    for b in range(2):
        np.testing.assert_allclose(
            np.asarray(got["x_norm"])[b][full[b]],
            np.asarray(ref["x_norm"])[b][full[b]], atol=5e-4, rtol=1e-4)


def test_pp_bf16(rng, mesh, model_params):
    model, params = model_params
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(vit_forward(model, params, x)["cls"])
    got = np.asarray(pp_vit_forward(mesh, model, params, x, n_microbatches=2,
                                    precision="bf16")["cls"])
    cos = np.sum(ref * got, -1) / (np.linalg.norm(ref, axis=-1) *
                                   np.linalg.norm(got, axis=-1) + 1e-12)
    assert cos.min() > 0.99, cos.min()


def test_pp_composes_with_dp(rng, mesh, model_params):
    """PP x DP: microbatches sharded over the data axis while stages shard
    over the model axis — the production composition."""
    model, params = model_params
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(vit_forward(model, params, x)["x_norm"])
    got = np.asarray(pp_vit_forward(mesh, model, params, x, n_microbatches=2,
                                    data_axis=DATA_AXIS)["x_norm"])
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


def test_pp_flash_attention(rng, mesh, model_params):
    """attn_impl='flash' (packed Pallas kernel per stage, interpret mode on
    CPU) must match the einsum stages."""
    model, params = model_params
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(pp_vit_forward(mesh, model, params, x,
                                    n_microbatches=2)["x_norm"])
    got = np.asarray(pp_vit_forward(mesh, model, params, x, n_microbatches=2,
                                    attn_impl="flash",
                                    interpret=True)["x_norm"])
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


def test_pp_rejects_bad_shapes(rng, mesh, model_params):
    model, params = model_params
    x = jnp.asarray(rng.standard_normal((3, 32, 32, 3)).astype(np.float32))
    with pytest.raises(ValueError, match="not divisible"):
        pp_vit_forward(mesh, model, params, x, n_microbatches=2)
