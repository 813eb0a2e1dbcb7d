"""Ring attention (sequence-parallel over the mesh) vs the masked-softmax
oracle on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_spectral_tpu.models.flash_attention import _einsum_attention
from deep_spectral_tpu.parallel import make_mesh
from deep_spectral_tpu.parallel.mesh import MODEL_AXIS
from deep_spectral_tpu.parallel.ring_attention import ring_attention_sharded


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(axes=[(MODEL_AXIS, len(jax.devices()))])


def test_ring_matches_einsum_full_mask(rng, mesh):
    B, H, T, hd = 2, 3, 64, 16
    q = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    ref = np.asarray(_einsum_attention(q, k, v, None))
    out = np.asarray(ring_attention_sharded(mesh, q, k, v))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_ring_matches_einsum_ragged_mask(rng, mesh):
    """Ragged validity mask (bucketed batching): padded KV positions must be
    inert even when a whole ring shard is invalid for one image."""
    B, H, T, hd = 2, 2, 64, 8
    q = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[0, 40:] = False     # image 0: last 3 shards entirely invalid
    mask[1, 61:] = False
    m = jnp.asarray(mask)
    ref = np.asarray(_einsum_attention(q, k, v, m))
    out = np.asarray(ring_attention_sharded(mesh, q, k, v, m))
    for b in range(B):
        valid = mask[b]
        np.testing.assert_allclose(out[b][:, valid], ref[b][:, valid],
                                   atol=2e-5)


def test_ring_rejects_indivisible_T(rng, mesh):
    B, H, T, hd = 1, 1, 63, 8
    x = jnp.zeros((B, H, T, hd))
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention_sharded(mesh, x, x, x)


def test_ring_flash_hops_match_einsum_hops(rng, mesh):
    """Flash-tile ring hops (Pallas kernel per resident tile, interpret mode
    on CPU) vs the einsum-tile hops — including a ragged mask with one fully
    invalid shard, which exercises the finite-lse merge of all-masked hops."""
    B, H, T, hd = 2, 2, 64, 8
    q = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[0, 40:] = False
    m = jnp.asarray(mask)
    ref = np.asarray(ring_attention_sharded(mesh, q, k, v, m))
    out = np.asarray(ring_attention_sharded(mesh, q, k, v, m, impl="flash",
                                            interpret=True))
    assert np.isfinite(out).all()
    for b in range(B):
        valid = mask[b]
        np.testing.assert_allclose(out[b][:, valid], ref[b][:, valid],
                                   atol=2e-5)
