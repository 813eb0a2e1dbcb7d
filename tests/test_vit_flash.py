"""ViT with the flash-attention impl matches the einsum impl end-to-end."""
import numpy as np
import jax.numpy as jnp

from deep_spectral_tpu.models import ViTConfig, VisionTransformer, init_vit_params


def test_vit_flash_matches_einsum(rng):
    cfg = ViTConfig(patch_size=8, embed_dim=64, depth=2, num_heads=4, img_size=32)
    _, params = init_vit_params(cfg, seed=0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    n = (64 // 8) ** 2
    mask = np.ones((2, n), bool)
    mask[1, 40:] = False
    mask = jnp.asarray(mask)

    m_ein = VisionTransformer(cfg, attention_impl="einsum")
    m_fla = VisionTransformer(cfg, attention_impl="flash")
    out_e = m_ein.apply(params, x, token_mask=mask)
    out_f = m_fla.apply(params, x, token_mask=mask)

    valid0 = np.r_[0, 1 + np.arange(n)]          # all tokens of image 0
    valid1 = np.r_[0, 1 + np.arange(40)]         # valid tokens of image 1
    a = np.asarray(out_e["x_norm"])
    b = np.asarray(out_f["x_norm"])
    np.testing.assert_allclose(b[0][valid0], a[0][valid0], atol=2e-4)
    np.testing.assert_allclose(b[1][valid1], a[1][valid1], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_f["qkv"]["k"]),
                               np.asarray(out_e["qkv"]["k"]), atol=2e-4)
