"""Flash-attention Pallas kernel vs the reference masked softmax (interpret
mode on CPU; the compiled path runs on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_spectral_tpu.models.flash_attention import flash_attention


def _reference_attention(q, k, v, kv_mask):
    hd = q.shape[-1]
    s = np.einsum("bhtd,bhsd->bhts", q, k) / np.sqrt(hd)
    if kv_mask is not None:
        s = np.where(kv_mask[:, None, None, :], s, -1e30)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhts,bhsd->bhtd", p, v)


@pytest.mark.parametrize("T", [256, 300, 901])
def test_flash_matches_reference(rng, T):
    B, H, hd = 2, 3, 64
    q = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    k = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    v = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), block_q=128, block_k=128,
                                     interpret=True))
    ref = _reference_attention(q, k, v, None)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_with_token_mask(rng):
    B, H, T, hd = 2, 2, 384, 64
    q = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    k = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    v = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    mask = np.ones((B, T), bool)
    mask[0, 200:] = False   # ragged batch: image 0 has only 200 valid tokens
    mask[1, 310:] = False
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), jnp.asarray(mask),
                                     block_q=128, block_k=128, interpret=True))
    ref = _reference_attention(q, k, v, mask)
    # Compare only valid Q rows (padded rows are never read downstream).
    np.testing.assert_allclose(out[0, :, :200], ref[0, :, :200], atol=2e-5)
    np.testing.assert_allclose(out[1, :, :310], ref[1, :, :310], atol=2e-5)


def test_flash_gradients_match_einsum(rng):
    """flash_attention_trainable's VJP equals differentiating the einsum path."""
    from deep_spectral_tpu.models.flash_attention import (
        flash_attention_trainable, _einsum_attention)
    B, H, T, hd = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[0, 200:] = False
    mask_j = jnp.asarray(mask)

    def loss_flash(q, k, v):
        out = flash_attention_trainable(q, k, v, mask_j, True)
        return jnp.sum(out[:, :, :200] ** 2)

    def loss_ref(q, k, v):
        out = _einsum_attention(q, k, v, mask_j)
        return jnp.sum(out[:, :, :200] ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_flash_gradients_ragged_mask_odd_T(rng):
    """Kernel backward with padding + ragged KV masks (the bucketed-batch case)."""
    from deep_spectral_tpu.models.flash_attention import (
        flash_attention_trainable, _einsum_attention)
    B, H, T, hd = 2, 2, 197, 64  # odd T -> internal padding
    q = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[0, 120:] = False
    mask[1, 60:] = False
    mask_j = jnp.asarray(mask)
    w = jnp.asarray(rng.standard_normal((hd,)).astype(np.float32))

    def loss(att_fn):
        def f(q, k, v):
            out = att_fn(q, k, v)
            # only valid rows contribute to the loss
            m = mask_j[:, None, :, None]
            return jnp.sum(jnp.where(m, out, 0.0) * w)
        return f

    gf = jax.grad(loss(lambda q, k, v: flash_attention_trainable(
        q, k, v, mask_j, True)), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda q, k, v: _einsum_attention(q, k, v, mask_j)),
                  argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        # Gradients at masked positions may differ (unused downstream); compare
        # valid rows only.
        for bb in range(B):
            n = int(mask[bb].sum())
            np.testing.assert_allclose(a[bb, :, :n], b[bb, :, :n],
                                       atol=2e-3, rtol=1e-3,
                                       err_msg=f"d{name} batch {bb}")


def test_flash_matches_vit_attention_module(rng):
    """The ViT's einsum attention and the flash kernel agree on identical
    inputs, including the CLS + mask layout the backbone uses."""
    T, hd, H = 197, 64, 4
    q = rng.standard_normal((1, H, T, hd)).astype(np.float32)
    k = rng.standard_normal((1, H, T, hd)).astype(np.float32)
    v = rng.standard_normal((1, H, T, hd)).astype(np.float32)
    mask = np.ones((1, T), bool)
    mask[0, 150:] = False
    mask[0, 0] = True  # CLS always valid
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), jnp.asarray(mask),
                                     block_q=128, block_k=128, interpret=True))
    import math
    logits = jnp.einsum("bhtd,bhsd->bhts", jnp.asarray(q), jnp.asarray(k)) \
        / math.sqrt(hd)
    logits = jnp.where(jnp.asarray(mask)[:, None, None, :], logits, -1e30)
    ref = jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(logits, -1),
                     jnp.asarray(v))
    np.testing.assert_allclose(out[0, :, :150], np.asarray(ref)[0, :, :150],
                               atol=2e-5)


def test_flash_unequal_block_sizes(rng):
    """block_q != block_k where neither divides the other's padded length:
    padding must go to a common multiple so no trailing tokens are dropped."""
    B, H, T, hd = 1, 2, 500, 64  # lcm(128, 192) = 384 -> Tp = 768
    q = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    k = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    v = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), block_q=128, block_k=192,
                                     interpret=True))
    ref = _reference_attention(q, k, v, None)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_bthd_layout_matches_bhtd(rng):
    """'bthd' (transpose-free qkv layout) forward + gradients match the
    'bhtd' path and the einsum oracle, including a ragged token mask."""
    import jax
    import jax.numpy as jnp
    from deep_spectral_tpu.models.flash_attention import (
        flash_attention_trainable, _einsum_attention)
    B, H, T, hd = 2, 3, 200, 32
    q = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, hd)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 150:] = False
    mask = jnp.asarray(mask)

    def loss_bhtd(q, k, v):
        o = flash_attention_trainable(q, k, v, mask, True, "bhtd")
        return jnp.sum(jnp.where(mask[:, None, :, None], o, 0.0) ** 2)

    def loss_bthd(qt, kt, vt):
        o = flash_attention_trainable(qt, kt, vt, mask, True, "bthd")
        return jnp.sum(jnp.where(mask[:, :, None, None], o, 0.0) ** 2)

    def loss_ref(q, k, v):
        o = _einsum_attention(q, k, v, mask)
        return jnp.sum(jnp.where(mask[:, None, :, None], o, 0.0) ** 2)

    t = lambda x: x.transpose(0, 2, 1, 3)
    l1, g1 = jax.value_and_grad(loss_bhtd, argnums=(0, 1, 2))(q, k, v)
    l2, g2 = jax.value_and_grad(loss_bthd, argnums=(0, 1, 2))(t(q), t(k), t(v))
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    np.testing.assert_allclose(float(l2), float(lr), rtol=1e-4)
    for a, b, c in zip(g1, g2, gr):
        np.testing.assert_allclose(np.asarray(t(b)), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(t(b)), np.asarray(c),
                                   atol=1e-3, rtol=1e-3)


def test_packed_two_level_kv_tiling_matches_einsum(rng):
    """Two-level KV tiling (block_k_minor < block_k) must be numerically
    identical to single-level: the online softmax just sees more, smaller KV
    tiles. Includes a ragged token mask that ends mid-minor-tile."""
    import jax.numpy as jnp
    from deep_spectral_tpu.models.flash_attention import (
        _einsum_attention, _flash_forward_packed)
    B, T, H, hd = 2, 640, 3, 32
    q = rng.standard_normal((B, T, H, hd)).astype(np.float32)
    k = rng.standard_normal((B, T, H, hd)).astype(np.float32)
    v = rng.standard_normal((B, T, H, hd)).astype(np.float32)
    mask = np.ones((B, T), bool)
    mask[1, 417:] = False  # ends inside a 128-minor tile
    t = lambda x: jnp.asarray(x.transpose(0, 2, 1, 3))
    ref = np.asarray(_einsum_attention(t(q), t(k), t(v), jnp.asarray(mask)))
    for bq, bk, bkm in [(128, 256, 128), (256, 256, 64), (128, 640, 128)]:
        out = np.asarray(_flash_forward_packed(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
            num_heads=H, block_q=bq, block_k=bk, block_k_minor=bkm,
            interpret=True))
        np.testing.assert_allclose(out.transpose(0, 2, 1, 3), ref, atol=2e-5,
                                   err_msg=f"blocks ({bq},{bk},{bkm})")


def test_packed_pad_scores_hd_is_identity(rng):
    """The pad_scores_hd MXU diagnostic (zero-padded scores contraction,
    VERDICT r3 #7 probe) must be bitwise-equivalent math: identical outputs
    to the unpadded kernel on the same blocks."""
    import jax.numpy as jnp
    from deep_spectral_tpu.models.flash_attention import _flash_forward_packed
    B, T, H, hd = 2, 384, 3, 32
    q = rng.standard_normal((B, T, H, hd)).astype(np.float32)
    k = rng.standard_normal((B, T, H, hd)).astype(np.float32)
    v = rng.standard_normal((B, T, H, hd)).astype(np.float32)
    mask = np.ones((B, T), bool)
    mask[1, 300:] = False
    base = np.asarray(_flash_forward_packed(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        num_heads=H, block_q=128, block_k=128, interpret=True))
    padded = np.asarray(_flash_forward_packed(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        num_heads=H, block_q=128, block_k=128, interpret=True,
        pad_scores_hd=True))
    np.testing.assert_array_equal(base, padded)


def test_packed_block_guard():
    """The packed kernel's block guard keeps the tuned blocks where they fit
    and, where the scoped-VMEM budget would overflow (T=4096 at single-level
    (512,1024) OOM'd on hardware at 16.47M/16M), shrinks block_q FIRST while
    staying single-level: the on-hardware sweep (T=3601 H=6 b16 v5e) measured
    (256,1024) single-level at 6.68 ms vs (512,1024,m512) two-level at
    10.89 ms — the minor tile's extra online-softmax rescales cost more than
    the larger q-block saves. The minor tile only shrinks once block_q hits
    its 128 floor, or when the caller forces one."""
    from deep_spectral_tpu.models.flash_attention import pick_packed_blocks
    assert pick_packed_blocks(1024, 6, 64) == (512, 1024, 1024)  # vits16 @480
    # vits8 @480: single-level (256, 1024) — the measured-fastest config
    assert pick_packed_blocks(3601, 6, 64) == (256, 1024, 1024)
    bq, bk, bkm = pick_packed_blocks(3601, 12, 64)               # vitb8 @480
    assert bq <= 256 and bk <= 1024
    assert pick_packed_blocks(1024, 12, 64)[0] <= 512            # vitb16 @480
    # explicit blocks are respected when they fit
    assert pick_packed_blocks(1024, 6, 64, 256, 512) == (256, 512, 512)
    # a caller-forced minor tile is honored
    assert pick_packed_blocks(3601, 6, 64, None, None, 512)[2] == 512
