"""Dense-CRF mean-field tests.

SimpleCRF is not installable here (and is the component being replaced), so these
are behavioral tests: the CRF must (a) denoise label speckle within homogeneous
color regions, (b) snap label boundaries to strong color edges, (c) preserve a
clean segmentation, and (d) the bilateral grid filter must approximate an exact
brute-force bilateral filter.
"""
import numpy as np
import jax.numpy as jnp

from crf_oracle import blobby_case, exact_mean_field
from deep_spectral_tpu.ops.crf import (
    bilateral_filter, dense_crf, gaussian_filter_2d,
)


def _two_region_image(H=64, W=64, noise=0.0, rng=None):
    """Left half dark, right half bright."""
    img = np.zeros((H, W, 3), np.float32)
    img[:, : W // 2] = 40.0
    img[:, W // 2:] = 210.0
    if noise and rng is not None:
        img = np.clip(img + rng.normal(0, noise, img.shape), 0, 255)
    return img


def test_gaussian_filter_is_separable_gaussian(rng):
    x = np.zeros((31, 31, 1), np.float32)
    x[15, 15] = 1.0
    out = np.asarray(gaussian_filter_2d(jnp.asarray(x), 3.0))[..., 0]
    import scipy.ndimage as ndi
    ref = ndi.gaussian_filter(x[..., 0], 3.0, truncate=2.5, mode="constant")
    # Ours is unnormalized; compare shapes after normalizing both.
    np.testing.assert_allclose(out / out.sum(), ref / ref.sum(), atol=1e-4)


def test_bilateral_filter_respects_edges(rng):
    img = _two_region_image()
    vals = rng.random((64, 64, 2)).astype(np.float32)
    vals[:, :32, 0] = 1.0
    vals[:, 32:, 0] = 0.0
    out, density = bilateral_filter(jnp.asarray(vals), jnp.asarray(img),
                                    alpha=16.0, beta=13.0)
    out = np.asarray(out)
    # Averaging stays within each color region: channel 0 stays ~1 left, ~0 right.
    assert out[:, :28, 0].min() > 0.9
    assert out[:, 36:, 0].max() < 0.1
    assert np.asarray(density).min() > 0


def test_bilateral_filter_matches_bruteforce(rng):
    """Small image: grid approximation vs exact O(N^2) bilateral average."""
    H = W = 16
    img = (rng.random((H, W, 3)) * 255).astype(np.float32)
    vals = rng.random((H, W, 1)).astype(np.float32)
    alpha, beta = 4.0, 26.0
    out, _ = bilateral_filter(jnp.asarray(vals), jnp.asarray(img), alpha, beta)
    out = np.asarray(out)[..., 0]

    yy, xx = np.mgrid[:H, :W]
    pos = np.stack([yy, xx], -1).reshape(-1, 2) / alpha
    col = img.reshape(-1, 3) / beta
    f = np.concatenate([pos, col], 1)
    k = np.exp(-0.5 * ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1))
    ref = (k @ vals.reshape(-1)) / k.sum(1)
    ref = ref.reshape(H, W)
    # Grid filtering is an approximation; require high correlation + low error.
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9, f"correlation {corr}"
    assert np.abs(out - ref).mean() < 0.08


def test_bilateral_filter_dense_path_is_exact(rng):
    """Round 4: small point counts take the exact dense-kernel path. At s=1
    (alpha < 8) it must reproduce the brute-force bilateral sum to float
    tolerance — not just the grid's 'high correlation' bar."""
    H = W = 16
    img = (rng.random((H, W, 3)) * 255).astype(np.float32)
    vals = rng.random((H, W, 1)).astype(np.float32)
    alpha, beta = 4.0, 26.0
    out, density = bilateral_filter(jnp.asarray(vals), jnp.asarray(img),
                                    alpha, beta)
    out = np.asarray(out)[..., 0]

    yy, xx = np.mgrid[:H, :W]
    pos = np.stack([yy, xx], -1).reshape(-1, 2) / alpha
    col = img.reshape(-1, 3) / beta
    f = np.concatenate([pos, col], 1)
    k = np.exp(-0.5 * ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1))
    ref_sum = k @ vals.reshape(-1)
    ref = (ref_sum / k.sum(1)).reshape(H, W)
    np.testing.assert_allclose(out, ref, atol=1e-4)
    # density is the exact kernel mass (unit gain — no grid calibration)
    np.testing.assert_allclose(np.asarray(density)[..., 0],
                               k.sum(1).reshape(H, W), rtol=1e-4)


def test_bilateral_filter_grid_path_still_approximates(rng, monkeypatch):
    """The 5-D grid path (now only reached for very large point counts) must
    stay a valid approximation — force it and re-check the brute-force
    agreement bar the dense path made trivial."""
    import deep_spectral_tpu.ops.crf as crf_mod
    monkeypatch.setattr(crf_mod, "_DENSE_MAX_POINTS", 0)
    import jax
    jax.clear_caches()  # drop dense-path traces for these shapes
    try:
        H = W = 16
        img = (rng.random((H, W, 3)) * 255).astype(np.float32)
        vals = rng.random((H, W, 1)).astype(np.float32)
        alpha, beta = 4.0, 26.0
        out, _ = crf_mod.bilateral_filter(jnp.asarray(vals), jnp.asarray(img),
                                          alpha, beta)
        out = np.asarray(out)[..., 0]
        yy, xx = np.mgrid[:H, :W]
        pos = np.stack([yy, xx], -1).reshape(-1, 2) / alpha
        col = img.reshape(-1, 3) / beta
        f = np.concatenate([pos, col], 1)
        k = np.exp(-0.5 * ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1))
        ref = ((k @ vals.reshape(-1)) / k.sum(1)).reshape(H, W)
        corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
        assert corr > 0.9, f"correlation {corr}"
        assert np.abs(out - ref).mean() < 0.08

        # end-to-end: forced-grid CRF still agrees >= 95% with the oracle
        img2, seg2 = blobby_case(np.random.default_rng(3), 56, 56)
        params = (10.0, 16.0, 13.0, 3.0, 3.0, 5.0)
        want = exact_mean_field(img2, seg2, 3, params)
        got = np.asarray(crf_mod.dense_crf(jnp.asarray(img2),
                                           jnp.asarray(seg2),
                                           num_classes=3, params=params))
        assert np.mean(got == want) >= 0.95
    finally:
        jax.clear_caches()  # don't leak grid-path traces to later tests


def test_crf_denoises_speckle(rng):
    img = _two_region_image(noise=5.0, rng=rng)
    seg = np.zeros((64, 64), np.int32)
    seg[:, 32:] = 1
    noisy = seg.copy()
    flip = rng.random(seg.shape) < 0.12
    noisy[flip] = 1 - noisy[flip]
    out = np.asarray(dense_crf(jnp.asarray(img), jnp.asarray(noisy), num_classes=2,
                               params=(10.0, 20.0, 13.0, 3.0, 3.0, 5.0)))
    err_before = (noisy != seg).mean()
    err_after = (out != seg).mean()
    assert err_after < err_before * 0.35, (err_before, err_after)


def test_crf_preserves_clean_segmentation():
    img = _two_region_image()
    seg = np.zeros((64, 64), np.int32)
    seg[:, 32:] = 1
    out = np.asarray(dense_crf(jnp.asarray(img), jnp.asarray(seg), num_classes=2,
                               params=(10.0, 20.0, 13.0, 3.0, 3.0, 5.0)))
    assert (out == seg).mean() > 0.98


def test_crf_refines_coarse_patch_segmap_to_pixel_blob(rng):
    """The pipeline scenario (VOC-like params, alpha=80): a 16x-coarse segmap
    of a color blob must snap to pixel-accurate boundaries, and the rest of a
    noisy image must stay background — the regression for the round-1 bug
    where normalized messages collapsed everything to the majority label."""
    H, W = 160, 240
    img = (rng.random((H, W, 3)) * 100).astype(np.float32)
    img[40:104, 80:176] = [210.0, 70.0, 60.0]  # blob
    # Coarse patch-level mask (16x), deliberately offset/blocky.
    seg = np.zeros((H, W), np.int32)
    seg[32:112, 80:176] = 2
    out = np.asarray(dense_crf(jnp.asarray(img), jnp.asarray(seg),
                               num_classes=4))  # default VOC params
    blob = np.zeros((H, W), bool)
    blob[40:104, 80:176] = True
    pred = out == 2
    iou = (pred & blob).sum() / (pred | blob).sum()
    assert iou > 0.9, iou
    assert set(np.unique(out)) == {0, 2}


def test_crf_snaps_to_color_edge(rng):
    """Segmentation boundary offset from the color edge should move toward it."""
    img = _two_region_image()
    seg = np.zeros((64, 64), np.int32)
    seg[:, 36:] = 1  # boundary 4px right of the color edge at 32
    out = np.asarray(dense_crf(jnp.asarray(img), jnp.asarray(seg), num_classes=2,
                               params=(10.0, 20.0, 13.0, 3.0, 3.0, 10.0)))
    # Count misassigned pixels relative to the color regions.
    true_seg = np.zeros_like(seg)
    true_seg[:, 32:] = 1
    assert (out != true_seg).mean() < (seg != true_seg).mean()


# Exact mean-field oracle + case generator shared with the calibration
# scripts: tests/crf_oracle.py (single source of truth).
def test_crf_matchesexact_mean_field_oracle(rng):
    """Grid CRF vs the exact dense oracle: >= 95% label agreement across
    images and parameter settings (VERDICT round-1 item #2; the calibrated
    GRID_SELF_GAIN in ops/crf.py was chosen by sweeping agreement with this
    oracle — scripts/validate_crf_oracle.py measured >= 99.9% at 12.9-16)."""
    param_sets = [
        (10.0, 80.0, 13.0, 3.0, 3.0, 5.0),   # reference defaults
        (10.0, 16.0, 13.0, 3.0, 3.0, 5.0),   # tighter spatial kernel
        (5.0, 40.0, 20.0, 3.0, 3.0, 5.0),
    ]
    for trial in range(2):
        img, seg = blobby_case(np.random.default_rng(trial), 56, 56)
        for params in param_sets:
            want = exact_mean_field(img, seg, 3, params)
            got = np.asarray(dense_crf(jnp.asarray(img), jnp.asarray(seg),
                                       num_classes=3, params=params))
            agree = np.mean(got == want)
            assert agree >= 0.95, f"trial {trial} params {params}: {agree:.4f}"
