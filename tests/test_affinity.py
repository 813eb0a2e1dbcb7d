"""Tests for the KNN/RW color affinity kernels against independent numpy
implementations of the reference semantics (reference: extract/extract_utils.py:151-204)."""
import numpy as np
import jax.numpy as jnp

from deep_spectral_tpu.ops import knn_affinity, rw_affinity, degree_vector


def _numpy_knn_affinity(image, n_neighbors=(20, 10), distance_weights=(2.0, 0.1)):
    """Brute-force numpy re-derivation of the reference's kd-tree + CSR construction
    (extract_utils.py:151-188): W[a,b] = #(b in knn(a)) + #(a in knn(b)) across lists."""
    h, w = image.shape[:2]
    n = h * w
    r, g, b = image.reshape(-1, 3).T
    x = np.tile(np.linspace(0, 1, w), h)
    y = np.repeat(np.linspace(0, 1, h), w)
    W = np.zeros((n, n), np.float64)
    for k, dw in zip(n_neighbors, distance_weights):
        f = np.stack([r, g, b, dw * x, dw * y], axis=1)
        d2 = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
        A = np.zeros((n, n))
        A[np.arange(n)[:, None], idx] = 1.0
        W += A + A.T
    return W


def test_knn_affinity_matches_bruteforce(rng):
    h, w = 9, 11
    image = rng.random((h, w, 3)).astype(np.float32)
    W = np.asarray(knn_affinity(jnp.asarray(image), n_neighbors=(8, 4)))
    W_ref = _numpy_knn_affinity(image, n_neighbors=(8, 4))
    # Ties in distance (grid coordinates collide) can be broken differently by
    # kd-tree vs top_k order; require near-exact agreement.
    frac_equal = np.mean(W == W_ref)
    assert frac_equal > 0.99, f"only {frac_equal:.4f} entries equal"
    assert np.allclose(W, W.T)
    assert set(np.unique(W)).issubset({0.0, 1.0, 2.0, 3.0, 4.0})


def test_knn_affinity_self_neighbor():
    """kd-tree KNN returns the query point itself => diagonal is 2*len(lists)."""
    image = np.random.default_rng(1).random((6, 6, 3)).astype(np.float32)
    W = np.asarray(knn_affinity(jnp.asarray(image), n_neighbors=(5, 3)))
    np.testing.assert_allclose(np.diag(W), 4.0)


def test_knn_affinity_mask_padding(rng):
    """Padded pixels must have zero affinity and not appear as neighbors."""
    h, w = 8, 8
    image = rng.random((h, w, 3)).astype(np.float32)
    mask = np.zeros(h * w, bool)
    mask[: 6 * 8] = True  # last two rows are padding
    W = np.asarray(knn_affinity(jnp.asarray(image), n_neighbors=(5,),
                                distance_weights=(2.0,), mask=jnp.asarray(mask)))
    assert np.abs(W[~mask]).max() == 0.0
    assert np.abs(W[:, ~mask]).max() == 0.0
    assert W[mask][:, mask].sum() > 0


def _pymatting_rw_oracle(image, sigma=0.033, r=1):
    """Direct numpy port of pymatting's `_rw_laplacian` inner loop
    (pymatting/laplacian/rw_laplacian.py — the function the reference calls via
    extract_utils.py:191-204): clamped window neighbors, Gaussian of squared
    color distance, CSR duplicate-summing."""
    h, w = image.shape[:2]
    n = h * w
    W = np.zeros((n, n), np.float64)
    for y in range(h):
        for x in range(w):
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    x2 = min(max(x + dx, 0), w - 1)
                    y2 = min(max(y + dy, 0), h - 1)
                    i = x + y * w
                    j = x2 + y2 * w
                    zi = image[y, x].astype(np.float64)
                    zj = image[y2, x2].astype(np.float64)
                    W[i, j] += np.exp(-np.sum((zi - zj) ** 2) / (2 * sigma**2))
    return W


def test_rw_affinity_matches_pymatting_oracle(rng):
    h, w = 7, 5
    image = rng.random((h, w, 3)).astype(np.float32)
    for sigma, radius in [(0.033, 1), (0.1, 1), (0.05, 2)]:
        W = np.asarray(rw_affinity(jnp.asarray(image), sigma=sigma, radius=radius))
        W_ref = _pymatting_rw_oracle(image, sigma=sigma, r=radius)
        np.testing.assert_allclose(W, W_ref, atol=1e-5)


def test_rw_affinity_basic(rng):
    h, w = 7, 5
    image = rng.random((h, w, 3)).astype(np.float32)
    W = np.asarray(rw_affinity(jnp.asarray(image), sigma=0.1, radius=1))
    assert W.shape == (h * w, h * w)
    assert np.allclose(W, W.T, atol=1e-6)
    # Interior self-weight: exactly one (0,0) offset => exp(0) = 1.
    assert abs(W[1 * w + 1, 1 * w + 1] - 1.0) < 1e-6
    # Corner pixel: offsets (-1,-1),(-1,0),(0,-1),(0,0) all clamp to self => diag 4.
    assert abs(W[0, 0] - 4.0) < 1e-6
    # Non-window entries are zero: pixel (0,0) vs pixel (3,3).
    assert W[0, 3 * w + 3] == 0.0


def test_rw_affinity_mask_padding(rng):
    """Bucketed rw affinity must equal pymatting on the unpadded image, embedded."""
    vh, vw, h, w = 5, 4, 7, 6
    image = rng.random((h, w, 3)).astype(np.float32)
    mask2d = np.zeros((h, w), bool)
    mask2d[:vh, :vw] = True
    W = np.asarray(rw_affinity(jnp.asarray(image), sigma=0.05, radius=1,
                               mask=jnp.asarray(mask2d.reshape(-1))))
    W_ref_small = _pymatting_rw_oracle(image[:vh, :vw], sigma=0.05, r=1)
    # Embed the small oracle into bucket coordinates.
    flat_mask = mask2d.reshape(-1)
    assert np.abs(W[~flat_mask]).max() == 0.0
    assert np.abs(W[:, ~flat_mask]).max() == 0.0
    np.testing.assert_allclose(W[np.ix_(flat_mask, flat_mask)], W_ref_small, atol=1e-5)


def test_degree_vector_clamp():
    W = np.zeros((4, 4), np.float32)
    W[0, 1] = W[1, 0] = 2.0
    d = np.asarray(degree_vector(jnp.asarray(W)))
    np.testing.assert_allclose(d, [2.0, 2.0, 1.0, 1.0])  # zero rows clamp to 1


def test_masked_affinities_zero_padded_rows_cols_exactly():
    """The w_premasked contract (ops/eigen.laplacian_eigs): every masked
    affinity construction must produce EXACTLY-zero padded rows/cols, since
    spectral_decompose skips the defensive W*m*m re-mask (two full (N, N)
    HBM streams) on that guarantee. == 0.0, not approx."""
    from deep_spectral_tpu.ops import feature_affinity

    rng = np.random.default_rng(11)
    h, w = 6, 5
    n = h * w
    mask = np.ones(n, bool)
    mask[-(w + 3):] = False  # bottom row + part of the one above
    mask2d = np.zeros((h, w), bool)
    mask2d[:5, :] = True  # rectangular for rw (top-left valid region)

    feats = rng.standard_normal((n, 64)).astype(np.float32)
    Wf = np.asarray(feature_affinity(jnp.asarray(feats),
                                     mask=jnp.asarray(mask)))
    image = rng.random((h, w, 3)).astype(np.float32)
    Wk = np.asarray(knn_affinity(jnp.asarray(image), (4, 2), (2.0, 0.1),
                                 mask=jnp.asarray(mask2d.reshape(-1))))
    Wr = np.asarray(rw_affinity(jnp.asarray(image),
                                mask=jnp.asarray(mask2d.reshape(-1))))
    for name, W, m in (("feature", Wf, mask),
                       ("knn", Wk, mask2d.reshape(-1)),
                       ("rw", Wr, mask2d.reshape(-1))):
        assert np.abs(W[~m]).max() == 0.0, f"{name}: padded rows not zero"
        assert np.abs(W[:, ~m]).max() == 0.0, f"{name}: padded cols not zero"
