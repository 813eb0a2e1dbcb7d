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


def test_rw_affinity_basic(rng):
    h, w = 7, 5
    image = rng.random((h, w, 3)).astype(np.float32)
    W = np.asarray(rw_affinity(jnp.asarray(image), sigma=0.1, radius=1))
    assert W.shape == (h * w, h * w)
    assert np.allclose(W, W.T, atol=1e-6)
    # Self-weight: exp(0) = 1 on the diagonal.
    np.testing.assert_allclose(np.diag(W), 1.0, atol=1e-6)
    # Non-window entries are zero: pixel (0,0) vs pixel (3,3).
    assert W[0, 3 * w + 3] == 0.0


def test_degree_vector_clamp():
    W = np.zeros((4, 4), np.float32)
    W[0, 1] = W[1, 0] = 2.0
    d = np.asarray(degree_vector(jnp.asarray(W)))
    np.testing.assert_allclose(d, [2.0, 2.0, 1.0, 1.0])  # zero rows clamp to 1
