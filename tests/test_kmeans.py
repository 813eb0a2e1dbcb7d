"""k-means / PCA kernels vs sklearn oracles (metric-level parity: identical
clusterings on well-separated data; same objective value class on hard data)."""
import numpy as np
import jax
import jax.numpy as jnp
from sklearn.cluster import KMeans as SkKMeans
from sklearn.decomposition import PCA as SkPCA

from deep_spectral_tpu.ops import kmeans, pca


def _blobs(rng, k=4, n_per=50, d=8, spread=0.05):
    centers = rng.standard_normal((k, d)) * 3.0
    X = np.concatenate([c + spread * rng.standard_normal((n_per, d)) for c in centers])
    y = np.repeat(np.arange(k), n_per)
    return X.astype(np.float32), y


def _cluster_agreement(a, b):
    """Fraction of pairs on which two labelings agree (Rand-index style)."""
    a, b = np.asarray(a), np.asarray(b)
    same_a = a[:, None] == a[None, :]
    same_b = b[:, None] == b[None, :]
    return np.mean(same_a == same_b)


def test_kmeans_recovers_blobs(rng):
    X, y = _blobs(rng)
    res = kmeans(jnp.asarray(X), 4, jax.random.PRNGKey(0))
    assert _cluster_agreement(res.labels, y) == 1.0


def test_kmeans_matches_sklearn_objective(rng):
    X, _ = _blobs(rng, k=5, n_per=40, spread=0.8)
    res = kmeans(jnp.asarray(X), 5, jax.random.PRNGKey(0), n_init=10)
    sk = SkKMeans(n_clusters=5, n_init=10, random_state=0).fit(X)
    # Same optimization problem: inertias should agree within 2%.
    assert float(res.inertia) <= sk.inertia_ * 1.02


def test_kmeans_mask_ignores_padding(rng):
    X, y = _blobs(rng, k=3, n_per=30)
    pad = np.full((17, X.shape[1]), 100.0, np.float32)  # far-away junk
    Xp = np.concatenate([X, pad])
    mask = np.zeros(len(Xp), bool)
    mask[: len(X)] = True
    res = kmeans(jnp.asarray(Xp), 3, jax.random.PRNGKey(1), mask=jnp.asarray(mask))
    assert _cluster_agreement(np.asarray(res.labels)[: len(X)], y) == 1.0
    assert np.all(np.asarray(res.labels)[len(X):] == -1)
    # No center should sit on the padding.
    assert np.abs(np.asarray(res.centers)).max() < 50.0


def test_pca_matches_sklearn(rng):
    X = rng.standard_normal((200, 32)).astype(np.float32)
    ours = np.asarray(pca(jnp.asarray(X), 8))
    ref = SkPCA(8, svd_solver="full").fit_transform(X)
    # Compare per component up to sign (sign is a free choice of the SVD).
    for j in range(8):
        err_pos = np.abs(ours[:, j] - ref[:, j]).max()
        err_neg = np.abs(ours[:, j] + ref[:, j]).max()
        assert min(err_pos, err_neg) < 1e-3
