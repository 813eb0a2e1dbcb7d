"""LOBPCG fast-solver parity vs the exact dense path on image-structured graphs
(the workload the 'auto' solver selects it for)."""
import numpy as np
import jax.numpy as jnp
import pytest

from deep_spectral_tpu.ops.eigen import laplacian_eigs, spectral_decompose
from deep_spectral_tpu.ops.affinity import feature_affinity


def _smooth_features(rng, h=24, w=24, d=64):
    """Image-like features: low-frequency spatial modes + an object blob."""
    yy, xx = np.mgrid[:h, :w] / h
    base = np.zeros((h, w, d), np.float32)
    for _ in range(6):
        fy, fx = rng.uniform(0.5, 3, 2)
        ph = rng.uniform(0, 2 * np.pi)
        base += np.sin(2 * np.pi * (fy * yy + fx * xx) + ph)[..., None] * \
            rng.standard_normal(d).astype(np.float32)
    cy, cx = rng.integers(6, h - 6), rng.integers(6, w - 6)
    blob = ((np.mgrid[:h, :w][0] - cy) ** 2 + (np.mgrid[:h, :w][1] - cx) ** 2) < 25
    base[blob] += 3 * rng.standard_normal(d).astype(np.float32)
    return base.reshape(-1, d)


@pytest.mark.parametrize("lapnorm", [True, False])
def test_lobpcg_solver_matches_eigh_on_image_graphs(rng, lapnorm):
    K = 5
    for trial in range(3):
        feats = _smooth_features(np.random.default_rng(trial))
        W = np.asarray(feature_affinity(jnp.asarray(feats)))
        ev, ex = laplacian_eigs(jnp.asarray(W), K, lapnorm=lapnorm,
                                solver="eigh", apply_sign_fix=False)
        lv, lx = laplacian_eigs(jnp.asarray(W), K, lapnorm=lapnorm,
                                solver="lobpcg", apply_sign_fix=False)
        ev, ex, lv, lx = (np.asarray(a) for a in (ev, ex, lv, lx))
        np.testing.assert_allclose(lv, ev, atol=5e-3, rtol=5e-2)
        for k in range(K):
            cos = abs(lx[k] @ ex[k]) / (np.linalg.norm(lx[k]) * np.linalg.norm(ex[k]))
            assert cos > 0.999, f"trial {trial} ev{k}: cos={cos}"


def test_lobpcg_k20_default_config(rng):
    """The extract_eigs default (K=20) on an image-structured graph: the auto
    solver's block is K+3=23, which needs N >= 93; verify quality holds for
    the deeper eigenspace too."""
    K = 20
    feats = _smooth_features(np.random.default_rng(7), h=30, w=30, d=96)
    W = np.asarray(feature_affinity(jnp.asarray(feats)))
    ev, ex = laplacian_eigs(jnp.asarray(W), K, solver="eigh", apply_sign_fix=False)
    lv, lx = laplacian_eigs(jnp.asarray(W), K, solver="lobpcg",
                            apply_sign_fix=False)
    ev, ex, lv, lx = (np.asarray(a) for a in (ev, ex, lv, lx))
    np.testing.assert_allclose(lv, ev, atol=1e-2, rtol=5e-2)
    # Individual high-index eigenvectors can rotate within near-degenerate
    # clusters; require subspace agreement (principal angles) instead.
    Q_e, _ = np.linalg.qr(ex.T)
    Q_l, _ = np.linalg.qr(lx.T)
    sv = np.linalg.svd(Q_e.T @ Q_l, compute_uv=False)
    assert sv.min() > 0.98, f"subspace alignment {sv.min()}"
    # The leading (well-separated) eigenvectors must still match individually.
    for k in range(6):
        cos = abs(lx[k] @ ex[k]) / (np.linalg.norm(lx[k]) * np.linalg.norm(ex[k]))
        assert cos > 0.99, f"ev{k}: cos={cos}"


@pytest.mark.parametrize("h,w", [(30, 30), (32, 64), (64, 64)])
def test_lobpcg_adaptive_iters_quality_sweep(h, w):
    """Documented quality floor for the auto iteration rule (60 iters for
    N <= 2048, 100 above): leading-K eigenvector cosine vs exact eigh >= 0.999
    across N in {900, 2048, 4096} on image-structured graphs."""
    K = 5
    feats = _smooth_features(np.random.default_rng(h * w), h=h, w=w, d=64)
    W = np.asarray(feature_affinity(jnp.asarray(feats)))
    ev, ex = laplacian_eigs(jnp.asarray(W), K, solver="eigh", apply_sign_fix=False)
    lv, lx = laplacian_eigs(jnp.asarray(W), K, solver="lobpcg",
                            apply_sign_fix=False)  # lobpcg_iters=None -> auto
    ev, ex, lv, lx = (np.asarray(a) for a in (ev, ex, lv, lx))
    np.testing.assert_allclose(lv, ev, atol=5e-3, rtol=5e-2)
    for k in range(K):
        cos = abs(lx[k] @ ex[k]) / (np.linalg.norm(lx[k]) * np.linalg.norm(ex[k]))
        assert cos > 0.999, f"N={h*w} ev{k}: cos={cos}"


def test_lobpcg_tol_early_exit_quality(rng):
    """Residual-based stopping: a loose tol must still deliver the 0.99 parity
    floor on an easy graph (and, inside lobpcg_standard's while_loop, exits
    early instead of burning the full iteration budget)."""
    K = 5
    feats = _smooth_features(np.random.default_rng(3))
    W = np.asarray(feature_affinity(jnp.asarray(feats)))
    ev, ex = laplacian_eigs(jnp.asarray(W), K, solver="eigh", apply_sign_fix=False)
    lv, lx = laplacian_eigs(jnp.asarray(W), K, solver="lobpcg",
                            lobpcg_iters=200, lobpcg_tol=1e-7,
                            apply_sign_fix=False)
    ev, ex, lv, lx = (np.asarray(a) for a in (ev, ex, lv, lx))
    np.testing.assert_allclose(lv, ev, atol=5e-3, rtol=5e-2)
    for k in range(K):
        cos = abs(lx[k] @ ex[k]) / (np.linalg.norm(lx[k]) * np.linalg.norm(ex[k]))
        assert cos > 0.99, f"ev{k}: cos={cos}"


def test_auto_solver_small_graph_uses_eigh(rng):
    """Small graphs must stay on the exact path (identical to solver='eigh')."""
    feats = rng.standard_normal((100, 16)).astype(np.float32)
    a = spectral_decompose(jnp.asarray(feats), 4, solver="auto")
    b = spectral_decompose(jnp.asarray(feats), 4, solver="eigh")
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-6)


def test_lobpcg_masked_padding(rng):
    K = 4
    feats = _smooth_features(np.random.default_rng(5))
    n = feats.shape[0]
    pad = 64
    W = np.asarray(feature_affinity(jnp.asarray(feats)))
    Wp = np.zeros((n + pad, n + pad), np.float32)
    Wp[:n, :n] = W
    mask = np.zeros(n + pad, bool)
    mask[:n] = True
    ev, ex = laplacian_eigs(jnp.asarray(W), K, solver="eigh", apply_sign_fix=False)
    lv, lx = laplacian_eigs(jnp.asarray(Wp), K, solver="lobpcg",
                            mask=jnp.asarray(mask), apply_sign_fix=False)
    np.testing.assert_allclose(np.asarray(lv), np.asarray(ev), atol=5e-3)
    lx = np.asarray(lx)
    assert np.abs(lx[:, n:]).max() < 1e-6
    for k in range(K):
        cos = abs(lx[k, :n] @ np.asarray(ex)[k]) / (
            np.linalg.norm(lx[k, :n]) * np.linalg.norm(np.asarray(ex)[k]))
        assert cos > 0.999
