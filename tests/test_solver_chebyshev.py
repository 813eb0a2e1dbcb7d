"""Chebyshev-filtered subspace solver (opt-in) vs the exact dense path."""
import numpy as np
import jax.numpy as jnp
import pytest

from deep_spectral_tpu.ops.eigen import laplacian_eigs
from deep_spectral_tpu.ops.affinity import feature_affinity
from test_solver_lobpcg import _smooth_features


def _subspace_cos(V, V_ref):
    Q1, _ = np.linalg.qr(np.asarray(V).T)
    Q2, _ = np.linalg.qr(np.asarray(V_ref).T)
    return float(np.linalg.svd(Q1.T @ Q2, compute_uv=False).min())


@pytest.mark.parametrize("hw", [(24, 24), (40, 40)])
def test_chebyshev_matches_eigh(hw):
    K = 5
    for trial in range(2):
        feats = _smooth_features(np.random.default_rng(trial + hw[0]), *hw)
        W = jnp.asarray(np.asarray(feature_affinity(jnp.asarray(feats))))
        ev_r, V_r = laplacian_eigs(W, K, solver="eigh", apply_sign_fix=False)
        ev, V = laplacian_eigs(W, K, solver="chebyshev", apply_sign_fix=False)
        np.testing.assert_allclose(np.asarray(ev), np.asarray(ev_r),
                                   atol=5e-3, rtol=5e-2)
        assert _subspace_cos(V, V_r) > 0.999


def test_chebyshev_padding_inert(rng):
    """Masked (padded) nodes must not affect the valid subgraph's eigenpairs."""
    K = 4
    feats = _smooth_features(np.random.default_rng(0), 20, 20)
    W_valid = np.asarray(feature_affinity(jnp.asarray(feats)))
    n = W_valid.shape[0]
    pad = 37
    W_pad = np.zeros((n + pad, n + pad), np.float32)
    W_pad[:n, :n] = W_valid
    W_pad[n:, n:] = rng.random((pad, pad)).astype(np.float32)  # garbage
    mask = np.zeros(n + pad, bool)
    mask[:n] = True
    ev_r, V_r = laplacian_eigs(jnp.asarray(W_valid), K, solver="chebyshev",
                               apply_sign_fix=False)
    ev_p, V_p = laplacian_eigs(jnp.asarray(W_pad), K, solver="chebyshev",
                               mask=jnp.asarray(mask), apply_sign_fix=False)
    np.testing.assert_allclose(np.asarray(ev_p), np.asarray(ev_r), atol=1e-4)
    assert np.abs(np.asarray(V_p)[:, n:]).max() == 0.0
    assert _subspace_cos(np.asarray(V_p)[:, :n], V_r) > 0.999


def test_chebyshev_rejects_lapnorm_false(rng):
    W = jnp.asarray(rng.random((64, 64)).astype(np.float32))
    with pytest.raises(ValueError, match="lapnorm"):
        laplacian_eigs((W + W.T) / 2, 3, solver="chebyshev", lapnorm=False)
