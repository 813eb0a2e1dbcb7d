"""Parity tests of the batched TPU eigensolver against the reference's numerics
(ARPACK generalized shift-invert eigsh — reference: extract/extract.py:227-234).

BASELINE.md north star: eigenvectors >= 0.99 cosine similarity up to sign.
"""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.sparse.linalg import eigsh

from deep_spectral_tpu.ops import (
    affinity_eigs,
    affinity_svd_eigs,
    feature_affinity,
    laplacian_eigs,
    sign_fix,
    spectral_decompose,
)


def _reference_laplacian_eigs(W: np.ndarray, K: int, lapnorm: bool = True):
    """The reference solver, verbatim semantics (extract/extract.py:221-234)."""
    D_vec = W.sum(axis=1)
    D_vec[D_vec < 1e-12] = 1.0
    D = np.diag(D_vec)
    L = D - W
    if lapnorm:
        evals, evecs = eigsh(L, k=K, sigma=0, which="LM", M=D)
    else:
        evals, evecs = eigsh(L, k=K, sigma=0, which="LM")
    return evals, evecs.T  # (K,), (K, N)


def _random_affinity(rng, n, d=32):
    feats = rng.standard_normal((n, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    W = feats @ feats.T
    W = W * (W > 0)
    W = W / W.max()
    np.fill_diagonal(W, 1.0)
    return W.astype(np.float32), feats


def _cosine_up_to_sign(a, b):
    a = a / (np.linalg.norm(a) + 1e-12)
    b = b / (np.linalg.norm(b) + 1e-12)
    return abs(float(a @ b))


@pytest.mark.parametrize("lapnorm", [True, False])
def test_laplacian_eigs_match_arpack(rng, lapnorm):
    n, K = 120, 5
    W, _ = _random_affinity(rng, n)
    ref_vals, ref_vecs = _reference_laplacian_eigs(W, K, lapnorm=lapnorm)
    vals, vecs = laplacian_eigs(jnp.asarray(W), K, lapnorm=lapnorm, apply_sign_fix=False)
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    np.testing.assert_allclose(vals, ref_vals, atol=2e-4, rtol=1e-3)
    for k in range(K):
        cos = _cosine_up_to_sign(vecs[k], ref_vecs[k])
        assert cos > 0.99, f"eigenvector {k}: cosine {cos}"


def test_laplacian_eigs_generalized_normalization(rng):
    """ARPACK returns M-orthonormal vectors: x^T D x = 1. We must match so that
    downstream thresholds (Fiedler > 0.0 etc.) see same-scale values."""
    n, K = 80, 4
    W, _ = _random_affinity(rng, n)
    d = W.sum(axis=1)
    vals, vecs = laplacian_eigs(jnp.asarray(W), K, lapnorm=True, apply_sign_fix=False)
    vecs = np.asarray(vecs)
    for k in range(K):
        dnorm = float(vecs[k] @ (d * vecs[k]))
        assert abs(dnorm - 1.0) < 1e-3


def test_laplacian_eigs_padded_mask_equals_unpadded(rng):
    """Bucketed padding must not perturb the valid subgraph's eigenpairs."""
    n, pad, K = 90, 38, 5
    W, _ = _random_affinity(rng, n)
    Wp = np.zeros((n + pad, n + pad), np.float32)
    Wp[:n, :n] = W
    mask = np.zeros(n + pad, bool)
    mask[:n] = True
    vals_u, vecs_u = laplacian_eigs(jnp.asarray(W), K, apply_sign_fix=False)
    vals_p, vecs_p = laplacian_eigs(jnp.asarray(Wp), K, mask=jnp.asarray(mask),
                                    apply_sign_fix=False)
    np.testing.assert_allclose(np.asarray(vals_p), np.asarray(vals_u), atol=1e-4)
    for k in range(K):
        cos = _cosine_up_to_sign(np.asarray(vecs_p)[k, :n], np.asarray(vecs_u)[k])
        assert cos > 0.999
    assert np.abs(np.asarray(vecs_p)[:, n:]).max() == 0.0


def test_affinity_eigs_match_arpack(rng):
    n, K = 100, 5
    W, _ = _random_affinity(rng, n)
    ref_vals, ref_vecs = eigsh(W, which="LM", k=K)  # ascending
    ref_vecs = ref_vecs[:, ::-1].T  # reference flips vectors only (extract.py:172)
    vals, vecs = affinity_eigs(jnp.asarray(W), K, apply_sign_fix=False)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-4, rtol=1e-4)
    for k in range(K):
        cos = _cosine_up_to_sign(np.asarray(vecs)[k], ref_vecs[k])
        assert cos > 0.99


def test_affinity_svd_eigs(rng):
    n, d, K = 64, 32, 5
    feats = rng.standard_normal((n, d)).astype(np.float32)
    U, S, _ = np.linalg.svd(feats, full_matrices=False)
    vals, vecs = affinity_svd_eigs(jnp.asarray(feats), K, apply_sign_fix=False)
    np.testing.assert_allclose(np.asarray(vals), S[:K], atol=1e-3, rtol=1e-3)
    for k in range(K):
        assert _cosine_up_to_sign(np.asarray(vecs)[k], U[:, k]) > 0.999


def test_sign_fix_matches_reference_rule():
    v = np.array([
        [0.6, 0.2, 0.1, -0.3],   # 75% positive -> flip
        [-0.6, -0.2, -0.1, 0.3],  # 25% positive -> keep
        [0.5, 0.2, 0.1, 0.3],     # 100% positive -> keep (strict < 1.0)
        [0.5, -0.2, 0.1, -0.3],   # exactly 50% -> keep (strict > 0.5)
    ], dtype=np.float32)
    out = np.asarray(sign_fix(jnp.asarray(v)))
    np.testing.assert_allclose(out[0], -v[0])
    np.testing.assert_allclose(out[1], v[1])
    np.testing.assert_allclose(out[2], v[2])
    np.testing.assert_allclose(out[3], v[3])


def test_spectral_decompose_end_to_end_matches_reference(rng):
    """Full fused path (normalize -> affinity -> laplacian -> eigh) vs the
    reference recipe run step-by-step in numpy/scipy."""
    n, d, K = 110, 48, 5
    feats = rng.standard_normal((n, d)).astype(np.float32)

    # Reference pipeline (extract/extract.py:146-234), numpy.
    f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    W = f @ f.T
    W = W * (W > 0)
    W = W / W.max()
    ref_vals, ref_vecs = _reference_laplacian_eigs(W.astype(np.float32), K)

    vals, vecs = spectral_decompose(jnp.asarray(feats), K, which_matrix="laplacian")
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    np.testing.assert_allclose(vals, ref_vals, atol=2e-4, rtol=1e-3)
    for k in range(K):
        assert _cosine_up_to_sign(vecs[k], ref_vecs[k]) > 0.99


def test_spectral_decompose_with_color_affinity(rng):
    n, d, K, lam = 96, 32, 4, 10.0
    feats = rng.standard_normal((n, d)).astype(np.float32)
    W_color = rng.random((n, n)).astype(np.float32)
    W_color = ((W_color + W_color.T) > 1.6).astype(np.float32)

    f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    W = f @ f.T
    W = W * (W > 0)
    W = W / W.max()
    W_comb = W + lam * W_color
    ref_vals, ref_vecs = _reference_laplacian_eigs(W_comb.astype(np.float32), K)

    vals, vecs = spectral_decompose(
        jnp.asarray(feats), K, which_matrix="laplacian",
        color_W=jnp.asarray(W_color), image_color_lambda=lam,
    )
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=5e-4, rtol=1e-3)
    for k in range(K):
        assert _cosine_up_to_sign(np.asarray(vecs)[k], ref_vecs[k]) > 0.99


def test_feature_affinity_matches_reference(rng):
    n, d = 50, 16
    feats = rng.standard_normal((n, d)).astype(np.float32)
    f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    W_ref = f @ f.T
    W_ref = W_ref * (W_ref > 0)
    W_ref = W_ref / W_ref.max()
    W = np.asarray(feature_affinity(jnp.asarray(feats)))
    np.testing.assert_allclose(W, W_ref, atol=1e-5)


@pytest.mark.parametrize("solver", ["eigh", "lobpcg", "chebyshev"])
@pytest.mark.parametrize("lapnorm", [True, False])
def test_laplacian_eigs_w_scale_matches_materialized(rng, solver, lapnorm):
    """The deferred max-normalization (w_scale) must reproduce the
    materialized W/max(W) solve exactly — same degrees, same M-normalized
    vectors (the whitened operator is invariant under W -> c*W only when the
    degree scaling is folded consistently)."""
    if solver == "chebyshev" and not lapnorm:
        pytest.skip("chebyshev supports lapnorm=True only")
    K = 5
    if solver == "eigh":
        W_raw, _ = _random_affinity(rng, 120)
        W_raw = (W_raw * 7.3).astype(np.float32)  # undo max-normalization
    else:
        # image-like graph the iterative solvers converge on
        # (same recipe as tests/test_solver_lobpcg._smooth_features)
        from test_solver_lobpcg import _smooth_features
        feats = _smooth_features(np.random.default_rng(3))
        f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        W_raw = (f @ f.T).astype(np.float32)
        W_raw = W_raw * (W_raw > 0) * 7.3
    W_norm = W_raw / W_raw.max()

    kw = dict(lapnorm=lapnorm, solver=solver, apply_sign_fix=False)
    vals_m, vecs_m = laplacian_eigs(jnp.asarray(W_norm), K, **kw)
    vals_s, vecs_s = laplacian_eigs(jnp.asarray(W_raw), K,
                                    w_scale=jnp.float32(1.0 / W_raw.max()),
                                    **kw)
    # atol floor: lobpcg recovers the ~0 constant-vector eigenvalue as
    # c - theta with c ~ O(max degree) — ~1e-4-scale cancellation noise on
    # the lapnorm=False graph (both paths equally; verified cosine 1.0).
    np.testing.assert_allclose(np.asarray(vals_s), np.asarray(vals_m),
                               atol=1e-3, rtol=1e-4)
    for k in range(K):
        cos = _cosine_up_to_sign(np.asarray(vecs_s)[k], np.asarray(vecs_m)[k])
        assert cos > 0.999, f"eigenvector {k}: cosine {cos}"
    if lapnorm:
        # M-normalization must be against the SCALED degrees (reference
        # normalizes W before building D, extract/extract.py:194, :221-222).
        d_norm = W_norm.sum(axis=1)
        for k in range(K):
            v = np.asarray(vecs_s)[k]
            assert abs(float(v @ (d_norm * v)) - 1.0) < 1e-3


@pytest.mark.parametrize("with_mask", [False, True])
def test_spectral_decompose_batched_eig_chunk_matches_whole(rng, with_mask):
    """eig_chunk sub-batching (lax.map over chunks of the vmapped solve) must
    be a pure scheduling change: identical eigenpairs and residuals to the
    whole-batch vmap, per image, for every solver the pipeline uses."""
    from deep_spectral_tpu.ops.eigen import spectral_decompose_batched

    B, n, d, K = 8, 64, 16, 4
    feats = rng.standard_normal((B, n, d)).astype(np.float32)
    if with_mask:
        masks = np.ones((B, n), dtype=bool)
        masks[0, -7:] = False
        masks[3, -2:] = False
        feats = feats * masks[:, :, None]
    else:
        masks = None

    for solver in ("eigh", "lobpcg"):
        whole = spectral_decompose_batched(
            jnp.asarray(feats), None if masks is None else jnp.asarray(masks),
            K=K, solver=solver, return_residual=True)
        chunked = spectral_decompose_batched(
            jnp.asarray(feats), None if masks is None else jnp.asarray(masks),
            K=K, solver=solver, return_residual=True, eig_chunk=2)
        for w, c in zip(whole, chunked):
            np.testing.assert_allclose(np.asarray(c), np.asarray(w),
                                       atol=1e-5, rtol=1e-5)

    with pytest.raises(ValueError, match="must divide"):
        spectral_decompose_batched(jnp.asarray(feats), K=K, solver="eigh",
                                   eig_chunk=3)


def test_spectral_decompose_batched_eig_chunk_chebyshev(rng):
    """Chunked chebyshev: same converged subspace as whole-batch (the adaptive
    outer count may legitimately differ between chunked lanes — one slow lane
    no longer drags the others — so compare subspaces, not raw floats), and
    the per-image self-guard still runs after chunked solves."""
    from test_solver_lobpcg import _smooth_features
    from deep_spectral_tpu.ops.eigen import spectral_decompose_batched

    B, K = 4, 5
    feats = np.stack([_smooth_features(np.random.default_rng(s))
                      for s in range(B)]).astype(np.float32)
    fj = jnp.asarray(feats)
    whole_v = np.asarray(spectral_decompose_batched(
        fj, K=K, solver="chebyshev")[1])
    chunk_v = np.asarray(spectral_decompose_batched(
        fj, K=K, solver="chebyshev", eig_chunk=2)[1])
    exact_v = np.asarray(spectral_decompose_batched(fj, K=K, solver="eigh")[1])
    for b in range(B):
        for name, v in (("whole", whole_v), ("chunk", chunk_v)):
            # principal-subspace cosine vs exact, per image
            q1, _ = np.linalg.qr(v[b].T)
            q2, _ = np.linalg.qr(exact_v[b].T)
            s = np.linalg.svd(q1.T @ q2, compute_uv=False)
            assert s.min() > 0.999, f"{name} image {b}: subspace cos {s.min()}"
