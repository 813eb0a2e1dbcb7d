"""Chebyshev-filtered subspace solver (the residual-guarded 'auto' default
for lapnorm graphs from N=512 up to the Pallas filter's VMEM admission,
~3700) vs the exact dense path."""
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


# ---------------------------------------------------------------------------
# Round-3 convergence guard (VERDICT #1): the chebyshev solver became the
# 'auto' default for lapnorm graphs with N >= 512 (up to the VMEM
# admission boundary since r4c); these tests pin
# (a) the auto+lapnorm=False regression fix, (b) the residual guard catching
# deliberately under-converged solves, and (c) auto-path quality >= 0.999
# subspace cosine across adversarial spectra where unguarded chebyshev fails.

def _adversarial_W(lams, d, seed=7):
    """Symmetric W whose whitened Laplacian I - D^-1/2 W D^-1/2 has the
    prescribed spectrum `lams` (lams[0] must be 0) and degree vector `d`:
    pick orthogonal Q with first column sqrt(d)/||sqrt(d)||, set
    A = Q diag(lams) Q^T, W = D^1/2 (I - A) D^1/2 (row sums equal d by
    construction since A sqrt(d) = 0)."""
    N = len(d)
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((N, N))
    M[:, 0] = np.sqrt(d)
    Q, _ = np.linalg.qr(M)
    A = (Q * np.asarray(lams)[None, :]) @ Q.T
    W = np.sqrt(d)[:, None] * (np.eye(N) - A) * np.sqrt(d)[None, :]
    return ((W + W.T) / 2).astype(np.float32)


def _adversarial_cases(K=5, N=900):
    rng = np.random.default_rng(7)
    d = rng.uniform(0.5, 2.0, N)
    return {
        # lam_K above the filter window bound (1.8): the Chebyshev recurrence
        # numerically blows up (NaN) — residual -> inf must trigger fallback.
        "lamK_above_window": _adversarial_W(
            np.concatenate([[0.0], np.linspace(1.82, 1.88, K - 1),
                            rng.uniform(1.9, 2.0, N - K)]), d),
        # lam_K just under the clip: window nearly empty, damping weak.
        "lamK_near_window_edge": _adversarial_W(
            np.concatenate([[0.0], np.linspace(1.6, 1.7, K - 1),
                            rng.uniform(1.75, 2.0, N - K)]), d),
        # 20 unwanted eigenvalues within 5e-4 of the wanted cluster: the fixed
        # filter budget cannot separate them (measured cos 0.02 unguarded).
        "clustered_spectrum": _adversarial_W(
            np.concatenate([[0.0], np.full(K - 1, 0.30), np.full(20, 0.3005),
                            rng.uniform(0.35, 2.0, N - K - 20)]), d),
        # gap of 5e-5 between wanted and unwanted (measured cos 0.22 unguarded).
        "tiny_gap": _adversarial_W(
            np.concatenate([[0.0], np.linspace(0.3, 0.3001, K - 1), [0.30015],
                            rng.uniform(0.31, 2.0, N - K - 1)]), d),
    }


def test_auto_lapnorm_false_uses_lobpcg():
    """ADVICE r2 (high): 'auto' + lapnorm=False at N in [512, 2048] must not
    raise (chebyshev supports lapnorm=True only) — it selects lobpcg."""
    K = 5
    feats = _smooth_features(np.random.default_rng(1), 30, 30)
    W = jnp.asarray(np.asarray(feature_affinity(jnp.asarray(feats))))
    ev, V = laplacian_eigs(W, K, lapnorm=False, solver="auto",
                           apply_sign_fix=False)
    ev_r, V_r = laplacian_eigs(W, K, lapnorm=False, solver="eigh",
                               apply_sign_fix=False)
    assert np.isfinite(np.asarray(V)).all()
    assert _subspace_cos(V, V_r) > 0.999


def test_guard_catches_underconverged():
    """A deliberately starved filter budget (1 outer iteration of degree 2)
    under-converges on a smooth graph; the residual guard must detect it and
    return the exact dense answer instead."""
    K = 5
    feats = _smooth_features(np.random.default_rng(2), 30, 30)
    W = jnp.asarray(np.asarray(feature_affinity(jnp.asarray(feats))))
    ev_r, V_r = laplacian_eigs(W, K, solver="eigh", apply_sign_fix=False)
    # unguarded: visibly wrong
    _, V_bad, res = laplacian_eigs(W, K, solver="chebyshev", cheb_outer=1,
                                   cheb_degree=2, apply_sign_fix=False,
                                   return_residual=True)
    assert float(res) > 2e-3, "starved budget should exceed the tolerance"
    assert _subspace_cos(V_bad, V_r) < 0.999
    # guarded: the lax.cond fallback returns the dense answer
    ev_g, V_g = laplacian_eigs(W, K, solver="chebyshev", cheb_outer=1,
                               cheb_degree=2, apply_sign_fix=False)
    assert _subspace_cos(V_g, V_r) > 0.9999
    np.testing.assert_allclose(np.asarray(ev_g), np.asarray(ev_r),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("case", ["lamK_above_window", "lamK_near_window_edge",
                                  "clustered_spectrum", "tiny_gap"])
def test_auto_guarded_on_adversarial_spectra(case):
    """The guarded auto path must never silently return a bad subspace."""
    K = 5
    W = jnp.asarray(_adversarial_cases(K)[case])
    ev_r, V_r = laplacian_eigs(W, K, solver="eigh", apply_sign_fix=False)
    ev, V = laplacian_eigs(W, K, solver="auto", apply_sign_fix=False)
    assert np.isfinite(np.asarray(V)).all()
    assert _subspace_cos(V, V_r) > 0.999, case


def test_color_fused_graph_guarded(rng):
    """Color-fused (lambda=10) graphs under-converge within the default
    budget (measured residual ~7e-3, cos 0.988); the guard must catch it."""
    from deep_spectral_tpu.ops.affinity import knn_affinity
    K = 5
    img = np.random.default_rng(5).random((30, 30, 3)).astype(np.float32)
    Wc = np.asarray(knn_affinity(jnp.asarray(img)))
    Wf = np.asarray(feature_affinity(
        jnp.asarray(_smooth_features(np.random.default_rng(9), 30, 30))))
    W = jnp.asarray((Wf + 10.0 * Wc).astype(np.float32))
    ev_r, V_r = laplacian_eigs(W, K, solver="eigh", apply_sign_fix=False)
    ev, V = laplacian_eigs(W, K, solver="auto", apply_sign_fix=False)
    assert _subspace_cos(V, V_r) > 0.999


def test_batched_guard_fires_per_image_all_bad(monkeypatch):
    """spectral_decompose_batched without return_residual self-guards with a
    per-image lax.scan + lax.cond: force the guard for every image
    (tolerance -> 0) and check the output equals the exact eigh solve."""
    from deep_spectral_tpu.ops import eigen as eigen_mod
    from deep_spectral_tpu.ops.eigen import spectral_decompose_batched
    K = 5
    # unique N (23x23=529) so the monkeypatched tolerance cannot collide with
    # a jit cache entry traced under the real tolerance
    feats = np.stack([_smooth_features(np.random.default_rng(i), 23, 23)
                      for i in range(3)])
    monkeypatch.setattr(eigen_mod, "CHEB_RESIDUAL_TOL", 0.0)
    ev, V = spectral_decompose_batched(jnp.asarray(feats), K=K, solver="auto")
    ev_r, V_r = spectral_decompose_batched(jnp.asarray(feats), K=K,
                                           solver="eigh")
    for b in range(3):
        assert _subspace_cos(np.asarray(V)[b], np.asarray(V_r)[b]) > 0.9999
    np.testing.assert_allclose(np.asarray(ev), np.asarray(ev_r),
                               atol=1e-4, rtol=1e-3)


def test_batched_guard_reselves_exactly_the_tripped_images(monkeypatch):
    """VERDICT r3 #5: the in-program guard must re-solve ONLY the images
    whose residual trips, passing converged images through UNCHANGED. Pin
    the tolerance between the batch's actual per-image residuals, then
    check tripped lanes match the dense eigh answer while untripped lanes
    are bitwise the unguarded chebyshev output (proof they did not go
    through the dense branch)."""
    from deep_spectral_tpu.ops import eigen as eigen_mod
    from deep_spectral_tpu.ops.eigen import spectral_decompose_batched
    K = 5
    # unique N (26x26=676) to avoid jit-cache collision across tolerances
    feats = np.stack([_smooth_features(np.random.default_rng(40 + i), 26, 26)
                      for i in range(4)])
    ev_c, V_c, res = spectral_decompose_batched(
        jnp.asarray(feats), K=K, solver="chebyshev", return_residual=True)
    res = np.asarray(res)
    assert res.min() < res.max(), "need distinct residuals to split on"
    mid = float(np.sort(res)[len(res) // 2 - 1] + np.sort(res)[len(res) // 2]) / 2
    tripped = res > mid
    assert tripped.any() and not tripped.all()
    monkeypatch.setattr(eigen_mod, "CHEB_RESIDUAL_TOL", mid)
    ev, V = spectral_decompose_batched(jnp.asarray(feats), K=K,
                                       solver="chebyshev")
    ev_r, V_r = spectral_decompose_batched(jnp.asarray(feats), K=K,
                                           solver="eigh")
    ev, V = np.asarray(ev), np.asarray(V)
    for b in range(len(res)):
        if tripped[b]:
            assert _subspace_cos(V[b], np.asarray(V_r)[b]) > 0.9999
            np.testing.assert_allclose(ev[b], np.asarray(ev_r)[b],
                                       atol=1e-4, rtol=1e-3)
        else:
            np.testing.assert_array_equal(ev[b], np.asarray(ev_c)[b])
            np.testing.assert_array_equal(V[b], np.asarray(V_c)[b])


def test_batched_return_residual_shapes():
    from deep_spectral_tpu.ops.eigen import spectral_decompose_batched
    K = 4
    feats = np.stack([_smooth_features(np.random.default_rng(i), 24, 24)
                      for i in range(2)])
    ev, V, res = spectral_decompose_batched(jnp.asarray(feats), K=K,
                                            solver="auto",
                                            return_residual=True)
    assert res.shape == (2,)
    assert np.all(np.asarray(res) < 2e-3)  # converged on smooth graphs
    # non-chebyshev modes report 0.0
    _, _, res_svd = spectral_decompose_batched(
        jnp.asarray(feats), K=K, which_matrix="affinity_svd",
        return_residual=True)
    assert np.all(np.asarray(res_svd) == 0.0)


def test_pallas_filter_matches_xla_filter():
    """The VMEM-resident Pallas filter chain (ops/cheb_filter.py, interpret
    mode on CPU) must converge to the XLA dot-chain solve's answer: same
    eigenpairs within solver tolerance. (The paths are not bitwise-identical:
    the pallas solve estimates the filter window with one degree-3 chain
    instead of three normalized power steps, so per-image residuals differ —
    both must still clear the convergence guard.)"""
    from deep_spectral_tpu.ops.eigen import (CHEB_RESIDUAL_TOL,
                                             spectral_decompose_batched)

    K = 5
    feats = np.stack([_smooth_features(np.random.default_rng(10 + i), 27, 27)
                      for i in range(3)])
    ev_x, V_x, res_x = spectral_decompose_batched(
        jnp.asarray(feats), K=K, solver="chebyshev", return_residual=True)
    ev_p, V_p, res_p = spectral_decompose_batched(
        jnp.asarray(feats), K=K, solver="chebyshev",
        cheb_filter_impl="pallas", return_residual=True)
    assert np.all(np.asarray(res_p) < CHEB_RESIDUAL_TOL)
    assert np.all(np.asarray(res_x) < CHEB_RESIDUAL_TOL)
    np.testing.assert_allclose(np.asarray(ev_p), np.asarray(ev_x),
                               atol=1e-4, rtol=1e-3)
    for b in range(3):
        assert _subspace_cos(np.asarray(V_p)[b], np.asarray(V_x)[b]) > 0.9999


def test_pallas_filter_vmem_fallback():
    """Operators too large for VMEM must silently take the XLA chain (the
    'pallas' request is a hint, not a contract). Guard boundary pinned per
    the round-4 fix: admission models the compiler's SCOPED-VMEM accounting
    (~3.25x the tile-padded operator, measured 25.78 MB at N=2025 on v5e)
    against the kernel's raised limit — the round-3 guard compared raw
    operator bytes to a 12 MB budget and admitted shapes the compiler then
    rejected (hard compile error at 1600 < N <= 2048)."""
    from deep_spectral_tpu.ops import cheb_filter

    assert cheb_filter.fits_vmem(900)
    # the round-3 on-device crash shape MUST be admitted under the raised
    # limit (its real scoped need, 25.78 MB, is far below 110 MB)...
    assert cheb_filter.fits_vmem(2025)
    assert cheb_filter.fits_vmem(2048)
    # ...and the estimate must not be wildly below the measured accounting
    # (under-estimation is exactly the round-3 bug)
    measured_2025 = 25.78 * 1024 * 1024
    assert cheb_filter.scoped_vmem_bytes(2025) >= measured_2025
    # vits8-scale operators now fit; far larger ones do not
    assert cheb_filter.fits_vmem(3600)
    assert not cheb_filter.fits_vmem(4200)
    assert cheb_filter.scoped_vmem_bytes(4200) > cheb_filter._VMEM_LIMIT_BYTES
    # f32 operator: pallas requires bf16 matvecs -> falls back, still solves
    feats = _smooth_features(np.random.default_rng(2), 24, 24)
    W = feature_affinity(jnp.asarray(feats))
    ev, V, res = laplacian_eigs(W, 5, solver="chebyshev",
                                cheb_filter_impl="pallas",
                                matvec_precision="f32",
                                apply_sign_fix=False, return_residual=True)
    assert float(res) < 2e-3


def test_long_chain_rescale_no_overflow():
    """The filter chains rescale (T_{j-1}, T_j) jointly per column each step,
    so arbitrarily long / tight-window chains stay finite in f32 (unscaled,
    |T_d| at the bottom of a width-0.2 window passes 1e15 by d=10 and
    overflows f32 around d~30). High degree may still under-converge (basis
    collapse onto the dominant eigendirection between orthonormalizations) —
    that is exactly what the residual guard is for — but the residual itself
    must be finite so the guard can act on it, for BOTH filter impls."""
    from deep_spectral_tpu.ops.eigen import laplacian_eigs

    feats = _smooth_features(np.random.default_rng(7), 27, 27)
    W = feature_affinity(jnp.asarray(feats))
    for impl in ("xla", "pallas"):
        ev, V, res = laplacian_eigs(
            W, 5, solver="chebyshev", cheb_outer=1, cheb_degree=48,
            cheb_filter_impl=impl, apply_sign_fix=False, return_residual=True)
        assert np.isfinite(float(res)), impl
        assert np.isfinite(np.asarray(V)).all(), impl


def test_filter_impl_auto_resolution(monkeypatch):
    """'auto' must actually resolve per its documented contract — pallas on
    TPU, xla elsewhere. Regression: _chebyshev_laplacian used to compare
    filter_impl == 'pallas' directly, so 'auto' (the default, what bench.py
    passes) silently always ran the XLA chain, even on the TPU."""
    import jax
    from deep_spectral_tpu.ops import eigen as eigen_mod

    assert eigen_mod._resolve_filter_impl("auto") == "xla"  # CPU test env
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert eigen_mod._resolve_filter_impl("auto") == "pallas"
    assert eigen_mod._resolve_filter_impl("xla") == "xla"
    assert eigen_mod._resolve_filter_impl("pallas") == "pallas"


def test_filter_impl_unknown_value_rejected():
    """ADVICE r3 (low): a typo like 'palas' must fail loudly, not silently
    run the XLA chain."""
    from deep_spectral_tpu.ops import eigen as eigen_mod

    with pytest.raises(ValueError, match="cheb_filter_impl"):
        eigen_mod._resolve_filter_impl("palas")
    feats = _smooth_features(np.random.default_rng(3), 24, 24)
    W = feature_affinity(jnp.asarray(feats))
    with pytest.raises(ValueError, match="cheb_filter_impl"):
        laplacian_eigs(W, 5, solver="chebyshev", cheb_filter_impl="palas")


def test_resolved_cheb_impl_reports_actual_impl(monkeypatch):
    """ADVICE r3 (low): bench.py reports resolved_cheb_impl, which must fold
    in backend resolution, the bf16 requirement, and the VMEM admission
    guard — a fits_vmem fallback to XLA must be visible."""
    import jax
    from deep_spectral_tpu.ops import eigen as eigen_mod

    assert eigen_mod.resolved_cheb_impl(900, "auto") == "xla"  # CPU env
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert eigen_mod.resolved_cheb_impl(900, "auto") == "pallas"
    assert eigen_mod.resolved_cheb_impl(900, "pallas",
                                        jnp.float32) == "xla"  # bf16 only
    assert eigen_mod.resolved_cheb_impl(8000, "pallas") == "xla"  # VMEM gate


# ---------------------------------------------------------------------------
# Round-4 budget retune: cheb_window_init='wide' (the 'auto' default for
# N <= _WIDE_INIT_MAX_N = 1600) skips the round-3 pre-loop window estimate (a
# degree-3 filter + a full Rayleigh-Ritz, ~1/3 of the measured eigs phase) by
# running the FIRST outer iteration with a fixed [_WIDE_INIT_LAM_CUT = 1.0, 2]
# damping window. These tests pin that both inits solve
# image graphs to the same subspace, that the legacy 'estimate' path stays
# reachable, and that unknown values fail loudly.

@pytest.mark.parametrize("win_init", ["wide", "estimate"])
def test_window_init_variants_match_eigh(win_init):
    K = 5
    for trial in range(2):
        feats = _smooth_features(np.random.default_rng(trial + 11), 30, 30)
        W = jnp.asarray(np.asarray(feature_affinity(jnp.asarray(feats))))
        ev_r, V_r = laplacian_eigs(W, K, solver="eigh", apply_sign_fix=False)
        ev, V, res = laplacian_eigs(W, K, solver="chebyshev",
                                    cheb_window_init=win_init,
                                    apply_sign_fix=False,
                                    return_residual=True)
        assert float(res) <= 2e-3, (win_init, trial)
        assert _subspace_cos(V, V_r) > 0.999, (win_init, trial)
        np.testing.assert_allclose(np.asarray(ev), np.asarray(ev_r),
                                   atol=5e-3, rtol=5e-2)


def test_window_init_wide_guarded_on_adversarial_spectra():
    """The wide first window must not weaken the guard: the worst adversarial
    case (lam_K above the clipped window bound) still falls back to eigh."""
    K = 5
    W = jnp.asarray(_adversarial_cases(K)["lamK_above_window"])
    ev_r, V_r = laplacian_eigs(W, K, solver="eigh", apply_sign_fix=False)
    ev, V = laplacian_eigs(W, K, solver="auto", cheb_window_init="wide",
                           apply_sign_fix=False)
    assert np.isfinite(np.asarray(V)).all()
    assert _subspace_cos(V, V_r) > 0.999


def test_window_init_unknown_value_rejected():
    feats = _smooth_features(np.random.default_rng(3), 24, 24)
    W = feature_affinity(jnp.asarray(feats))
    with pytest.raises(ValueError, match="cheb_window_init"):
        laplacian_eigs(W, 5, solver="chebyshev", cheb_window_init="wyde")


def test_auto_solver_regime_boundaries():
    """r4c regime raise: 'auto' selects chebyshev for lapnorm graphs up to
    the Pallas filter's VMEM admission (~3700), lobpcg above it and for
    lapnorm=False, eigh for tiny graphs — the measured v5e split
    (eigs-only A/B at N=3600 b16: chebyshev 21.15 vs lobpcg 27.61 ms)."""
    from deep_spectral_tpu.ops import cheb_filter
    from deep_spectral_tpu.ops.eigen import _resolve_solver

    assert _resolve_solver(900, 8, True, "auto") == "chebyshev"
    assert _resolve_solver(3600, 8, True, "auto") == "chebyshev"
    assert cheb_filter.fits_vmem(3600)
    assert not cheb_filter.fits_vmem(8000)
    assert _resolve_solver(8000, 8, True, "auto") == "lobpcg"
    assert _resolve_solver(3600, 8, False, "auto") == "lobpcg"
    assert _resolve_solver(100, 8, True, "auto") == "eigh"
    # explicit solver requests pass through untouched
    assert _resolve_solver(8000, 8, True, "chebyshev") == "chebyshev"
    # The raised ~3700 cutoff was only measured on the VMEM-resident Pallas
    # path: a forced XLA filter chain (or f32 matvecs — each matvec streams
    # the (N, N) operator from HBM) keeps the round-2 boundary, 2048, where
    # lobpcg was measured to win (ADVICE r4).
    assert _resolve_solver(3600, 8, True, "auto", filter_impl="xla") == "lobpcg"
    assert _resolve_solver(2048, 8, True, "auto", filter_impl="xla") == "chebyshev"
    assert _resolve_solver(
        3600, 8, True, "auto", matvec_dtype=jnp.float32) == "lobpcg"
    # The admission guard is evaluated at the ACTUAL block size: a large-K
    # block near the boundary shrinks the admitted N (ADVICE r4), dropping
    # to the XLA-chain boundary rather than admitting a kernel that the
    # compiler would reject.
    from deep_spectral_tpu.ops.eigen import resolved_cheb_impl
    assert cheb_filter.fits_vmem(3600, m=8)
    big_m = 256
    if not cheb_filter.fits_vmem(3600, m=big_m):
        assert _resolve_solver(3600, big_m, True, "auto") == "lobpcg"
        assert resolved_cheb_impl(3600, "pallas", m=big_m) == "xla"


def test_resolve_eig_chunk_auto_rule():
    """VERDICT r4 #5: the measured eig_chunk rule is encoded — 'auto'
    resolves to whole-batch below b64 and chunk=8 at b >= 64 (device A/B:
    whole 1.93 vs 2.74+ ms/call at b24; chunk-8 10.32 vs 11.80 at b64)."""
    from deep_spectral_tpu.ops.eigen import resolve_eig_chunk

    assert resolve_eig_chunk("auto", 24) is None
    assert resolve_eig_chunk("auto", 32) is None
    assert resolve_eig_chunk("auto", 64) == 8
    assert resolve_eig_chunk("auto", 96) == 8
    assert resolve_eig_chunk("auto", 65) is None  # 8 does not divide
    assert resolve_eig_chunk(None, 64) is None
    assert resolve_eig_chunk(0, 64) is None
    assert resolve_eig_chunk(4, 24) == 4


def test_window_init_invalid_fails_before_solve():
    """ADVICE r4: an invalid cheb_window_init raises up front (ValueError
    from validation), never reaching a compile — so the pipeline's
    never-crash pallas->xla fallback cannot misreport it."""
    from deep_spectral_tpu.ops.eigen import validate_cheb_window_init

    for ok in ("auto", "wide", "estimate", "wide@0.75"):
        validate_cheb_window_init(ok)
    for bad in ("wyde", "wide@", "wide@x", "Estimate"):
        with pytest.raises(ValueError, match="cheb_window_init"):
            validate_cheb_window_init(bad)
