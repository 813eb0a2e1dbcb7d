"""Batched graph eigensolvers — the numerical core of the framework.

The reference solves, per image and on the host, the generalized symmetric
eigenproblem (D - W) x = lam D x for the K smallest eigenpairs with ARPACK
shift-invert (reference: extract/extract.py:227-234). That is a sequential,
Fortran, one-image-at-a-time path. TPU-first redesign:

    whiten:  A = I - D^{-1/2} W D^{-1/2}    (symmetric, same spectrum)
    solve:   full dense `eigh` on A, batched over images with `vmap`
    unwhiten: x = D^{-1/2} v  (gives x^T D x = 1, exactly ARPACK's M-normalization)

For the graph sizes this pipeline produces (N = H_patch*W_patch ~ 400-4000), a
batched dense eigh on the MXU beats per-image ARPACK by orders of magnitude in
throughput, and returns bit-stable results (no Lanczos restarts / random starts).
For very large graphs (matting-laplacian at low downsample factors) use
`deep_spectral_tpu.parallel.lobpcg` which shards the matvec over the device mesh.

Padding contract: a `mask` marks valid nodes. Padded rows/cols of W are zeroed and
the padded diagonal of the whitened operator is set above the Gershgorin bound of
the valid block, so padded eigenpairs sort strictly after all valid ones and
slicing the smallest K is unaffected.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .affinity import degree_vector, feature_affinity, l2_normalize

# Convergence guard for the Chebyshev subspace solver: max whitened residual
# ||A x_k - theta_k x_k|| (unit x_k, ||A|| <= 2) above which the result is
# rejected and the exact dense path used instead. Calibrated on CPU oracles:
# converged image-structured graphs land at 1e-5..1.7e-3; known failure modes
# (clustered spectra 2.4e-3, color-fused lambda=10 7e-3, tiny-gap 1.4e-2,
# lam_K above the filter window -> NaN) all exceed it.
CHEB_RESIDUAL_TOL = 2e-3

# TPU gotcha (measured on v5e, round 3): XLA:TPU runs float32 `jnp.dot` at
# DEFAULT precision as ONE bf16 MXU pass, so every "f32" matmul inside the
# iterative solvers silently ran at bf16 — the Chebyshev window estimate /
# Rayleigh-Ritz / residual check degraded until the solver converged to the
# wrong band (Fiedler cosine ~0.02 vs eigh on graphs that solve to 1e-4
# residual on CPU), and LOBPCG's internal orthonormalization suffered the
# same. Solver-critical dots are therefore pinned to HIGHEST (true f32,
# 6-pass); the Chebyshev FILTER chain stays explicitly bf16 — a degraded
# filter only slows convergence, and the exact residual guard rejects
# anything that did not converge.
_EXACT = jax.lax.Precision.HIGHEST

# First-outer filter window upper edge for cheb_window_init='wide' (see
# _chebyshev_laplacian): the window [_WIDE_INIT_LAM_CUT, 2] is damped and the
# spectrum below it amplified on the first, pre-theta filter pass. 1.0 wins
# the CPU trip-count study (scripts/study_cheb_budget.py, 64 structured
# graphs, degree 10): {2: 62, 3: 2} all-converged vs the pre-loop estimate's
# {2: 60, 3: 4} — i.e. the fixed half-spectrum window needs NO more outers
# than the old adaptive pre-loop estimate, while skipping its full RR and
# degree-3 filter. 1.8 inflates trips ({2: 46, 3: 17, 4: 1}); 0.5 is too
# tight ({3: 53, 4: 11}).
_WIDE_INIT_LAM_CUT = 1.0

# 'auto' window-init split, measured ON DEVICE (scripts/ab_cheb_window.py +
# the --platform device trip study, v5e, 2026-08-19): trip counts are
# borderline-sensitive to the bf16 MXU filter and came out OPPOSITE to the
# CPU study at large N — at N=2025 the device runs estimate at batch-max 2
# outers but wide at 3 ({2: 13, 3: 3}), and one extra degree-10 outer costs
# more than the whole pre-loop estimate there (A/B: 7.32 vs 9.64 ms/call
# b16; N=3600: 21.06 vs 26.92). At N <= 1600 the device trips match and
# wide wins by skipping the pre-loop RR + deg-3 filter (N=900: 3.82 ->
# 3.13 ms/call b24, 12.93 -> 11.76 b64; N=1600 b16: 5.36 -> 5.08).
# Split at the last measured wide-wins size: wide <= 1600, estimate above.
_WIDE_INIT_MAX_N = 1600


def sign_fix(eigenvectors: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """Resolve eigenvector sign ambiguity the way the reference does: flip a vector
    iff strictly more than half (but not all) of its entries are positive
    (reference: extract/extract.py:237-240).

    eigenvectors: (K, N) row-major. mask: optional (N,) validity.
    """
    if mask is None:
        frac_pos = jnp.mean((eigenvectors > 0).astype(jnp.float32), axis=-1)
    else:
        m = mask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        frac_pos = jnp.sum((eigenvectors > 0).astype(jnp.float32) * m[None, :], axis=-1) / denom
    flip = (frac_pos > 0.5) & (frac_pos < 1.0)
    return jnp.where(flip[:, None], -eigenvectors, eigenvectors)


def _pad_aware_eigh(A: jax.Array, mask: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array]:
    """eigh of a symmetric operator whose padded diagonal is pushed past the valid
    spectrum (Gershgorin upper bound of the valid block + margin)."""
    if mask is not None:
        m = mask.astype(A.dtype)
        A = A * m[:, None] * m[None, :]
        bound = jnp.max(jnp.sum(jnp.abs(A), axis=-1)) + 1.0
        A = A + jnp.diag(jnp.where(mask, 0.0, bound))
    evals, evecs = jnp.linalg.eigh(A)
    return evals, evecs


# 'auto' regime boundary for the HBM-streaming XLA filter chain (forced
# cheb_filter_impl='xla', the pipeline's runtime pallas->xla downgrade, or
# matvec_precision='f32'): the raised ~3700 cutoff was only measured on the
# VMEM-resident Pallas path; without it each matvec streams the (N, N)
# operator from HBM and the round-2 measurement (lobpcg wins above 2048)
# still applies (ADVICE r4).
_XLA_CHAIN_CHEB_MAX_N = 2048


def _resolve_solver(N: int, m_block: int, lapnorm: bool, solver: str,
                    filter_impl: str = "auto",
                    matvec_dtype=jnp.bfloat16) -> str:
    """Static 'auto' solver selection (shapes are static under jit).

    Regime split measured on v5e (device-time harness):
      lapnorm graphs up to the Pallas filter's VMEM admission (~3700 bf16,
        ops/cheb_filter.fits_vmem, evaluated at the ACTUAL block size):
        chebyshev — lobpcg's per-iteration RR/SVQB batched small-eigh
        custom-calls dominate its solve, which chebyshev replaces with pure
        matvec chains (13.5 vs 36.6 ms per b64 N=900 K=5 batch in round 3;
        at N=3600 b16 the r4c eigs-only A/B has chebyshev 21.06 vs lobpcg
        27.61 ms/call — the round-2 "lobpcg above 2048" split predates the
        VMEM-resident filter, the premasked Gram fusion and the adaptive
        outer loop, all of which moved the crossover). The raised cutoff
        applies when the Pallas filter will (or, off-TPU with 'auto'/
        'pallas', WOULD on TPU — so CPU tests mirror device selection) run;
        a forced XLA chain or f32 matvecs keep the old 2048 boundary
        (_XLA_CHAIN_CHEB_MAX_N), the regime where lobpcg was measured to
        win over HBM-streaming chebyshev.
      N above the boundary (or lapnorm=False, which chebyshev does not
        support): lobpcg.
      small N: dense eigh.
    """
    if solver != "auto":
        return solver
    if N >= 4 * m_block + 1 and N >= 512:
        if not lapnorm:
            return "lobpcg"
        from .cheb_filter import fits_vmem
        pallas_filter = (filter_impl != "xla"
                         and matvec_dtype == jnp.bfloat16
                         and fits_vmem(N, matvec_dtype, m=m_block))
        if pallas_filter:
            return "chebyshev"
        return "chebyshev" if N <= _XLA_CHAIN_CHEB_MAX_N else "lobpcg"
    return "eigh"


def laplacian_eigs(
    W: jax.Array,
    K: int,
    *,
    lapnorm: bool = True,
    mask: Optional[jax.Array] = None,
    apply_sign_fix: bool = True,
    solver: str = "auto",
    lobpcg_iters: Optional[int] = None,
    lobpcg_tol: Optional[float] = None,
    lobpcg_block_extra: int = 3,
    cheb_outer: int = 4,
    cheb_degree: int = 10,
    cheb_guard: bool = True,
    cheb_filter_impl: str = "auto",
    cheb_window_init: str = "auto",
    matvec_precision: str = "bf16",
    return_residual: bool = False,
    w_scale: Optional[jax.Array] = None,
    w_premasked: bool = False,
):
    """Smallest-K eigenpairs of the graph Laplacian of affinity W.

    lapnorm=True : generalized problem (D - W) x = lam D x  — the reference default
                   (extract/extract.py:227-229); solved via the whitened operator.
    lapnorm=False: standard problem (D - W) x = lam x (extract/extract.py:231-234).

    solver: 'eigh' — exact full dense decomposition (bit-stable, the parity
            gold path); 'lobpcg' — block LOBPCG on the shifted operator,
            ~25x faster at N ~ 1000 with >0.999 eigenvector cosine on
            image-structured graphs; 'chebyshev' — Chebyshev-filtered
            subspace iteration (~9 small-eigh calls vs LOBPCG's ~90; see
            _chebyshev_laplacian), residual-guarded (see cheb_guard);
            'auto' — chebyshev for lapnorm graphs from N=512 up to the
            Pallas filter's VMEM admission (~3700; and N >= 4*(K + extra)),
            lobpcg for larger graphs or lapnorm=False, eigh for small
            graphs (see _resolve_solver).
    cheb_guard: the chebyshev solver ends with a cheap residual check (one
            extra block matvec, max_k ||A x_k - theta_k x_k|| on the whitened
            operator). When cheb_guard=True (default) and the residual
            exceeds CHEB_RESIDUAL_TOL (or is non-finite), a `lax.cond`
            falls back to the exact dense eigh path in the same program —
            ARPACK-style convergence-or-fail semantics (reference:
            extract/extract.py:227-234). NOTE: under `vmap` a lax.cond
            executes both branches for the whole batch; batched callers
            should either guard per image inside a lax.scan (what
            spectral_decompose_batched does) or pass return_residual=True
            and do the fallback per-image on the host (pipeline
            extract_eigs does this).
    return_residual: return (evals, vectors, residual) where residual is the
            chebyshev convergence residual described above (0.0 for the
            other solvers, which converge by construction / by lobpcg_tol);
            implies cheb_guard is skipped — the caller owns the fallback.
    cheb_outer / cheb_degree: chebyshev filter budget (outer iterations x
            polynomial degree); defaults validated in tests. Exposed mainly
            so tests can force under-convergence to exercise the guard.
    cheb_window_init: 'wide' / 'wide@<lam_cut>' — the FIRST outer iteration
            filters with a fixed window [lam_cut, 2] (default lam_cut
            _WIDE_INIT_LAM_CUT = 1.0) instead of running the round-3
            pre-loop window estimate (a degree-3 filter + a full
            Rayleigh-Ritz, ~1/3 of the r4b-profiled eigs phase).
            'estimate' keeps the pre-loop path. 'auto' (default) resolves by
            graph size at the measured on-device split (_WIDE_INIT_MAX_N):
            'wide' for N <= 1600 (+5-22% eigs phase — device trip counts
            match the pre-loop's), 'estimate' above (device trip counts
            inflate under 'wide' at N >= 2025 and one extra outer
            outweighs the pre-loop there). Convergence-vs-budget data:
            scripts/study_cheb_budget.py (CPU + --platform device) and
            scripts/ab_cheb_window.py (device A/B).
    cheb_filter_impl: 'xla' — the filter chain as XLA dots (each matvec
            streams the (N, N) operator from HBM); 'pallas' — the
            VMEM-resident kernel (ops/cheb_filter.py): one operator read
            per degree-d chain instead of d. Same math up to the window
            estimate (same residual guard applies); requires
            matvec_precision='bf16' and the operator to fit VMEM (falls
            back to 'xla' otherwise). 'auto' (default) resolves to 'pallas'
            on TPU and 'xla' elsewhere (off-TPU the kernel only runs in
            slow interpret mode, kept for tests that pass 'pallas'
            explicitly).
    matvec_precision: 'bf16' (default) runs the chebyshev filter's matvec
            chains with a bf16 operator and f32 accumulation — the MXU's
            native mode; Rayleigh-Ritz, the window estimate and the residual
            check stay f32, and the guard rejects any under-converged
            result. 'f32' forces full-precision matvecs.
    lobpcg_iters: max LOBPCG iterations. None = auto by graph size: 60 for
            N <= 2048, 100 above (the bottom-of-spectrum eigengap shrinks as
            the graph grows, so larger graphs need a deeper Krylov space;
            measured quality floor >= 0.999 leading-vector cosine vs eigh
            across N in {900, 2048, 4096} — tests/test_eigen.py).
    lobpcg_tol: residual tolerance forwarded to `lobpcg_standard` — the
            iteration exits as soon as every block column's residual
            |A v - theta v| falls below tol * 10 * N * (theta + |A v|)
            (ARPACK-style convergence stopping instead of a fixed trip
            count). None uses float32 machine eps, i.e. "stop only when
            numerically converged".

    Block-size note (measured on v5e, scripts/sweep_lobpcg_block.py,
    device-time harness, b64 N=900 K=5): a SMALLER block is faster on TPU —
    lobpcg_standard's per-iteration orthonormalization/Rayleigh-Ritz batched
    small-eigh custom-calls dominate the solve (~91% of its device time,
    profiled) and scale ~n^3 with the basis: extra=3 -> 36.5 ms/batch,
    extra=8 -> 46.7, extra=35 -> 187. Quality floor at extra=3: worst
    subspace cosine 0.99997 across K in {5, 20} and N in {900, 4000}
    (>= 0.999 required). The iteration cap is not binding on
    image-structured graphs (tol early-exit converges in <30 iters).

    w_premasked: the caller guarantees W already has exactly-zero padded
            rows/cols (true for every ops.affinity construction given the
            same mask: the Gram product masks the features, KNN/rw mask
            structurally), so the defensive W*m*m re-mask — two full (N, N)
            broadcast-multiply HBM streams — is skipped. `mask` is still
            used for the pad-aware eigh diagonal and final vector masking.

    w_scale: optional positive scalar c meaning "solve the graph c*W without
            materializing it". The whitened operator D^-1/2 W D^-1/2 is
            invariant under W -> c*W, so callers that only need W for its
            max-normalized Laplacian (spectral_decompose's lapnorm branch)
            can skip the full (N, N) division pass — which XLA cannot fuse
            into the downstream dots — and pass c = 1/max(W) instead. The
            degree clamp (d < 1e-12 -> 1) and the M-normalization both apply
            to the SCALED graph, so results match the materialized c*W path
            (reference semantics, extract/extract.py:194 + extract_utils.py:218).

    Returns (eigenvalues (K,), eigenvectors (K, N)) sorted ascending, eigenvectors
    row-major like the reference's saved dict (extract/extract.py:235, :243),
    with ARPACK's M-normalization (x^T D x = 1) when lapnorm.
    """
    W = W.astype(jnp.float32)
    N = W.shape[-1]
    if mask is not None and not w_premasked:
        # Callers whose W already has zeroed padded rows/cols (everything
        # coming out of ops.affinity with a mask — Gram/KNN/rw constructions
        # zero them structurally) pass w_premasked=True to skip this: the
        # two (N, N) broadcast-multiply streams were among the biggest HBM
        # costs of the whole eigs phase (round-4 HLO dump).
        m = mask.astype(W.dtype)
        W = W * m[:, None] * m[None, :]
    if w_scale is None:
        d = degree_vector(W)
        ws = None
    else:
        ws = jnp.asarray(w_scale, jnp.float32)
        d_raw = jnp.sum(W, axis=-1) * ws
        d = jnp.where(d_raw < 1e-12, 1.0, d_raw)

    validate_cheb_window_init(cheb_window_init)
    m_block = K + lobpcg_block_extra
    solver = _resolve_solver(
        N, m_block, lapnorm, solver, filter_impl=cheb_filter_impl,
        matvec_dtype=(jnp.float32 if matvec_precision == "f32"
                      else jnp.bfloat16))

    if solver == "lobpcg":
        iters = lobpcg_iters if lobpcg_iters is not None else (60 if N <= 2048 else 100)
        out = _lobpcg_laplacian(W, d, K, m_block, iters, lobpcg_tol, lapnorm,
                                mask, apply_sign_fix, w_scale=ws)
        return (*out, jnp.float32(0.0)) if return_residual else out

    if solver == "chebyshev":
        if not lapnorm:
            raise ValueError("solver='chebyshev' supports lapnorm=True only")
        evals, vectors, res = _chebyshev_laplacian(
            W, d, K, m_block, cheb_outer, cheb_degree, mask, apply_sign_fix,
            matvec_dtype=(jnp.float32 if matvec_precision == "f32"
                          else jnp.bfloat16), w_scale=ws,
            filter_impl=cheb_filter_impl, window_init=cheb_window_init)
        if return_residual:
            return evals, vectors, res
        if not cheb_guard:
            return evals, vectors
        # In-program convergence guard: reject under-converged/non-finite
        # results and recompute with the exact dense path. `lax.cond` is lazy
        # for unbatched calls (localization drivers etc.); batched callers
        # use return_residual + host-side per-image fallback instead.
        dense = partial(_dense_laplacian, W, d, K, lapnorm, mask,
                        apply_sign_fix, w_scale=ws)
        ok = res <= CHEB_RESIDUAL_TOL  # False for NaN residuals too
        return jax.lax.cond(ok, lambda: (evals, vectors), dense)

    out = _dense_laplacian(W, d, K, lapnorm, mask, apply_sign_fix, w_scale=ws)
    return (*out, jnp.float32(0.0)) if return_residual else out


def _dense_laplacian(W, d, K, lapnorm, mask, apply_sign_fix, w_scale=None):
    """Exact dense eigh path: whitened operator when lapnorm, else D - W.

    w_scale folds the deferred max-normalization (W -> w_scale*W) into the
    whitening scaling / the D - W fusion — one elementwise epilogue either
    way, never a separate (N, N) pass."""
    N = W.shape[-1]
    if lapnorm:
        inv_sqrt_d = jax.lax.rsqrt(d)
        s = inv_sqrt_d if w_scale is None else inv_sqrt_d * jnp.sqrt(w_scale)
        A = -(s[:, None] * W * s[None, :])
        A = A + jnp.eye(N, dtype=W.dtype)
    else:
        A = jnp.diag(d) - (W if w_scale is None else W * w_scale)
    evals, evecs = _pad_aware_eigh(A, mask)
    evals = evals[:K]
    V = evecs[:, :K]
    if lapnorm:
        V = jax.lax.rsqrt(d)[:, None] * V  # unwhiten: x^T D x = 1, ARPACK's M-norm
    vectors = V.T
    if mask is not None:
        vectors = vectors * mask.astype(vectors.dtype)[None, :]
    if apply_sign_fix:
        vectors = sign_fix(vectors, mask)
    return evals, vectors


def _lobpcg_laplacian(W, d, K, m_block, iters, tol, lapnorm, mask, apply_sign_fix,
                      w_scale=None):
    """Block LOBPCG for the smallest-K Laplacian eigenpairs: largest-K of the
    shifted operator (cI - A) with Gershgorin bound c; block size K + extra for
    faster separation of the wanted subspace. Masked (padded) rows stay exactly
    zero throughout the iteration (zero start block + zero matvec rows).
    `iters` caps the iteration count; `tol` enables residual-based early exit
    inside lobpcg_standard's while_loop (all block columns converged).
    w_scale: deferred max-normalization (see laplacian_eigs) folded into the
    whitening scalings — the scaled graph is never materialized."""
    from jax.experimental.sparse.linalg import lobpcg_standard

    N = W.shape[-1]
    if lapnorm:
        inv_sqrt_d = jax.lax.rsqrt(d)
        s = inv_sqrt_d if w_scale is None else inv_sqrt_d * jnp.sqrt(w_scale)
        offdiag = jnp.sum(jnp.abs(s[:, None] * W * s[None, :]), axis=1)
        c = 1.0 + jnp.max(offdiag)

        def mv(X):
            WX = jnp.dot(W, s[:, None] * X, precision=_EXACT,
                         preferred_element_type=jnp.float32)
            return (c - 1.0) * X + s[:, None] * WX
    else:
        wsc = 1.0 if w_scale is None else w_scale
        c = jnp.max(d + wsc * jnp.sum(jnp.abs(W), axis=1)) + 1.0

        def mv(X):
            return (c * jnp.ones_like(d) - d)[:, None] * X + wsc * jnp.dot(
                W, X, precision=_EXACT, preferred_element_type=jnp.float32)

    X0 = jax.random.normal(jax.random.PRNGKey(0), (N, m_block), jnp.float32)
    if mask is not None:
        X0 = X0 * mask.astype(jnp.float32)[:, None]
    # lobpcg_standard's internal Rayleigh-Ritz/SVQB matmuls must be true f32
    # on TPU too (trace-time context; see the _EXACT note at the top).
    with jax.default_matmul_precision("highest"):
        theta, V, _ = lobpcg_standard(mv, X0, m=iters, tol=tol)
    evals = (c - theta)[:K]
    V = V[:, :K]
    if lapnorm:
        V = jax.lax.rsqrt(d)[:, None] * V
    vectors = V.T
    if mask is not None:
        vectors = vectors * mask.astype(vectors.dtype)[None, :]
    if apply_sign_fix:
        vectors = sign_fix(vectors, mask)
    return evals, vectors


def _resolve_filter_impl(filter_impl: str) -> str:
    """'auto' = pallas on TPU (the VMEM-resident kernel is the point of
    running there), xla elsewhere (off-TPU pallas only interprets — kept
    reachable for tests that pass 'pallas' explicitly). Unknown values fail
    loudly: a typo like 'palas' silently running the XLA chain would be
    indistinguishable from a real Pallas run (ADVICE r3)."""
    if filter_impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    if filter_impl not in ("xla", "pallas"):
        raise ValueError(
            f"cheb_filter_impl must be 'auto', 'xla' or 'pallas'; "
            f"got {filter_impl!r}")
    return filter_impl


def resolved_cheb_impl(N: int, filter_impl: str = "auto",
                       matvec_dtype=jnp.bfloat16, m: int = 8) -> str:
    """The chebyshev filter impl that will ACTUALLY run for an (N, N)
    operator and an (N, m) block: applies the backend resolution ('auto'),
    the bf16 requirement, and the VMEM admission guard. Lets callers
    (bench.py) report the real impl instead of the unresolved request
    string (ADVICE r3). `m` is the solver block size K + lobpcg_block_extra
    — the default 8 matches the pipeline's K=5 + 3; larger K near the
    admission boundary shrinks the admitted N (ADVICE r4)."""
    impl = _resolve_filter_impl(filter_impl)
    if impl == "pallas":
        from .cheb_filter import fits_vmem
        if matvec_dtype != jnp.bfloat16 or not fits_vmem(N, matvec_dtype, m=m):
            return "xla"
    return impl


def validate_cheb_window_init(window_init: str) -> None:
    """Fail fast on an invalid cheb_window_init — BEFORE any compile is
    attempted, so the pipeline's never-crash pallas->xla fallback (which
    catches build failures broadly) cannot misreport a caller typo as a
    kernel compile failure (ADVICE r4)."""
    if window_init in ("auto", "wide", "estimate"):
        return
    if isinstance(window_init, str) and window_init.startswith("wide@"):
        try:
            float(window_init.split("@", 1)[1])
            return
        except ValueError:
            pass
    raise ValueError(
        f"cheb_window_init must be 'auto', 'wide', 'wide@<lam_cut>' or "
        f"'estimate'; got {window_init!r}")


def _chebyshev_laplacian(W, d, K, m_block, n_outer, degree, mask,
                         apply_sign_fix, matvec_dtype=jnp.bfloat16,
                         w_scale=None, filter_impl="xla",
                         window_init="auto"):
    """Chebyshev-filtered subspace iteration for the smallest-K eigenpairs of
    the WHITENED Laplacian (lapnorm=True only) — the 'auto' default for
    lapnorm graphs from N=512 up to the Pallas filter's VMEM admission
    (~3700), residual-guarded (see below).

    Motivation (round-2 profile): jax's lobpcg_standard spends ~91% of its
    device time in per-iteration Rayleigh-Ritz/SVQB batched small-eigh
    custom-calls (~3 per iteration x ~30 iterations). This scheme runs pure
    matvec chains (MXU work) with only 2 small eighs per OUTER iteration
    (2*n_outer + 1 ~ 9 total): estimate the wanted window's upper edge
    lam_cut from a short power-iteration RR, then repeat [Chebyshev filter of
    `degree` damping [lam_cut, 2] -> orthonormalize (SVQB) -> RR]. Masked
    (padded) rows stay exactly zero (zero start block + linear recurrences).

    Validated >= 0.99997 worst subspace cosine vs exact eigh at N in
    {900, 3600} on image-structured graphs (tests/test_solver_chebyshev.py).
    Failure modes exist — if the true lam_K exceeds the clipped window upper
    bound (1.8) the filter damps (or numerically blows up) wanted pairs, and
    clustered/tiny-gap spectra can under-converge within the fixed budget —
    so the solve ends with a residual check (one extra block matvec):
    returns (evals, vectors, residual) where residual = max_k
    ||A x_k - theta_k x_k|| over the wanted K whitened unit vectors
    (non-finite -> +inf). Callers reject residual > CHEB_RESIDUAL_TOL and
    fall back to the exact dense path (laplacian_eigs cheb_guard /
    pipeline extract_eigs host-side retry) — ARPACK-style converge-or-fail
    semantics (tests/test_solver_chebyshev.py adversarial cases).
    """
    N = W.shape[-1]
    inv_sqrt_d = jax.lax.rsqrt(d)
    # Deferred max-normalization (see laplacian_eigs): fold sqrt(w_scale) into
    # the whitening scaling so the scaled graph is never materialized. The
    # final unwhitening below still uses inv_sqrt_d of the (scaled) degrees.
    sc = inv_sqrt_d if w_scale is None else inv_sqrt_d * jnp.sqrt(w_scale)

    def A_mv(X):  # I - D^-1/2 W D^-1/2, exact f32 (RR + residual check)
        return X - sc[:, None] * jnp.dot(
            W, sc[:, None] * X, precision=_EXACT,
            preferred_element_type=jnp.float32)

    # Filter matvecs in bf16 with f32 accumulation: the MXU's native mode
    # (f32 matmuls decompose into multiple bf16 passes, ~2x+ slower). The
    # whitened operator S = D^-1/2 W D^-1/2 is materialized once in bf16 so
    # the per-matvec row/col scalings don't run at reduced precision.
    # Rayleigh-Ritz, the window estimate and the final residual check stay
    # f32 — a bf16-degraded filter only slows convergence, and the residual
    # guard rejects anything that didn't converge (CHEB_RESIDUAL_TOL).
    if matvec_dtype == jnp.float32:
        S_fast = sc[:, None] * W * sc[None, :]
    else:
        S_fast = (sc[:, None] * W * sc[None, :]).astype(matvec_dtype)

    def A_mv_fast(X):
        # bf16 operator: DEFAULT (one MXU pass) is exactly bf16 compute, as
        # designed. f32 operator (matvec_precision='f32'): pin HIGHEST, or
        # XLA:TPU silently runs the dot at bf16 anyway (see _EXACT note).
        prec = None if S_fast.dtype == jnp.bfloat16 else _EXACT
        return X - jnp.dot(S_fast, X.astype(S_fast.dtype), precision=prec,
                           preferred_element_type=jnp.float32)

    X = jax.random.normal(jax.random.PRNGKey(0), (N, m_block), jnp.float32)
    if mask is not None:
        X = X * mask.astype(jnp.float32)[:, None]

    def rr(X):
        # TPU eigh hazard (measured on v5e): XLA's eigh expansion silently
        # returns diag(G) (V = permutation, 59% residual!) when entries reach
        # ~1e21 — its internal squares overflow f32 and no Jacobi rotation
        # fires. An unscaled degree-10 filter grows column norms to ~1e10
        # (Gram ~1e20), exactly that regime, which collapsed the whole solve
        # on TPU while CPU (LAPACK) was fine. The filter chains now rescale
        # per column each step (|T_j| ~ 1), but normalize here too as
        # defense in depth — the span (all RR needs) is unchanged, and Gram
        # entries stay <= 1 for any input.
        X = X / jnp.maximum(jnp.linalg.norm(X, axis=0, keepdims=True), 1e-20)
        G = jnp.dot(X.T, X, precision=_EXACT, preferred_element_type=jnp.float32)
        w, Vg = jnp.linalg.eigh(G)
        Xo = jnp.dot(X, Vg / jnp.sqrt(jnp.maximum(w, 1e-12))[None, :],
                     precision=_EXACT, preferred_element_type=jnp.float32)
        AXo = A_mv(Xo)
        T = jnp.dot(Xo.T, AXo, precision=_EXACT,
                    preferred_element_type=jnp.float32)
        theta, Q = jnp.linalg.eigh((T + T.T) / 2)
        Xr = jnp.dot(Xo, Q, precision=_EXACT,
                     preferred_element_type=jnp.float32)
        # Convergence residual of the wanted K pairs, nearly free as an RR
        # byproduct: A (Xo Q) = (A Xo) Q, and A Xo was already computed for
        # the projection. Exact f32 throughout; non-finite (filter blow-up
        # when lam_K > window) -> +inf so callers always reject it.
        AXr = jnp.dot(AXo, Q, precision=_EXACT,
                      preferred_element_type=jnp.float32)
        R = AXr[:, :K] - Xr[:, :K] * theta[:K][None, :]
        res = jnp.max(jnp.sqrt(jnp.sum(R * R, axis=0)))
        res = jnp.where(jnp.isfinite(res), res, jnp.inf)
        return Xr, theta, res

    use_pallas = resolved_cheb_impl(N, filter_impl, matvec_dtype,
                                    m=m_block) == "pallas"
    if use_pallas:
        from .cheb_filter import chebyshev_filter
    interp = jax.default_backend() != "tpu"

    if window_init == "auto":
        # Measured on-device split (see _WIDE_INIT_MAX_N): skip-the-pre-loop
        # 'wide' wins at small N, the adaptive pre-loop 'estimate' wins once
        # one extra degree-10 outer costs more than the pre-loop.
        window_init = "wide" if N <= _WIDE_INIT_MAX_N else "estimate"

    if window_init == "estimate":
        # Round-3 pre-loop window estimate: a degree-3 bottom-emphasizing
        # filter, then one RR. The Rayleigh quotients overestimate the true
        # smallest eigenvalues, so 1.5x theta_K safely contains the wanted
        # window. Superseded by 'wide' for N <= _WIDE_INIT_MAX_N — the r4b
        # device profile showed this pre-loop costing as much as the whole
        # adaptive loop (deg-3 filter 2.67 ms + RR small-eighs ~4.8 ms of a
        # 21.9 ms phase at N=900 b64) — but still the faster init for
        # larger graphs, where device trip counts inflate under 'wide'.
        if use_pallas:
            # Same kernel as the main chain with (c, e) = (2, 1): T_3(A - 2I)
            # magnifies the bottom of [0, 2] like the (2I - A)^3 power steps
            # (|T_3|: 26 at lam=0 -> 0 at lam=2) — one HBM read of the
            # operator instead of 3. Growth <= 26x, safe in f32; rr
            # column-normalizes.
            X = chebyshev_filter(S_fast, X, 2.0, 1.0, degree=3,
                                 interpret=interp)
        else:
            for _ in range(3):
                X = 2.0 * X - A_mv_fast(X)
                X = X / jnp.maximum(
                    jnp.linalg.norm(X, axis=0, keepdims=True), 1e-20)
        X, theta, res = rr(X)
    elif window_init == "wide" or window_init.startswith("wide@"):
        # 'wide' / 'wide@<lam_cut>': skip the pre-loop entirely. Seed theta
        # so the FIRST loop iteration's window() resolves to a FIXED damping
        # window [lam_cut0, 2] — the first in-loop RR then produces the same
        # interlacing-safe theta the pre-loop produced, one full RR + one
        # filter cheaper. res seeds at +inf so the loop always runs at least
        # one iteration. lam_cut0 trades safety for first-pass selectivity:
        # at 1.8 (maximal window) nothing the clip would ever admit is
        # damped, but bottom-emphasis is weak (T_10 ratio ~5.6x between
        # lam=0 and lam=0.3) and trip counts inflate vs the pre-loop
        # estimate (CPU study: {2: 46, 3: 17, 4: 1} vs {2: 60, 3: 4});
        # tighter windows amplify the bottom harder (1.33^10 ~ 18x at
        # lam_cut0=0.75). Image-Laplacian lam_K sits far below 0.75
        # (measured < 0.1 on the structured set), and any graph whose
        # wanted band the fixed window damps under-converges and is caught
        # by the residual guard -> exact eigh fallback, so a tighter
        # default is safe-by-construction, just slower on pathological
        # graphs. The default lam_cut0 is picked by the on-device A/B
        # (scripts/ab_cheb_window.py) among CPU-converged candidates
        # (scripts/study_cheb_budget.py).
        lam_cut0 = (_WIDE_INIT_LAM_CUT if window_init == "wide"
                    else float(window_init.split("@", 1)[1]))
        theta = jnp.full((m_block,), (lam_cut0 - 1e-3) / 1.5, jnp.float32)
        res = jnp.float32(jnp.inf)
    else:
        raise ValueError(
            f"cheb_window_init must be 'wide', 'wide@<lam_cut>' or "
            f"'estimate'; got {window_init!r}")

    def window(theta):
        # Filter window [lam_cut, 2]: damp everything above lam_cut, amplify
        # below. RR Rayleigh quotients OVERESTIMATE the true eigenvalues
        # (Cauchy interlacing: theta_k >= lam_k for an orthonormal basis), so
        # 1.5x theta_K always contains the wanted band — recomputing the
        # window from the latest theta each outer iteration tightens the
        # filter as the estimates converge downward (measured on 64 CPU
        # image-graphs: 55/64 converge in 2 outers and all by 3, vs
        # {2: 13, 3: 46, 4: 5} with the fixed initial window — with the
        # at-tol early exit below, the vmapped batch-max outer count drops
        # 4 -> 3).
        lam_cut = jnp.clip(theta[K - 1] * 1.5 + 1e-3, 1e-3, 1.8)
        return (lam_cut + 2.0) / 2.0, (2.0 - lam_cut) / 2.0

    if use_pallas:
        # VMEM-resident chain: ONE HBM read of the operator per degree-d
        # filter application instead of d (ops/cheb_filter.py). Interpret
        # mode off-TPU so CPU tests exercise the same code path.

        def filt(X, c, e):
            return chebyshev_filter(S_fast, X, c, e, degree=degree,
                                    interpret=interp)
    else:
        def filt(X, c, e):
            # Joint per-column rescale each step (exact up to the per-column
            # scale rr normalizes away): keeps |T_j| ~ 1 so long/tight-window
            # chains cannot overflow f32 — same scheme as the Pallas kernel
            # (ops/cheb_filter.py). Cost: one (N, m) VPU pass per matvec,
            # fused by XLA, negligible against the (N, N) operator read.
            T0 = X
            T1 = (A_mv_fast(X) - c * X) / e
            for _ in range(degree - 1):
                T2 = 2.0 * (A_mv_fast(T1) - c * T1) / e - T0
                sc = 1.0 / jnp.maximum(
                    jnp.max(jnp.abs(T2), axis=0, keepdims=True), 1.0)
                T0, T1 = T1 * sc, T2 * sc
            return T1

    # Adaptive outer loop: exit as soon as the wanted-pair residual clears
    # the guard with margin (easy image graphs converge after 1-2 of the
    # n_outer budgeted filter applications — each skipped outer saves
    # `degree` streams of the (N, N) operator, the dominant cost at large
    # N). The residual is an RR byproduct (see rr), so the check is free;
    # non-finite spectra give res=inf and run the full budget, then fail
    # the guard. Under vmap the loop runs until every lane converges (the
    # batch pays the slowest image, still <= the old fixed budget).
    def outer_cond(carry):
        _, _, res, i = carry
        # Exit exactly at the guard's own threshold: a lane at res <= tol
        # already passes the caller-side convergence check, so one more
        # outer buys nothing (a tighter 0.5x margin kept whole batches
        # running a 4th outer for lanes already in [tol/2, tol] — measured
        # trip dist on 64 CPU image-graphs: {2: 43, 3: 20, 4: 1} at 0.5x
        # vs {2: 55, 3: 9} at 1.0x with the adaptive window).
        return (i < n_outer) & (res > CHEB_RESIDUAL_TOL)

    def outer_body(carry):
        X, theta, _, i = carry
        c, e = window(theta)
        X, theta, res = rr(filt(X, c, e))
        return X, theta, res, i + 1

    X, theta, res, _ = jax.lax.while_loop(
        outer_cond, outer_body, (X, theta, res, jnp.int32(0)))

    evals = theta[:K]
    Xk = X[:, :K]
    V = inv_sqrt_d[:, None] * Xk         # unwhiten: x^T D x = 1 (ARPACK M-norm)
    vectors = V.T
    if mask is not None:
        vectors = vectors * mask.astype(vectors.dtype)[None, :]
    if apply_sign_fix:
        vectors = sign_fix(vectors, mask)
    return evals, vectors, res


def affinity_eigs(
    W: jax.Array,
    K: int,
    *,
    mask: Optional[jax.Array] = None,
    apply_sign_fix: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Largest-K eigenpairs of an affinity matrix.

    Reference quirk preserved (extract/extract.py:166-172): ARPACK returns the K
    largest in ascending order; the reference flips the *eigenvectors* to
    descending but leaves the *eigenvalues* ascending. We do the same.
    """
    W = W.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(W.dtype)
        W = W * m[:, None] * m[None, :]
        # Push padded eigenvalues *below* the valid spectrum for a largest-K solve.
        bound = jnp.max(jnp.sum(jnp.abs(W), axis=-1)) + 1.0
        W = W - jnp.diag(jnp.where(mask, 0.0, bound))
    evals, evecs = jnp.linalg.eigh(W)  # ascending
    evals_k = evals[-K:]               # K largest, ascending (ARPACK order)
    vectors = evecs[:, -K:][:, ::-1].T  # (K, N), descending eigenvalue
    if mask is not None:
        vectors = vectors * mask.astype(vectors.dtype)[None, :]
    if apply_sign_fix:
        vectors = sign_fix(vectors, mask)
    return evals_k, vectors


def affinity_svd_eigs(
    feats: jax.Array,
    K: int,
    *,
    mask: Optional[jax.Array] = None,
    apply_sign_fix: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Left singular vectors of the (normalized) feature matrix — the reference's
    'affinity_svd' mode (extract/extract.py:160-163): eigenvectors = U[:, :K].T,
    eigenvalues = S[:K]."""
    f = feats.astype(jnp.float32)
    if mask is not None:
        f = f * mask.astype(f.dtype)[:, None]
    U, S, _ = jnp.linalg.svd(f, full_matrices=False)
    vectors = U[:, :K].T
    if apply_sign_fix:
        vectors = sign_fix(vectors, mask)
    return S[:K], vectors


def spectral_decompose(
    feats: jax.Array,
    K: int,
    *,
    which_matrix: str = "laplacian",
    normalize: bool = True,
    threshold_at_zero: bool = True,
    lapnorm: bool = True,
    color_W: Optional[jax.Array] = None,
    image_color_lambda: float = 0.0,
    mask: Optional[jax.Array] = None,
    solver: str = "auto",
    cheb_filter_impl: str = "auto",
    cheb_window_init: str = "auto",
    cheb_degree: int = 10,
    return_residual: bool = False,
):
    """Fused end-to-end spectral decomposition of one image's patch features.

    This is the TPU-native equivalent of the whole `_extract_eig` hot path
    (reference: extract/extract.py:119-244): affinity matmul + optional color-graph
    fusion + Laplacian + eigensolve in a single compiled program, with no host
    round-trips. Batch it with `vmap` over bucketed images.

    feats: (N, D). color_W: optional precomputed (N, N) color affinity.
    Returns (eigenvalues (K,), eigenvectors (K, N)); with return_residual,
    also the chebyshev convergence residual (0.0 for other solvers — see
    laplacian_eigs) so batched callers can do per-image fallback.
    """
    if which_matrix in ("laplacian", "matting_laplacian"):
        if color_W is not None and image_color_lambda > 0:
            # Color fusion needs the max-normalized W_feat materialized
            # (W = W_feat/max + lambda*W_color, extract/extract.py:221).
            W = feature_affinity(
                feats, normalize=normalize, threshold_at_zero=threshold_at_zero,
                max_normalize=True, mask=mask,
            )
            W = W + color_W.astype(W.dtype) * image_color_lambda
            # Both terms have structurally zero padded rows/cols (feature
            # masking in the Gram product; knn/rw affinities mask/clamp to
            # the valid region), so skip the re-mask inside laplacian_eigs.
            return laplacian_eigs(W, K, lapnorm=lapnorm, mask=mask,
                                  solver=solver,
                                  cheb_filter_impl=cheb_filter_impl,
                                  cheb_window_init=cheb_window_init,
                                  cheb_degree=cheb_degree,
                                  return_residual=return_residual,
                                  w_premasked=True)
        # No fusion: defer the max-normalization into the solver's whitening
        # scalings (w_scale) — skips a full (N, N) divide pass that XLA
        # cannot fuse into the downstream dot operands.
        W = feature_affinity(
            feats, normalize=normalize, threshold_at_zero=threshold_at_zero,
            max_normalize=False, mask=mask,
        )
        w_scale = 1.0 / jnp.maximum(jnp.max(W), 1e-12)
        return laplacian_eigs(W, K, lapnorm=lapnorm, mask=mask, solver=solver,
                              cheb_filter_impl=cheb_filter_impl,
                              cheb_window_init=cheb_window_init,
                              cheb_degree=cheb_degree,
                              return_residual=return_residual,
                              w_scale=w_scale, w_premasked=True)
    if which_matrix in ("affinity", "affinity_torch"):
        W = feature_affinity(
            feats, normalize=normalize, threshold_at_zero=threshold_at_zero,
            max_normalize=False, mask=mask,
        )
        out = affinity_eigs(W, K, mask=mask)
    elif which_matrix == "affinity_svd":
        f = l2_normalize(feats) if normalize else feats
        out = affinity_svd_eigs(f, K, mask=mask)
    else:
        raise ValueError(f"unknown which_matrix: {which_matrix}")
    return (*out, jnp.float32(0.0)) if return_residual else out


def resolve_eig_chunk(eig_chunk: Union[int, str, None], B: int) -> Optional[int]:
    """Resolve the eig_chunk request for a batch of B images.

    'auto' = the measured device rule (scripts/sweep_eig_chunk.py, r4c,
    N=900, v5e): whole batch below b64 (the lax.map sequentialization
    overhead exceeds any saved adaptive outers — 1.93 ms/call whole vs
    2.74+ chunked at b24), chunk=8 at B >= 64 (10.32 vs 11.80 ms/call at
    b64 — more lanes = higher batch-max trip odds). Falls back to whole
    batch when 8 does not divide B. None/0 = whole batch; ints pass
    through (validated against B by the caller)."""
    if eig_chunk == "auto":
        return 8 if (B >= 64 and B % 8 == 0) else None
    return eig_chunk or None


@partial(jax.jit, static_argnames=("K", "which_matrix", "normalize", "threshold_at_zero",
                                   "lapnorm", "image_color_lambda", "solver",
                                   "cheb_filter_impl", "cheb_window_init",
                                   "cheb_degree", "return_residual",
                                   "eig_chunk"))
def spectral_decompose_batched(
    feats: jax.Array,
    masks: Optional[jax.Array] = None,
    color_W: Optional[jax.Array] = None,
    *,
    K: int = 5,
    which_matrix: str = "laplacian",
    normalize: bool = True,
    threshold_at_zero: bool = True,
    lapnorm: bool = True,
    image_color_lambda: float = 0.0,
    solver: str = "auto",
    cheb_filter_impl: str = "auto",
    cheb_window_init: str = "auto",
    cheb_degree: int = 10,
    return_residual: bool = False,
    eig_chunk: Union[int, str, None] = "auto",
):
    """Batched `spectral_decompose`: feats (B, N, D), masks (B, N), color_W (B, N, N).

    With return_residual, also returns per-image (B,) chebyshev convergence
    residuals (0.0 for other solvers) and the guard is deferred to the
    caller (pipeline extract_eigs re-solves offenders per image host-side,
    merged with its non-finite retry). Without return_residual the batched
    path self-guards PER IMAGE with a lax.scan whose body holds a
    scalar-predicate lax.cond: under vmap a cond executes both branches for
    the whole batch, but scan is sequential, so each image's cond is a real
    branch and the dense eigh re-solve executes only for the under-converged
    images — O(bad), not O(batch). Good images pass through unchanged (a
    (K,) + (K, N) copy per image, negligible).

    eig_chunk: optionally solve the batch in sequential sub-batches of this
    size (lax.map over chunks of the vmapped solve). The chebyshev adaptive
    outer loop under vmap runs until EVERY lane converges, so one slow graph
    forces the batch-max outer count (each extra outer = `degree` streams of
    each lane's (N, N) operator); chunking confines that penalty to the slow
    graph's chunk. An int must divide the batch; None/0 = whole batch;
    'auto' (default) applies the measured device rule — see
    resolve_eig_chunk. Measured on device (scripts/sweep_eig_chunk.py, r4c,
    N=900): at the b24 bench default WHOLE BATCH wins (1.93 ms/call vs
    2.74/3.16/3.44 at chunks 4/8/12 — the lax.map sequentialization
    overhead exceeds any saved outers), while at b64 chunk=8 wins 10.32 vs
    11.80 ms/call (more lanes = higher batch-max trip odds).
    """
    def one(f, m, cw, slv):
        return spectral_decompose(
            f, K, which_matrix=which_matrix, normalize=normalize,
            threshold_at_zero=threshold_at_zero, lapnorm=lapnorm,
            color_W=cw, image_color_lambda=image_color_lambda, mask=m,
            solver=slv, cheb_filter_impl=cheb_filter_impl,
            cheb_window_init=cheb_window_init, cheb_degree=cheb_degree,
            return_residual=True,
        )
    if masks is None:
        masks = jnp.ones(feats.shape[:2], dtype=bool)

    def solve(slv):
        def vsolve(f, m, cw):
            if cw is None:
                return jax.vmap(lambda ff, mm: one(ff, mm, None, slv))(f, m)
            return jax.vmap(lambda ff, mm, cc: one(ff, mm, cc, slv))(f, m, cw)

        B = feats.shape[0]
        chunk = resolve_eig_chunk(eig_chunk, B)
        if not chunk or chunk >= B:
            return vsolve(feats, masks, color_W)
        if B % chunk != 0:
            raise ValueError(
                f"eig_chunk={chunk} must divide the batch size {B}")
        rs = lambda x: x.reshape(B // chunk, chunk, *x.shape[1:])
        out = jax.lax.map(
            lambda xs: vsolve(*xs),
            (rs(feats), rs(masks),
             rs(color_W) if color_W is not None else None))
        return jax.tree.map(lambda x: x.reshape(B, *x.shape[2:]), out)

    evals, vecs, res = solve(solver)
    if return_residual:
        return evals, vecs, res
    eff = _resolve_solver(feats.shape[1], K + 3, lapnorm, solver,
                          filter_impl=cheb_filter_impl)
    if which_matrix in ("laplacian", "matting_laplacian") and eff == "chebyshev":
        # Per-image guard via lax.scan: scan bodies run sequentially, so the
        # scalar-predicate lax.cond inside is a REAL branch (unlike under
        # vmap, where a cond executes both branches for the whole batch) and
        # the dense eigh re-solve executes only for the images whose residual
        # tripped — O(bad) instead of the round-3 whole-batch re-solve.
        def fix_one(_, xs):
            if color_W is None:
                f, m, ev, vc, r = xs
                cw = None
            else:
                f, m, cw, ev, vc, r = xs
            out = jax.lax.cond(
                r <= CHEB_RESIDUAL_TOL,  # False for NaN/inf residuals too
                lambda: (ev, vc),
                lambda: one(f, m, cw, "eigh")[:2])
            return 0, out
        xs = ((feats, masks, evals, vecs, res) if color_W is None
              else (feats, masks, color_W, evals, vecs, res))
        _, (evals, vecs) = jax.lax.scan(fix_one, 0, xs)
    return evals, vecs
