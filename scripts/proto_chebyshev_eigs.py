"""PROTOTYPE: Chebyshev-filtered subspace iteration for the smallest-K
Laplacian eigenpairs — a candidate replacement for jax's lobpcg_standard,
whose per-iteration Rayleigh-Ritz/SVQB batched small-eigh custom-calls are
~91% of the eigensolve's device time (round-2 profile).

Scheme (ChASE-style):
  whitened A in [0, 2]; want the K smallest.
  1. A few power iterations of (2I - A) on a random block to estimate the
     wanted window's upper edge lam_cut via one small RR.
  2. Outer loop: X <- T_deg(L(A)) X where L maps [lam_cut, 2] -> [-1, 1]
     (three-term Chebyshev recurrence — pure matvecs, damps the unwanted
     band while amplifying [0, lam_cut) like cosh(deg * acosh(.))), then
     orthonormalize (one small eigh via SVQB) and Rayleigh-Ritz (one more).
  Total small-eigh count: 2 * n_outer + 1 ~ 10 vs LOBPCG's ~90.

Run quality on CPU:   python -u scripts/proto_chebyshev_eigs.py
Not wired into ops/eigen.py — this is the round-3 starting point.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def chebyshev_eigs(W, K, *, m_block=None, n_outer=4, degree=10):
    import jax
    import jax.numpy as jnp
    from deep_spectral_tpu.ops.affinity import degree_vector

    N = W.shape[-1]
    m = m_block or (K + 3)
    d = degree_vector(W)
    inv_sqrt_d = jax.lax.rsqrt(d)

    def A_mv(X):  # whitened Laplacian: I - D^-1/2 W D^-1/2
        return X - inv_sqrt_d[:, None] * (W @ (inv_sqrt_d[:, None] * X))

    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (N, m), jnp.float32)

    def rr(X):
        # orthonormalize (SVQB) + Rayleigh-Ritz, ascending
        G = X.T @ X
        w, V = jnp.linalg.eigh(G)
        w = jnp.maximum(w, 1e-12)
        Xo = X @ (V / jnp.sqrt(w)[None, :])
        T = Xo.T @ A_mv(Xo)
        theta, Q = jnp.linalg.eigh((T + T.T) / 2)
        return Xo @ Q, theta

    # window estimate: few plain power steps on (2I - A) then RR
    for _ in range(3):
        X = 2 * X - A_mv(X)
        X = X / jnp.linalg.norm(X, axis=0, keepdims=True)
    X, theta = rr(X)
    lam_cut = float(theta[K - 1]) * 1.5 + 1e-3   # a bit past the K-th estimate
    lam_cut = min(max(lam_cut, 1e-3), 1.0)

    # Chebyshev filter on [lam_cut, 2]: y = (2A - (lam_cut + 2)) / (2 - lam_cut)
    c = (lam_cut + 2.0) / 2.0
    e = (2.0 - lam_cut) / 2.0

    def filt(X):
        T0 = X
        T1 = (A_mv(X) - c * X) / e
        for _ in range(degree - 1):
            T2 = 2.0 * (A_mv(T1) - c * T1) / e - T0
            T0, T1 = T1, T2
        return T1

    for _ in range(n_outer):
        X = filt(X)
        X, theta = rr(X)

    evals = theta[:K]
    V = X[:, :K]
    V = inv_sqrt_d[:, None] * V          # unwhiten: x^T D x = 1
    return np.asarray(evals), np.asarray(V.T)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from deep_spectral_tpu.ops.affinity import feature_affinity
    from deep_spectral_tpu.ops.eigen import laplacian_eigs
    from sweep_lobpcg_block import image_features

    K = 5
    for n, label in ((900, "N~900"), (3600, "N~3600")):
        h = int(np.sqrt(n) * 0.75)
        w = n // h
        feats = image_features(4, h, w, 64, seed=n)
        worst = 1.0
        for f in feats:
            W = jnp.asarray(np.asarray(feature_affinity(jnp.asarray(f))))
            ev_r, V_r = laplacian_eigs(W, K, solver="eigh",
                                       apply_sign_fix=False)
            ev, V = chebyshev_eigs(np.asarray(W), K)
            V_r = np.asarray(V_r)
            Q1, _ = np.linalg.qr(V.T)
            Q2, _ = np.linalg.qr(V_r.T)
            s = np.linalg.svd(Q1.T @ Q2, compute_uv=False)
            worst = min(worst, float(s.min()))
            print(f"  {label}: evals cheb {np.round(ev, 5)} vs eigh "
                  f"{np.round(np.asarray(ev_r), 5)}")
        print(f"{label}: worst subspace cos {worst:.6f} "
              f"(target >= 0.999; small-eigh count ~9 vs LOBPCG ~90)")


if __name__ == "__main__":
    main()
