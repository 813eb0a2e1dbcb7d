"""On-device numerics validation — run after ANY change to numerical code.

Round-3 lesson: CPU tests cannot certify TPU behavior. Two silent traps were
found on v5e (see ops/eigen.py's TPU-numerics note): the eigh/svd expansions
overflow f32 internally for large-magnitude inputs and return diag(A) with
NO error, and DEFAULT-precision f32 dots execute as single bf16 MXU passes.
This script re-checks, on the real chip:

  1. the eigh-overflow hazard is still caught (a 1e21-scaled Gram must NOT
     be treated as diagonal by the solvers' normalized path);
  2. chebyshev + LOBPCG converge on image-structured graphs at N=900 and
     N=3600 with residuals ~1e-4 and subspace cosine >= 0.999 vs dense eigh;
  3. the residual guard still rejects a spectrally unstructured graph.

Run: python -u scripts/validate_tpu_numerics.py   (exit code 0 = all pass)
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def subcos(U, V):
    Qu, _ = np.linalg.qr(np.asarray(U).T)
    Qv, _ = np.linalg.qr(np.asarray(V).T)
    return float(np.linalg.svd(Qu.T @ Qv, compute_uv=False).min())


def main():
    import jax
    import jax.numpy as jnp
    from bench import _structured_features
    from deep_spectral_tpu.ops.eigen import (spectral_decompose_batched,
                                             CHEB_RESIDUAL_TOL)

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    failures = []

    # -- 1. eigh overflow probe: a PSD matrix with ~1e21 entries must still
    #       decompose correctly after O(1) scaling (what the solvers do).
    rng = np.random.default_rng(0)
    A0 = rng.standard_normal((8, 8)).astype(np.float64)
    A0 = (A0 @ A0.T).astype(np.float32)
    big = jnp.asarray(A0 * 1e21)
    w_big, _ = jax.jit(jnp.linalg.eigh)(big)
    diag_like = np.allclose(np.sort(np.diag(A0 * 1e21)), np.asarray(w_big),
                            rtol=1e-3)
    scaled = big / jnp.max(jnp.abs(big))
    w_s, _ = jax.jit(jnp.linalg.eigh)(scaled)
    w_ref = np.linalg.eigvalsh(A0 / np.abs(A0).max())
    ok_scaled = np.allclose(np.asarray(w_s), w_ref, atol=1e-4)
    print(f"[1] eigh overflow: raw-1e21 returns diag(A)={diag_like} "
          f"(the hazard {'persists — normalization stays mandatory' if diag_like else 'is gone in this XLA'}); "
          f"O(1)-scaled eigh correct={ok_scaled}")
    if not ok_scaled:
        failures.append("scaled eigh wrong")

    # -- 2. solver convergence + quality at the two workload sizes.
    for N, batch in ((900, 8), (3600, 4)):
        grid = int(round(N ** 0.5))
        feats = jnp.asarray(_structured_features(batch, grid, 384, rng))
        mask = jnp.ones((batch, grid * grid), bool)
        _, vec_e = spectral_decompose_batched(feats, mask, K=5, solver="eigh")
        vec_e = np.asarray(vec_e)
        variants = [("chebyshev", "xla"), ("lobpcg", "xla")]
        from deep_spectral_tpu.ops.cheb_filter import fits_vmem
        if fits_vmem(N):  # VMEM-resident filter (raised scoped limit: ~3700)
            variants.append(("chebyshev", "pallas"))
        for slv, impl in variants:
            out = spectral_decompose_batched(feats, mask, K=5, solver=slv,
                                             cheb_filter_impl=impl,
                                             return_residual=True)
            res = float(np.asarray(out[2]).max())
            vec = np.asarray(out[1])
            cos = min(subcos(vec[b][1:], vec_e[b][1:]) for b in range(batch))
            ok = (slv == "lobpcg" or res <= CHEB_RESIDUAL_TOL) and cos >= 0.999
            print(f"[2] N={N} {slv}[{impl}]: res_max={res:.2e} "
                  f"subcos_min={cos:.6f} {'OK' if ok else 'FAIL'}")
            if not ok:
                failures.append(f"{slv}[{impl}]@{N}")

    # -- 3. the residual guard must REJECT a deliberately under-budgeted
    #       solve (1 outer x degree-2 filter cannot converge at N=900) —
    #       proving the guard itself is alive on this backend.
    from deep_spectral_tpu.ops.affinity import feature_affinity
    from deep_spectral_tpu.ops.eigen import laplacian_eigs
    f = _structured_features(1, 30, 384, rng)[0]
    W = feature_affinity(jnp.asarray(f))
    _, _, res_ub = laplacian_eigs(W, 5, solver="chebyshev", cheb_outer=1,
                                  cheb_degree=2, return_residual=True)
    res_ub = float(res_ub)
    guard_fires = res_ub > CHEB_RESIDUAL_TOL
    print(f"[3] under-budgeted-solve guard: residual={res_ub:.2e} "
          f"rejected={guard_fires}")
    if not guard_fires:
        failures.append("guard did not fire on an under-converged solve")

    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL TPU NUMERICS CHECKS PASSED")


if __name__ == "__main__":
    main()
