"""CPU convergence study for the chebyshev filter budget (degree x outers).

The r4b device profile (N=900 b64 pallas) splits the eigs phase ~1/3 pre-loop
window estimate (degree-3 filter + full RR, incl. two batched small-eigh
custom calls), ~1/3 adaptive outer loop, ~1/3 W/S construction. Raising the
filter degree per RR (safe to 20 — r3: basis collapse ONLY above that) and/or
dropping the pre-loop RR trades filter matvecs (cheap, VMEM-resident) for RR
custom-calls (expensive). This script measures, on the 64-graph structured
CPU set, the per-image outer-trip distribution and worst residual for each
candidate budget — the device A/B only runs candidates that stay fully
converged here.

Trip counts use the REAL solver: residual after a budget of n outers is the
state after min(trips, n) (the while early-exits), so an image's trip count
is the smallest n with residual <= tol.

Run (CPU): JAX_PLATFORMS=cpu python -u scripts/study_cheb_budget.py
"""
import argparse
import collections
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=30)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--variants",
                    default="estimate:10,wide@1.8:10,wide@1.0:10,"
                            "wide@0.75:10,wide@0.5:10,wide@0.75:14,wide:20")
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default) or device: trip counts can differ "
                         "on the TPU (bf16 MXU filter matvecs vs the CPU "
                         "study) — the device run decides defaults")
    a = ap.parse_args()
    variants = [(w, int(d)) for w, d in
                (v.rsplit(":", 1) for v in a.variants.split(","))]
    if a.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bench import _structured_features
    from deep_spectral_tpu.ops.affinity import feature_affinity
    from deep_spectral_tpu.ops.eigen import CHEB_RESIDUAL_TOL, laplacian_eigs

    B, grid, D, K = a.batch, a.grid, 384, 5
    rng = np.random.default_rng(0)
    feats = _structured_features(B, grid, D, rng)

    Ws, scales = [], []
    for b in range(B):
        W = feature_affinity(jnp.asarray(feats[b]), max_normalize=False)
        Ws.append(np.asarray(W))
        scales.append(1.0 / float(jnp.max(W)))
    Ws = jnp.asarray(np.stack(Ws))
    scales = jnp.asarray(np.asarray(scales, np.float32))

    import functools

    @functools.partial(jax.jit, static_argnames=("n", "degree", "win_init"))
    def solve_batch(Ws, scales, n, degree, win_init):
        def one(W, sc):
            _, _, rr = laplacian_eigs(
                W, K, solver="chebyshev", cheb_outer=n, cheb_degree=degree,
                w_scale=sc, return_residual=True, matvec_precision="bf16",
                cheb_window_init=win_init)
            return rr
        return jax.vmap(one)(Ws, scales)

    for win_init, degree in variants:
        # residual per image per outer budget
        res_at = {}
        for n in (1, 2, 3, 4):
            res_at[n] = np.asarray(solve_batch(Ws, scales, n, degree,
                                               win_init))
        trips = np.full(B, 99)
        for n in (4, 3, 2, 1):
            trips[res_at[n] <= CHEB_RESIDUAL_TOL] = n
        dist = collections.Counter(trips.tolist())
        conv4 = int((res_at[4] <= CHEB_RESIDUAL_TOL).sum())
        print(f"N={grid*grid} {win_init:9s} degree {degree:2d}: "
              f"trip dist {dict(sorted(dist.items()))} "
              f"(99 = unconverged at 4); converged@4 {conv4}/{B}; "
              f"worst residual@4 {res_at[4].max():.2e}", flush=True)


if __name__ == "__main__":
    main()
