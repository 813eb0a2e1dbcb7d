"""On-device A/B: chebyshev window init 'wide' (skip the pre-loop RR) vs
'estimate' (round-3 degree-3 filter + RR window estimate).

Why: the r4b eigs-phase profile (N=900 b64, pallas filter) split the 21.9 ms
phase ~1/3 pre-loop window estimate (deg-3 filter 2.67 ms + RR small-eigh
custom-calls ~4.8 ms), ~1/3 adaptive outer loop, ~1/3 W/S construction. The
'wide' init replaces the pre-loop with a fixed [1.0, 2] first-outer window
(_WIDE_INIT_LAM_CUT, picked by this A/B among CPU-converged candidates) —
one full RR and one filter cheaper when trip counts hold (CPU gate:
scripts/study_cheb_budget.py).

Measures, per config, device-time (chained loop-in-jit, two lengths
differenced) for both inits plus residual-based convergence. Convergence must
hold for the A/B to count.

Run: python -u scripts/ab_cheb_window.py [--configs 900:24,900:64,2025:16,3600:16]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="900:24,900:64,2025:16,3600:16")
    ap.add_argument("--variants", default="estimate:10,wide:10",
                    help="comma list of window_init:degree pairs; the "
                         "special token 'lobpcg' measures the LOBPCG solver "
                         "instead (same harness, for regime-split decisions)")
    ap.add_argument("--K", type=int, default=5)
    a = ap.parse_args()
    variants = [("lobpcg", 0) if v == "lobpcg"
                else (v.rsplit(":", 1)[0], int(v.rsplit(":", 1)[1]))
                for v in a.variants.split(",")]

    from bench import _structured_features
    from bench_device_time import timed_loop
    from deep_spectral_tpu.ops.eigen import (CHEB_RESIDUAL_TOL,
                                             spectral_decompose_batched)

    for cfg in a.configs.split(","):
        n_tokens, batch = (int(x) for x in cfg.split(":"))
        grid = int(round(n_tokens ** 0.5))
        rng = np.random.default_rng(0)
        f = jnp.asarray(_structured_features(batch, grid, 384, rng))
        mask = jnp.ones((batch, grid * grid), bool)

        for win, deg in variants:
            if win == "lobpcg":
                kw = dict(solver="lobpcg")
            else:
                kw = dict(solver="chebyshev", cheb_window_init=win,
                          cheb_degree=deg)
            ev, vec, res = spectral_decompose_batched(
                f, mask, K=a.K, return_residual=True, **kw)
            res = np.asarray(res)
            conv = bool((res <= CHEB_RESIDUAL_TOL).all())

            def step(c, kw=kw):
                _, evecs, _ = spectral_decompose_batched(
                    c, mask, K=a.K, return_residual=True, **kw)
                return c + jnp.mean(evecs).astype(c.dtype) * 1e-9

            dt = timed_loop(step, f)
            label = win if win == "lobpcg" else f"{win}:{deg}"
            print(f"N={n_tokens} b{batch} {label}: "
                  f"{dt*1e3:8.2f} ms/call = {batch/dt:8.1f} img/s  "
                  f"(residual max {res.max():.2e}, converged={conv})",
                  flush=True)


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    main()
