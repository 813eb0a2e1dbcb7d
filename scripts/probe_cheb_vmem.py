"""Probe the Pallas chebyshev filter's real scoped-VMEM boundary on device.

For each N, run one batched chebyshev solve with cheb_filter_impl='pallas'
(explicit — bypasses the 'auto' regime split, exercises fits_vmem + the
raised CompilerParams vmem limit) and report compile/run/quality status.
Calibrates ops/cheb_filter's admission model (VERDICT r3 #1a: 're-derive the
true bound on device'): every N the guard ADMITS must compile and converge;
the first N it REJECTS should be near the real compile boundary.

Run: python -u scripts/probe_cheb_vmem.py [--ns 1600,2025,2500,3136,3600,3844]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="1600,2025,2500,3136,3600,3844")
    ap.add_argument("--batch", type=int, default=4)
    a = ap.parse_args()

    import jax.numpy as jnp
    from bench import _structured_features
    from deep_spectral_tpu.ops.cheb_filter import fits_vmem, scoped_vmem_bytes
    from deep_spectral_tpu.ops.eigen import (CHEB_RESIDUAL_TOL,
                                             spectral_decompose_batched)

    rng = np.random.default_rng(0)
    for n in [int(x) for x in a.ns.split(",")]:
        grid = int(round(n ** 0.5))
        N = grid * grid
        admit = fits_vmem(N)
        est_mb = scoped_vmem_bytes(N) / 1e6
        feats = jnp.asarray(_structured_features(a.batch, grid, 384, rng))
        mask = jnp.ones((a.batch, N), bool)
        t0 = time.time()
        try:
            ev, vec, res = spectral_decompose_batched(
                feats, mask, K=5, solver="chebyshev",
                cheb_filter_impl="pallas", return_residual=True)
            res = np.asarray(res)
            ok = bool((res <= CHEB_RESIDUAL_TOL).all())
            print(f"N={N:5d} admit={admit} est={est_mb:6.1f}MB -> ran "
                  f"(compile+run {time.time()-t0:.0f}s, res_max "
                  f"{res.max():.2e}, converged={ok})"
                  + ("" if admit else "  [guard rejected -> this ran XLA]"),
                  flush=True)
        except Exception as exc:  # noqa: BLE001 — probing for failures
            print(f"N={N:5d} admit={admit} est={est_mb:6.1f}MB -> FAILED "
                  f"({type(exc).__name__}: {str(exc)[:160]})", flush=True)


if __name__ == "__main__":
    main()
