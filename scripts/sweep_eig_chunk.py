"""Sweep eig_chunk (sequential sub-batching of the batched eigs solve) on the
real TPU at the flagship config.

Why: the chebyshev adaptive outer loop under vmap runs until EVERY lane
converges, so one slow graph forces batch-max outers on all lanes (measured
CPU trip dist {2: 55, 3: 9} over 64 image graphs — 9 slow graphs cost the
other 55 a full extra filter application, `degree` streams of each (N, N)
operator). eig_chunk confines the penalty to the slow graph's chunk; this
script measures whether the saved filter work beats the lax.map
sequentialization overhead, per chunk size, with the device-time harness
(chained loop-in-jit, two lengths differenced — per-call timings lie on this
tunnel, see scripts/bench_device_time.py).

Run: python -u scripts/sweep_eig_chunk.py [--batch 64] [--n-tokens 900]
     [--chunks 0,4,8,16,32]   (0 = whole batch)
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-tokens", type=int, default=900)
    ap.add_argument("--chunks", default="0,4,8,16,32")
    ap.add_argument("--K", type=int, default=5)
    a = ap.parse_args()

    from bench import _structured_features
    from bench_cheb_filter import timed_loop
    from deep_spectral_tpu.ops.eigen import (CHEB_RESIDUAL_TOL,
                                             spectral_decompose_batched)

    grid = int(round(a.n_tokens ** 0.5))
    rng = np.random.default_rng(0)
    f = jnp.asarray(_structured_features(a.batch, grid, 384, rng))
    mask = jnp.ones((a.batch, grid * grid), bool)

    for chunk in [int(x) for x in a.chunks.split(",")]:
        ck = chunk or None
        ev, vec, res = spectral_decompose_batched(
            f, mask, K=a.K, solver="chebyshev", return_residual=True,
            eig_chunk=ck)
        res = np.asarray(res)
        conv = bool((res <= CHEB_RESIDUAL_TOL).all())

        def step(c, ck=ck):
            _, evecs, _ = spectral_decompose_batched(
                c, mask, K=a.K, solver="chebyshev", return_residual=True,
                eig_chunk=ck)
            return c + jnp.mean(evecs).astype(c.dtype) * 1e-9

        dt = timed_loop(step, f)
        print(f"eig_chunk {chunk or 'whole':>5}: {dt*1e3:8.2f} ms/call = "
              f"{a.batch/dt:8.1f} img/s  (residual max {res.max():.2e}, "
              f"converged={conv})", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    main()
