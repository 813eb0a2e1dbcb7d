"""A/B the VMEM-resident Pallas Chebyshev filter vs the XLA dot chain on the
real TPU (device-time harness: chained loop-in-jit, two lengths differenced —
see scripts/bench_device_time.py for why per-call timings lie on this tunnel).

Measures the EIGS PHASE (spectral_decompose_batched, structured features so
the solve is on the convergent fast path) at the flagship vits16 config
(N=900, b64) and a larger chebyshev-eligible config (N=2025, b16), for
cheb_filter_impl in {xla, pallas}; verifies residual convergence and
subspace agreement between the two impls on-device.

Run: python -u scripts/bench_cheb_filter.py [--batch 64]
"""
import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timed_loop(step_fn, carry, n1=2, n2=8):
    @functools.partial(jax.jit, static_argnames="n")
    def run(c, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step_fn(c), c)

    def measure(n):
        out = run(carry, n)
        leaf = jax.tree_util.tree_leaves(out)[0]
        t0 = time.time()
        np.asarray(leaf.ravel()[0])
        return time.time() - t0

    for n in (n1, n2):
        run(carry, n)
    measure(n1)
    t1 = min(measure(n1) for _ in range(3))
    t2 = min(measure(n2) for _ in range(3))
    return (t2 - t1) / (n2 - n1)


def bench(n_tokens, batch, K=5):
    from bench import _structured_features
    from deep_spectral_tpu.ops.eigen import (CHEB_RESIDUAL_TOL,
                                             spectral_decompose_batched)

    grid = int(round(n_tokens ** 0.5))
    rng = np.random.default_rng(0)
    f = jnp.asarray(_structured_features(batch, grid, 384, rng))
    mask = jnp.ones((batch, grid * grid), bool)

    outs = {}
    for impl in ("xla", "pallas"):
        ev, vec, res = spectral_decompose_batched(
            f, mask, K=K, solver="chebyshev", cheb_filter_impl=impl,
            return_residual=True)
        res = np.asarray(res)
        outs[impl] = np.asarray(vec)
        print(f"  {impl}: residual max {res.max():.2e} "
              f"(tol {CHEB_RESIDUAL_TOL}) converged={bool((res <= CHEB_RESIDUAL_TOL).all())}")

    # subspace agreement between impls, worst image
    worst = 1.0
    for b in range(batch):
        Qx, _ = np.linalg.qr(outs["xla"][b].T)
        Qp, _ = np.linalg.qr(outs["pallas"][b].T)
        worst = min(worst, float(np.linalg.svd(Qx.T @ Qp,
                                               compute_uv=False).min()))
    print(f"  xla-vs-pallas worst subspace cos: {worst:.6f}")

    for impl in ("xla", "pallas"):
        def step(c, impl=impl):
            _, evecs, _ = spectral_decompose_batched(
                c, mask, K=K, solver="chebyshev", cheb_filter_impl=impl,
                return_residual=True)
            return c + jnp.mean(evecs).astype(c.dtype) * 1e-9

        dt = timed_loop(step, f)
        print(f"  {impl}: {dt*1e3:8.2f} ms/call = {batch/dt:8.1f} img/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    a = ap.parse_args()
    print(f"N=900 b{a.batch} (flagship vits16 eigs phase):")
    bench(900, a.batch)
    print("N=2025 b16 (upper chebyshev regime):")
    bench(2025, 16)
