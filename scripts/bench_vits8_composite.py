"""ViT-S/8 480px composite (feature extraction + eigs, N=3600) device-time
bench with on-device solver quality validation.

The round-2 solver regime split (lobpcg above N=2048) was tuned before the
TPU numerics fixes (eigh overflow + DEFAULT-precision bf16 dots,
ops/eigen.py) — both solvers were silently corrupt on device, so their
measured ranking was meaningless. This script re-times the composite with
correct numerics and re-validates quality: chebyshev residuals (exact,
on-device) plus subspace cosine vs dense eigh on a small probe batch.

Run on the real TPU: python -u scripts/bench_vits8_composite.py
"""
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

BATCH = 16
SIZE = 480
K = 5
GRID = SIZE // 8  # 60 -> N = 3600


def smooth_features(batch, grid, D, rng):
    from bench import _structured_features
    return _structured_features(batch, grid, D, rng)


def main():
    from deep_spectral_tpu.models.convert import load_params
    from deep_spectral_tpu.models.vit import extract_patch_keys
    from deep_spectral_tpu.ops.eigen import (spectral_decompose_batched,
                                             CHEB_RESIDUAL_TOL)

    model, params = load_params("dino_vits8", precision="bf16")
    rng = np.random.default_rng(0)
    N = GRID * GRID
    base = jnp.asarray(smooth_features(BATCH, GRID, 384, rng))
    images = jnp.asarray(
        rng.standard_normal((BATCH, SIZE, SIZE, 3)).astype(np.float32))
    mask = jnp.ones((BATCH, N), dtype=bool)

    # ---- quality probe (b=4): residual + subspace cosine vs dense eigh ----
    probe_b = 4
    fp, mp = base[:probe_b], mask[:probe_b]
    _, vec_e = spectral_decompose_batched(fp, mp, K=K, solver="eigh")
    vec_e = np.asarray(vec_e)

    def subcos(U, V):
        Qu, _ = np.linalg.qr(U.T)
        Qv, _ = np.linalg.qr(V.T)
        return float(np.linalg.svd(Qu.T @ Qv, compute_uv=False).min())

    for slv in ("lobpcg", "chebyshev"):
        out = spectral_decompose_batched(fp, mp, K=K, solver=slv,
                                         return_residual=True)
        res = np.asarray(out[2])
        vec = np.asarray(out[1])
        cos = min(subcos(vec[b][1:], vec_e[b][1:]) for b in range(probe_b))
        print(f"quality {slv}: res_max={res.max():.2e} subcos_min={cos:.6f}")

    # ---- composite timing: chained loop-in-jit, two lengths ----
    def make_step(slv):
        def step(c):
            k = extract_patch_keys(model, params, c, token_mask=mask)
            feats = base + 0.02 * k.astype(jnp.float32)
            out = spectral_decompose_batched(feats, mask, K=K, solver=slv,
                                             return_residual=True)
            bump = jnp.mean(out[1]).astype(c.dtype) * 1e-6
            return c + bump
        return step

    @functools.partial(jax.jit, static_argnames=("slv", "n"))
    def run(c, slv, n):
        return jax.lax.fori_loop(0, n, lambda i, c: make_step(slv)(c), c)

    n1, n2 = 2, 6
    for slv in ("lobpcg", "chebyshev"):
        for n in (n1, n2):
            run(images, slv, n)
        np.asarray(run(images, slv, n1).ravel()[0])  # warm transport
        t1s, t2s = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(images, slv, n1).ravel()[0])
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(run(images, slv, n2).ravel()[0])
            t2s.append(time.perf_counter() - t0)
        dt = (min(t2s) - min(t1s)) / (n2 - n1)
        print(f"composite vits8 480px b{BATCH} [{slv}]: {dt*1e3:7.1f} ms "
              f"= {BATCH/dt:6.1f} img/s/chip")


if __name__ == "__main__":
    main()
