"""Composite (feature extraction + eigs) device-time bench for ANY registered
backbone — closes VERDICT r4 #2: dino_vitb8, the stretch backbone of the
build plan (SURVEY.md section 7 step 7), had config+tests but zero device
numbers; its flash-block and solver-regime choices were extrapolated from
vits8.

Measures, per solver (lobpcg / chebyshev / auto):
  * quality probe (small batch): chebyshev residual + subspace cosine vs
    dense eigh, computed on device;
  * fwd-only device time (chained loop-in-jit, two lengths differenced) +
    useful TFLOP/s + % of v5e bf16 peak;
  * composite (fwd + eigs) device time.

Run on the real TPU:
  python -u scripts/bench_backbone_composite.py --model dino_vitb8 --batch 8
  python -u scripts/bench_backbone_composite.py --model dino_vits8 --batch 16
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

V5E_PEAK_BF16 = 197e12


def chained_ms(step, params, images, n1=2, n2=6, reps=3):
    """Device ms per step-call: fori_loop-chained program, one fetch, two
    loop lengths differenced (the honest harness on this tunnel —
    block_until_ready can return before execution completes).

    `params` MUST be a jit argument, not a closure constant: closed-over
    arrays are baked into the serialized program, and vitb8's ~170 MB of
    bf16 weights exceed the remote-compile HTTP body limit (HTTP 413 —
    vits16's 42 MB squeaked under it)."""
    @functools.partial(jax.jit, static_argnames="n")
    def run(p, c, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step(p, c), c)

    for n in (n1, n2):
        run(params, images, n)
    np.asarray(run(params, images, n1).ravel()[0])  # warm transport
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(params, images, n1).ravel()[0])
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run(params, images, n2).ravel()[0])
        t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="dino_vitb8")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=480)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--solvers", default="auto,lobpcg,chebyshev")
    args = p.parse_args()

    from bench import _structured_features
    from deep_spectral_tpu.models.convert import load_params
    from deep_spectral_tpu.models.vit import extract_patch_keys, get_model_config
    from deep_spectral_tpu.ops.eigen import (spectral_decompose_batched,
                                             _resolve_solver, resolved_cheb_impl)

    cfg = get_model_config(args.model)
    P, D, depth = cfg.patch_size, cfg.embed_dim, cfg.depth
    B, S, K = args.batch, args.size, args.k
    grid = S // P
    N = grid * grid
    T = N + 1

    model, params = load_params(args.model, precision="bf16")
    rng = np.random.default_rng(0)
    base = jnp.asarray(_structured_features(B, grid, D, rng))
    images = jnp.asarray(rng.standard_normal((B, S, S, 3)).astype(np.float32))
    mask = jnp.ones((B, N), dtype=bool)

    auto_slv = _resolve_solver(N, K + 3, True, "auto")
    print(f"{args.model}: P={P} D={D} depth={depth} T={T} N={N} b{B}  "
          f"auto_solver={auto_slv} cheb_impl={resolved_cheb_impl(N, 'auto', m=K + 3)}")

    # ---- quality probe ----
    probe_b = min(4, B)
    fp, mp = base[:probe_b], mask[:probe_b]
    _, vec_e = spectral_decompose_batched(fp, mp, K=K, solver="eigh")
    vec_e = np.asarray(vec_e)

    def subcos(U, V):
        Qu, _ = np.linalg.qr(U.T)
        Qv, _ = np.linalg.qr(V.T)
        return float(np.linalg.svd(Qu.T @ Qv, compute_uv=False).min())

    solvers = args.solvers.split(",")
    for slv in solvers:
        out = spectral_decompose_batched(fp, mp, K=K, solver=slv,
                                         return_residual=True)
        res, vec = np.asarray(out[2]), np.asarray(out[1])
        cos = min(subcos(vec[b][1:], vec_e[b][1:]) for b in range(probe_b))
        print(f"quality {slv:10s}: res_max={res.max():.2e} "
              f"subcos_min={cos:.6f}")

    # ---- fwd-only ----
    fwd_flops = B * (depth * (24 * T * D**2 + 4 * T**2 * D)
                     + 2 * N * D * (P * P * 3))

    def fwd_step(p, c):
        k = extract_patch_keys(model, p, c, token_mask=mask)
        return c + jnp.mean(k).astype(c.dtype) * 1e-6

    ms = chained_ms(fwd_step, params, images)
    tf = fwd_flops / (ms * 1e-3)
    print(f"fwd-only {args.model} {S}px b{B}: {ms:7.2f} ms = "
          f"{B / ms * 1e3:6.1f} img/s  {tf / 1e12:5.1f} TFLOP/s "
          f"({tf / V5E_PEAK_BF16 * 100:.1f}% peak)")

    # ---- composite ----
    def make_step(slv):
        # p = (vit params, structured base): base is ~88 MB f32 at vitb8
        # shapes — as a closure constant it would also bloat the serialized
        # program toward the remote-compile body limit.
        def step(p, c):
            vit_p, base_p = p
            k = extract_patch_keys(model, vit_p, c, token_mask=mask)
            feats = base_p + 0.02 * k.astype(jnp.float32)
            out = spectral_decompose_batched(feats, mask, K=K, solver=slv,
                                             return_residual=True)
            return c + jnp.mean(out[1]).astype(c.dtype) * 1e-6
        return step

    for slv in solvers:
        ms = chained_ms(make_step(slv), (params, base), images)
        print(f"composite {args.model} {S}px b{B} [{slv}]: {ms:7.1f} ms "
              f"= {B / ms * 1e3:6.1f} img/s/chip")


if __name__ == "__main__":
    main()
