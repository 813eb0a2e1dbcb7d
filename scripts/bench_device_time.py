"""Honest DEVICE-TIME microbenchmarks through the remote (axon) tunnel.

Per-call host timing on this transport conflates ~30-100 ms round-trips with
device compute, which made the first flash block sweep noise-dominated. The
honest recipe: run N iterations CHAINED BY A DATA DEPENDENCY inside one jit
(lax.fori_loop feeding each output back into the next input), fetch one scalar
at the end, and difference two loop lengths to cancel the fixed dispatch+fetch
overhead:

    t(N2) - t(N1) = (N2 - N1) * t_iter      (pure device time per iteration)

Targets: the Pallas flash-attention forward (ViT-S/8 shape), the full ViT
forward, and the LOBPCG eigensolve — the three hot paths of the pipeline.

Run: python -u scripts/bench_device_time.py [--target flash|vit|eigs|all]
"""
import argparse
import functools
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timed_loop(step_fn, carry, n1=4, n2=20):
    """Device time per iteration of step_fn via the two-length difference."""

    @functools.partial(jax.jit, static_argnames="n")
    def run(c, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step_fn(c), c)

    def measure(n):
        out = run(carry, n)
        leaf = jax.tree_util.tree_leaves(out)[0]
        t0 = time.time()
        np.asarray(leaf.ravel()[0])  # single honest sync+fetch
        return out, time.time() - t0

    # compile both programs + warm up transport
    for n in (n1, n2):
        run(carry, n)
    measure(n1)
    t1s, t2s = [], []
    for _ in range(3):
        _, t1 = measure(n1)
        _, t2 = measure(n2)
        t1s.append(t1)
        t2s.append(t2)
    t1, t2 = min(t1s), min(t2s)
    return (t2 - t1) / (n2 - n1)


def bench_flash(blocks=((256, 256), (512, 512), (512, 1024), (1024, 1024))):
    from deep_spectral_tpu.models.flash_attention import flash_attention
    B, H, T, HD = 8, 6, 3601, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, HD)), jnp.bfloat16)
    mask = jnp.ones((B, T), bool)
    flops = 4 * B * H * T * T * HD  # 2 matmuls x 2 flops/MAC (valid region)
    for bq, bk in blocks:
        def step(c, bq=bq, bk=bk):
            # feed output back as q: forces serialization of iterations
            o = flash_attention(c, k, v, mask, block_q=bq, block_k=bk)
            return o.astype(jnp.bfloat16)

        try:
            dt = timed_loop(step, q)
        except Exception as e:  # noqa: BLE001 — VMEM OOM at big blocks
            print(f"flash fwd ({bq},{bk}): FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}")
            continue
        print(f"flash fwd ({bq},{bk}): {dt*1e3:8.2f} ms/call "
              f"{flops/dt/1e12:6.1f} TFLOP/s "
              f"({flops/dt/197e12*100:.1f}% of v5e bf16 peak)")


def bench_vit(name="dino_vits8", batch=8, size=480, precision="bf16"):
    from deep_spectral_tpu.models.convert import load_params
    from deep_spectral_tpu.models.vit import extract_patch_keys
    model, params = load_params(name, precision=precision)
    P = model.cfg.patch_size
    T = (size // P) ** 2
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((batch, size, size, 3)),
                      jnp.float32)
    mask = jnp.ones((batch, T), bool)

    def step(c):
        k = extract_patch_keys(model, params, c, token_mask=mask)
        # fold features back into the image so iterations serialize
        bump = jnp.mean(k).astype(jnp.float32) * 1e-6
        return c + bump

    dt = timed_loop(step, img, n1=2, n2=8)
    # ~2*params*tokens + attention flops
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    attn = 4 * 6 * (T + 1) ** 2 * 64 * model.cfg.depth
    flops = (2 * n_params * (T + 1) + attn) * batch
    print(f"{name} fwd b{batch} @{size}: {dt*1e3:8.1f} ms/call "
          f"= {batch/dt:7.1f} img/s  {flops/dt/1e12:6.1f} TFLOP/s "
          f"({flops/dt/197e12*100:.1f}% peak)")


def bench_eigs(n_tokens=900, batch=64, K=5):
    from deep_spectral_tpu.ops.eigen import spectral_decompose_batched
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((batch, n_tokens, 64)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    f = jnp.asarray(feats)
    mask = jnp.ones((batch, n_tokens), bool)

    def step(c):
        evals, evecs = spectral_decompose_batched(c, mask, K=K,
                                                  which_matrix="laplacian")
        bump = jnp.mean(evecs).astype(c.dtype) * 1e-9
        return c + bump

    dt = timed_loop(step, f, n1=2, n2=8)
    print(f"eigs (N={n_tokens}, b{batch}, K={K}): {dt*1e3:8.1f} ms/call "
          f"= {batch/dt:7.1f} img/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="all",
                    choices=["flash", "vit", "vit16", "eigs", "all"])
    a = ap.parse_args()
    if a.target in ("flash", "all"):
        bench_flash()
    if a.target in ("vit", "all"):
        bench_vit("dino_vits8", batch=8)
    if a.target == "vit16":
        bench_vit("dino_vits16", batch=64)
    if a.target in ("eigs", "all"):
        bench_eigs()
