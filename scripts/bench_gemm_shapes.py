"""GEMM-only device microbench of the ViT's linear shapes (VERDICT r4 #7).

The fwd ceiling arithmetic (CLAUDE.md "Remaining TODO") assumes ~70% MXU
efficiency for the linear GEMMs — the one number in that argument that was
assumed rather than measured (the tunnel profiler drops MXU events at this
size). This times each linear shape of the vits16@480 b24 forward as a
chained bf16 GEMM stream and reports measured TFLOP/s / % of v5e peak, so
the ceiling argument cites a measurement. If efficiency comes in >= 80%,
that's ~1 ms/batch of fwd headroom worth a targeted fusion attempt.

Run: python -u scripts/bench_gemm_shapes.py [--m 21624] [--d 384]
(m = B*T = 24*901 for the headline bench config)
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


def time_gemm(m, k, n, reps=3, n1=500, n2=8500):
    """ms per (m,k)@(k,n) bf16 GEMM: fori_loop-chained, two lengths
    differenced, result fetched (the only honest sync on this tunnel).

    Two traps, both hit by the first version of this script (which printed
    NEGATIVE times and 400-800% of peak):
    1. The per-step feedback must consume ALL of the GEMM output through a
       NONLINEAR reduction. A slice (`out[:, :1]`) lets XLA narrow
       dot(c,b)[:, :1] into dot(c, b[:, :1]) — a matvec — and a plain sum
       is algebraically foldable into the operands; sum(out*out) is not.
    2. The differenced span must dwarf tunnel jitter (tens of ms): the
       8000-step delta puts every shape's span at 0.5-6 s."""
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    b = jax.random.normal(key, (k, n), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames="steps")
    def run(a, b, steps):
        def body(_, carry):
            c, s = carry
            out = c @ b
            s2 = jnp.sum((out * out).astype(jnp.float32))
            # Re-inject a value-negligible but dataflow-real dependency so
            # every GEMM waits on the previous reduction (sequential chain)
            # while operand magnitudes stay constant across iterations.
            return a + (s2 * 1e-30).astype(a.dtype), s + s2
        return jax.lax.fori_loop(0, steps, body, (a, jnp.float32(0)))[1]

    for s in (n1, n2):
        run(a, b, s)
    np.asarray(run(a, b, n1))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(a, b, n1))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run(a, b, n2))
        t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=24 * 901)
    p.add_argument("--d", type=int, default=384)
    args = p.parse_args()
    m, d = args.m, args.d

    shapes = [
        ("qkv  (m,D)@(D,3D)", m, d, 3 * d),
        ("proj (m,D)@(D,D) ", m, d, d),
        ("fc1  (m,D)@(D,4D)", m, d, 4 * d),
        ("fc2  (m,4D)@(4D,D)", m, 4 * d, d),
    ]
    total_ms, total_fl = 0.0, 0.0
    for name, M, K, N in shapes:
        ms = time_gemm(M, K, N)
        if ms <= 0:
            raise SystemExit(f"{name}: non-positive differenced time "
                             f"({ms:.3f} ms) — tunnel jitter exceeded the "
                             f"chained span; raise n2 and rerun")
        fl = 2 * M * K * N
        tf = fl / (ms * 1e-3)
        total_ms += ms
        total_fl += fl
        print(f"{name}: {ms:7.3f} ms  {tf / 1e12:6.1f} TFLOP/s "
              f"({tf / V5E_PEAK_BF16 * 100:5.1f}% peak)")
    tf = total_fl / (total_ms * 1e-3)
    # Per 12-block forward: qkv+proj+fc1+fc2 once per block.
    print(f"linear-stack aggregate: {total_ms:.3f} ms/block-set, "
          f"{tf / 1e12:.1f} TFLOP/s ({tf / V5E_PEAK_BF16 * 100:.1f}% peak); "
          f"x12 blocks = {12 * total_ms:.2f} ms/batch of pure linear GEMM")


if __name__ == "__main__":
    main()
