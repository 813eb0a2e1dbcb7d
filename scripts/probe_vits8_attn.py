"""vits8 attention MXU-ceiling probe (VERDICT r3 #7).

The packed flash forward at the ViT-S/8 480px workload (T=3601, H=6, hd=64,
bf16) measures 66 TFLOP/s whole-model — CLAUDE.md attributes the gap to
hd=64 capping the scores matmul at ~50% MXU utilization. This script tests
that story on hardware with the honest loop-in-jit device-time harness:

  1. block-config sweep, INCLUDING low-padding configs: T=3601 pads to
     lcm(block_q, block_k)-multiples, so (256,1024) computes a 4096^2 score
     grid (+29% vs T^2) while (128,128) computes 3712^2 (+6%) — block
     overhead permitting, smaller lcm is free throughput;
  2. the pad_scores_hd diagnostic (models/flash_attention.py): scores
     contraction zero-padded 64 -> 128, bitwise-identical output. SAME time
     => a K=64 contraction only fills half the MXU and hd=64 is a real
     hardware cap (record the impossibility); ~2x SLOWER => K=64 already
     runs full-rate and the ceiling is elsewhere (keep digging).

Run: python -u scripts/probe_vits8_attn.py [--batch 16]
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

T, H, HD = 3601, 6, 64
CONFIGS = [(256, 1024, False),   # shipped default (pick_packed_blocks)
           (128, 128, False), (256, 256, False), (384, 384, False),
           (256, 512, False), (512, 512, False),
           (256, 1024, True),    # pad_scores_hd diagnostic at the default
           (256, 256, True)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    a = ap.parse_args()
    from deep_spectral_tpu.models.flash_attention import _flash_forward_packed

    B = a.batch
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, H, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, H, HD)), jnp.bfloat16)
    mask = jnp.ones((B, T), bool)
    useful_flops = 4 * B * T * T * H * HD  # scores + mix, valid tokens

    @functools.partial(jax.jit, static_argnames=("bq", "bk", "pad", "n"))
    def run(qq, bq, bk, pad, n):
        def body(_, c):
            o = _flash_forward_packed(c, k, v, mask, num_heads=H, block_q=bq,
                                      block_k=bk, pad_scores_hd=pad)
            return c + o * jnp.bfloat16(1e-3)
        return jax.lax.fori_loop(0, n, body, qq)

    ref = None
    for bq, bk, pad in CONFIGS:
        tp = -(-T // math.lcm(bq, bk)) * math.lcm(bq, bk)
        padded_ratio = (tp / T) ** 2
        try:
            t0 = time.time()
            out = np.asarray(_flash_forward_packed(
                q, k, v, mask, num_heads=H, block_q=bq, block_k=bk,
                pad_scores_hd=pad), np.float32)
            compile_s = time.time() - t0
            if ref is None:
                ref = out
            else:
                err = np.abs(out - ref).max()
                assert err < 0.02, (bq, bk, pad, err)
            n1, n2 = 2, 8
            for n in (n1, n2):
                run(q, bq, bk, pad, n)
            np.asarray(run(q, bq, bk, pad, n1).ravel()[0])
            t1 = min(_fetch_time(run, q, bq, bk, pad, n1) for _ in range(3))
            t2 = min(_fetch_time(run, q, bq, bk, pad, n2) for _ in range(3))
            dt = (t2 - t1) / (n2 - n1)
            print(f"bq={bq:4d} bk={bk:4d} pad_hd={int(pad)} Tp={tp} "
                  f"(+{100*(padded_ratio-1):4.1f}% pad): {dt*1e3:7.2f} ms/call "
                  f"= {useful_flops/dt/1e12:5.1f} useful TFLOP/s "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — probing
            print(f"bq={bq:4d} bk={bk:4d} pad_hd={int(pad)}: FAILED "
                  f"{type(e).__name__}: {str(e)[:140]}", flush=True)


def _fetch_time(run, q, bq, bk, pad, n):
    t0 = time.perf_counter()
    np.asarray(run(q, bq, bk, pad, n).ravel()[0])
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
