"""SUPERSEDED: per-call host timing through the axon tunnel conflates the
~30-100 ms dispatch/fetch round-trip with device compute, which made this
sweep noise-dominated (it reported 38-46 ms for kernels that actually run in
3-10 ms). Use scripts/bench_device_time.py (loop-in-jit, two-length
difference) for honest kernel timing; kept for the transport-level view.

Run: python -u scripts/sweep_flash_blocks.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from deep_spectral_tpu.models.flash_attention import flash_attention

B, H, T, HD = 8, 6, 3601, 64
CONFIGS = [(256, 256), (512, 256), (256, 512), (512, 512),
           (1024, 512), (512, 1024), (128, 512)]


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, HD)), jnp.bfloat16)
    mask = jnp.ones((B, T), bool)
    ref = None
    for bq, bk in CONFIGS:
        try:
            t0 = time.time()
            out = flash_attention(q, k, v, mask, block_q=bq, block_k=bk)
            first = np.asarray(out, np.float32)
            compile_s = time.time() - t0
            if ref is None:
                ref = first
            else:
                err = np.abs(first - ref).max()
                assert err < 0.02, (bq, bk, err)
            n = 8
            t0 = time.time()
            outs = [flash_attention(q, k, v, mask, block_q=bq, block_k=bk)
                    for _ in range(n)]
            _ = [np.asarray(o[:1, :1, :1]) for o in outs]  # force execution
            dt = (time.time() - t0) / n * 1000
            print(f"block_q={bq:5d} block_k={bk:5d}: {dt:7.2f} ms/fwd "
                  f"(compile {compile_s:.0f}s)")
        except Exception as e:  # noqa: BLE001
            print(f"block_q={bq:5d} block_k={bk:5d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
