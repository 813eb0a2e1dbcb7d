"""Measure host<->device transfer bandwidth through the axon tunnel.

The at-scale pipeline moves real bytes per image (uint8 image up, fp16
features down — ~1.2 MB/img for stage 1); on this dev environment those
bytes ride a remote tunnel, which a production host (PCIe-attached TPU)
does not pay. This probe measures sustained MB/s each way so the at-scale
report can decompose its host-inclusive rate into decode/serialize vs
transport, and state the production arithmetic honestly.

Run: python -u scripts/probe_tunnel_bandwidth.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def measure(nbytes: int, reps: int = 5):
    up_np = np.random.default_rng(0).integers(
        0, 255, nbytes, dtype=np.uint8)
    # warm both directions
    dev = jnp.asarray(up_np)
    np.asarray(dev)

    ups, downs = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        dev = jnp.asarray(up_np)
        # force materialization on device: tiny reduce + fetch of 1 scalar
        np.asarray(dev[:1])
        ups.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(dev)
        downs.append(time.perf_counter() - t0)
    return nbytes / min(ups) / 1e6, nbytes / min(downs) / 1e6


def main():
    print(f"devices: {jax.devices()}")
    for mb in (1, 8, 32, 128):
        up, down = measure(mb * 1_000_000)
        print(f"  {mb:4d} MB: up {up:7.1f} MB/s   down {down:7.1f} MB/s")


if __name__ == "__main__":
    main()
