"""Sweep the flagship feature+eigs batch size on the real TPU to map the
HBM knee (CLAUDE.md: b64 -> ~1035 img/s, b128 regressed in round 1's
streamed harness; the chained device-time harness has never swept it).

Uses bench.py's own chained loop-in-jit measurement (two loop lengths
differenced) so the tunnel's per-dispatch RPC cancels.

Run: python -u scripts/sweep_bench_batch.py [--batches 32,48,64,96,128]
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,48,64,96,128")
    ap.add_argument("--seeds", default="0",
                    help="comma list; >1 seed tests stability of a point "
                         "(the adaptive chebyshev outer loop runs the batch "
                         "MAX outers, so per-seed graph draws move the rate)")
    a = ap.parse_args()

    import bench

    for b in [int(x) for x in a.batches.split(",")]:
        for s in [int(x) for x in a.seeds.split(",")]:
            rate, streamed, max_res = bench.measure_tpu(batch=b, seed=s)
            print(f"batch {b:4d} seed {s}: {rate:8.1f} img/s device-time "
                  f"(streamed {streamed:7.1f}; eig residual max "
                  f"{max_res:.2e})", flush=True)


if __name__ == "__main__":
    main()
