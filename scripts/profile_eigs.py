"""Profile the batched eigensolve on the real TPU and print the device-op
breakdown (same trace-through-tunnel methodology as profile_train_step.py).

Run: python -u scripts/profile_eigs.py [--n 3600] [--batch 16] [--solver chebyshev]
"""
import argparse
import collections
import glob
import gzip
import json
import re
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3600)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--solver", default="chebyshev")
    ap.add_argument("--filter-impl", default="xla",
                    choices=["xla", "pallas"])
    ap.add_argument("--K", type=int, default=5)
    ap.add_argument("--trace-dir", default="/tmp/eigs_trace")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import _structured_features
    from deep_spectral_tpu.ops.eigen import spectral_decompose_batched

    grid = int(round(a.n ** 0.5))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(_structured_features(a.batch, grid, 384, rng))
    mask = jnp.ones((a.batch, grid * grid), bool)

    def run():
        return spectral_decompose_batched(feats, mask, K=a.K, solver=a.solver,
                                          cheb_filter_impl=a.filter_impl,
                                          return_residual=True)

    out = run()
    _ = np.asarray(out[1])  # compile + warm + honest sync

    n = 5
    t0 = time.time()
    with jax.profiler.trace(a.trace_dir):
        outs = [run() for _ in range(n)]
        for o in outs:
            _ = np.asarray(o[1])
    wall = (time.time() - t0) / n
    print(f"eigs[{a.solver}/{a.filter_impl}] N={a.n} b{a.batch}: {wall*1e3:.1f} ms wall/call "
          f"(incl. per-call tunnel RPC; see device total below)")

    fs = sorted(glob.glob(f"{a.trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not fs:
        print("no trace captured")
        return
    with gzip.open(fs[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    cat = collections.Counter()
    tot = 0
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and pids.get(e.get("pid"), "") == "/device:TPU:0"
                and tids.get((e["pid"], e["tid"]), "") != "Steps"):
            name = e["name"]
            if name.startswith("jit_"):
                continue
            cat[re.sub(r"\.\d+$", "", name)] += e["dur"]
            tot += e["dur"]
    for k, v in cat.most_common(20):
        print(f"{v/n/1e3:9.2f} ms/call {100*v/max(tot,1):5.1f}%  {k[:70]}")
    print(f"device total {tot/n/1e3:.1f} ms/call "
          f"= {a.batch/(tot/n/1e6):.1f} img/s")


if __name__ == "__main__":
    main()
