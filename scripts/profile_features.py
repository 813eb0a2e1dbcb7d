"""Profile the batched ViT feature forward on the real TPU and print the
device-op breakdown (same trace-through-tunnel methodology as
profile_eigs.py). The r4c composite split made the forward the headline
bottleneck (15.2 of the 18.5 ms b24 batch, 85 TFLOP/s = 43% of v5e bf16
peak) — this shows where the non-MXU time goes.

Run: python -u scripts/profile_features.py [--model dino_vits16] [--batch 24]
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
    ap.add_argument("--model", default="dino_vits16")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--size", type=int, default=480)
    ap.add_argument("--trace-dir", default="/tmp/features_trace")
    a = ap.parse_args()

    import jax
    from deep_spectral_tpu.models.convert import load_params
    from deep_spectral_tpu.models.vit import extract_patch_keys
    import jax.numpy as jnp

    model, params = load_params(a.model, precision="bf16")
    P = model.cfg.patch_size
    T = (a.size // P) ** 2
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((a.batch, a.size, a.size, 3)),
                      jnp.float32)
    mask = jnp.ones((a.batch, T), bool)

    def run():
        return extract_patch_keys(model, params, img, token_mask=mask)

    _ = np.asarray(run())  # compile + warm + honest sync

    n = 5
    t0 = time.time()
    with jax.profiler.trace(a.trace_dir):
        outs = [run() for _ in range(n)]
        for o in outs:
            _ = np.asarray(o)
    wall = (time.time() - t0) / n
    print(f"{a.model} fwd b{a.batch} @{a.size}: {wall*1e3:.1f} ms wall/call "
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
    for k, v in cat.most_common(25):
        print(f"{v/n/1e3:9.2f} ms/call {100*v/max(tot,1):5.1f}%  {k[:70]}")
    print(f"device total {tot/n/1e3:.1f} ms/call "
          f"= {a.batch/(tot/n/1e6):.1f} img/s")


if __name__ == "__main__":
    main()
