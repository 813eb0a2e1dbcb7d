"""Profile the dense-CRF mean field on the real TPU and print the device-op
breakdown (same trace-through-tunnel methodology as profile_eigs.py).

Run: python -u scripts/profile_crf.py [--h 320] [--w 480] [--classes 6]
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
    ap.add_argument("--h", type=int, default=320)
    ap.add_argument("--w", type=int, default=480)
    ap.add_argument("--classes", type=int, default=6)
    ap.add_argument("--trace-dir", default="/tmp/crf_trace")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from deep_spectral_tpu.ops.crf import dense_crf

    rng = np.random.default_rng(0)
    img = np.full((a.h, a.w, 3), 60, np.uint8)
    img[80:240, 120:360] = (200, 80, 60)
    img = np.clip(img + rng.normal(0, 8, img.shape), 0, 255).astype(np.uint8)
    seg = np.zeros((a.h, a.w), np.int32)
    seg[96:256, 96:336] = 1  # 16px-offset coarse blob the CRF must snap
    image, segmap = jnp.asarray(img), jnp.asarray(seg)

    def run():
        return dense_crf(image, segmap, num_classes=a.classes)

    _ = np.asarray(run())  # compile + warm + honest sync

    n = 5
    t0 = time.time()
    with jax.profiler.trace(a.trace_dir):
        outs = [run() for _ in range(n)]
        for o in outs:
            _ = np.asarray(o)
    wall = (time.time() - t0) / n
    print(f"crf {a.h}x{a.w}x{a.classes}: {wall*1e3:.1f} ms wall/call "
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
          f"= {1/(tot/n/1e6):.1f} img/s")


if __name__ == "__main__":
    main()
