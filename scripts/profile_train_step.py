"""Profile the self-training step on the real TPU and print the device-op
category breakdown (the same methodology that found the ViT forward's
pad/slice/transpose overheads — jax.profiler works through the axon tunnel;
parse vm.trace.json.gz host-side).

Run: python -u scripts/profile_train_step.py [--batch 32] [--precision bf16]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--crop", type=int, default=224)
    ap.add_argument("--backbone", default="dino_vits16")
    ap.add_argument("--trace-dir", default="/tmp/train_trace")
    ap.add_argument("--top-ops", type=int, default=0,
                    help="also print the N biggest INDIVIDUAL device ops "
                         "(un-merged names, e.g. copy.123) — for naming the "
                         "specific copies/fusions behind a category")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from deep_spectral_tpu.tasks import semantic_segmentation as SS

    cfg = SS.TrainConfig(backbone=a.backbone, num_classes=21,
                         batch_size=a.batch, precision=a.precision,
                         crop_size=a.crop, unfrozen_backbone_layers=1)
    model = SS.build_model(cfg)
    state = SS.create_train_state(cfg, model)
    rng = np.random.default_rng(0)
    ims = jnp.asarray(rng.standard_normal(
        (a.batch, a.crop, a.crop, 3)).astype(np.float32))
    labs = jnp.asarray(rng.integers(0, 21, (a.batch, a.crop, a.crop)), jnp.int32)
    key = jax.random.PRNGKey(0)

    state, logs = SS.train_step(state, ims, labs, key)   # compile + warm
    _ = np.asarray(logs["loss"])

    n = 5
    t0 = time.time()
    with jax.profiler.trace(a.trace_dir):
        for _ in range(n):
            state, logs = SS.train_step(state, ims, labs, key)
        _ = np.asarray(logs["loss"])
    wall = (time.time() - t0) / n
    print(f"step {wall*1e3:.1f} ms wall = {a.batch/wall:.1f} img/s "
          f"(batch {a.batch}, {a.precision}, crop {a.crop})")

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
    ops = collections.Counter()
    op_shapes = {}
    tot = 0
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and pids.get(e.get("pid"), "") == "/device:TPU:0"
                # 'Steps' carries the profiler's per-step markers, not ops
                and tids.get((e["pid"], e["tid"]), "") != "Steps"):
            name = e["name"]
            if name.startswith("jit_"):
                continue
            cat[re.sub(r"\.\d+$", "", name)] += e["dur"]
            ops[name] += e["dur"]
            args = e.get("args") or {}
            for key in ("shape", "layout", "long_name", "tf_op"):
                if args.get(key):
                    op_shapes.setdefault(name, str(args[key])[:90])
                    break
            tot += e["dur"]
    for k, v in cat.most_common(18):
        print(f"{v/n/1e3:9.2f} ms/step {100*v/max(tot,1):5.1f}%  {k[:70]}")
    print(f"device total {tot/n/1e3:.1f} ms/step")
    if a.top_ops:
        print(f"--- top {a.top_ops} individual ops ---")
        for k, v in ops.most_common(a.top_ops):
            print(f"{v/n/1e3:9.2f} ms/step  {k[:48]:48s} "
                  f"{op_shapes.get(k, '')}")


if __name__ == "__main__":
    main()
