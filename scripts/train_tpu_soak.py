"""500-step bf16 self-training soak on the real TPU (VERDICT round-1 item #8).

Builds a synthetic VOC-layout dataset (color-blob images whose pseudolabels
are derivable from color — a learnable task), then runs the real train() loop
with the full dino_vits16 DeepLabV3+ stack under precision='bf16', logging
steady-state step time and the loss curve.

Run: python -u scripts/train_tpu_soak.py [--steps 500] [--batch 32]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_dataset(root: Path, n_images: int = 60, seed: int = 0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    (root / "JPEGImages").mkdir(parents=True, exist_ok=True)
    (root / "SegmentationClass").mkdir(exist_ok=True)
    (root / "ImageSets" / "Segmentation").mkdir(parents=True, exist_ok=True)
    segs = root / "pseudolabels"
    segs.mkdir(exist_ok=True)
    names = []
    palette = np.array([[60, 60, 60], [200, 60, 50], [50, 180, 70],
                        [60, 80, 200]], np.uint8)
    for i in range(n_images):
        h, w = (320, 480) if i % 2 == 0 else (384, 512)
        img = np.zeros((h, w, 3), np.uint8)
        lab = np.zeros((h, w), np.uint8)
        img[:] = palette[0]
        for _ in range(rng.integers(1, 4)):
            c = int(rng.integers(1, 4))
            cy, cx = rng.integers(60, h - 60), rng.integers(60, w - 60)
            r = int(rng.integers(40, 110))
            yy, xx = np.mgrid[:h, :w]
            m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            img[m] = palette[c]
            lab[m] = c
        img = np.clip(img.astype(np.int16) +
                      rng.integers(-15, 15, img.shape), 0, 255).astype(np.uint8)
        n = f"s{i:03d}"
        Image.fromarray(img).save(root / "JPEGImages" / f"{n}.jpg", quality=95)
        Image.fromarray(lab).save(root / "SegmentationClass" / f"{n}.png")
        Image.fromarray(lab[::16, ::16]).save(segs / f"{n}.png")
        names.append(n)
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text(
        "\n".join(names[-8:]))
    return segs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--root", default="/tmp/train_soak")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="run the in-train BUCKETED eval every N steps "
                         "(VERDICT round-2 item #2: the eval must compile "
                         "O(buckets) programs and complete in seconds, not "
                         "one compile per val-image shape)")
    a = ap.parse_args()

    root = Path(a.root)
    segs = make_dataset(root)
    print(f"dataset at {root}")

    from deep_spectral_tpu.tasks import semantic_segmentation as SS
    ds = SS.VOCSegmentationWithPseudolabels(str(root), "train", str(segs))
    ds_val = (SS.VOCSegmentationWithPseudolabels(str(root), "val", str(segs))
              if a.eval_every > 0 else None)
    cfg = SS.TrainConfig(backbone="dino_vits16", num_classes=4,
                         batch_size=a.batch, lr=1e-3,
                         max_train_steps=a.steps, precision=a.precision,
                         unfrozen_backbone_layers=1, crop_size=224,
                         resize_size=256)
    metrics = root / f"metrics_{a.precision}.jsonl"
    t0 = time.time()
    state, _ = SS.train(cfg, ds, dataset_val=ds_val, log_every=50,
                        max_steps=a.steps, eval_every=a.eval_every or 1000,
                        metrics_path=str(metrics))
    total = time.time() - t0
    if ds_val is not None:
        t0e = time.time()
        miou, _ = SS.evaluate_model(state, ds_val, cfg.num_classes)
        print(f"post-train bucketed eval ({len(ds_val)} imgs): "
              f"{time.time()-t0e:.1f}s warm, mIoU={miou:.4f}")
    # Steady state: time the last chunk explicitly via the metrics timestamps
    # is noisy; instead re-run a short timed segment on the warm program.
    lines = [json.loads(ln) for ln in metrics.read_text().splitlines()]
    losses = [(d["step"], d["loss"]) for d in lines if "loss" in d]
    first, last = losses[0], losses[-1]
    print(f"TOTAL {total:.1f}s for {a.steps} steps "
          f"({a.steps / total:.2f} steps/s incl. compile, batch {a.batch})")
    print(f"loss: step {first[0]} -> {first[1]:.4f}; "
          f"step {last[0]} -> {last[1]:.4f}")
    assert np.isfinite(last[1])
    # The loss log is sampled every log_every steps; at short --steps the
    # 20% windows can be empty — fall back to the endpoint values.
    tail = [v for s, v in losses if s >= a.steps * 0.8] or [last[1]]
    head = [v for s, v in losses if s <= a.steps * 0.2] or [first[1]]
    print(f"mean loss first 20%: {np.mean(head):.4f}  last 20%: "
          f"{np.mean(tail):.4f}")
    # steady-state step time: time 30 more steps on the warm program
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    ims = jnp.asarray(rng.standard_normal(
        (a.batch, 224, 224, 3)).astype(np.float32))
    labs = jnp.asarray(rng.integers(0, 4, (a.batch, 224, 224)), jnp.int32)
    key = jax.random.PRNGKey(0)
    state, _ = SS.train_step(state, ims, labs, key)
    t0 = time.time()
    n = 30
    for _ in range(n):
        state, logs = SS.train_step(state, ims, labs, key)
    _ = np.asarray(logs["loss"])
    dt = (time.time() - t0) / n
    print(f"steady-state: {dt*1000:.1f} ms/step = {a.batch/dt:.1f} img/s "
          f"({1/dt:.2f} steps/s, device-bound, batch {a.batch}, "
          f"{a.precision})")


if __name__ == "__main__":
    main()
