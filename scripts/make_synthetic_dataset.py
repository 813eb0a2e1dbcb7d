#!/usr/bin/env python
"""Generate a VOC-shaped synthetic JPEG dataset for at-scale pipeline runs.

The reference's whole reason to exist is batch-processing 5k-17k-image
datasets (reference: README.md:83-99 — VOC2012's 17,125-id trainaug list);
this generator produces a structurally-similar image set so the ten-stage
pipeline's HOST-inclusive throughput (JPEG decode, normalize, pickle writes)
can be measured at dataset scale without the (unavailable, no-egress) VOC
tarball.

Sizes are drawn from the real VOC2012 resolution distribution (PASCAL images
are max-side-500 photographs; the dominant shapes below cover >90% of the
trainaug set). Content is textured background + a few solid color blobs —
realistic JPEG entropy (so decode cost is honest) and object-like structure
for the downstream segmentation stages.

Usage:
    python scripts/make_synthetic_dataset.py --out /tmp/dss_at_scale \
        --n-images 2000 [--seed 0]
"""
import argparse
import time
from pathlib import Path

import numpy as np

# (w, h, relative frequency): the PASCAL VOC resolution mix — landscape
# 500x375 dominates, then portrait 375x500, then max-side-500 odd aspects.
VOC_SHAPES = [
    ((500, 375), 0.55),
    ((375, 500), 0.18),
    ((500, 333), 0.10),
    ((333, 500), 0.05),
    ((500, 334), 0.04),
    ((500, 281), 0.03),
    ((480, 360), 0.03),
    ((500, 400), 0.02),
]


def make_image(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Textured background + 1-3 solid-ish color blobs (object-like)."""
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    # Low-frequency color field (sky/ground-like gradients).
    for c in range(3):
        fy, fx = rng.uniform(0.3, 2.0, 2)
        ph = rng.uniform(0, 2 * np.pi)
        img[..., c] = 110 + 60 * np.sin(
            2 * np.pi * (fy * yy / h + fx * xx / w) + ph)
    # High-frequency texture so JPEG decode cost is realistic (flat fields
    # compress to nothing and decode ~free).
    img += rng.standard_normal((h, w, 3)).astype(np.float32) * 18
    # Object blobs: rotated-ellipse masks with a distinct color.
    for _ in range(rng.integers(1, 4)):
        cy, cx = rng.uniform(0.25, 0.75) * h, rng.uniform(0.25, 0.75) * w
        ry, rx = rng.uniform(0.10, 0.28) * h, rng.uniform(0.10, 0.28) * w
        th = rng.uniform(0, np.pi)
        u = (yy - cy) * np.cos(th) + (xx - cx) * np.sin(th)
        v = -(yy - cy) * np.sin(th) + (xx - cx) * np.cos(th)
        m = (u / ry) ** 2 + (v / rx) ** 2 < 1.0
        color = rng.uniform(40, 215, 3).astype(np.float32)
        img[m] = color + rng.standard_normal((int(m.sum()), 3)) * 10
    return np.clip(img, 0, 255).astype(np.uint8)


def main(argv=None):
    from PIL import Image

    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n-images", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quality", type=int, default=92,
                   help="JPEG quality (VOC jpegs are high-quality)")
    args = p.parse_args(argv)

    out = Path(args.out)
    (out / "images").mkdir(parents=True, exist_ok=True)
    (out / "lists").mkdir(exist_ok=True)

    rng = np.random.default_rng(args.seed)
    shapes = [s for s, _ in VOC_SHAPES]
    freqs = np.array([f for _, f in VOC_SHAPES])
    picks = rng.choice(len(shapes), size=args.n_images, p=freqs / freqs.sum())

    t0 = time.perf_counter()
    names = []
    total_bytes = 0
    for i, si in enumerate(picks):
        w, h = shapes[si]
        name = f"synth_{i:06d}.jpg"
        path = out / "images" / name
        if not path.is_file():
            Image.fromarray(make_image(rng, w, h)).save(
                path, quality=args.quality)
        total_bytes += path.stat().st_size
        names.append(name)
        if (i + 1) % 500 == 0:
            print(f"  {i + 1}/{args.n_images} "
                  f"({(i + 1) / (time.perf_counter() - t0):.0f} img/s)")
    (out / "lists" / "images.txt").write_text("\n".join(names) + "\n")
    print(f"wrote {len(names)} jpegs ({total_bytes / 1e6:.0f} MB, "
          f"mean {total_bytes / len(names) / 1e3:.0f} KB) "
          f"in {time.perf_counter() - t0:.0f}s -> {out}")


if __name__ == "__main__":
    main()
