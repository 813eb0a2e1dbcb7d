#!/usr/bin/env python
"""Micro-profile the pipeline's HOST-side per-image costs (VERDICT r4 #1).

The device does 1299 img/s (feature+eigs, chained in one jit); the ten-stage
pipeline additionally pays, per image, on the host:

  stage 1: JPEG decode -> normalize -> pad   (prefetch pool)
           + one ~0.66 MB torch-pickle write (writer pool)
  stage 2: two feature-dict loads (size scan + prepare) + one eigs write

This script measures each cost in isolation on the current host so the
at-scale run's stage rates decompose into explained parts, and A/Bs the
candidate optimizations (fused HWC normalize, mmap size-scan loads).

Usage: python scripts/profile_host_path.py --data-root /tmp/dss_at_scale \
           [--n 200]
(data root from scripts/make_synthetic_dataset.py)
"""
import argparse
import io
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, items, reps=1):
    t0 = time.perf_counter()
    for _ in range(reps):
        for it in items:
            fn(it)
    dt = time.perf_counter() - t0
    n = len(items) * reps
    return n / dt, dt / n * 1e3  # rate img/s, ms/img


def main(argv=None):
    from PIL import Image
    import torch

    from deep_spectral_tpu.utils.image_io import (load_image_rgb,
                                                  normalize_imagenet)
    from deep_spectral_tpu.utils.serialization import load_pth, save_pth

    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--n", type=int, default=200)
    args = p.parse_args(argv)

    root = Path(args.data_root)
    paths = sorted((root / "images").iterdir())[: args.n]
    assert paths, f"no images under {root}/images"
    print(f"host-path micro-profile over {len(paths)} images "
          f"(1 thread; pool parallelism only overlaps IO on this host)")

    # Bytes are cached so decode timing excludes cold page cache.
    raw = [p.read_bytes() for p in paths]

    r, ms = timed(lambda b: np.array(Image.open(io.BytesIO(b)).convert("RGB")),
                  raw)
    print(f"  jpeg decode            {r:8.1f} img/s   {ms:6.2f} ms/img")

    rgbs = [np.array(Image.open(io.BytesIO(b)).convert("RGB")) for b in raw]

    r, ms = timed(lambda x: normalize_imagenet(x).transpose(1, 2, 0), rgbs)
    print(f"  normalize (CHW+T)      {r:8.1f} img/s   {ms:6.2f} ms/img")

    from deep_spectral_tpu.utils.image_io import IMAGENET_MEAN, IMAGENET_STD
    scale = (1.0 / (255.0 * IMAGENET_STD)).astype(np.float32)
    shift = (IMAGENET_MEAN / IMAGENET_STD).astype(np.float32)

    def fused(x):
        return x.astype(np.float32) * scale - shift

    ref = normalize_imagenet(rgbs[0]).transpose(1, 2, 0)
    np.testing.assert_allclose(fused(rgbs[0]), ref, rtol=0, atol=1e-5)
    r, ms = timed(fused, rgbs)
    print(f"  normalize (fused HWC)  {r:8.1f} img/s   {ms:6.2f} ms/img")

    # Representative stage-1 feature dict: 30x30 grid fp16 (vits16@480-ish).
    feat = {
        "k": np.random.default_rng(0).standard_normal(
            (1, 900, 384)).astype(np.float16),
        "indices": np.asarray([0]), "file": "x.jpg", "id": "x",
        "model_name": "dino_vits16", "patch_size": 16, "shape": (1, 3, 480, 480),
    }
    tmp = root / "_prof_tmp"
    tmp.mkdir(exist_ok=True)
    files = [tmp / f"f{i}.pth" for i in range(min(len(paths), 100))]

    r, ms = timed(lambda f: save_pth(feat, f), files)
    sz = files[0].stat().st_size
    print(f"  save_pth (feature)     {r:8.1f} img/s   {ms:6.2f} ms/img   "
          f"({sz / 1e3:.0f} KB -> {r * sz / 1e6:.0f} MB/s)")

    r, ms = timed(load_pth, files)
    print(f"  load_pth (full)        {r:8.1f} img/s   {ms:6.2f} ms/img")

    def load_meta(f):
        d = torch.load(str(f), map_location="cpu", weights_only=False,
                       mmap=True)
        return {k: (tuple(v.shape) if isinstance(v, torch.Tensor) else v)
                for k, v in d.items()}

    r, ms = timed(load_meta, files)
    print(f"  load_pth (mmap meta)   {r:8.1f} img/s   {ms:6.2f} ms/img")

    eig = {"eigenvalues": np.zeros(5, np.float32),
           "eigenvectors": np.zeros((5, 900), np.float32)}
    r, ms = timed(lambda f: save_pth(eig, f), files)
    print(f"  save_pth (eigs)        {r:8.1f} img/s   {ms:6.2f} ms/img")

    for f in files:
        f.unlink()
    tmp.rmdir()


if __name__ == "__main__":
    main()
