#!/usr/bin/env python
"""At-scale pipeline measurement: sustained HOST-INCLUSIVE throughput of the
features->eigs path over a dataset-scale image set (VERDICT r4 #1).

The repo's headline 1298 img/s is pure device time inside one jit; the
reference's actual workload is batch-processing 5k-17k-image datasets
(reference: README.md:83-99) through host decode, prefetch, and per-image
torch-pickle writes. This harness runs the REAL pipeline stages
(pipeline/extract.py, same code the CLI dispatches) over a synthetic
VOC-shaped set (scripts/make_synthetic_dataset.py) and reports steady-state
per-stage img/s next to the device rate, so "full VOC2012 in minutes" is
arithmetic on a measurement.

Between stages 1 and 2 the saved features are (untimed) rewritten as
structured-feature mixtures — the bench's recipe (bench.py:53-87): without a
real DINO checkpoint the random-weight forward yields spectrally
unstructured graphs on which every iterative solver falls back to dense
eigh, which is neither the real-weight regime nor a throughput measurement
of anything but eigh. The rewrite preserves the exact on-disk schema, per
image grid shapes, and fp16 dtype, so stage 2's host path (double dict
reads, upsample, pad, pickle writes) is measured unchanged.

Usage:
  python scripts/make_synthetic_dataset.py --out /tmp/dss_at_scale --n-images 2000
  python scripts/at_scale_pipeline.py --data-root /tmp/dss_at_scale
"""
import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def structured_k(gh: int, gw: int, D: int, rng) -> np.ndarray:
    """bench.py's structured-feature recipe generalized to non-square grids:
    low-frequency spatial modes + an object blob — the spectral regime real
    DINO features produce (small bottom spectrum, usable eigengap)."""
    yy, xx = np.mgrid[:gh, :gw].astype(np.float32)
    yy, xx = yy / gh, xx / gw
    base = np.zeros((gh, gw, D), np.float32)
    for _ in range(6):
        fy, fx = rng.uniform(0.5, 3, 2)
        ph = rng.uniform(0, 2 * np.pi)
        base += np.sin(2 * np.pi * (fy * yy + fx * xx) + ph)[..., None] * \
            rng.standard_normal(D).astype(np.float32)
    m = min(gh, gw)
    cy = rng.integers(m // 5, gh - m // 5)
    cx = rng.integers(m // 5, gw - m // 5)
    blob = ((np.mgrid[:gh, :gw][0] - cy) ** 2 +
            (np.mgrid[:gh, :gw][1] - cx) ** 2) < (m * m) // 36
    base[blob] += 3 * rng.standard_normal(D).astype(np.float32)
    return base.reshape(gh * gw, D)


def rewrite_features_structured(features_dir: Path, seed: int = 0) -> float:
    """Overwrite each saved k with structured + 0.02 * real-k (schema, shape,
    and dtype preserved). Returns wall seconds (reported, never timed as a
    stage)."""
    from deep_spectral_tpu.utils.serialization import load_pth, save_pth
    from deep_spectral_tpu.utils.sizes import get_image_sizes

    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    for f in sorted(features_dir.iterdir()):
        d = load_pth(f)
        s = get_image_sizes(d)
        D = d["k"].shape[-1]
        k = structured_k(s.H_patch, s.W_patch, D, rng) + \
            0.02 * np.asarray(d["k"], np.float32).reshape(-1, D)
        d["k"] = k.reshape(1, -1, D).astype(np.float16)
        save_pth(d, f)
    return time.perf_counter() - t0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True,
                   help="from scripts/make_synthetic_dataset.py")
    p.add_argument("--output-root", default=None)
    p.add_argument("--n-images", type=int, default=None,
                   help="truncate the list (default: all)")
    p.add_argument("--model", default="dino_vits16")
    p.add_argument("--feature-batch-size", type=int, default=24)
    p.add_argument("--batch-size", type=int, default=24)
    p.add_argument("--no-structured-eigs", action="store_true",
                   help="skip the feature rewrite (eigs will mass-fallback "
                        "to dense eigh on random-weight features)")
    p.add_argument("--fresh", action="store_true",
                   help="wipe the output root first (stages are resumable; "
                        "a stale run would otherwise skip everything)")
    p.add_argument("--device-ref", type=float, default=1298.0,
                   help="device-only composite rate to compare against "
                        "(BENCH_r04)")
    args = p.parse_args(argv)

    root = Path(args.data_root)
    out = Path(args.output_root or root / "out")
    if args.fresh and out.exists():
        shutil.rmtree(out)

    images_list = root / "lists" / "images.txt"
    names = [n for n in images_list.read_text().splitlines() if n.strip()]
    if args.n_images:
        names = names[: args.n_images]
        images_list = out / "lists.txt"
        images_list.parent.mkdir(parents=True, exist_ok=True)
        images_list.write_text("\n".join(names) + "\n")
    n = len(names)

    from deep_spectral_tpu.pipeline import extract as stages

    # Backend warmup OUTSIDE the stage timings: a fresh process's first
    # device round trip includes tunnel/backend init measured anywhere from
    # 8 to 236 s across sessions — without this, that init lands inside
    # stage 1's wall clock and dwarfs the thing being measured.
    import jax
    import jax.numpy as jnp
    t0 = time.perf_counter()
    x = jnp.ones((500, 500))
    np.asarray(x @ x)
    warm = time.perf_counter() - t0
    print(f"--- backend warmup (untimed): {warm:.1f}s", flush=True)

    features_dir = out / "features" / args.model
    eigs_dir = out / "eigs" / "laplacian"

    report = {"n_images": n, "model": args.model,
              "feature_batch_size": args.feature_batch_size,
              "batch_size": args.batch_size, "warmup_sec": round(warm, 1)}

    print(f"=== at-scale run: {n} images ===", flush=True)
    t0 = time.perf_counter()
    stages.extract_features(
        images_list=str(images_list), images_root=str(root / "images"),
        model_name=args.model, batch_size=args.feature_batch_size,
        output_dir=str(features_dir))
    dt = time.perf_counter() - t0
    report["features_sec"] = round(dt, 2)
    report["features_img_s"] = round(n / dt, 1)
    print(f"--- extract_features: {dt:.1f}s = {n / dt:.1f} img/s "
          f"(host-inclusive)", flush=True)

    if not args.no_structured_eigs:
        dt = rewrite_features_structured(features_dir)
        print(f"--- feature rewrite (untimed conditioning): {dt:.1f}s",
              flush=True)

    t0 = time.perf_counter()
    stages.extract_eigs(
        images_root=str(root / "images"), features_dir=str(features_dir),
        output_dir=str(eigs_dir), which_matrix="laplacian", K=5,
        batch_size=args.batch_size)
    dt = time.perf_counter() - t0
    report["eigs_sec"] = round(dt, 2)
    report["eigs_img_s"] = round(n / dt, 1)
    print(f"--- extract_eigs: {dt:.1f}s = {n / dt:.1f} img/s "
          f"(host-inclusive)", flush=True)

    total = report["features_sec"] + report["eigs_sec"]
    rate = n / total
    report["end_to_end_img_s"] = round(rate, 1)
    report["device_ref_img_s"] = args.device_ref
    report["host_gap_factor"] = round(args.device_ref / rate, 2)
    # VOC2012 trainaug = 17,125 images (the vendored list).
    report["voc2012_trainaug_minutes"] = round(17125 / rate / 60, 1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
