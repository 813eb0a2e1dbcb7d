"""The ten-stage deep-spectral pipeline, TPU-native.

Same CLI stages, flags, and on-disk layout as the reference
(`extract/extract.py:837-850`): per-image `<id>.pth` feature/eig dicts, `.png`
segmaps, one `.pth` bbox list. What changed is *how* each stage computes:

  reference                                   this framework
  ------------------------------------------  ----------------------------------
  per-image torch forward, batch_size=1       shape-bucketed batched ViT forward
    + forward hook on qkv                       that returns qkv directly
  per-image host ARPACK eigsh (+ CPU pool)    fused affinity->Laplacian->batched
                                                dense eigh on device
  sklearn KMeans / MiniBatchKMeans / PCA      jit k-means++/Lloyd + SVD PCA
  skimage morphology + scipy CC (host)        reduce-window morphology + label
                                                propagation on device
  SimpleCRF permutohedral C++                 bilateral-grid mean field on device
  multiprocessing.Pool over images            vmap over bucket batches; the
                                                `--multiprocessing N` flag is
                                                accepted and ignored

Stages are idempotent/resumable exactly like the reference (skip if the output
file exists, reference: extract/extract.py:77-79 et al.).
"""
from __future__ import annotations

import os
import sys
import threading
import time
from collections import defaultdict, deque
from concurrent.futures import ThreadPoolExecutor
from contextlib import contextmanager
from functools import partial
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.convert import load_params
from ..models.vit import extract_patch_keys, get_model_config
from ..ops import (
    infer_background_swap, kmeans, pca,
)
from ..ops.affinity import knn_affinity, rw_affinity
from ..ops.crf import dense_crf
from ..ops.eigen import (CHEB_RESIDUAL_TOL, resolve_eig_chunk,
                         spectral_decompose_batched,
                         validate_cheb_window_init)
from ..ops.resize import resize_bilinear, resize_nearest
from ..utils import bucketing
from ..utils.image_io import (load_image_rgb, load_image_resized,
                              normalize_imagenet_hwc, read_image_list)
from ..utils.serialization import (load_pth, load_pth_meta, save_pth,
                                   save_segmap_png, load_segmap_png)
from ..utils.sizes import get_image_sizes


# --------------------------------------------------------------------- helpers

def make_output_dir(output_dir, check_if_empty: bool = True) -> None:
    """mkdir -p; if non-empty, confirm interactively when attached to a TTY
    (reference: extract/extract_utils.py:98-104), else proceed (resumable stages
    skip existing outputs anyway)."""
    out = Path(output_dir)
    out.mkdir(exist_ok=True, parents=True)
    if check_if_empty and any(out.iterdir()) and sys.stdin.isatty():
        if input("Output dir already contains files. Continue? (y/n) >> ") != "y":
            sys.exit()


def _resolve_image_file(images_root, image_id: str) -> Path:
    """Resolve an image id (no extension) to the actual file on disk — used by
    stages whose inputs carry only ids (bbox dicts, reference schema keeps
    just 'id', extract/extract.py:529-532). The reference hardcodes `.jpg`;
    we accept any extension."""
    root = Path(images_root)
    for ext in (".jpg", ".jpeg", ".png", ".JPEG", ".JPG", ".PNG", ".bmp",
                ".webp"):
        p = root / f"{image_id}{ext}"
        if p.is_file():
            return p
    matches = sorted(root.glob(f"{image_id}.*"))
    if matches:
        return matches[0]
    raise FileNotFoundError(f"no image named '{image_id}.*' under {root}")


def get_paired_input_files(path1, path2) -> list:
    def files(p):
        p = Path(p)
        if p.is_dir():
            return sorted(p.iterdir())
        if p.is_file():
            return p.read_text().splitlines()
        raise ValueError(str(p))
    f1, f2 = files(path1), files(path2)
    assert len(f1) == len(f2), f"{len(f1)} vs {len(f2)} paired files"
    return list(enumerate(zip(f1, f2)))


def _inflight_depth(default: int = 1) -> int:
    """How many dispatched-but-unfetched batches stages 1/2 keep in flight.

    DSS_TPU_INFLIGHT=0 restores the pre-r5 fetch-immediately behavior (the
    result download serializes with the next batch's upload + compute);
    1 (default) overlaps them; >1 buys nothing on a single stream in theory
    but is exposed for the same-session A/B (scripts/device_session_r5d.sh).
    """
    return max(0, int(os.environ.get("DSS_TPU_INFLIGHT", default)))


class _StageTiming:
    """Wall-clock split of a stage loop, enabled by DSS_TPU_STAGE_TIMING=1.

    Phases measured from the REAL stage code path (not a proxy harness):
      prepare  — host decode/unpickle/pad, in POOL-THREAD seconds (runs
                 overlapped with the device step; > wall is expected)
      dispatch — main thread: host->device upload + async dispatch
      fetch    — main thread: wait for compute + result download
    Main-thread residual (wall - dispatch - fetch) ~= prepare stalls +
    bookkeeping. Zero overhead when disabled.
    """

    def __init__(self, name: str):
        self.enabled = os.environ.get("DSS_TPU_STAGE_TIMING", "0") not in ("", "0")
        self.name = name
        self.t0 = time.perf_counter()
        self.acc: dict = defaultdict(float)
        self._lock = threading.Lock()

    @contextmanager
    def phase(self, key: str):
        if not self.enabled:
            yield
            return
        t = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t
            with self._lock:
                self.acc[key] += dt

    def report(self, n_items: int) -> None:
        if not self.enabled:
            return
        wall = time.perf_counter() - self.t0
        n = max(n_items, 1)
        parts = [f"{k}={v:.1f}s ({1000 * v / n:.1f} ms/img)"
                 for k, v in sorted(self.acc.items())]
        resid = wall - self.acc.get("dispatch", 0.0) - self.acc.get("fetch", 0.0)
        print(f"[stage-timing] {self.name}: wall={wall:.1f}s over {n_items} "
              f"img | " + " | ".join(parts) +
              f" | main-thread residual={resid:.1f}s", flush=True)


class _AsyncWriter:
    """Overlap host-side serialization with device compute."""

    def __init__(self, workers: int = 8):
        self._pool = ThreadPoolExecutor(workers)
        self._futures = []

    def submit(self, fn, *args):
        self._futures.append(self._pool.submit(fn, *args))

    def close(self):
        for f in self._futures:
            f.result()
        self._pool.shutdown()


def shard_across_processes(items):
    """Round-robin shard a per-image work list across JAX processes: each host
    of a multi-host run computes and writes a disjoint subset (the pipeline's
    outputs are independent per-image files, so no synchronization is needed —
    the reference's accelerate multi-process extraction pattern,
    extract/extract.py:113-114, without the wait_for_everyone)."""
    import jax
    n = jax.process_count()
    if n == 1:
        return items
    return items[jax.process_index()::n]


def _progress(it, desc):
    try:
        from tqdm import tqdm
        return tqdm(it, desc=desc)
    except ImportError:
        return it


# ----------------------------------------------------------- stage 1: features

def extract_features(
    images_list: str,
    images_root: Optional[str],
    model_name: str,
    batch_size: int,
    output_dir: str,
    which_block: int = -1,
    ckpt_dir: Optional[str] = None,
    bucket_granularity: int = 8,
    precision: str = "bf16",
):
    """Dense ViT patch-key features for every image in the list
    (reference: extract/extract.py:21-116). Batched per shape bucket; the saved
    per-image dict is schema-identical to the reference's. precision='bf16'
    (default) runs the backbone in bfloat16 compute (k-feature cosine vs fp32
    >= 0.9999, ~1.5x faster; the reference itself runs fp16, extract.py:65)."""
    make_output_dir(output_dir)
    model_name = model_name.lower()
    cfg = get_model_config(model_name)
    model, params = load_params(model_name, ckpt_dir, precision=precision)
    P = cfg.patch_size

    paths = read_image_list(images_list, images_root)
    rels = [p.name if images_root is not None else str(p) for p in paths]

    # Images ship to the device as raw uint8 and normalize THERE: XLA fuses
    # the multiply-add into the patch-embed conv's input, the host sheds its
    # single biggest per-image cost (normalize = 4.4 ms of a ~9 ms/img host
    # budget, scripts/profile_host_path.py), and host->device transfer drops
    # 4x (1 byte/px vs float32) — on this tunnel transport, bandwidth IS the
    # dispatch cost. Floor-cropping to patch multiples keeps every valid
    # patch fully inside its image, so pad pixels never reach a kept token.
    from ..utils.image_io import IMAGENET_SCALE, IMAGENET_SHIFT
    dev_scale = jnp.asarray(IMAGENET_SCALE)
    dev_shift = jnp.asarray(IMAGENET_SHIFT)

    @jax.jit
    def fwd(images_u8, token_mask):
        images = images_u8.astype(jnp.float32) * dev_scale - dev_shift
        k = extract_patch_keys(model, params, images,
                               which_block=which_block, token_mask=token_mask)
        # fp16 is the on-disk dtype anyway; converting on device halves the
        # fetch bytes through the tunnel.
        return k.astype(jnp.float16)

    # Host-side sizes (decode headers only) for bucketing.
    from PIL import Image
    def size_of(item):
        _, path = item
        with Image.open(str(path)) as im:
            w, h = im.size
        return (h // P, w // P)

    writer = _AsyncWriter()
    items = [x for x in enumerate(paths)
             if not (Path(output_dir) / f"{Path(rels[x[0]]).stem}.pth").is_file()]
    items = shard_across_processes(items)
    done = [0]

    timing = _StageTiming("extract_features")

    def prepare(bucket: bucketing.Bucket, batch_items):
        """Host side: decode + floor-crop + pad, all uint8 (runs in the
        prefetch pool, overlapped with the device forward; normalization
        happens on device — see fwd)."""
        with timing.phase("prepare"):
            imgs, metas = [], []
            for idx, path in batch_items:
                rgb = load_image_rgb(path)
                H, W = rgb.shape[:2]
                H_pad, W_pad = (H // P) * P, (W // P) * P
                imgs.append(rgb[:H_pad, :W_pad])
                metas.append((idx, rels[idx], (1, 3, H, W)))
            padded, extents = bucketing.pad_batch_images(
                imgs, (bucket.h * P, bucket.w * P), batch_size)
            masks = bucketing.token_masks(extents, bucket, P)
            return padded, masks, extents, metas

    # Device pipelining: dispatch is async in JAX, so by deferring each
    # batch's fetch until the NEXT batch has been dispatched, the (slow,
    # ~15 MB/s on this tunnel) result download overlaps the next batch's
    # upload + forward instead of serializing with them. One batch in
    # flight costs ~50 MB device memory at b24/480px — noise vs 16 GB HBM.
    inflight: deque = deque()
    depth = _inflight_depth()

    def flush_one():
        dev_k, bucket, extents, metas = inflight.popleft()
        with timing.phase("fetch"):
            k = np.asarray(dev_k)  # fp16
        for i, (idx, rel, shape) in enumerate(metas):
            hp, wp = extents[i, 0] // P, extents[i, 1] // P
            ki = k[i].reshape(bucket.h, bucket.w, -1)[:hp, :wp].reshape(1, hp * wp, -1)
            out = {
                "k": ki,
                "indices": np.asarray([idx]),
                "file": rel,
                "id": Path(rel).stem,
                "model_name": model_name,
                "patch_size": P,
                "shape": shape,
            }
            writer.submit(save_pth, out, Path(output_dir) / f"{out['id']}.pth")
        done[0] += len(metas)

    def consume(bucket: bucketing.Bucket, batch_items, prepared):
        padded, masks, extents, metas = prepared
        with timing.phase("dispatch"):
            inflight.append((fwd(jnp.asarray(padded), jnp.asarray(masks)),
                             bucket, extents, metas))
        while len(inflight) > depth:
            flush_one()

    bucketing.run_bucketed_prefetched(
        items, size_of, prepare, consume, batch_size=batch_size,
        granularity=bucket_granularity)
    while inflight:
        flush_one()
    writer.close()
    timing.report(done[0])
    print(f"Saved {done[0]} features to {output_dir}")


# --------------------------------------------------------------- stage 2: eigs

def extract_eigs(
    images_root: str,
    features_dir: str,
    output_dir: str,
    which_matrix: str = "laplacian",
    which_color_matrix: str = "knn",
    which_features: str = "k",
    normalize: bool = True,
    threshold_at_zero: bool = True,
    lapnorm: bool = True,
    K: int = 20,
    image_downsample_factor: Optional[int] = None,
    image_color_lambda: float = 0.0,
    multiprocessing: int = 0,  # accepted for CLI parity; batching replaces it
    batch_size: int = 8,
    bucket_granularity: int = 4,
    solver: str = "auto",  # 'eigh' (exact) | 'lobpcg' (fast) | 'auto'
    cheb_filter_impl: str = "auto",  # 'xla' | 'pallas' | 'auto' (pallas on TPU)
    cheb_window_init: str = "auto",  # auto|wide|wide@<lam_cut>|estimate
    eig_chunk: str = "auto",  # sub-batch the solve: auto|none|<int> (ops/eigen.py)
):
    """Laplacian/affinity eigendecomposition per image
    (reference: extract/extract.py:119-280), batched on device."""
    del multiprocessing
    # Fail fast on bad knob values — BEFORE the never-crash pallas->xla
    # fallback below can misreport a caller typo as a kernel build failure.
    validate_cheb_window_init(cheb_window_init)
    if isinstance(eig_chunk, str):
        if eig_chunk.lower() in ("none", "", "0"):
            eig_chunk = None
        elif eig_chunk != "auto":
            eig_chunk = int(eig_chunk)
    chunk = resolve_eig_chunk(eig_chunk, batch_size)
    if chunk and batch_size % chunk != 0:
        raise ValueError(
            f"--eig_chunk {chunk} must divide --batch_size {batch_size}")
    make_output_dir(output_dir)

    # The chebyshev solver's Pallas filter kernel is admission-guarded
    # (ops/cheb_filter.fits_vmem), but the compiler's scoped-VMEM accounting
    # can still reject shapes the guard admits (round-3 on-device session:
    # hard compile error at N=2025). ARPACK never crashes the reference
    # pipeline (extract/extract.py:227-234), so neither may a kernel build
    # failure here: fall back to the XLA dot-chain filter, stickily (no
    # point retrying the failing kernel on every batch of the same bucket).
    filter_impl_state = {"impl": cheb_filter_impl}

    def solve_batched(*args, **kwargs):
        try:
            return spectral_decompose_batched(
                *args, cheb_filter_impl=filter_impl_state["impl"],
                cheb_window_init=cheb_window_init, **kwargs)
        except (ValueError, TypeError):
            # Caller errors (bad knob values, shape mismatches) are not
            # kernel build failures — re-raise instead of misreporting them
            # as a pallas compile failure and poisoning the run (ADVICE r4).
            raise
        except Exception as exc:  # noqa: BLE001 — never-crash contract
            if filter_impl_state["impl"] == "xla":
                raise
            print(f"eigs: chebyshev filter impl "
                  f"{filter_impl_state['impl']!r} failed to build "
                  f"({type(exc).__name__}: {exc}); falling back to the XLA "
                  f"filter chain for the rest of this run")
            filter_impl_state["impl"] = "xla"
            return spectral_decompose_batched(
                *args, cheb_filter_impl="xla",
                cheb_window_init=cheb_window_init, **kwargs)

    def lr_grid_of(s) -> Tuple[int, int]:
        f = s.P if image_downsample_factor is None else image_downsample_factor
        return s.H_pad // f, s.W_pad // f

    # Size scan: read each feature dict's STRUCTURE only (mmap — tensor pages
    # never fault in, 0.38 vs 0.60 ms/dict, scripts/profile_host_path.py),
    # keep paths (not tensors) so memory stays O(1) in dataset size.
    pending = []
    for f in sorted(Path(features_dir).iterdir()):
        d = load_pth_meta(f)
        # Derive the id from the listed filename with any extension
        # (reference pairs actual listed names, extract/extract.py:199-204).
        image_id = Path(d["file"]).stem
        out_file = Path(output_dir) / f"{image_id}.pth"
        if out_file.is_file():
            continue
        pending.append((f, image_id, out_file, lr_grid_of(get_image_sizes(d))))
    pending = shard_across_processes(pending)

    writer = _AsyncWriter()
    timing = _StageTiming("extract_eigs")

    def prepare(bucket: bucketing.Bucket, batch_items):
        """Host side: reload feature dicts, upsample to the lr grid, pad, and
        load/resize color images (prefetch pool, overlapped with the solve)."""
        with timing.phase("prepare"):
            return _prepare_inner(bucket, batch_items)

    def _prepare_inner(bucket: bucketing.Bucket, batch_items):
        B = batch_size
        feats = None
        imgs = (np.zeros((B, bucket.h, bucket.w, 3), np.float32)
                if image_color_lambda > 0 else None)
        extents = np.zeros((B, 2), np.int32)
        metas = []
        for i, (fpath, image_id, out_file, (h_lr, w_lr)) in enumerate(batch_items):
            d = load_pth(fpath)
            s = get_image_sizes(d)
            D = d[which_features].shape[-1]
            if feats is None:
                # fp16 end-to-end to the device: it is the on-disk dtype of
                # stage 1's "k", so shipping fp16 and casting to f32 ON
                # device is bit-identical to the old f32 host cast for the
                # (default) no-resize path — while halving the upload, the
                # at-scale run's binding cost on this tunnel.
                feats = np.zeros((B, bucket.tokens, D), np.float16)
            fi = np.asarray(d[which_features]).reshape(-1, D)
            if (s.H_patch, s.W_patch) != (h_lr, w_lr):
                # Bilinear upsample patch features to the lr grid
                # (reference: extract/extract.py:184-188); torch-exact kernel.
                fi = np.asarray(resize_bilinear(
                    jnp.asarray(fi.reshape(s.H_patch, s.W_patch, D),
                                jnp.float32),
                    (h_lr, w_lr))).reshape(-1, D)
            grid = np.zeros((bucket.h, bucket.w, D), np.float16)
            grid[:h_lr, :w_lr] = fi.reshape(h_lr, w_lr, D)
            feats[i] = grid.reshape(-1, D)
            extents[i] = (h_lr, w_lr)
            if imgs is not None:
                # Load the actual listed file (any extension), not a
                # hardcoded .jpg (reference: extract/extract.py:199-204).
                imgs[i, :h_lr, :w_lr] = load_image_resized(
                    Path(images_root) / d["file"], (w_lr, h_lr))
            metas.append((image_id, out_file, h_lr, w_lr))
        masks = bucketing.grid_masks(extents, (bucket.h, bucket.w))
        return feats, imgs, masks, metas

    # The stored "k" is fp16; ship it fp16 (half the upload) and widen to the
    # solver's f32 on device. jit'd so the cast output lives on device.
    widen = jax.jit(lambda x: x.astype(jnp.float32))

    # One solve in flight (dispatch N+1 before fetching N): the eigenvector
    # download overlaps the next batch's feature upload + solve. The
    # under-convergence check below happens at flush (fetch) time.
    inflight: deque = deque()
    depth = _inflight_depth()

    def consume(bucket: bucketing.Bucket, batch_items, prepared):
        feats, imgs, masks, metas = prepared
        with timing.phase("dispatch"):
            color_W = None
            if imgs is not None:
                aff_batched = jax.vmap(
                    lambda im, m: (knn_affinity if which_color_matrix == "knn"
                                   else rw_affinity)(im, mask=m))
                color_W = aff_batched(jnp.asarray(imgs), jnp.asarray(masks))
            out = solve_batched(
                widen(jnp.asarray(feats)), jnp.asarray(masks), color_W,
                K=K, which_matrix=which_matrix, normalize=normalize,
                threshold_at_zero=threshold_at_zero, lapnorm=lapnorm,
                image_color_lambda=image_color_lambda, solver=solver,
                return_residual=True, eig_chunk=chunk,
            )
            inflight.append((out, feats, color_W, masks, metas, bucket))
        while len(inflight) > depth:
            flush_one()

    def flush_one():
        out, feats, color_W, masks, metas, bucket = inflight.popleft()
        # np.array (not asarray): the per-image fallback below writes in place,
        # and asarray of a jax array yields a read-only view.
        with timing.phase("fetch"):
            evals, evecs, res = (np.array(out[0]), np.array(out[1]),
                                 np.asarray(out[2]))
        # Solver fallback, mirroring the reference's ARPACK shift-invert ->
        # plain-SM retry (extract/extract.py:227-234): if the fast iterative
        # solver produced non-finite values OR the chebyshev convergence
        # residual rejects an image (clustered spectra, lam_K beyond the
        # filter window — see ops/eigen.CHEB_RESIDUAL_TOL), re-solve THAT
        # image with exact eigh — O(bad), not the whole batch (at b64/N=2048
        # one bad graph used to cost 64 dense 2048^2 eighs). Host-side check
        # keeps the eigh program compile-lazy (B=1, built only if ever
        # tripped, one compile per bucket shape).
        good = (np.isfinite(evals).reshape(len(res), -1).all(1)
                & np.isfinite(evecs).reshape(len(res), -1).all(1)
                & (res <= CHEB_RESIDUAL_TOL))
        if solver != "eigh" and not good.all():
            bad = np.flatnonzero(~good)
            print(f"eigs: solver under-converged on {len(bad)}/{len(res)} "
                  f"image(s) in a batch; re-solving those with exact eigh")
            for i in bad:
                ev_i, vec_i = solve_batched(
                    jnp.asarray(feats[i:i + 1], jnp.float32),
                    jnp.asarray(masks[i:i + 1]),
                    None if color_W is None else color_W[i:i + 1],
                    K=K, which_matrix=which_matrix, normalize=normalize,
                    threshold_at_zero=threshold_at_zero, lapnorm=lapnorm,
                    image_color_lambda=image_color_lambda, solver="eigh",
                )
                evals[i] = np.asarray(ev_i)[0]
                evecs[i] = np.asarray(vec_i)[0]
        for i, (image_id, out_file, h_lr, w_lr) in enumerate(metas):
            vec = evecs[i].reshape(K, bucket.h, bucket.w)[:, :h_lr, :w_lr]
            out = {
                "eigenvalues": evals[i].astype(np.float32),
                "eigenvectors": vec.reshape(K, h_lr * w_lr).astype(np.float32),
            }
            writer.submit(save_pth, out, out_file)

    def coarse_grid(it):
        # Coarsen bucketing for big graphs: the eigensolve's cost is O(N^2 m)
        # so padding 3600 -> 4096 tokens costs ~30% compute, while every
        # distinct shape costs a full (remote) compile.
        h, w = it[3]
        g = bucket_granularity if h * w <= 2048 else max(bucket_granularity, 16)
        b = bucketing.bucket_for(h, w, g)
        return (b.h, b.w)

    bucketing.run_bucketed_prefetched(
        pending, coarse_grid, prepare, consume,
        batch_size=batch_size, granularity=1)
    while inflight:
        flush_one()
    writer.close()
    timing.report(len(pending))
    print(f"Saved eigs to {output_dir}")


# ------------------------------------------- stages 3/4: region segmentations

def _load_feature_eig_pair(feature_path, eigs_path):
    d = load_pth(feature_path)
    d.update(load_pth(eigs_path))
    return d


def extract_multi_region_segmentations(
    features_dir: str,
    eigs_dir: str,
    output_dir: str,
    adaptive: bool = False,
    non_adaptive_num_segments: int = 4,
    infer_bg_index: bool = True,
    kmeans_baseline: bool = False,
    num_eigenvectors: int = 1_000_000,
    multiprocessing: int = 0,
    seed: int = 0,
    batch_size: int = 16,
    bucket_granularity: int = 4,
):
    """k-means over eigenvectors -> multi-region segmaps
    (reference: extract/extract.py:283-377), batched: images grouped by
    (n_clusters, grid bucket) and clustered with one vmapped k-means per group."""
    del multiprocessing
    make_output_dir(output_dir)
    inputs = get_paired_input_files(features_dir, eigs_dir)
    writer = _AsyncWriter()

    # Host pass: per-image n_clusters (adaptive eigengap, extract.py:311-315)
    # and segmap grid dims; group by n_clusters for static-shape batching.
    from collections import defaultdict
    groups = defaultdict(list)
    for index, (feature_path, eigs_path) in inputs:
        d = _load_feature_eig_pair(feature_path, eigs_path)
        out_file = Path(output_dir) / f"{d['id']}.png"
        if out_file.is_file():
            continue
        s = get_image_sizes(d)
        if adaptive:
            gaps = np.diff(np.asarray(d["eigenvalues"]))
            order = np.argsort(gaps)[::-1]
            n_clusters = int(order[order != 0][0]) + 1
        else:
            n_clusters = non_adaptive_num_segments
        if kmeans_baseline:
            X = np.asarray(d["k"], np.float32).reshape(-1, d["k"].shape[-1])
        else:
            X = np.asarray(d["eigenvectors"],
                           np.float32)[1: 1 + num_eigenvectors].T
        n_pts = X.shape[0]
        if n_pts == s.H_patch * s.W_patch:
            grid = (s.H_patch, s.W_patch)
        elif n_pts == s.H_patch * s.W_patch * 4:
            grid = (s.H_patch * 2, s.W_patch * 2)
        else:
            raise ValueError(f"{n_pts=} vs {s}")
        groups[n_clusters].append((index, out_file, X, grid))

    def batched_kmeans(n_clusters):
        def one(X, key, mask):
            res = kmeans(X, n_clusters, key, n_init=10, max_iter=300, mask=mask)
            return res.labels
        return jax.jit(jax.vmap(one))

    for n_clusters, items in groups.items():
        km = batched_kmeans(n_clusters)

        def prepare(bucket: bucketing.Bucket, batch_items):
            M = batch_items[0][2].shape[1]
            X = np.zeros((batch_size, bucket.tokens, M), np.float32)
            extents = np.zeros((batch_size, 2), np.int32)
            for i, (index, out_file, Xi, (h, w)) in enumerate(batch_items):
                g = np.zeros((bucket.h, bucket.w, M), np.float32)
                g[:h, :w] = Xi.reshape(h, w, M)
                X[i] = g.reshape(-1, M)
                extents[i] = (h, w)
            masks = bucketing.grid_masks(extents, (bucket.h, bucket.w))
            keys = np.stack([np.asarray(jax.random.PRNGKey(seed + it[0]))
                             for it in batch_items]
                            + [np.zeros(2, np.uint32)] *
                            (batch_size - len(batch_items)))
            return X, masks, keys

        def consume(bucket: bucketing.Bucket, batch_items, prepared):
            X, masks, keys = prepared
            labels = np.asarray(km(jnp.asarray(X), jnp.asarray(keys),
                                   jnp.asarray(masks)))
            for i, (index, out_file, Xi, (h, w)) in enumerate(batch_items):
                segmap = labels[i].reshape(bucket.h, bucket.w)[:h, :w]
                if infer_bg_index:
                    segmap = np.asarray(infer_background_swap(
                        jnp.asarray(segmap), n_clusters))
                writer.submit(save_segmap_png, segmap.astype(np.uint8), out_file)

        bucketing.run_bucketed_prefetched(
            items, lambda it: it[3], prepare, consume,
            batch_size=batch_size, granularity=bucket_granularity)

    writer.close()
    print(f"Saved multi-region segmentations to {output_dir}")


def extract_single_region_segmentations(
    features_dir: str,
    eigs_dir: str,
    output_dir: str,
    threshold: float = 0.0,
    multiprocessing: int = 0,
):
    """Binary mask = Fiedler vector > threshold
    (reference: extract/extract.py:380-426). Saved as 0/255 like the reference's
    bool->PIL path so downstream binarization at 0.5 works."""
    del multiprocessing
    make_output_dir(output_dir)
    inputs = get_paired_input_files(features_dir, eigs_dir)
    for _, (feature_path, eigs_path) in _progress(inputs, "single_region"):
        d = _load_feature_eig_pair(feature_path, eigs_path)
        out_file = Path(output_dir) / f"{d['id']}.png"
        if out_file.is_file():
            continue
        s = get_image_sizes(d)
        vec = np.asarray(d["eigenvectors"])[1]
        segmap = (vec > threshold).reshape(s.H_patch, s.W_patch)
        save_segmap_png(segmap.astype(np.uint8) * 255, out_file)
    print(f"Saved single-region segmentations to {output_dir}")


# ------------------------------------------------------------ stage 5: bboxes

def extract_bboxes(
    features_dir: str,
    segmentations_dir: str,
    output_file: str,
    num_erode: int = 2,
    num_dilate: int = 3,
    skip_bg_index: bool = True,
    downsample_factor: Optional[int] = None,
):
    """Eroded/dilated per-segment bounding boxes
    (reference: extract/extract.py:429-497).

    Morphology + extents run HOST-SIDE in vectorized numpy: patch grids are
    tiny (<= ~60x60) and per-(shape, segment-count) device jits would cost far
    more than the op itself (a device path for CC/morphology exists in
    ops/morphology for the localization driver). Measured: ~0.8 ms/image
    (~1300 img/s single process) at VOC-typical 30x40 grids with 4 segments —
    an order of magnitude faster than the feature stage, so not a pipeline
    bottleneck even at VOC2012 scale (17k images ~ 13 s)."""
    make_output_dir(str(Path(output_file).parent), check_if_empty=False)
    inputs = get_paired_input_files(features_dir, segmentations_dir)

    def _np_erode_dilate(m: np.ndarray, erode: bool) -> np.ndarray:
        """Cross-footprint min/max step, numpy (same semantics as
        ops.morphology._erode_dilate_once; patch grids are tiny and a device
        jit per segmap shape would cost far more than the op)."""
        pad_val = erode
        p = np.pad(m, 1, constant_values=pad_val)
        stack = np.stack([p[1:-1, 1:-1], p[:-2, 1:-1], p[2:, 1:-1],
                          p[1:-1, :-2], p[1:-1, 2:]])
        return stack.all(0) if erode else stack.any(0)

    def segment_box(mask, num_erode, num_dilate):
        m = mask.astype(bool)
        for _ in range(num_erode):
            new = _np_erode_dilate(m, erode=True)
            if new.sum() > 0:  # don't erode the mask away (extract_utils.py:115-121)
                m = new
        for _ in range(num_dilate):
            new = _np_erode_dilate(m, erode=False)
            if new.sum() > 0:
                m = new
        ys, xs = np.where(m)
        if len(ys) == 0:
            return 0, 0, 0, 0
        return int(xs.min()), int(ys.min()), int(xs.max()) + 1, int(ys.max()) + 1

    all_outputs = []
    for _, (feature_path, seg_path) in _progress(inputs, "bboxes"):
        d = load_pth(feature_path)
        segmap = load_segmap_png(seg_path)
        s = get_image_sizes(d, downsample_factor)
        outputs = {"bboxes": [], "bboxes_original_resolution": [],
                   "segment_indices": [], "id": d["id"],
                   "format": "(xmin, ymin, xmax, ymax)"}
        for seg_idx in sorted(np.unique(segmap).tolist()):
            if skip_bg_index and seg_idx <= 0:
                continue
            xmin, ymin, xmax, ymax = segment_box(segmap == seg_idx,
                                                 num_erode, num_dilate)
            outputs["segment_indices"].append(seg_idx)
            outputs["bboxes"].append([xmin, ymin, xmax, ymax])
            outputs["bboxes_original_resolution"].append(
                [xmin * s.P, ymin * s.P, xmax * s.P, ymax * s.P])
        all_outputs.append(outputs)
    save_pth(all_outputs, output_file)
    print(f"Saved bboxes to {output_file}")


# ----------------------------------------------------- stage 6: bbox features

def extract_bbox_features(
    images_root: str,
    bbox_file: str,
    model_name: str,
    output_file: str,
    ckpt_dir: Optional[str] = None,
    batch_size: int = 16,
    precision: str = "bf16",
):
    """CLS embedding of each bbox crop (reference: extract/extract.py:500-544),
    batched across all crops by bucket shape."""
    bbox_list = load_pth(bbox_file)
    model_name = model_name.lower()
    cfg = get_model_config(model_name)
    model, params = load_params(model_name, ckpt_dir, precision=precision)
    P = cfg.patch_size

    @jax.jit
    def fwd_cls(images, token_mask):
        out = model.apply(params, images, n_intermediates=1, token_mask=token_mask)
        return out["cls"]

    # Gather all crops with back-references.
    crops = []  # (img_idx, box_idx, crop HWC normalized)
    for i, bd in enumerate(_progress(bbox_list, "bbox crops")):
        rgb = load_image_rgb(_resolve_image_file(images_root, bd["id"]))
        x = normalize_imagenet_hwc(rgb)
        for j, (xmin, ymin, xmax, ymax) in enumerate(bd["bboxes_original_resolution"]):
            crop = x[ymin:ymax, xmin:xmax]
            hp, wp = max(crop.shape[0] // P, 1), max(crop.shape[1] // P, 1)
            crops.append((i, j, crop[: hp * P, : wp * P]))

    feats: dict[tuple, np.ndarray] = {}

    def process(bucket: bucketing.Bucket, batch_items):
        imgs = [c[2] for c in batch_items]
        padded, extents = bucketing.pad_batch_images(
            imgs, (bucket.h * P, bucket.w * P), batch_size)
        masks = bucketing.token_masks(extents, bucket, P)
        cls = np.asarray(fwd_cls(jnp.asarray(padded), jnp.asarray(masks)))
        for b, (i, j, _) in enumerate(batch_items):
            feats[(i, j)] = cls[b]

    # Square pow2 buckets: crop shapes vary wildly and each distinct shape costs
    # one compile; cap compiled shapes at ~log2(max crop size).
    from collections import defaultdict
    crop_groups = defaultdict(list)
    for c in crops:
        hp = max(c[2].shape[0] // P, 1)
        wp = max(c[2].shape[1] // P, 1)
        crop_groups[bucketing.square_pow2_bucket(hp, wp)].append(c)
    for bucket in sorted(crop_groups, key=lambda b: -b.tokens):
        for chunk in bucketing.batches(range(len(crop_groups[bucket])), batch_size):
            process(bucket, [crop_groups[bucket][i] for i in chunk])

    for i, bd in enumerate(bbox_list):
        n = len(bd["bboxes"])
        bd["features"] = np.stack([feats[(i, j)] for j in range(n)]) if n else \
            np.zeros((0, cfg.embed_dim), np.float32)
    save_pth(bbox_list, output_file)
    print(f"Saved features to {output_file}")


# ----------------------------------------------------- stage 7: bbox clusters

def extract_bbox_clusters(
    bbox_features_file: str,
    output_file: str,
    num_clusters: int = 20,
    seed: int = 0,
    pca_dim: Optional[int] = 0,
):
    """Dataset-wide clustering of bbox features
    (reference: extract/extract.py:547-599). Full-batch Lloyd replaces
    MiniBatchKMeans — exact, and a single fused device program."""
    bbox_list = load_pth(bbox_features_file)
    all_features = np.concatenate([bd["features"] for bd in bbox_list], axis=0)
    all_features = all_features / np.linalg.norm(all_features, axis=-1, keepdims=True)

    X = jnp.asarray(all_features, jnp.float32)
    if pca_dim:
        X = pca(X, pca_dim)
    res = kmeans(X, num_clusters, jax.random.PRNGKey(seed), n_init=10, max_iter=300)
    clusters = np.asarray(res.labels)

    idx_vals, counts = np.unique(clusters, return_counts=True)
    print(f"Cluster indices: {idx_vals.tolist()}")
    print(f"Cluster counts: {counts.tolist()}")

    idx = 0
    for bd in bbox_list:
        n = len(bd["bboxes"])
        del bd["features"]
        bd["clusters"] = clusters[idx: idx + n]
        idx += n
    save_pth(bbox_list, output_file)
    print(f"Saved clusters to {output_file}")


# ------------------------------------------- stage 8: semantic segmentations

def extract_semantic_segmentations(
    segmentations_dir: str,
    bbox_clusters_file: str,
    output_dir: str,
):
    """Map each segment to its bbox's dataset-wide cluster id
    (reference: extract/extract.py:602-647)."""
    bbox_list = load_pth(bbox_clusters_file)
    make_output_dir(output_dir)
    for bd in _progress(bbox_list, "semantic segmaps"):
        segmap = load_segmap_png(Path(segmentations_dir) / f"{bd['id']}.png")
        if set(np.unique(segmap).tolist()).issubset({0, 255}):
            segmap = segmap.copy()
            segmap[segmap == 255] = 1
        semantic_map = dict(zip(bd["segment_indices"],
                                np.asarray(bd["clusters"]).tolist()))
        assert 0 not in semantic_map, semantic_map
        semantic_map[0] = 0  # background stays zero
        lut = np.zeros(max(semantic_map) + 1, np.uint8)
        for k, v in semantic_map.items():
            lut[k] = v
        save_segmap_png(lut[segmap], Path(output_dir) / f"{bd['id']}.png")
    print(f"Saved semantic segmentations to {output_dir}")


# --------------------------------------------------- stage 9: CRF refinement

def extract_crf_segmentations(
    images_list: str,
    images_root: str,
    segmentations_dir: str,
    output_dir: str,
    num_classes: int = 21,
    downsample_factor: int = 16,
    multiprocessing: int = 0,
    w1: float = 10.0,
    alpha: float = 80.0,
    beta: float = 13.0,
    w2: float = 3.0,
    gamma: float = 3.0,
    it: float = 5.0,
    batch_size: int = 4,
    gt_prob: float = 0.7,
):
    """Dense-CRF sharpening of patch-level segmaps at full image resolution
    (reference: extract/extract.py:650-735), on device, batched per image-size
    bucket (edge-replicated padding; results cropped back). `gt_prob` softens
    the hard-label unaries (unary_from_labels convention, see ops/crf.py)."""
    del multiprocessing
    make_output_dir(output_dir)
    params = (w1, alpha, beta, w2, gamma, it)
    writer = _AsyncWriter()

    # Single-image program dispatched per image, NOT vmapped: on a v5e the
    # vmapped CRF is ~2x SLOWER per image than the single-image program
    # (batched bilateral-grid scatter/gather lower to a worse path: 7.8 vs
    # 15.2 img/s at 320x480x6, device-time harness). Independent dispatches
    # pipeline on-device, so the loop costs no wall time on a local host;
    # bucketing still bounds the compile count.
    crf_one = jax.jit(lambda im, sg: dense_crf(im, sg, num_classes=num_classes,
                                               params=params, gt_prob=gt_prob))

    from PIL import Image
    pending = []
    for _, (image_file, segmap_path) in get_paired_input_files(
            images_list, segmentations_dir):
        image_id = Path(image_file).stem
        out_file = Path(output_dir) / f"{image_id}.png"
        if out_file.is_file():
            continue
        # Use the actual listed filename (any extension), unlike the
        # reference which re-derives `{id}.jpg` (extract/extract.py:668).
        with Image.open(str(Path(images_root) / image_file)) as im:
            Wd, Hd = im.size
        pending.append((image_file, segmap_path, out_file, (Hd, Wd)))
    pending = shard_across_processes(pending)

    GRAN = 64  # pixel bucket granularity

    def prepare(bucket: bucketing.Bucket, batch_items):
        BH, BW = bucket.h * GRAN, bucket.w * GRAN  # bucket is in 64-px units
        imgs = np.zeros((batch_size, BH, BW, 3), np.float32)
        segs = np.zeros((batch_size, BH, BW), np.int32)
        metas = []
        for i, (image_file, segmap_path, out_file, (H, W)) in enumerate(batch_items):
            image = load_image_rgb(Path(images_root) / image_file)
            segmap = load_segmap_png(segmap_path)
            P = downsample_factor
            H_pad, W_pad = (H // P) * P, (W // P) * P
            # Upsample patch segmap to full res (cv2 nearest convention,
            # reference: extract/extract.py:679-681).
            seg_up = np.array(resize_nearest(
                jnp.asarray(segmap.astype(np.int32)), (H_pad, W_pad)))
            seg_full = np.array(resize_nearest(
                jnp.asarray(segmap.astype(np.int32)), (H, W)))
            seg_full[:H_pad, :W_pad] = seg_up
            if set(np.unique(seg_full).tolist()) == {0, 255}:
                seg_full[seg_full == 255] = 1
            # Edge-replicate into the bucket so border bilateral neighborhoods
            # stay natural; crop back after the CRF.
            imgs[i] = np.pad(image, ((0, BH - H), (0, BW - W), (0, 0)),
                             mode="edge")
            segs[i] = np.pad(seg_full, ((0, BH - H), (0, BW - W)), mode="edge")
            metas.append((out_file, H, W))
        return imgs, segs, metas

    def consume(bucket: bucketing.Bucket, batch_items, prepared):
        imgs, segs, metas = prepared
        # dispatch all images of the batch first (they overlap on device),
        # then fetch
        outs = [crf_one(jnp.asarray(imgs[i]), jnp.asarray(segs[i]))
                for i in range(len(metas))]
        for (out_file, H, W), o in zip(metas, outs):
            writer.submit(save_segmap_png,
                          np.asarray(o)[:H, :W].astype(np.uint8), out_file)

    bucketing.run_bucketed_prefetched(
        pending, lambda it: (it[3][0] // GRAN + (it[3][0] % GRAN > 0),
                             it[3][1] // GRAN + (it[3][1] % GRAN > 0)),
        prepare, consume, batch_size=batch_size, granularity=1)
    writer.close()
    print(f"Saved CRF segmentations to {output_dir}")


# ------------------------------------------------------------- visualization

from .vis_server import vis_server  # noqa: E402,F401  (CLI stage re-export)


def vis_segmentations(
    images_list: str,
    images_root: str,
    segmentations_dir: str,
    bbox_file: Optional[str] = None,
    output_dir: str = "./vis",
    max_images: int = 40,
):
    """Static HTML/PNG gallery of image / segmap overlays (the reference uses a
    streamlit app, extract/extract.py:738-834; this environment is headless so we
    render files instead)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    # Key bboxes by image id, not position: bboxes.pth is ordered by the
    # sorted segmentations dir while images_list is whatever order the file
    # is in — positional pairing silently draws the wrong boxes for an
    # unsorted list (the stage-8 builder already pairs by id).
    bboxes_by_id = (
        {bd["id"]: bd for bd in load_pth(bbox_file)} if bbox_file else None)
    colors = matplotlib.colormaps["tab20"].resampled(21)

    rows = []
    names = Path(images_list).read_text().splitlines()
    for name in names[:max_images]:
        image_id = Path(name).stem
        image = load_image_rgb(Path(images_root) / name)
        segmap = load_segmap_png(Path(segmentations_dir) / f"{image_id}.png")
        if set(np.unique(segmap).tolist()) == {0, 255}:
            segmap = (segmap == 255).astype(np.uint8)
        seg_full = np.asarray(resize_nearest(jnp.asarray(segmap.astype(np.int32)),
                                             image.shape[:2]))
        ncols = 3 if bboxes_by_id is not None else 2
        fig, axes = plt.subplots(1, ncols, figsize=(5 * ncols, 5))
        axes[0].imshow(image)
        axes[0].set_title(image_id)
        overlay = colors(seg_full % 21)[..., :3]
        blend = 0.55 * image / 255.0 + 0.45 * overlay
        blend[seg_full == 0] = (image / 255.0)[seg_full == 0]
        axes[1].imshow(blend)
        axes[1].set_title("segments")
        if bboxes_by_id is not None:
            axes[2].imshow(image)
            bd = bboxes_by_id.get(image_id, {"bboxes_original_resolution": []})
            for (xmin, ymin, xmax, ymax) in bd["bboxes_original_resolution"]:
                axes[2].add_patch(plt.Rectangle((xmin, ymin), xmax - xmin,
                                                ymax - ymin, fill=False,
                                                edgecolor="red", linewidth=2))
            axes[2].set_title("boxes")
        for ax in axes:
            ax.axis("off")
        fig.savefig(out / f"{image_id}.png", bbox_inches="tight", dpi=80)
        plt.close(fig)
        rows.append(f'<div><h3>{image_id}</h3><img src="{image_id}.png"/></div>')
    (out / "index.html").write_text(
        "<html><body>" + "\n".join(rows) + "</body></html>")
    print(f"Wrote visualization gallery to {out / 'index.html'}")
