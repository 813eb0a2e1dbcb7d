"""deep_spectral_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for deep spectral
unsupervised segmentation and localization.

Re-implements, TPU-first, the full capability surface of
lukemelas/deep-spectral-segmentation (CVPR 2022 "Deep Spectral Methods"):

  * dense self-supervised ViT (DINO) patch-feature extraction
    (reference: extract/extract.py:21-116)
  * per-image affinity graphs + generalized Laplacian eigendecomposition
    (reference: extract/extract.py:119-244), here a fused, batched, on-device kernel
  * multi/single-region segmentation, bbox discovery, dataset-wide clustering,
    semantic segmaps, dense-CRF refinement (reference: extract/extract.py:283-735)
  * object localization (CorLoc), object segmentation (IoU/F-max), semantic
    segmentation (Hungarian-matched mIoU) evals and DeepLab self-training
    (reference: object-localization/, object-segmentation/, semantic-segmentation/)

Design: everything numerical is a pure, jit-able JAX function batched with vmap and
sharded with pjit over a `jax.sharding.Mesh`; image IO and file layout live at the
edges and remain byte-compatible with the reference's on-disk interface
(`<id>.pth` feature/eig dicts, `.png` segmaps).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: compiles through this environment's remote
# TPU compiler take 30-300 s; the cache cuts repeat compiles to seconds across
# processes (measured 236 s -> 19 s). Disable with DSS_TPU_NO_COMPILE_CACHE=1.
# Not enabled for CPU-only runs: CPU AOT cache entries are host-feature
# fingerprinted and can SIGILL when loaded under a different feature detection.
if (not _os.environ.get("DSS_TPU_NO_COMPILE_CACHE")
        and _os.environ.get("JAX_PLATFORMS", "") != "cpu"):
    _cache_dir = _os.environ.get(
        "DSS_TPU_COMPILE_CACHE_DIR",
        _os.path.expanduser("~/.cache/dss_tpu_compile_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass

from . import ops, utils  # noqa: F401
