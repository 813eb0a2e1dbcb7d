"""Host-side IO helpers backing the at-scale pipeline path (round 5):
the fused HWC normalize and the mmap shape-only feature-dict scan.

Both exist because the host is the binding constraint of the end-to-end
pipeline (scripts/profile_host_path.py): normalize was the single biggest
per-image host cost and the stage-2 size scan read every tensor it never
used.
"""
import numpy as np
import pytest

from deep_spectral_tpu.utils.image_io import (normalize_imagenet,
                                              normalize_imagenet_hwc)
from deep_spectral_tpu.utils.serialization import (load_pth, load_pth_meta,
                                                   save_pth)


def test_normalize_hwc_matches_composed_form():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), np.uint8)
    ref = normalize_imagenet(img).transpose(1, 2, 0)
    np.testing.assert_allclose(normalize_imagenet_hwc(img), ref,
                               rtol=0, atol=1e-5)
    assert normalize_imagenet_hwc(img).dtype == np.float32


def test_device_normalize_constants_match_host():
    """The stage-1 jit normalizes uint8 images ON DEVICE with the same fused
    constants (pipeline/extract.py fwd); pin scale/shift against the
    canonical mean/std so the two paths cannot drift."""
    from deep_spectral_tpu.utils.image_io import (IMAGENET_MEAN,
                                                  IMAGENET_SCALE,
                                                  IMAGENET_SHIFT,
                                                  IMAGENET_STD)
    x = np.float32(200.0)
    ref = (x / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(x * IMAGENET_SCALE - IMAGENET_SHIFT, ref,
                               rtol=0, atol=1e-5)


def test_load_pth_meta_shapes_only(tmp_path):
    d = {
        "k": np.zeros((1, 30, 8), np.float16),
        "indices": np.asarray([3]),
        "file": "a.jpg", "id": "a", "model_name": "dino_vits16",
        "patch_size": 16, "shape": (1, 3, 480, 640),
        "nested": [np.zeros((2, 2)), "s"],
    }
    save_pth(d, tmp_path / "a.pth")
    meta = load_pth_meta(tmp_path / "a.pth")
    assert meta["k"] == (1, 30, 8)
    assert meta["indices"] == (1,)
    assert meta["nested"] == [(2, 2), "s"]
    # Non-tensor metadata comes through verbatim — exactly what
    # get_image_sizes needs (utils/sizes.py).
    for key in ("file", "id", "model_name", "patch_size", "shape"):
        assert meta[key] == d[key]

    from deep_spectral_tpu.utils.sizes import get_image_sizes
    s = get_image_sizes(meta)
    assert (s.H_patch, s.W_patch) == (30, 40)

    # And the full loader still round-trips the data.
    full = load_pth(tmp_path / "a.pth")
    np.testing.assert_array_equal(full["k"], d["k"])
