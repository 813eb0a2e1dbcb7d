"""Golden-artifact regression for the downstream pipeline stages (3-9).

Round-2 golden coverage stopped at the eig stage (test_golden.py); a quiet
behavior change in segmentation/bbox/CRF stages (e.g. a CRF gain tweak) would
pass the behavioral test suite. This runs the full stage chain on a
deterministic synthetic dataset and pins the stage 3-9 outputs committed
under tests/golden/pipeline/ (reference per-image outputs:
extract/extract.py:283-735).

The dataset images are saved as PNG (deterministic bytes, unlike JPEG across
libjpeg versions) — which also exercises the any-extension filename handling
end-to-end (the reference hardcodes `.jpg`, extract/extract.py:199-204, :668).

Regenerate goldens (after an INTENTIONAL behavior change) with:

    python tests/test_golden_pipeline.py   # rewrites tests/golden/pipeline/
"""
import io
import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

GOLDEN = Path(__file__).parent / "golden" / "pipeline"
MODEL = "dino_vits16"
N_IMAGES = 4


def _make_dataset(root: Path):
    images_dir = root / "images"
    images_dir.mkdir(parents=True)
    rng = np.random.default_rng(7)
    sizes = [(96, 128), (96, 128), (112, 96), (80, 80)]
    names = []
    for i, (h, w) in enumerate(sizes):
        img = (rng.random((h, w, 3)) * 120).astype(np.uint8)
        y, x = rng.integers(16, h - 32), rng.integers(16, w - 32)
        img[y:y + 24, x:x + 24] = [220, 60, 60]
        name = f"img_{i:03d}.png"  # PNG: deterministic bytes + non-jpg path
        Image.fromarray(img).save(images_dir / name)
        names.append(name)
    (root / "lists").mkdir()
    (root / "lists" / "images.txt").write_text("\n".join(names))
    return images_dir, root / "lists" / "images.txt"


def _run_stages(root: Path, out: Path):
    from deep_spectral_tpu.pipeline import extract as stages
    images_dir, images_list = _make_dataset(root)
    d = dict(images_root=str(images_dir), images_list=str(images_list))
    stages.extract_features(images_list=d["images_list"],
                            images_root=d["images_root"], model_name=MODEL,
                            batch_size=2, output_dir=str(out / "features"))
    stages.extract_eigs(images_root=d["images_root"],
                        features_dir=str(out / "features"),
                        output_dir=str(out / "eigs"), which_matrix="laplacian",
                        K=5, batch_size=2)
    stages.extract_multi_region_segmentations(
        features_dir=str(out / "features"), eigs_dir=str(out / "eigs"),
        output_dir=str(out / "multi"), non_adaptive_num_segments=3)
    stages.extract_single_region_segmentations(
        features_dir=str(out / "features"), eigs_dir=str(out / "eigs"),
        output_dir=str(out / "single"))
    stages.extract_bboxes(features_dir=str(out / "features"),
                          segmentations_dir=str(out / "multi"),
                          output_file=str(out / "bboxes.pth"),
                          num_erode=1, num_dilate=2)
    stages.extract_bbox_features(images_root=d["images_root"],
                                 bbox_file=str(out / "bboxes.pth"),
                                 model_name=MODEL,
                                 output_file=str(out / "bbox_feats.pth"))
    stages.extract_bbox_clusters(bbox_features_file=str(out / "bbox_feats.pth"),
                                 output_file=str(out / "bbox_clusters.pth"),
                                 num_clusters=3, seed=0, pca_dim=8)
    stages.extract_semantic_segmentations(
        segmentations_dir=str(out / "multi"),
        bbox_clusters_file=str(out / "bbox_clusters.pth"),
        output_dir=str(out / "semantic"))
    stages.extract_crf_segmentations(
        images_list=d["images_list"], images_root=d["images_root"],
        segmentations_dir=str(out / "semantic"), output_dir=str(out / "crf"),
        num_classes=4, downsample_factor=16)
    return out


@pytest.fixture(scope="module")
def pipeline_out(tmp_path_factory):
    root = tmp_path_factory.mktemp("golden_data")
    out = tmp_path_factory.mktemp("golden_out")
    return _run_stages(root, out)


def _segmaps(dirpath: Path) -> dict:
    from deep_spectral_tpu.utils.serialization import load_segmap_png
    return {f.name: np.asarray(load_segmap_png(f))
            for f in sorted(Path(dirpath).iterdir())}


def _bbox_summary(bbox_list) -> list:
    """JSON-stable view of the bbox dicts (ignores float features)."""
    return [{
        "id": bd["id"],
        "segment_indices": [int(s) for s in bd["segment_indices"]],
        "bboxes": [[int(v) for v in b] for b in bd["bboxes"]],
        "bboxes_original_resolution": [[int(v) for v in b]
                                       for b in bd["bboxes_original_resolution"]],
        **({"clusters": [int(c) for c in np.asarray(bd["clusters"]).tolist()]}
           if "clusters" in bd else {}),
    } for bd in bbox_list]


def _assert_segmaps_match(got: dict, golden_npz: Path, min_agree: float,
                          stage: str):
    g = np.load(golden_npz)
    assert set(got) == set(g.files), f"{stage}: file set changed"
    for name in got:
        a, b = got[name], g[name]
        assert a.shape == b.shape, f"{stage}/{name}: shape {a.shape} vs {b.shape}"
        agree = float(np.mean(a == b))
        assert agree >= min_agree, f"{stage}/{name}: pixel agreement {agree:.4f}"
        assert set(np.unique(a).tolist()) == set(np.unique(b).tolist()), \
            f"{stage}/{name}: label set changed"


def test_stage3_multi_region_golden(pipeline_out):
    _assert_segmaps_match(_segmaps(pipeline_out / "multi"),
                          GOLDEN / "multi_region.npz", 0.99, "multi_region")


def test_stage4_single_region_golden(pipeline_out):
    # Fiedler threshold at 0.0 is numerically crisp on these inputs: exact.
    _assert_segmaps_match(_segmaps(pipeline_out / "single"),
                          GOLDEN / "single_region.npz", 1.0, "single_region")


def test_stage5_bboxes_golden(pipeline_out):
    from deep_spectral_tpu.utils.serialization import load_pth
    got = _bbox_summary(load_pth(pipeline_out / "bboxes.pth"))
    golden = json.loads((GOLDEN / "bboxes.json").read_text())
    assert got == golden


def test_stage7_bbox_clusters_golden(pipeline_out):
    from deep_spectral_tpu.utils.serialization import load_pth
    got = _bbox_summary(load_pth(pipeline_out / "bbox_clusters.pth"))
    golden = json.loads((GOLDEN / "bbox_clusters.json").read_text())
    assert got == golden


def test_stage8_semantic_golden(pipeline_out):
    _assert_segmaps_match(_segmaps(pipeline_out / "semantic"),
                          GOLDEN / "semantic.npz", 0.99, "semantic")


def test_stage9_crf_golden(pipeline_out):
    _assert_segmaps_match(_segmaps(pipeline_out / "crf"),
                          GOLDEN / "crf.npz", 0.99, "crf")


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, str(Path(__file__).parents[1]))
    # Reproduce conftest.py's environment EXACTLY: near-threshold Fiedler
    # pixels are sensitive to XLA CPU config, so goldens must be generated
    # under the same flags the tests run with.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["DSS_TPU_NO_COMPILE_CACHE"] = "1"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ.setdefault("JAX_ENABLE_X64", "0")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import tempfile
    from deep_spectral_tpu.utils.serialization import load_pth
    GOLDEN.mkdir(parents=True, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        out = _run_stages(Path(td) / "data", Path(td) / "out")
        np.savez_compressed(GOLDEN / "multi_region.npz", **_segmaps(out / "multi"))
        np.savez_compressed(GOLDEN / "single_region.npz", **_segmaps(out / "single"))
        np.savez_compressed(GOLDEN / "semantic.npz", **_segmaps(out / "semantic"))
        np.savez_compressed(GOLDEN / "crf.npz", **_segmaps(out / "crf"))
        (GOLDEN / "bboxes.json").write_text(
            json.dumps(_bbox_summary(load_pth(out / "bboxes.pth")), indent=1))
        (GOLDEN / "bbox_clusters.json").write_text(
            json.dumps(_bbox_summary(load_pth(out / "bbox_clusters.pth")), indent=1))
    print(f"wrote stage 3-9 goldens to {GOLDEN}")
