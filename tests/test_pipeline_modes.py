"""Pipeline alternate-mode tests: adaptive segment counts, kmeans baseline,
affinity/affinity_svd eig modes, custom downsample factor."""
import numpy as np
import pytest
from pathlib import Path
from PIL import Image

from deep_spectral_tpu.pipeline import extract as stages
from deep_spectral_tpu.utils.serialization import load_pth, load_segmap_png

MODEL = "dino_vits16"


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    root = tmp_path_factory.mktemp("modes")
    images_dir = root / "images"
    images_dir.mkdir()
    rng = np.random.default_rng(1)
    names = []
    for i, (h, w) in enumerate([(96, 96), (96, 128)]):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        name = f"m{i}.jpg"
        Image.fromarray(img).save(images_dir / name, quality=95)
        names.append(name)
    lists = root / "lists"
    lists.mkdir()
    (lists / "images.txt").write_text("\n".join(names))
    feats = root / "features"
    stages.extract_features(
        images_list=str(lists / "images.txt"), images_root=str(images_dir),
        model_name=MODEL, batch_size=2, output_dir=str(feats))
    return root, feats


def test_affinity_matrix_mode(prepared, tmp_path):
    root, feats = prepared
    out = tmp_path / "eigs_aff"
    stages.extract_eigs(
        images_root=str(root / "images"), features_dir=str(feats),
        output_dir=str(out), which_matrix="affinity", K=4, batch_size=2)
    e = load_pth(sorted(out.iterdir())[0])
    assert e["eigenvectors"].shape[0] == 4
    # Largest-of-affinity: eigenvalues ascending, row 0 is the top eigenvector
    # (reference quirk, extract.py:166-172).
    assert np.all(np.diff(e["eigenvalues"]) >= -1e-5)


def test_affinity_svd_mode(prepared, tmp_path):
    root, feats = prepared
    out = tmp_path / "eigs_svd"
    stages.extract_eigs(
        images_root=str(root / "images"), features_dir=str(feats),
        output_dir=str(out), which_matrix="affinity_svd", K=3, batch_size=2)
    e = load_pth(sorted(out.iterdir())[0])
    assert e["eigenvectors"].shape[0] == 3


def test_adaptive_and_kmeans_baseline(prepared, tmp_path):
    root, feats = prepared
    eigs = tmp_path / "eigs"
    stages.extract_eigs(
        images_root=str(root / "images"), features_dir=str(feats),
        output_dir=str(eigs), which_matrix="laplacian", K=6, batch_size=2)

    out_a = tmp_path / "multi_adaptive"
    stages.extract_multi_region_segmentations(
        features_dir=str(feats), eigs_dir=str(eigs), output_dir=str(out_a),
        adaptive=True)
    for f in out_a.iterdir():
        seg = load_segmap_png(f)
        assert seg.max() >= 0  # valid segmap with adaptive cluster count

    out_b = tmp_path / "multi_kmb"
    stages.extract_multi_region_segmentations(
        features_dir=str(feats), eigs_dir=str(eigs), output_dir=str(out_b),
        kmeans_baseline=True, non_adaptive_num_segments=3)
    for f in out_b.iterdir():
        seg = load_segmap_png(f)
        assert seg.max() < 3


def test_downsample_factor_upsampled_grid(prepared, tmp_path):
    """image_downsample_factor=8 with P=16 -> 2x-upsampled eig grid, and the
    multi-region stage reshapes to the doubled grid (extract.py:332-337)."""
    root, feats = prepared
    eigs = tmp_path / "eigs8"
    stages.extract_eigs(
        images_root=str(root / "images"), features_dir=str(feats),
        output_dir=str(eigs), which_matrix="laplacian", K=4,
        image_downsample_factor=8, batch_size=2)
    d = load_pth(sorted(Path(feats).iterdir())[0])
    e = load_pth(sorted(eigs.iterdir())[0])
    _, _, H, W = d["shape"]
    assert e["eigenvectors"].shape[1] == (H // 8) * (W // 8)

    out = tmp_path / "multi8"
    stages.extract_multi_region_segmentations(
        features_dir=str(feats), eigs_dir=str(eigs), output_dir=str(out),
        non_adaptive_num_segments=3)
    seg = load_segmap_png(sorted(out.iterdir())[0])
    assert seg.shape == ((H // 16) * 2, (W // 16) * 2)
