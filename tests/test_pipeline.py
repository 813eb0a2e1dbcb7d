"""End-to-end pipeline integration test on a tiny synthetic dataset.

Runs all ten stages through the same file interfaces the reference uses
(`<id>.pth` dicts, `.png` segmaps) and checks schema-compatibility plus
numerical parity of the eig stage against a scipy re-derivation from the saved
feature files (the BASELINE.md >=0.99-cosine north star, on random-weight
features)."""
import numpy as np
import pytest
from pathlib import Path
from PIL import Image

from deep_spectral_tpu.pipeline import extract as stages
from deep_spectral_tpu.utils.serialization import load_pth, load_segmap_png

MODEL = "dino_vits16"
N_IMAGES = 4


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    images_dir = root / "images"
    images_dir.mkdir()
    rng = np.random.default_rng(0)
    sizes = [(96, 128), (96, 128), (112, 96), (80, 80)]
    names = []
    for i, (h, w) in enumerate(sizes):
        img = (rng.random((h, w, 3)) * 120).astype(np.uint8)
        # paint a bright blob to segment
        y, x = rng.integers(16, h - 32), rng.integers(16, w - 32)
        img[y:y + 24, x:x + 24] = [220, 60, 60]
        name = f"img_{i:03d}.jpg"
        Image.fromarray(img).save(images_dir / name, quality=95)
        names.append(name)
    (root / "lists").mkdir()
    (root / "lists" / "images.txt").write_text("\n".join(names))
    return root


@pytest.fixture(scope="module")
def pipeline_dirs(dataset, tmp_path_factory):
    out = tmp_path_factory.mktemp("out")
    d = {
        "root": dataset,
        "images_list": str(dataset / "lists" / "images.txt"),
        "images_root": str(dataset / "images"),
        "features": str(out / "features"),
        "eigs": str(out / "eigs"),
        "multi": str(out / "multi_region"),
        "single": str(out / "single_region"),
        "bboxes": str(out / "bboxes" / "bboxes.pth"),
        "bbox_feats": str(out / "bboxes" / "bbox_features.pth"),
        "bbox_clusters": str(out / "bboxes" / "bbox_clusters.pth"),
        "semantic": str(out / "semantic"),
        "crf": str(out / "crf"),
        "vis": str(out / "vis"),
    }
    return d


def test_stage1_features(pipeline_dirs):
    stages.extract_features(
        images_list=pipeline_dirs["images_list"],
        images_root=pipeline_dirs["images_root"],
        model_name=MODEL, batch_size=2,
        output_dir=pipeline_dirs["features"],
    )
    files = sorted(Path(pipeline_dirs["features"]).iterdir())
    assert len(files) == N_IMAGES
    d = load_pth(files[0])
    # Schema identical to the reference's saved dict (extract/extract.py:104-110).
    assert set(d) >= {"k", "indices", "file", "id", "model_name", "patch_size", "shape"}
    B, C, H, W = d["shape"]
    assert (B, C) == (1, 3)
    n_tokens = (H // 16) * (W // 16)
    assert d["k"].shape == (1, n_tokens, 384)
    assert d["patch_size"] == 16
    assert d["model_name"] == MODEL


def test_stage2_eigs_and_parity(pipeline_dirs):
    stages.extract_eigs(
        images_root=pipeline_dirs["images_root"],
        features_dir=pipeline_dirs["features"],
        output_dir=pipeline_dirs["eigs"],
        which_matrix="laplacian", K=5, batch_size=2,
    )
    eig_files = sorted(Path(pipeline_dirs["eigs"]).iterdir())
    assert len(eig_files) == N_IMAGES

    # Parity vs the reference's numpy/scipy recipe on the saved features.
    from scipy.sparse.linalg import eigsh
    for f in sorted(Path(pipeline_dirs["features"]).iterdir()):
        d = load_pth(f)
        e = load_pth(Path(pipeline_dirs["eigs"]) / f"{Path(d['file']).stem}.pth")
        feats = np.asarray(d["k"], np.float32).squeeze(0)
        feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
        W = feats @ feats.T
        W = W * (W > 0)
        W = W / W.max()
        dvec = W.sum(1)
        dvec[dvec < 1e-12] = 1.0
        D = np.diag(dvec)
        vals, vecs = eigsh(D - W, k=5, sigma=0, which="LM", M=D)
        np.testing.assert_allclose(np.asarray(e["eigenvalues"]), vals,
                                   atol=5e-3, rtol=5e-2)
        for k in range(1, 5):  # skip near-constant ev 0 (sign/scale degenerate)
            ours = np.asarray(e["eigenvectors"])[k]
            ref = vecs[:, k]
            cos = abs(ours @ ref / (np.linalg.norm(ours) * np.linalg.norm(ref)))
            assert cos > 0.99, f"{f.name} ev{k}: cos={cos:.4f}"


def test_stage2_eigs_with_color_affinity(pipeline_dirs, tmp_path):
    out = tmp_path / "eigs_color"
    stages.extract_eigs(
        images_root=pipeline_dirs["images_root"],
        features_dir=pipeline_dirs["features"],
        output_dir=str(out),
        which_matrix="laplacian", K=4, image_color_lambda=10.0, batch_size=2,
    )
    files = sorted(out.iterdir())
    assert len(files) == N_IMAGES
    e = load_pth(files[0])
    assert e["eigenvectors"].shape[0] == 4


def test_stage2_pallas_build_failure_falls_back(pipeline_dirs, tmp_path,
                                                monkeypatch, capsys):
    """VERDICT r3 #1: a Pallas chebyshev-filter build failure must NOT crash
    extract_eigs (ARPACK's never-crash contract, reference
    extract/extract.py:227-234) — the stage falls back to the XLA filter
    chain and produces identical-schema outputs that match an explicit-XLA
    run."""
    from deep_spectral_tpu.ops import cheb_filter

    def boom(*a, **k):
        raise RuntimeError("Scoped allocation ... exceeded scoped vmem limit")

    monkeypatch.setattr(cheb_filter, "chebyshev_filter", boom)
    out = tmp_path / "eigs_pallas_fail"
    stages.extract_eigs(
        images_root=pipeline_dirs["images_root"],
        features_dir=pipeline_dirs["features"],
        output_dir=str(out),
        which_matrix="laplacian", K=5, batch_size=2,
        solver="chebyshev", cheb_filter_impl="pallas",
    )
    assert "falling back to the XLA filter chain" in capsys.readouterr().out
    monkeypatch.undo()
    out_xla = tmp_path / "eigs_xla"
    stages.extract_eigs(
        images_root=pipeline_dirs["images_root"],
        features_dir=pipeline_dirs["features"],
        output_dir=str(out_xla),
        which_matrix="laplacian", K=5, batch_size=2,
        solver="chebyshev", cheb_filter_impl="xla",
    )
    for f in sorted(out.iterdir()):
        a, b = load_pth(f), load_pth(out_xla / f.name)
        np.testing.assert_array_equal(np.asarray(a["eigenvalues"]),
                                      np.asarray(b["eigenvalues"]))
        np.testing.assert_array_equal(np.asarray(a["eigenvectors"]),
                                      np.asarray(b["eigenvectors"]))


def test_stage2_per_image_eigh_fallback(pipeline_dirs, tmp_path, monkeypatch,
                                        capsys):
    """VERDICT r3 #5: the host-side under-convergence fallback must re-solve
    per image (B=1 calls), not the whole batch. Force every image to trip
    (pipeline-side tolerance -> -1) and spy on the solver's call shapes."""
    from deep_spectral_tpu.ops.eigen import spectral_decompose_batched as real
    calls = []

    def spy(feats, *a, **k):
        calls.append((int(feats.shape[0]), k.get("solver")))
        return real(feats, *a, **k)

    monkeypatch.setattr(stages, "spectral_decompose_batched", spy)
    monkeypatch.setattr(stages, "CHEB_RESIDUAL_TOL", -1.0)
    out = tmp_path / "eigs_per_image"
    stages.extract_eigs(
        images_root=pipeline_dirs["images_root"],
        features_dir=pipeline_dirs["features"],
        output_dir=str(out),
        which_matrix="laplacian", K=5, batch_size=2,
        solver="chebyshev",
    )
    assert "re-solving those with exact eigh" in capsys.readouterr().out
    eigh_calls = [c for c in calls if c[1] == "eigh"]
    assert eigh_calls, "forced trip must trigger the fallback"
    assert all(b == 1 for b, _ in eigh_calls), \
        f"fallback must be per-image (B=1), got {eigh_calls}"
    # outputs must equal the exact solve
    out_ref = tmp_path / "eigs_exact"
    stages.extract_eigs(
        images_root=pipeline_dirs["images_root"],
        features_dir=pipeline_dirs["features"],
        output_dir=str(out_ref),
        which_matrix="laplacian", K=5, batch_size=2, solver="eigh",
    )
    for f in sorted(out.iterdir()):
        a, b = load_pth(f), load_pth(out_ref / f.name)
        np.testing.assert_allclose(np.asarray(a["eigenvalues"]),
                                   np.asarray(b["eigenvalues"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a["eigenvectors"]),
                                   np.asarray(b["eigenvectors"]), atol=1e-4)


def test_stage3_multi_region(pipeline_dirs):
    stages.extract_multi_region_segmentations(
        features_dir=pipeline_dirs["features"],
        eigs_dir=pipeline_dirs["eigs"],
        output_dir=pipeline_dirs["multi"],
        non_adaptive_num_segments=3,
    )
    files = sorted(Path(pipeline_dirs["multi"]).iterdir())
    assert len(files) == N_IMAGES
    for f, feat in zip(files, sorted(Path(pipeline_dirs["features"]).iterdir())):
        seg = load_segmap_png(f)
        d = load_pth(feat)
        _, _, H, W = d["shape"]
        assert seg.shape == (H // 16, W // 16)
        assert seg.max() < 3


def test_stage4_single_region(pipeline_dirs):
    stages.extract_single_region_segmentations(
        features_dir=pipeline_dirs["features"],
        eigs_dir=pipeline_dirs["eigs"],
        output_dir=pipeline_dirs["single"],
    )
    files = sorted(Path(pipeline_dirs["single"]).iterdir())
    assert len(files) == N_IMAGES
    seg = load_segmap_png(files[0])
    assert set(np.unique(seg)).issubset({0, 255})  # reference bool->L convention


def test_stage5_bboxes(pipeline_dirs):
    stages.extract_bboxes(
        features_dir=pipeline_dirs["features"],
        segmentations_dir=pipeline_dirs["multi"],
        output_file=pipeline_dirs["bboxes"],
        num_erode=1, num_dilate=2,
    )
    bbox_list = load_pth(pipeline_dirs["bboxes"])
    assert len(bbox_list) == N_IMAGES
    bd = bbox_list[0]
    assert set(bd) >= {"bboxes", "bboxes_original_resolution", "segment_indices",
                       "id", "format"}
    for (x0, y0, x1, y1), (X0, Y0, X1, Y1) in zip(
            bd["bboxes"], bd["bboxes_original_resolution"]):
        assert (X0, Y0, X1, Y1) == (x0 * 16, y0 * 16, x1 * 16, y1 * 16)
        assert x1 > x0 and y1 > y0
    assert 0 not in bd["segment_indices"]  # bg skipped


def test_stage6_bbox_features(pipeline_dirs):
    stages.extract_bbox_features(
        images_root=pipeline_dirs["images_root"],
        bbox_file=pipeline_dirs["bboxes"],
        model_name=MODEL,
        output_file=pipeline_dirs["bbox_feats"],
    )
    bl = load_pth(pipeline_dirs["bbox_feats"])
    for bd in bl:
        assert bd["features"].shape == (len(bd["bboxes"]), 384)


def test_stage7_bbox_clusters(pipeline_dirs):
    stages.extract_bbox_clusters(
        bbox_features_file=pipeline_dirs["bbox_feats"],
        output_file=pipeline_dirs["bbox_clusters"],
        num_clusters=3, seed=0, pca_dim=8,
    )
    bl = load_pth(pipeline_dirs["bbox_clusters"])
    for bd in bl:
        assert "features" not in bd
        assert len(bd["clusters"]) == len(bd["bboxes"])
        assert all(0 <= c < 3 for c in np.asarray(bd["clusters"]).tolist())


def test_stage8_semantic(pipeline_dirs):
    stages.extract_semantic_segmentations(
        segmentations_dir=pipeline_dirs["multi"],
        bbox_clusters_file=pipeline_dirs["bbox_clusters"],
        output_dir=pipeline_dirs["semantic"],
    )
    files = sorted(Path(pipeline_dirs["semantic"]).iterdir())
    assert len(files) == N_IMAGES
    bl = load_pth(pipeline_dirs["bbox_clusters"])
    seg = load_segmap_png(files[0])
    allowed = {0} | {int(c) for c in np.asarray(bl[0]["clusters"]).tolist()}
    assert set(np.unique(seg).tolist()).issubset(allowed)


def test_stage9_crf(pipeline_dirs):
    stages.extract_crf_segmentations(
        images_list=pipeline_dirs["images_list"],
        images_root=pipeline_dirs["images_root"],
        segmentations_dir=pipeline_dirs["semantic"],
        output_dir=pipeline_dirs["crf"],
        num_classes=4, downsample_factor=16,
    )
    files = sorted(Path(pipeline_dirs["crf"]).iterdir())
    assert len(files) == N_IMAGES
    for f, name in zip(files, ["img_000", "img_001", "img_002", "img_003"]):
        seg = load_segmap_png(f)
        img = np.array(Image.open(
            Path(pipeline_dirs["images_root"]) / f"{name}.jpg"))
        assert seg.shape == img.shape[:2]  # full resolution
        assert seg.max() < 4


def test_stage10_vis(pipeline_dirs):
    stages.vis_segmentations(
        images_list=pipeline_dirs["images_list"],
        images_root=pipeline_dirs["images_root"],
        segmentations_dir=pipeline_dirs["multi"],
        bbox_file=pipeline_dirs["bboxes"],
        output_dir=pipeline_dirs["vis"],
    )
    assert (Path(pipeline_dirs["vis"]) / "index.html").is_file()


def test_stage10_vis_unsorted_list_pairs_bboxes_by_id(tmp_path, monkeypatch):
    """The gallery must pair bboxes to images BY ID, not by position:
    bboxes.pth is ordered by the sorted segmentations dir while images_list
    is whatever order the file is in (VERDICT r4 weak #6). A reversed list
    under positional pairing would draw each image's boxes on the other."""
    from deep_spectral_tpu.utils.serialization import save_pth, save_segmap_png
    import matplotlib.pyplot as plt

    images_dir = tmp_path / "images"
    seg_dir = tmp_path / "segs"
    images_dir.mkdir()
    seg_dir.mkdir()
    boxes = {"img_a": (1, 2, 11, 12), "img_b": (3, 4, 23, 24)}
    for image_id in boxes:
        Image.fromarray(np.full((64, 64, 3), 100, np.uint8)).save(
            images_dir / f"{image_id}.jpg")
        save_segmap_png(np.ones((4, 4), np.uint8), seg_dir / f"{image_id}.png")
    # bboxes.pth in sorted-id order (how extract_bboxes writes it) ...
    save_pth([{"id": i, "bboxes_original_resolution": [boxes[i]]}
              for i in sorted(boxes)], tmp_path / "bboxes.pth")
    # ... but the images list REVERSED.
    order = sorted(boxes, reverse=True)
    (tmp_path / "images.txt").write_text(
        "\n".join(f"{i}.jpg" for i in order))

    drawn = []
    real_rect = plt.Rectangle

    def recording_rect(xy, w, h, **kw):
        drawn.append((xy[0], xy[1], xy[0] + w, xy[1] + h))
        return real_rect(xy, w, h, **kw)

    monkeypatch.setattr(plt, "Rectangle", recording_rect)
    stages.vis_segmentations(
        images_list=str(tmp_path / "images.txt"),
        images_root=str(images_dir),
        segmentations_dir=str(seg_dir),
        bbox_file=str(tmp_path / "bboxes.pth"),
        output_dir=str(tmp_path / "vis"),
    )
    assert drawn == [boxes[i] for i in order]


def test_resumability(pipeline_dirs, capsys):
    """Re-running a stage with existing outputs must be a no-op (skip-if-exists,
    reference: extract/extract.py:141-143)."""
    before = {f.name: f.stat().st_mtime_ns
              for f in Path(pipeline_dirs["eigs"]).iterdir()}
    stages.extract_eigs(
        images_root=pipeline_dirs["images_root"],
        features_dir=pipeline_dirs["features"],
        output_dir=pipeline_dirs["eigs"],
        which_matrix="laplacian", K=5, batch_size=2,
    )
    after = {f.name: f.stat().st_mtime_ns
             for f in Path(pipeline_dirs["eigs"]).iterdir()}
    assert before == after


def test_cli_parses_reference_flags(pipeline_dirs, tmp_path):
    """The reference's exact command line must work
    (reference: extract/extract.py:33-38 usage example)."""
    from deep_spectral_tpu.pipeline.cli import main
    out = tmp_path / "cli_eigs"
    main([
        "extract_eigs",
        "--images_root", pipeline_dirs["images_root"],
        "--features_dir", pipeline_dirs["features"],
        "--which_matrix", "laplacian",
        "--output_dir", str(out),
        "--K", "5",
        "--multiprocessing", "8",
    ])
    assert len(list(out.iterdir())) == N_IMAGES


@pytest.mark.parametrize("depth", ["0", "2"])
def test_inflight_depth_and_stage_timing(pipeline_dirs, tmp_path, monkeypatch,
                                         capsys, depth):
    """DSS_TPU_INFLIGHT (device-pipelining depth A/B knob) must not change any
    output byte-for-byte vs the default depth-1 run, and DSS_TPU_STAGE_TIMING=1
    must print the prepare/dispatch/fetch wall split from the real stage path
    (scripts/device_session_r5d.sh relies on both)."""
    monkeypatch.setenv("DSS_TPU_INFLIGHT", depth)
    monkeypatch.setenv("DSS_TPU_STAGE_TIMING", "1")
    feats_dir = tmp_path / "features"
    stages.extract_features(
        images_list=pipeline_dirs["images_list"],
        images_root=pipeline_dirs["images_root"],
        model_name=MODEL, batch_size=2,
        output_dir=str(feats_dir),
    )
    out = capsys.readouterr().out
    assert "[stage-timing] extract_features:" in out
    for key in ("prepare=", "dispatch=", "fetch="):
        assert key in out
    ref_files = sorted(Path(pipeline_dirs["features"]).iterdir())
    got_files = sorted(feats_dir.iterdir())
    assert [f.name for f in got_files] == [f.name for f in ref_files]
    for rf, gf in zip(ref_files, got_files):
        r, g = load_pth(rf), load_pth(gf)
        np.testing.assert_array_equal(np.asarray(r["k"]), np.asarray(g["k"]))
