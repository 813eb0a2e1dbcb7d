"""Config system and task-CLI tests."""
import numpy as np
from pathlib import Path
from PIL import Image

from deep_spectral_tpu.utils.config import load_config, Config


def test_config_overrides(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("a: 1\nb:\n  c: hello\n  d: [1, 2]\ne: true\n")
    cfg = load_config(y, ["b.c=world", "b.new=3.5", "e=false", "f.g=null"])
    assert cfg.a == 1
    assert cfg.b.c == "world"
    assert cfg.b.new == 3.5
    assert cfg.e is False
    assert cfg.f.g is None
    assert cfg.b.d == [1, 2]
    assert cfg.get_path("b.missing", 42) == 42


def test_config_attribute_access():
    c = Config({"x": Config({"y": 2})})
    assert c.x.y == 2
    c.set_path("x.z.w", 5)
    assert c.x.z.w == 5


def test_localization_cli(tmp_path):
    """End-to-end CLI run on a synthetic VOC-layout dataset."""
    from deep_spectral_tpu.tasks.cli import main
    from deep_spectral_tpu.utils.serialization import save_pth
    base = tmp_path / "VOC2012"
    for sub in ["JPEGImages", "Annotations", "ImageSets/Main"]:
        (base / sub).mkdir(parents=True)
    eigs = tmp_path / "eigs"
    eigs.mkdir()
    H, W = 160, 320
    names = ["a", "b"]
    for n in names:
        Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(
            base / "JPEGImages" / f"{n}.jpg")
        mask = np.zeros((10, 20), np.float32)
        mask[2:5, 3:8] = 1
        vec = mask.reshape(-1) * 2 - 1
        save_pth({"eigenvalues": np.zeros(2, np.float32),
                  "eigenvectors": np.stack([np.ones_like(vec), vec])},
                 eigs / f"{n}.pth")
        (base / "Annotations" / f"{n}.xml").write_text(
            "<annotation><object><name>cat</name><truncated>0</truncated>"
            "<difficult>0</difficult><bndbox><xmin>49</xmin><ymin>33</ymin>"
            "<xmax>128</xmax><ymax>80</ymax></bndbox></object></annotation>")
    (base / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(names))
    score = main(["localization", "--dataset", "VOC12", "--dataset_root",
                  str(tmp_path), "--eigenseg", "--precomputed_eigs_dir",
                  str(eigs), "--output_dir", str(tmp_path / "out")])
    assert score == 100.0


def test_object_segmentation_cli(tmp_path):
    from deep_spectral_tpu.tasks.cli import main
    from deep_spectral_tpu.utils.serialization import save_segmap_png
    images = tmp_path / "images"; images.mkdir()
    labels = tmp_path / "labels"; labels.mkdir()
    preds = tmp_path / "preds"; preds.mkdir()
    gt = np.zeros((64, 96), np.uint8)
    gt[16:48, 32:64] = 255
    Image.fromarray(np.zeros((64, 96, 3), np.uint8)).save(images / "x.jpg")
    Image.fromarray(gt).save(labels / "x.png")
    p = np.zeros((4, 6), np.uint8)
    p[1:3, 2:4] = 255
    save_segmap_png(p, preds / "x.png")
    res = main(["object_segmentation",
                f"predictions.root={preds}",
                f"datasets.ECSSD.images_dir={images}",
                f"datasets.ECSSD.labels_dir={labels}"])
    assert abs(res["ECSSD"]["iou"] - 1.0) < 1e-6


def test_localization_vis_smoke(tmp_path, rng):
    from deep_spectral_tpu.tasks import localization_vis as V
    image = (rng.random((80, 120, 3)) * 255).astype(np.uint8)
    V.visualize_predictions(image, [10, 10, 50, 60], [[12, 8, 52, 58]],
                            tmp_path / "pred.png")
    A = rng.random((48, 48)).astype(np.float32)
    V.visualize_fms(A, seed=5, scores=rng.random(48).astype(np.float32),
                    dims=(8, 6), output_dir=tmp_path / "fms")
    V.visualize_seed_expansion(image, [10, 10, 50, 60], 5,
                               (rng.random(48) > 0.5), (8, 6), (16, 16),
                               tmp_path / "seed.png")
    assert (tmp_path / "pred.png").is_file()
    assert (tmp_path / "fms" / "degree_map.png").is_file()
    assert (tmp_path / "seed.png").is_file()
