"""semantic_train / semantic_eval CLI drivers end-to-end (tiny backbone)."""
import numpy as np
from pathlib import Path
from PIL import Image

from deep_spectral_tpu.tasks.cli import main


def _make_voc(tmp_path):
    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    segs = root / "pseudo"
    segs.mkdir()
    rng = np.random.default_rng(0)
    names = [f"c{i}" for i in range(4)]
    for n in names:
        img = np.zeros((64, 64, 3), np.uint8)
        img[:, :32] = 30
        img[:, 32:] = 220
        Image.fromarray(img).save(root / "JPEGImages" / f"{n}.jpg")
        gt = np.zeros((64, 64), np.uint8)
        gt[:, 32:] = 1
        Image.fromarray(gt).save(root / "SegmentationClass" / f"{n}.png")
        Image.fromarray(gt[::16, ::16]).save(segs / f"{n}.png")
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text(names[-1])
    return root, segs


def test_semantic_eval_cli(tmp_path):
    root, segs = _make_voc(tmp_path)
    miou, match = main([
        "semantic_eval",
        f"data.root={root}", "data.image_set=all", f"segments_dir={segs}",
        "n_clusters=2", "data.num_classes=1", "visualize=2",
        f"output_dir={tmp_path / 'out'}",
    ])
    assert miou == 1.0  # pseudolabels == GT at block granularity
    assert (tmp_path / "out" / "vis").is_dir()


def test_semantic_train_cli(tmp_path):
    root, segs = _make_voc(tmp_path)
    best = main([
        "semantic_train",
        f"data.root={root}", f"segments_dir={segs}",
        "backbone=test_vit_tiny", "data.num_classes=1",
        "data.loader.batch_size=2", "data.transform.crop_size=32",
        "data.transform.resize_size=40",
        "max_train_steps=6", "eval_every=3", "lr=0.005",
        "unfrozen_backbone_layers=0",
        f"checkpoint.dir={tmp_path / 'ckpt'}",
    ])
    assert best >= 0.0  # ran evals and returned a best mIoU
    assert (tmp_path / "ckpt" / "best").is_dir()
