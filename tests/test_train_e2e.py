"""End-to-end self-training loop on a tiny VOC-like fixture: the full
train() path (aug, batching, optimization, periodic eval, best-checkpointing)."""
import numpy as np
import pytest
from pathlib import Path
from PIL import Image

from deep_spectral_tpu.models import ViTConfig
from deep_spectral_tpu.tasks import semantic_segmentation as SS

TINY = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, img_size=32)


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_train")
    (root / "JPEGImages").mkdir()
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    segs = root / "pseudolabels"
    segs.mkdir()
    rng = np.random.default_rng(0)
    names = [f"t{i:02d}" for i in range(8)]
    for n in names:
        # learnable signal: class = (left dark / right bright)
        img = np.zeros((64, 64, 3), np.uint8)
        img[:, :32] = rng.integers(0, 60)
        img[:, 32:] = rng.integers(180, 250)
        Image.fromarray(img).save(root / "JPEGImages" / f"{n}.jpg")
        gt = np.zeros((64, 64), np.uint8)
        gt[:, 32:] = 1
        Image.fromarray(gt).save(root / "SegmentationClass" / f"{n}.png")
        Image.fromarray(gt[::16, ::16]).save(segs / f"{n}.png")
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text(
        "\n".join(names[6:]))
    return root, segs


def test_train_loop_data_parallel_mesh(voc_root, tmp_path):
    """DP training over the 8-device CPU mesh runs and learns."""
    from deep_spectral_tpu.parallel import make_mesh
    root, segs = voc_root
    train_ds = SS.VOCSegmentationWithPseudolabels(str(root), "all", str(segs))
    cfg = SS.TrainConfig(backbone=TINY, num_classes=2, crop_size=32,
                         resize_size=40, batch_size=8, lr=5e-3,
                         max_train_steps=12, unfrozen_backbone_layers=0)
    mesh = make_mesh()
    state, _ = SS.train(cfg, train_ds, mesh=mesh, log_every=0, max_steps=12,
                        metrics_path=str(tmp_path / "m.jsonl"))
    assert int(state.step) == 12
    miou, _ = SS.evaluate_model(state, train_ds, num_classes=2, max_images=4)
    assert miou > 0.4
    assert (tmp_path / "m.jsonl").is_file()


def test_train_loop_end_to_end(voc_root, tmp_path):
    root, segs = voc_root
    train_ds = SS.VOCSegmentationWithPseudolabels(str(root), "all", str(segs))
    cfg = SS.TrainConfig(backbone=TINY, num_classes=2, crop_size=32,
                         resize_size=40, batch_size=4, lr=5e-3,
                         max_train_steps=30, unfrozen_backbone_layers=0)
    state, best = SS.train(cfg, train_ds, dataset_val=train_ds,
                           ckpt_dir=str(tmp_path / "ckpt"),
                           eval_every=15, log_every=0, max_steps=30)
    assert int(state.step) == 30
    # Best checkpoint written during eval.
    assert (tmp_path / "ckpt" / "best").is_dir()
    miou, _ = SS.evaluate_model(state, train_ds, num_classes=2, max_images=4)
    assert miou > 0.5, miou  # trivially separable task

    # generate job dumps pred/gt PNGs
    SS.generate_predictions(state, train_ds, tmp_path / "gen", max_images=2)
    assert len(list((tmp_path / "gen" / "pred").iterdir())) == 2
    assert len(list((tmp_path / "gen" / "gt").iterdir())) == 2
