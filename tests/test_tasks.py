"""Task-driver tests: localization (CorLoc), object-segmentation eval, semantic
segmentation (cluster matching eval + DeepLab self-training step)."""
import numpy as np
import pytest
from pathlib import Path
from PIL import Image

import jax
import jax.numpy as jnp

from deep_spectral_tpu.models import ViTConfig
from deep_spectral_tpu.tasks import localization as L
from deep_spectral_tpu.tasks import object_segmentation as OS
from deep_spectral_tpu.tasks import semantic_segmentation as SS
from deep_spectral_tpu.utils.serialization import save_pth, save_segmap_png


# -------------------------------------------------------------- localization

def _write_voc_xml(path, boxes, truncated=0):
    objs = "\n".join(
        f"<object><name>cat</name><truncated>{truncated}</truncated>"
        f"<difficult>0</difficult><bndbox><xmin>{x0}</xmin><ymin>{y0}</ymin>"
        f"<xmax>{x1}</xmax><ymax>{y1}</ymax></bndbox></object>"
        for x0, y0, x1, y1 in boxes)
    Path(path).write_text(f"<annotation>{objs}</annotation>")


def test_parse_voc_annotation_one_based_fix(tmp_path):
    _write_voc_xml(tmp_path / "a.xml", [(1, 1, 50, 60)])
    boxes, n_hard = L.parse_voc_annotation(tmp_path / "a.xml")
    np.testing.assert_allclose(boxes, [[0, 0, 50, 60]])  # datasets.py:262-264
    assert n_hard == 0


def test_parse_voc_annotation_remove_hards(tmp_path):
    _write_voc_xml(tmp_path / "a.xml", [(1, 1, 50, 60)], truncated=1)
    boxes, n_hard = L.parse_voc_annotation(tmp_path / "a.xml", remove_hards=True)
    assert boxes.shape == (0, 4) and n_hard == 1


def test_get_bbox_from_patch_mask_basic():
    H, W = 160, 320  # 10 x 20 patch grid at P=16
    mask = np.zeros((10, 20), np.uint8)
    mask[2:5, 3:8] = 1
    box = L.get_bbox_from_patch_mask(mask.reshape(-1), (H, W))
    np.testing.assert_allclose(box, [3 * 16, 2 * 16, 8 * 16, 5 * 16])


def test_get_bbox_from_patch_mask_inversion():
    """>50% foreground flips the mask (object_discovery.py:106-109)."""
    mask = np.ones((10, 20), np.uint8)
    mask[4:6, 8:12] = 0  # 'object' is the minority zero region after inversion
    box = L.get_bbox_from_patch_mask(mask.reshape(-1), (160, 320))
    np.testing.assert_allclose(box, [8 * 16, 4 * 16, 12 * 16, 6 * 16])


def test_get_bbox_from_patch_mask_empty_covers_image():
    mask = np.zeros((10, 20), np.uint8)
    box = L.get_bbox_from_patch_mask(mask.reshape(-1), (160, 320))
    np.testing.assert_allclose(box, [0, 0, 320, 160])


def test_corloc_end_to_end(tmp_path):
    """Synthetic eigs with a Fiedler blob matching GT -> CorLoc 100."""
    img_dir = tmp_path / "JPEGImages"
    ann_dir = tmp_path / "Annotations"
    eigs_dir = tmp_path / "eigs"
    for d in (img_dir, ann_dir, eigs_dir):
        d.mkdir()
    H, W = 160, 320
    pairs = []
    for i, hit in enumerate([True, True, False]):
        name = f"im{i}"
        Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(img_dir / f"{name}.jpg")
        mask = np.zeros((10, 20), np.float32)
        mask[2:5, 3:8] = 1.0
        vec = mask.reshape(-1) * 2 - 1  # positive inside the blob
        eigs = {"eigenvalues": np.zeros(2, np.float32),
                "eigenvectors": np.stack([np.ones_like(vec), vec])}
        save_pth(eigs, eigs_dir / f"{name}.pth")
        gt = (48, 32, 128, 80) if hit else (200, 100, 300, 150)
        _write_voc_xml(ann_dir / f"{name}.xml", [(gt[0] + 1, gt[1] + 1, gt[2], gt[3])])
        pairs.append((img_dir / f"{name}.jpg", ann_dir / f"{name}.xml"))
    score, preds, gts = L.evaluate_corloc(pairs, eigs_dir, progress=False,
                                          output_dir=tmp_path / "out")
    assert abs(score - 100 * 2 / 3) < 1e-6
    assert (tmp_path / "out" / "results.txt").is_file()
    assert (tmp_path / "out" / "preds.pkl").is_file()


def test_lost_finds_distinct_cluster(rng):
    """Patches in a block share a feature direction; LOST should box them."""
    wf, hf = 12, 10  # note LOST uses (w_featmap, h_featmap) reshape order
    d = 32
    base = rng.standard_normal(d).astype(np.float32)
    obj = rng.standard_normal(d).astype(np.float32)
    feats = np.tile(base, (wf * hf, 1)) + 0.05 * rng.standard_normal((wf * hf, d)).astype(np.float32)
    grid = feats.reshape(wf, hf, d)
    grid[3:7, 2:6] = obj + 0.05 * rng.standard_normal((4, 4, d)).astype(np.float32)
    feats = grid.reshape(-1, d)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    P = 16
    pred = L.lost(feats, (wf, hf), (P, P), (wf * P, hf * P))
    # The object block is rows 3:7, cols 2:6 in (wf, hf) indexing -> x from cols.
    x0, y0, x1, y1 = pred
    assert x0 >= 1 * P and x1 <= 7 * P and y0 >= 2 * P and y1 <= 8 * P


def test_dino_seg_smoke(rng):
    wf, hf, nh = 8, 6, 4
    T = wf * hf + 1
    attn = rng.random((1, nh, T, T)).astype(np.float32)
    pred = L.dino_seg(attn, (wf, hf), 16, head=0)
    x0, y0, x1, y1 = pred
    assert 0 <= x0 < x1 <= wf * 16 and 0 <= y0 < y1 <= hf * 16


# ------------------------------------------------------ object segmentation

def test_object_segmentation_eval(tmp_path):
    images = tmp_path / "images"
    labels = tmp_path / "labels"
    preds = tmp_path / "preds"
    for d in (images, labels, preds):
        d.mkdir()
    H, W = 64, 96
    gt = np.zeros((H, W), np.uint8)
    gt[16:48, 32:64] = 255
    for i in range(2):
        Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(images / f"x{i}.jpg")
        Image.fromarray(gt).save(labels / f"x{i}.png")
    # pred 0: perfect at patch level (P=16): patches rows 1:3, cols 2:4
    p0 = np.zeros((H // 16, W // 16), np.uint8)
    p0[1:3, 2:4] = 255
    save_segmap_png(p0, preds / "x0.png")
    # pred 1: empty
    save_segmap_png(np.zeros((H // 16, W // 16), np.uint8), preds / "x1.png")
    res = OS.evaluate_predictions(images, labels, preds, downsample=16,
                                  progress=False)
    assert res["n_images"] == 2
    assert abs(res["iou"] - 0.5) < 1e-6          # (1.0 + 0.0) / 2
    expected_acc = (1.0 + (1 - 1024 / (H * W))) / 2
    assert abs(res["acc"] - expected_acc) < 1e-6


def test_central_crop():
    x = np.arange(24).reshape(4, 6)
    c = OS.central_crop(x)
    assert c.shape == (4, 4)
    np.testing.assert_array_equal(c, x[:, 1:5])


def test_soft_eval_fmax(rng):
    soft = rng.random((3, 32, 32)).astype(np.float32)
    targ = rng.random((3, 32, 32)) > 0.5
    res = OS.evaluate_soft_predictions(soft, targ)
    assert set(res) == {"acc", "iou", "f_max"}
    assert 0 <= res["f_max"] <= 1


# ------------------------------------------------------ semantic segmentation

@pytest.fixture(scope="module")
def voc_like(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    (root / "JPEGImages").mkdir()
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    segs = root / "pseudolabels"
    segs.mkdir()
    rng = np.random.default_rng(0)
    names = [f"img{i:02d}" for i in range(6)]
    perm = np.array([2, 0, 1])  # cluster = perm[class]
    for n in names:
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "JPEGImages" / f"{n}.jpg")
        gt_patch = rng.integers(0, 3, (4, 4)).astype(np.uint8)
        gt = np.kron(gt_patch, np.ones((16, 16), np.uint8))  # block-constant GT
        Image.fromarray(gt).save(root / "SegmentationClass" / f"{n}.png")
        pseudo = perm[gt_patch].astype(np.uint8)  # patch-level 4x4
        Image.fromarray(pseudo).save(segs / f"{n}.png")
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text(
        "\n".join(names[4:]))
    return root, segs, perm


def test_voc_dataset_splits(voc_like):
    root, segs, _ = voc_like
    # 'val' split needs matching segmap count: build dataset over all images.
    ds = SS.VOCSegmentationWithPseudolabels(str(root), "all", str(segs))
    assert len(ds) == 6
    image, seg, target, stem = ds[0]
    assert image.shape == (64, 64, 3)
    assert seg.shape == (64, 64)  # pseudolabel upsampled from 4x4
    assert target.shape == (64, 64)


def test_evaluate_segments_recovers_permutation(voc_like):
    root, segs, perm = voc_like
    ds = SS.VOCSegmentationWithPseudolabels(str(root), "all", str(segs))
    miou, jac, match = SS.evaluate_segments(ds, n_clusters=3, num_classes=3)
    # pseudolabels are a pure permutation of GT at patch granularity; after
    # nearest upsampling they agree exactly on the subsampled grid.
    for pred_c, gt_c in match:
        assert perm[gt_c] == pred_c
    assert miou == 1.0


def test_label_map_applied_by_dataset(voc_like):
    root, segs, perm = voc_like
    label_map = {int(perm[c]): c for c in range(3)}
    ds = SS.VOCSegmentationWithPseudolabels(str(root), "all", str(segs),
                                            label_map=label_map)
    _, seg, target, _ = ds[0]
    assert (seg == target).mean() == 1.0


TINY = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, img_size=32)


def test_deeplab_forward_shapes():
    cfg = SS.TrainConfig(backbone=TINY, num_classes=4, crop_size=32, batch_size=2)
    model = SS.build_model(cfg)
    state = SS.create_train_state(cfg, model)
    x = jnp.zeros((2, 32, 32, 3))
    logits = state.apply_fn({"params": state.params,
                             "batch_stats": state.batch_stats}, x, train=False)
    assert logits.shape == (2, 32, 32, 4)


def test_train_step_learns_and_freezes_backbone(rng):
    cfg = SS.TrainConfig(backbone=TINY, num_classes=3, crop_size=32,
                         batch_size=4, lr=1e-2, max_train_steps=50,
                         unfrozen_backbone_layers=0)
    model = SS.build_model(cfg)
    state = SS.create_train_state(cfg, model)
    frozen_before = jax.tree.map(np.asarray, state.params["backbone"])

    x = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    y = np.zeros((4, 32, 32), np.int64)
    y[:, :, 16:] = 1
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        key, sub = jax.random.split(key)
        state, logs = SS.train_step(state, jnp.asarray(x), jnp.asarray(y), sub)
        losses.append(float(logs["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    frozen_after = jax.tree.map(np.asarray, state.params["backbone"])
    for a, b in zip(jax.tree.leaves(frozen_before), jax.tree.leaves(frozen_after)):
        np.testing.assert_array_equal(a, b)  # backbone stayed frozen


def test_checkpoint_roundtrip(tmp_path):
    """Full resume parity: model, BN stats, optimizer state, and step all
    round-trip (reference resumes model/EMA/optimizer/scheduler/epoch,
    util.py:258-307)."""
    cfg = SS.TrainConfig(backbone=TINY, num_classes=3, crop_size=32, batch_size=2)
    model = SS.build_model(cfg)
    state = SS.create_train_state(cfg, model)
    # Take two real steps so the optimizer state is non-trivial.
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    y = jnp.zeros((2, 32, 32), jnp.int32)
    for i in range(2):
        state, _ = SS.train_step(state, x, y, jax.random.PRNGKey(i))
    SS.save_checkpoint(str(tmp_path / "ckpt"), state, int(state.step))
    state2 = SS.create_train_state(cfg, model)
    state2 = SS.restore_checkpoint(str(tmp_path / "ckpt"), state2)
    assert int(state2.step) == int(state.step) == 2
    for name in ("params", "opt_state", "batch_stats"):
        for a, b in zip(jax.tree.leaves(getattr(state, name)),
                        jax.tree.leaves(getattr(state2, name))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Training continues identically from the restored state.
    s1, l1 = SS.train_step(state, x, y, jax.random.PRNGKey(9))
    s2, l2 = SS.train_step(state2, x, y, jax.random.PRNGKey(9))
    assert float(l1["loss"]) == float(l2["loss"])
