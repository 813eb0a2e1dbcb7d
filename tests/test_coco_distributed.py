"""COCO detection loading, COCO20k subsetting, and distributed helpers."""
import json
import numpy as np

from deep_spectral_tpu.tasks import localization as L
from deep_spectral_tpu.parallel import distributed as D


def _coco_json(tmp_path, n_images=5):
    images = [{"id": i, "file_name": f"im{i}.jpg", "width": 100, "height": 80}
              for i in range(n_images)]
    annotations = []
    aid = 0
    for i in range(n_images):
        for b in range(i % 3):
            annotations.append({"id": aid, "image_id": i,
                                "bbox": [10 * b, 5 * b, 20, 30],
                                "category_id": 1, "iscrowd": 0})
            aid += 1
    path = tmp_path / "instances.json"
    path.write_text(json.dumps({"images": images, "annotations": annotations,
                                "categories": [{"id": 1, "name": "x"}]}))
    return path


def test_load_coco_detection(tmp_path):
    path = _coco_json(tmp_path)
    pairs = L.load_coco_detection(tmp_path, path)
    assert len(pairs) == 5
    img_path, boxes = pairs[2]  # image 2 has 2 annotations
    assert img_path.name == "im2.jpg"
    assert boxes.shape == (2, 4)
    np.testing.assert_allclose(boxes[1], [10, 5, 30, 35])  # xywh -> xyxy


def test_load_coco_detection_subset(tmp_path):
    path = _coco_json(tmp_path)
    pairs = L.load_coco_detection(tmp_path, path, subset_ids=[1, 4])
    assert len(pairs) == 2
    assert {p[0].name for p in pairs} == {"im1.jpg", "im4.jpg"}


def test_select_coco_20k_deterministic(tmp_path):
    path = _coco_json(tmp_path, n_images=10)
    a = L.select_coco_20k(path, seed=42, n=4)
    b = L.select_coco_20k(path, seed=42, n=4)
    assert a == b and len(a) == 4


def test_corloc_accepts_box_arrays(tmp_path):
    """evaluate_corloc works with COCO-style (path, boxes) pairs."""
    from PIL import Image
    from deep_spectral_tpu.utils.serialization import save_pth
    img_dir = tmp_path / "imgs"; img_dir.mkdir()
    eigs = tmp_path / "eigs"; eigs.mkdir()
    H, W = 160, 320
    Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(img_dir / "c0.jpg")
    mask = np.zeros((10, 20), np.float32)
    mask[2:5, 3:8] = 1
    vec = mask.reshape(-1) * 2 - 1
    save_pth({"eigenvalues": np.zeros(2, np.float32),
              "eigenvectors": np.stack([np.ones_like(vec), vec])},
             eigs / "c0.pth")
    pairs = [(img_dir / "c0.jpg", np.asarray([[48, 32, 128, 80]], np.float32))]
    score, _, _ = L.evaluate_corloc(pairs, eigs, progress=False)
    assert score == 100.0


def test_distributed_helpers_single_process():
    assert D.is_master()
    assert D.all_sum_scalar(3.5) == 3.5
    D.barrier()  # no-op, must not raise
    D.initialize()  # no-op in single-process env
