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


def test_load_coco_removes_iscrowd_by_default(tmp_path):
    """Crowd GT boxes are removed by default, matching the reference's
    extract_gt_COCO(remove_iscrowd=True) (datasets.py:217-225)."""
    images = [{"id": 0, "file_name": "im0.jpg", "width": 100, "height": 80}]
    annotations = [
        {"id": 0, "image_id": 0, "bbox": [1, 2, 10, 10], "category_id": 1,
         "iscrowd": 0},
        {"id": 1, "image_id": 0, "bbox": [5, 5, 40, 40], "category_id": 1,
         "iscrowd": 1},
    ]
    path = tmp_path / "inst.json"
    path.write_text(json.dumps({"images": images, "annotations": annotations,
                                "categories": []}))
    _, boxes = L.load_coco_detection(tmp_path, path)[0]
    assert boxes.shape == (1, 4)
    np.testing.assert_allclose(boxes[0], [1, 2, 11, 12])
    _, boxes_k = L.load_coco_detection(tmp_path, path, remove_iscrowd=False)[0]
    assert boxes_k.shape == (2, 4)


def test_load_coco_rounds_box_coords(tmp_path):
    """xywh -> xyxy converts with int rounding (reference datasets.py:231-233)."""
    images = [{"id": 0, "file_name": "im0.jpg"}]
    annotations = [{"id": 0, "image_id": 0, "bbox": [1.4, 2.6, 10.2, 10.2],
                    "category_id": 1, "iscrowd": 0}]
    path = tmp_path / "inst.json"
    path.write_text(json.dumps({"images": images, "annotations": annotations,
                                "categories": []}))
    _, boxes = L.load_coco_detection(tmp_path, path)[0]
    np.testing.assert_allclose(boxes[0], [1, 3, 12, 13])


def test_select_coco_20k_official_list(tmp_path):
    """With LOST's published sel file, ids come from the file names."""
    sel = tmp_path / "sel_20k.txt"
    sel.write_text("COCO_train2014_000000000009.jpg\n"
                   "COCO_train2014_000000012345.jpg\n")
    ids = L.select_coco_20k(tmp_path / "unused.json", sel_file=sel)
    assert ids == [9, 12345]


def test_localization_cli_coco20k(tmp_path):
    """--dataset COCO20k routes through the COCO loader end-to-end."""
    from PIL import Image
    from deep_spectral_tpu.tasks.cli import main as cli_main
    from deep_spectral_tpu.utils.serialization import save_pth

    root = tmp_path / "coco"
    (root / "images").mkdir(parents=True)
    (root / "annotations").mkdir()
    H, W = 160, 320
    images, annotations = [], []
    for i in range(3):
        name = f"COCO_train2014_{i:012d}.jpg"
        Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(
            root / "images" / name)
        images.append({"id": i, "file_name": name, "width": W, "height": H})
        annotations.append({"id": i, "image_id": i,
                            "bbox": [48, 32, 80, 48], "category_id": 1,
                            "iscrowd": 0})
    # plus one crowd box that must be ignored
    annotations.append({"id": 99, "image_id": 0, "bbox": [0, 0, W, H],
                        "category_id": 1, "iscrowd": 1})
    (root / "annotations" / "instances_train2014.json").write_text(
        json.dumps({"images": images, "annotations": annotations,
                    "categories": []}))
    sel = tmp_path / "sel.txt"
    sel.write_text("\n".join(f"COCO_train2014_{i:012d}.jpg" for i in range(2)))

    # Synthetic eigs whose Fiedler mask matches the GT box exactly.
    eigs = tmp_path / "eigs"; eigs.mkdir()
    mask = np.zeros((10, 20), np.float32)
    mask[2:5, 3:8] = 1  # box = [16*3, 16*2, 16*8, 16*5] = [48, 32, 128, 80]
    vec = mask.reshape(-1) * 2 - 1
    for i in range(2):
        save_pth({"eigenvalues": np.zeros(2, np.float32),
                  "eigenvectors": np.stack([np.ones_like(vec), vec])},
                 eigs / f"COCO_train2014_{i:012d}.pth")

    score = cli_main(["localization", "--dataset", "COCO20k",
                      "--dataset_root", str(root),
                      "--coco20k_list", str(sel),
                      "--eigenseg",
                      "--precomputed_eigs_dir", str(eigs),
                      "--output_dir", str(tmp_path / "out")])
    assert score == 100.0  # only the 2 listed images, crowd box ignored
    assert (tmp_path / "out" / "results.txt").read_text().startswith("corloc,100.0,2")
