"""Binary object-segmentation evaluation — the reference's
`object-segmentation/` subproject (main.py + metrics.py + dataset.py).

Evaluates predicted single-region masks (patch-level or CRF'd PNGs) against GT
masks of saliency datasets (CUB / DUT-OMRON / DUTS / ECSSD layouts): per-image
accuracy + IoU, optional F-max for soft predictions, with the reference's exact
resize/crop semantics (nearest upsample by the downsample factor, optional
center crop for CUB; main.py:75-112) and empty-mask conventions (metrics.py).
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

import jax.numpy as jnp

from ..ops import metrics as M
from ..ops.resize import resize_nearest
from ..utils.serialization import load_segmap_png

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif",
                  ".tiff", ".webp")


def _paths(d: Path) -> list[Path]:
    """Folder-of-files or folder-of-folders listing, sorted
    (reference: dataset.py:10-16, :42-54)."""
    entries = sorted(d.iterdir())
    if entries and entries[0].is_dir():
        return sorted(p for sub in entries for p in sub.iterdir())
    return entries


def central_crop(arr: np.ndarray) -> np.ndarray:
    """Center crop to a square of min(H, W) (reference: dataset.py:19-22)."""
    H, W = arr.shape[:2]
    s = min(H, W)
    y0, x0 = (H - s) // 2, (W - s) // 2
    return arr[y0:y0 + s, x0:x0 + s]


def load_gt_mask(path: Path, crop: bool) -> np.ndarray:
    """GT mask binarized at 0.5 of the 0-255 range (reference: dataset.py:86)."""
    from PIL import Image
    m = np.array(Image.open(path).convert("RGB"))[:, :, 0]
    if crop:
        m = central_crop(m)
    return m > 127


def prepare_prediction(pred: np.ndarray, target_hw: tuple[int, int],
                       downsample: Optional[int], crop: bool) -> np.ndarray:
    """Reference resize pipeline for patchwise predictions
    (object-segmentation/main.py:85-100): {0,255}->{0,1}, nearest-resize to
    max(patch*P, H) per dim, re-paste the exact x P upscale, center-crop."""
    pred = np.array(pred)
    uniq = set(np.unique(pred).tolist())
    assert uniq <= {0, 1, 255}, f"unexpected prediction values {uniq}"
    pred[pred == 255] = 1
    if downsample is not None:
        H, W = target_hw
        Hp, Wp = pred.shape
        H_pad, W_pad = Hp * downsample, Wp * downsample
        H_max, W_max = max(H_pad, H), max(W_pad, W)
        up = np.array(resize_nearest(jnp.asarray(pred.astype(np.int32)),
                                     (H_max, W_max)))
        up[:H_pad, :W_pad] = np.array(resize_nearest(
            jnp.asarray(pred.astype(np.int32)), (H_pad, W_pad)))
        pred = up
    if crop:
        pred = central_crop(pred)
    return pred.astype(bool)


def evaluate_predictions(
    images_dir: str | Path,
    labels_dir: str | Path,
    predictions_dir: str | Path,
    downsample: Optional[int] = 16,
    crop: bool = False,
    progress: bool = True,
) -> dict:
    """Dataset evaluation: mean acc + IoU over images
    (reference: object-segmentation/main.py:60-112). `crop=True` for CUB."""
    image_paths = _paths(Path(images_dir))
    label_paths = _paths(Path(labels_dir))
    assert len(image_paths) == len(label_paths)
    accs, ious = [], []
    it = zip(image_paths, label_paths)
    if progress:
        try:
            from tqdm import tqdm
            it = tqdm(list(it), desc="eval")
        except ImportError:
            pass
    for img_path, lab_path in it:
        target = load_gt_mask(lab_path, crop=False)
        pred_png = Path(predictions_dir) / f"{img_path.stem}.png"
        pred = load_segmap_png(pred_png)
        pred = prepare_prediction(pred, target.shape, downsample, crop)
        if crop:
            target = central_crop(target)
        # Size mismatches can remain at the right/bottom edge; crop both to the
        # common extent like the reference's paste-over does implicitly.
        H = min(pred.shape[0], target.shape[0])
        W = min(pred.shape[1], target.shape[1])
        pred, target = pred[:H, :W], target[:H, :W]
        accs.append(float(M.binary_accuracy(jnp.asarray(pred), jnp.asarray(target))))
        ious.append(float(M.binary_iou(jnp.asarray(pred), jnp.asarray(target))))
    results = {"acc": float(np.mean(accs)), "iou": float(np.mean(ious)),
               "n_images": len(accs)}
    print(f"acc: {results['acc']:.4f}  iou: {results['iou']:.4f} "
          f"({results['n_images']} images)")
    return results


def evaluate_soft_predictions(soft_preds: np.ndarray, targets: np.ndarray) -> dict:
    """acc/IoU/F-max for soft (probability) predictions, batched
    (reference: metrics.py:7-62 with preds_are_soft=True)."""
    hard = soft_preds > 0.5
    accs = [float(M.binary_accuracy(jnp.asarray(h), jnp.asarray(t)))
            for h, t in zip(hard, targets)]
    ious = [float(M.binary_iou(jnp.asarray(h), jnp.asarray(t)))
            for h, t in zip(hard, targets)]
    precs, recs = [], []
    for sp, t in zip(soft_preds, targets):
        p, r = M.soft_precision_recall_curve(jnp.asarray(sp), jnp.asarray(t))
        precs.append(np.asarray(p))
        recs.append(np.asarray(r))
    fmax = float(M.f_max(jnp.asarray(np.stack(precs)), jnp.asarray(np.stack(recs))))
    return {"acc": float(np.mean(accs)), "iou": float(np.mean(ious)),
            "f_max": fmax}
