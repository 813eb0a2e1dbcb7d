"""Evaluation metrics: binary segmentation (acc/IoU/F-max), detection (bbox IoU,
CorLoc), and semantic segmentation (confusion matrix, per-class Jaccard, mIoU,
Hungarian / majority-vote cluster matching).

Mirrors the reference's formulas exactly:
  * acc/IoU/precision-recall/F-max with the empty-mask -> 1.0 convention
    (reference: object-segmentation/metrics.py:65-114, :97-99)
  * bbox IoU (reference: object-localization/datasets.py:269-321) and CorLoc
    ("pred counts if IoU >= 0.5 with any GT box",
    reference: object-localization/main.py:394-397)
  * flat-pixel IoU matrix + scipy Hungarian assignment
    (reference: semantic-segmentation/eval_utils.py:7-46). The reference computes
    the (k x k) IoU matrix with 16 joblib processes re-scanning all pixels k^2
    times; here it is ONE fused confusion-matrix pass on device, with the tiny
    assignment solved on host.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- binary masks

def binary_accuracy(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Pixel accuracy (reference: object-segmentation/metrics.py:65-67)."""
    return jnp.mean((pred.astype(bool) == target.astype(bool)).astype(jnp.float32))


def binary_iou(pred: jax.Array, target: jax.Array) -> jax.Array:
    """IoU with the reference's NaN->0 convention (metrics.py:70-76)."""
    p, t = pred.astype(bool), target.astype(bool)
    inter = jnp.sum((p & t).astype(jnp.float32))
    union = jnp.sum((p | t).astype(jnp.float32))
    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)


def precision_recall(target: jax.Array, pred: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Empty pred -> precision 1.0; empty target -> recall 1.0
    (reference: object-segmentation/metrics.py:91-100)."""
    t, p = target.astype(bool), pred.astype(bool)
    tp = jnp.sum((t & p).astype(jnp.float32))
    p_area = jnp.sum(p.astype(jnp.float32))
    t_area = jnp.sum(t.astype(jnp.float32))
    precision = jnp.where(p_area == 0, 1.0, tp / jnp.maximum(p_area, 1.0))
    recall = jnp.where(t_area == 0, 1.0, tp / jnp.maximum(t_area, 1.0))
    return precision, recall


@partial(jax.jit, static_argnames=("prob_bins",))
def soft_precision_recall_curve(soft_pred: jax.Array, target: jax.Array,
                                prob_bins: int = 255):
    """Precision/recall at thresholds arange(0,1,1/bins)[1:]
    (reference: object-segmentation/metrics.py:79-88).

    Vectorized over thresholds on device instead of a python loop.
    Returns (precisions, recalls) of length prob_bins-1.
    """
    thresholds = jnp.arange(0.0, 1.0, 1.0 / prob_bins)[1:]
    def at_thr(thr):
        return precision_recall(target, soft_pred > thr)
    return jax.vmap(at_thr)(thresholds)


def f_max(precisions: jax.Array, recalls: jax.Array, beta_sq: float = 0.3) -> jax.Array:
    """F-max over thresholds: mean P/R across images per threshold, then max F
    (reference: object-segmentation/metrics.py:103-114). precisions/recalls:
    (num_images, num_thresholds)."""
    p = jnp.mean(precisions, axis=0)
    r = jnp.mean(recalls, axis=0)
    f = ((1 + beta_sq) * p * r) / (beta_sq * p + r)
    f = jnp.nan_to_num(f, nan=0.0)
    return jnp.max(f)


# ------------------------------------------------------------------ detection

def bbox_iou(box1: jax.Array, box2: jax.Array) -> jax.Array:
    """IoU of boxes in (xmin, ymin, xmax, ymax). box1: (4,), box2: (..., 4).
    (reference: object-localization/datasets.py:269-321, default x1y1x2y2 IoU)."""
    b1 = box1.astype(jnp.float32)
    b2 = box2.astype(jnp.float32)
    ix1 = jnp.maximum(b1[0], b2[..., 0])
    iy1 = jnp.maximum(b1[1], b2[..., 1])
    ix2 = jnp.minimum(b1[2], b2[..., 2])
    iy2 = jnp.minimum(b1[3], b2[..., 3])
    iw = jnp.clip(ix2 - ix1, 0)
    ih = jnp.clip(iy2 - iy1, 0)
    inter = iw * ih
    a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return inter / jnp.maximum(a1 + a2 - inter, 1e-16)


def bbox_iou_variants(box1: jax.Array, box2: jax.Array, *, x1y1x2y2: bool = True,
                      giou: bool = False, diou: bool = False,
                      ciou: bool = False, eps: float = 1e-16) -> jax.Array:
    """IoU / GIoU / DIoU / CIoU between box1 (4,) and box2 (..., 4), the
    yolov5-style family the reference exposes
    (reference: object-localization/datasets.py:269-321)."""
    b1 = box1.astype(jnp.float32)
    b2 = box2.astype(jnp.float32)
    if not x1y1x2y2:  # xywh -> xyxy
        b1 = jnp.stack([b1[0] - b1[2] / 2, b1[1] - b1[3] / 2,
                        b1[0] + b1[2] / 2, b1[1] + b1[3] / 2])
        b2 = jnp.stack([b2[..., 0] - b2[..., 2] / 2, b2[..., 1] - b2[..., 3] / 2,
                        b2[..., 0] + b2[..., 2] / 2, b2[..., 1] + b2[..., 3] / 2],
                       axis=-1)
    ix1 = jnp.maximum(b1[0], b2[..., 0])
    iy1 = jnp.maximum(b1[1], b2[..., 1])
    ix2 = jnp.minimum(b1[2], b2[..., 2])
    iy2 = jnp.minimum(b1[3], b2[..., 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    w1, h1 = b1[2] - b1[0], b1[3] - b1[1]
    w2, h2 = b2[..., 2] - b2[..., 0], b2[..., 3] - b2[..., 1]
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not (giou or diou or ciou):
        return iou
    cw = jnp.maximum(b1[2], b2[..., 2]) - jnp.minimum(b1[0], b2[..., 0])
    ch = jnp.maximum(b1[3], b2[..., 3]) - jnp.minimum(b1[1], b2[..., 1])
    if giou:
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = (((b2[..., 0] + b2[..., 2]) - (b1[0] + b1[2])) ** 2 +
            ((b2[..., 1] + b2[..., 3]) - (b1[1] + b1[3])) ** 2) / 4.0
    if diou:
        return iou - rho2 / c2
    v = (4 / jnp.pi ** 2) * (jnp.arctan(w2 / (h2 + eps)) -
                             jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = v / (1 - iou + v + eps)
    return iou - (rho2 / c2 + v * alpha)


def corloc_hit(pred_box: jax.Array, gt_boxes: jax.Array,
               gt_valid: Optional[jax.Array] = None) -> jax.Array:
    """1.0 iff pred IoU >= 0.5 with any valid GT box
    (reference: object-localization/main.py:394-397)."""
    ious = bbox_iou(pred_box, gt_boxes)
    if gt_valid is not None:
        ious = jnp.where(gt_valid, ious, 0.0)
    return (jnp.max(ious, initial=0.0) >= 0.5).astype(jnp.float32)


# ---------------------------------------------------------- semantic (multi-class)

@partial(jax.jit, static_argnames=("num_pred", "num_gt"))
def confusion_matrix(flat_preds: jax.Array, flat_targets: jax.Array,
                     num_pred: int, num_gt: int) -> jax.Array:
    """(num_pred, num_gt) co-occurrence counts in ONE pass over pixels (replaces
    the reference's k^2 joblib rescans, semantic-segmentation/eval_utils.py:13-27)."""
    idx = flat_preds.astype(jnp.int32) * num_gt + flat_targets.astype(jnp.int32)
    counts = jnp.zeros(num_pred * num_gt, jnp.int32).at[idx].add(1)
    return counts.reshape(num_pred, num_gt)


def iou_matrix_from_confusion(conf: jax.Array) -> jax.Array:
    """IoU[c1, c2] = tp / (tp + fp + fn), the reference's get_iou
    (eval_utils.py:36-46)."""
    conf = conf.astype(jnp.float32)
    tp = conf
    fp = jnp.sum(conf, axis=0, keepdims=True) - conf  # target==c2, pred!=c1
    fn = jnp.sum(conf, axis=1, keepdims=True) - conf  # pred==c1, target!=c2
    return tp / jnp.maximum(tp + fp + fn, 1e-8)


def hungarian_match(flat_preds, flat_targets, preds_k: int, targets_k: int):
    """Optimal 1:1 cluster->class assignment maximizing IoU
    (reference: semantic-segmentation/eval_utils.py:7-23). Confusion matrix on
    device; the (k x k) assignment via scipy on host. Returns [(pred_c, gt_c)]."""
    from scipy.optimize import linear_sum_assignment
    assert preds_k == targets_k
    conf = confusion_matrix(jnp.asarray(flat_preds), jnp.asarray(flat_targets),
                            preds_k, targets_k)
    iou = np.asarray(iou_matrix_from_confusion(conf))
    rows, cols = linear_sum_assignment(-iou)
    return list(zip(rows.tolist(), cols.tolist()))


def majority_vote(flat_preds, flat_targets, preds_k: int, targets_k: int):
    """Each pred cluster -> its best-IoU GT class
    (reference: semantic-segmentation/eval_utils.py:26-33)."""
    conf = confusion_matrix(jnp.asarray(flat_preds), jnp.asarray(flat_targets),
                            preds_k, targets_k)
    iou = np.asarray(iou_matrix_from_confusion(conf))
    best = iou.argmax(axis=1)
    return list(zip(range(preds_k), best.tolist()))


def apply_label_map(preds: np.ndarray, match: Sequence[Tuple[int, int]]) -> np.ndarray:
    """Remap pred cluster ids -> matched class ids (host-side, tiny)."""
    lut = np.zeros(max(m[0] for m in match) + 1, dtype=np.int64)
    for pred_c, gt_c in match:
        lut[pred_c] = gt_c
    return lut[preds]


@partial(jax.jit, static_argnames=("num_classes",))
def per_class_jaccard(flat_preds: jax.Array, flat_targets: jax.Array,
                      num_classes: int):
    """Per-class TP/FP/FN -> Jaccard, plus mIoU over all classes
    (reference: semantic-segmentation/eval.py:141-153)."""
    conf = confusion_matrix(flat_preds, flat_targets, num_classes, num_classes)
    conf = conf.astype(jnp.float32)
    tp = jnp.diag(conf)
    fp = jnp.sum(conf, axis=1) - tp  # predicted c, target != c
    fn = jnp.sum(conf, axis=0) - tp  # target c, predicted != c
    jac = tp / jnp.maximum(tp + fp + fn, 1e-8)
    return jac, jnp.mean(jac)
