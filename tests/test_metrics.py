"""Metric kernels vs independent numpy/reference-formula oracles."""
import numpy as np
import jax.numpy as jnp

from deep_spectral_tpu.ops import metrics as M


def test_binary_iou_acc(rng):
    p = rng.random((20, 30)) > 0.5
    t = rng.random((20, 30)) > 0.5
    iou = float(M.binary_iou(jnp.asarray(p), jnp.asarray(t)))
    acc = float(M.binary_accuracy(jnp.asarray(p), jnp.asarray(t)))
    ref_iou = (p & t).sum() / (p | t).sum()
    assert abs(iou - ref_iou) < 1e-6
    assert abs(acc - (p == t).mean()) < 1e-6
    # Empty union -> 0 (reference nan->0 convention, metrics.py:75)
    z = np.zeros((4, 4), bool)
    assert float(M.binary_iou(jnp.asarray(z), jnp.asarray(z))) == 0.0


def test_precision_recall_empty_conventions():
    t = np.zeros((5, 5), bool)
    p = np.zeros((5, 5), bool)
    prec, rec = M.precision_recall(jnp.asarray(t), jnp.asarray(p))
    assert float(prec) == 1.0 and float(rec) == 1.0  # metrics.py:97-99


def test_f_max_against_reference_formula(rng):
    # 3 images, soft predictions
    precs, recs = [], []
    for i in range(3):
        soft = rng.random((16, 16)).astype(np.float32)
        targ = rng.random((16, 16)) > 0.5
        p, r = M.soft_precision_recall_curve(jnp.asarray(soft), jnp.asarray(targ))
        precs.append(np.asarray(p))
        recs.append(np.asarray(r))
    precs, recs = np.stack(precs), np.stack(recs)
    ours = float(M.f_max(jnp.asarray(precs), jnp.asarray(recs)))
    # reference F_max (object-segmentation/metrics.py:103-114)
    pm, rm = precs.mean(0), recs.mean(0)
    f = (1.3 * pm * rm) / (0.3 * pm + rm)
    f = np.nan_to_num(f)
    assert abs(ours - f.max()) < 1e-6
    assert 0.0 <= ours <= 1.0


def test_bbox_iou_and_corloc():
    a = jnp.asarray([0, 0, 10, 10])
    b = jnp.asarray([[5, 5, 15, 15], [20, 20, 30, 30]])
    ious = np.asarray(M.bbox_iou(a, b))
    np.testing.assert_allclose(ious, [25 / 175, 0.0], atol=1e-6)
    assert float(M.corloc_hit(a, jnp.asarray([[0, 0, 10, 12]]))) == 1.0
    assert float(M.corloc_hit(a, b)) == 0.0
    # invalid GT boxes are ignored
    hit = M.corloc_hit(a, jnp.asarray([[0, 0, 10, 10], [1, 1, 9, 9]]),
                       gt_valid=jnp.asarray([False, False]))
    assert float(hit) == 0.0


def _ref_get_iou(preds, targets, c1, c2):
    gt = preds == c1
    pd = targets == c2
    tp = np.sum(gt & pd); fp = np.sum(~gt & pd); fn = np.sum(gt & ~pd)
    return float(tp) / max(float(tp + fp + fn), 1e-8)


def test_iou_matrix_matches_reference(rng):
    preds = rng.integers(0, 5, 2000)
    targets = rng.integers(0, 5, 2000)
    conf = M.confusion_matrix(jnp.asarray(preds), jnp.asarray(targets), 5, 5)
    iou = np.asarray(M.iou_matrix_from_confusion(conf))
    for c1 in range(5):
        for c2 in range(5):
            assert abs(iou[c1, c2] - _ref_get_iou(preds, targets, c1, c2)) < 1e-6


def test_hungarian_match_recovers_permutation(rng):
    perm = np.array([3, 0, 4, 1, 2])
    targets = rng.integers(0, 5, 5000)
    preds = perm[targets]  # pred cluster = perm[class]
    noise = rng.random(5000) < 0.05
    preds[noise] = rng.integers(0, 5, noise.sum())
    match = M.hungarian_match(preds, targets, 5, 5)
    for pred_c, gt_c in match:
        assert perm[gt_c] == pred_c


def test_majority_vote(rng):
    targets = rng.integers(0, 3, 3000)
    preds = targets.copy()
    match = M.majority_vote(preds, targets, 3, 3)
    assert match == [(0, 0), (1, 1), (2, 2)]


def test_per_class_jaccard_miou(rng):
    preds = rng.integers(0, 4, 5000)
    targets = rng.integers(0, 4, 5000)
    jac, miou = M.per_class_jaccard(jnp.asarray(preds), jnp.asarray(targets), 4)
    jac = np.asarray(jac)
    for c in range(4):
        tp = np.sum((preds == c) & (targets == c))
        fp = np.sum((preds == c) & (targets != c))
        fn = np.sum((preds != c) & (targets == c))
        assert abs(jac[c] - tp / (tp + fp + fn)) < 1e-6
    assert abs(float(miou) - jac.mean()) < 1e-6


def test_apply_label_map():
    preds = np.array([0, 1, 2, 1, 0])
    out = M.apply_label_map(preds, [(0, 5), (1, 7), (2, 9)])
    np.testing.assert_array_equal(out, [5, 7, 9, 7, 5])
