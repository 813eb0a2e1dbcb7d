"""Shared exact dense mean-field CRF oracle + synthetic case generator.

Single source of truth for tests/test_crf.py, scripts/validate_crf_oracle.py
and scripts/calibrate_crf_gain.py: GRID_SELF_GAIN in ops/crf.py was calibrated
by sweeping agreement against THIS oracle, so a drifted copy would silently
de-calibrate it.
"""
import numpy as np


def exact_mean_field(image, segmap, num_classes, params, gt_prob=0.7):
    """Exact O(N^2) Krahenbuhl dense mean field: explicit dense bilateral +
    Gaussian kernels, self-interaction removed, unnormalized kernel sums,
    Potts compatibility — the formulation `dense_crf` approximates with the
    bilateral grid (SimpleCRF wraps the same algorithm in C++;
    reference call: extract/extract.py:688-710)."""
    w1, alpha, beta, w2, gamma, it = params
    H, W = segmap.shape
    N, C = H * W, num_classes
    yy, xx = np.mgrid[:H, :W]
    pos = np.stack([yy.ravel(), xx.ravel()], 1).astype(np.float64)
    col = image.reshape(N, 3).astype(np.float64)
    dp2 = ((pos[:, None] - pos[None]) ** 2).sum(-1)
    dc2 = ((col[:, None] - col[None]) ** 2).sum(-1)
    k_bi = np.exp(-dp2 / (2 * alpha**2) - dc2 / (2 * beta**2))
    k_sp = np.exp(-dp2 / (2 * gamma**2))
    np.fill_diagonal(k_bi, 0.0)
    np.fill_diagonal(k_sp, 0.0)
    onehot = np.eye(C)[segmap.reshape(-1)]
    probs = onehot * gt_prob + (1 - onehot) * (1 - gt_prob) / max(C - 1, 1)
    unary = -np.log(np.clip(probs, 1e-8, 1.0))

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    Q = softmax(-unary)
    for _ in range(int(it)):
        msg = w1 * (k_bi @ Q) + w2 * (k_sp @ Q)
        penalty = msg.sum(-1, keepdims=True) - msg
        Q = softmax(-unary - penalty)
    return np.argmax(Q, -1).reshape(H, W)


def blobby_case(rng, H, W, n_labels=3, patch=8):
    """Blobby image + coarse patch-level misaligned segmap (the pipeline's
    nearest-upsampled patch labels)."""
    img = np.zeros((H, W, 3), np.float32)
    labels = np.zeros((H, W), np.int32)
    palette = rng.uniform(30, 225, (n_labels, 3))
    for lab in range(1, n_labels):
        cy, cx = rng.integers(0, H), rng.integers(0, W)
        r = rng.integers(min(H, W) // 5, min(H, W) // 2)
        yy, xx = np.mgrid[:H, :W]
        labels[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = lab
    for lab in range(n_labels):
        img[labels == lab] = palette[lab]
    img = np.clip(img + rng.normal(0, 10, img.shape), 0, 255).astype(np.float32)
    seg = labels[patch // 2::patch, patch // 2::patch]
    seg_up = np.repeat(np.repeat(seg, patch, 0), patch, 1)[:H, :W]
    return img, seg_up


