"""Validate the bilateral-grid CRF against an exact O(N^2) dense mean-field
oracle (Krahenbuhl & Koltun) and sweep the grid self-gain constant.

For each candidate gain, runs `dense_crf` on small synthetic images and
measures label agreement with the exact oracle (explicit dense bilateral +
Gaussian kernels, self-excluded, unnormalized sums — the same mean-field
formulation, with no grid approximation). Prints agreement per gain so the
GRID_SELF_GAIN constant in ops/crf.py can be chosen empirically.

Run: python -u scripts/validate_crf_oracle.py
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import deep_spectral_tpu.ops.crf as crf_mod  # noqa: E402


def make_case(rng, H, W, n_labels=3, patch=8):
    """CRF-typical case: blobby image + a coarse (patch-level) misaligned
    segmap, as produced by the pipeline's nearest-upsampled patch labels."""
    img = np.zeros((H, W, 3), np.float32)
    labels = np.zeros((H, W), np.int32)
    palette = rng.uniform(30, 225, (n_labels, 3))
    for lab in range(1, n_labels):
        cy, cx = rng.integers(0, H), rng.integers(0, W)
        r = rng.integers(min(H, W) // 5, min(H, W) // 2)
        yy, xx = np.mgrid[:H, :W]
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        labels[m] = lab
    for lab in range(n_labels):
        img[labels == lab] = palette[lab]
    img = np.clip(img + rng.normal(0, 10, img.shape), 0, 255).astype(np.float32)
    # Coarse segmap: majority label per patch, nearest-upsampled back.
    seg = labels[patch // 2::patch, patch // 2::patch]
    seg_up = np.repeat(np.repeat(seg, patch, 0), patch, 1)[:H, :W]
    return img, seg_up, labels


def softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def exact_mean_field(image, segmap, num_classes, params, gt_prob=0.7):
    """Exact dense mean field: explicit (N, N) bilateral + Gaussian kernels,
    diagonal (self-interaction) removed, unnormalized kernel sums, Potts
    compatibility — the formulation dense_crf approximates with the grid."""
    w1, alpha, beta, w2, gamma, it = params
    H, W = segmap.shape
    N = H * W
    C = num_classes
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
    Q = softmax(-unary)
    for _ in range(int(it)):
        msg = w1 * (k_bi @ Q) + w2 * (k_sp @ Q)
        penalty = msg.sum(-1, keepdims=True) - msg
        Q = softmax(-unary - penalty)
    return np.argmax(Q, -1).reshape(H, W)


def main():
    cases = []
    rng = np.random.default_rng(0)
    param_sets = [
        (10.0, 80.0, 13.0, 3.0, 3.0, 5.0),   # reference defaults
        (10.0, 16.0, 13.0, 3.0, 3.0, 5.0),   # smaller spatial std
        (5.0, 40.0, 20.0, 3.0, 3.0, 5.0),
    ]
    for trial in range(3):
        img, seg, gt = make_case(rng, 56, 56)
        for params in param_sets:
            cases.append((img, seg, params))
    oracle = [exact_mean_field(img, seg, 3, params)
              for img, seg, params in cases]
    print(f"{len(cases)} cases prepared")

    for gain in [12.86, 13.5, 14.0, 14.2, 14.5, 15.0, 16.0]:
        crf_mod.GRID_SELF_GAIN = gain
        jax.clear_caches()
        agrees = []
        for (img, seg, params), orc in zip(cases, oracle):
            out = np.asarray(crf_mod.dense_crf(
                jnp.asarray(img), jnp.asarray(seg), num_classes=3,
                params=params))
            agrees.append(np.mean(out == orc))
        agrees = np.asarray(agrees)
        print(f"gain {gain:6.2f}: mean agreement {agrees.mean():.4f}  "
              f"min {agrees.min():.4f}  per-case "
              f"{np.round(agrees, 3).tolist()}")


if __name__ == "__main__":
    main()
