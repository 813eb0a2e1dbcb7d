"""Empirically calibrate the bilateral-grid self-gain constant in ops/crf.py.

The grid pipeline (trilinear splat -> unnormalized [1,2,1] blur per dim ->
trilinear slice) multiplies the unit-peak exact bilateral kernel
exp(-|dp|^2/2a^2 - |dI|^2/2b^2) by a roughly constant gain. Round 1 derived
(5/3)^5 ~= 12.86 analytically (per-dim expected self-response of the
splat/blur/slice chain). This script MEASURES the gain on representative
images: for random piecewise-constant-plus-noise RGB images it computes

    gain_i = (grid kernel-weighted sum at pixel i) / (exact kernel sum at i)

and reports distribution statistics across images, sizes and (alpha, beta).
The implementation constant K0 in ops/crf.py should be the measured central
value. Run: JAX_PLATFORMS=cpu python scripts/calibrate_crf_gain.py
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
from deep_spectral_tpu.ops.crf import bilateral_filter  # noqa: E402

# Round 4 made small point counts take the EXACT dense-kernel path (gain 1 by
# construction) — force the grid path, which is what this script calibrates.
crf_mod._DENSE_MAX_POINTS = 0


def make_image(rng, H, W):
    """Piecewise-constant blobs + noise, in [0, 255] — CRF-typical content."""
    img = np.zeros((H, W, 3), np.float32)
    for _ in range(4):
        cy, cx = rng.integers(0, H), rng.integers(0, W)
        r = rng.integers(min(H, W) // 6, min(H, W) // 2)
        color = rng.uniform(0, 255, 3)
        yy, xx = np.mgrid[:H, :W]
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        img[m] = color
    img += rng.normal(0, 8, img.shape)
    return np.clip(img, 0, 255).astype(np.float32)


def exact_bilateral_sum(values, image, alpha, beta):
    H, W, C = values.shape
    N = H * W
    yy, xx = np.mgrid[:H, :W]
    pos = np.stack([yy.ravel(), xx.ravel()], 1).astype(np.float64)
    col = image.reshape(N, 3).astype(np.float64)
    dp2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    dc2 = ((col[:, None, :] - col[None, :, :]) ** 2).sum(-1)
    K = np.exp(-dp2 / (2 * alpha**2) - dc2 / (2 * beta**2))
    return K @ values.reshape(N, C)


def main():
    rng = np.random.default_rng(0)
    gains = []
    for (H, W) in [(40, 56), (64, 64), (48, 80)]:
        for (alpha, beta) in [(80.0, 13.0), (16.0, 13.0), (8.0, 20.0)]:
            for trial in range(2):
                image = make_image(rng, H, W)
                values = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
                grid_avg, density = bilateral_filter(
                    jnp.asarray(values), jnp.asarray(image), alpha, beta)
                # density comes back pre-divided by GRID_SELF_GAIN (round 4);
                # undo that to measure the RAW grid gain this script exists
                # to calibrate.
                grid_sum = (np.asarray(grid_avg) * np.asarray(density)
                            * crf_mod.GRID_SELF_GAIN)
                exact = exact_bilateral_sum(values, image, alpha, beta)
                g = grid_sum.reshape(-1, 3) / np.maximum(exact, 1e-9)
                med = np.median(g)
                gains.append(med)
                print(f"H={H} W={W} alpha={alpha} beta={beta} trial={trial}: "
                      f"median gain {med:.3f}  p10 {np.percentile(g,10):.3f}  "
                      f"p90 {np.percentile(g,90):.3f}")
    gains = np.asarray(gains)
    print(f"\nOverall: median {np.median(gains):.4f}  mean {gains.mean():.4f}  "
          f"analytic (5/3)^5 = {(5/3)**5:.4f}")


if __name__ == "__main__":
    main()
