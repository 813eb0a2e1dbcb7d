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

# Round 4 made small point counts take the EXACT dense-kernel path (no gain
# constant involved) — force the grid path, whose gain this script sweeps.
crf_mod._DENSE_MAX_POINTS = 0

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
# single source of truth for the oracle + case generator (tests/crf_oracle.py)
from crf_oracle import blobby_case as make_case  # noqa: E402
from crf_oracle import exact_mean_field  # noqa: E402



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
