#!/bin/bash
# Round-5 device session: close the four measurement items from the round-4
# verdict that need the chip. Ordered by value-per-minute:
#   [1] GEMM-only microbench (verdict #7 — replace the assumed ~70% MXU eff
#       in the fwd ceiling arithmetic with a measurement)
#   [2] dino_vitb8 composite bench (verdict #2 — the stretch backbone's
#       first device numbers; checks the flash-block pick and chebyshev
#       VMEM admission hold at D=768)
#   [3] at-scale 2000-image features->eigs run (verdict #1 — sustained
#       HOST-inclusive throughput vs the 1298 img/s device rate; the
#       tunnel's measured ~15 MB/s transport is decomposed afterwards)
#   [4] train at reference scale (verdict #4 — 1k-step bf16 soak at bs 96
#       crop224, the reference train.yaml:31,35 regime, + op breakdown)
#   [5] headline bench + numerics gates (regression check)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/device_session_r5.log}
exec > >(tee -a "$LOG") 2>&1

echo "=== device session r5 $(date -u +%FT%TZ) ==="

echo "--- [0] tunnel health ---"
timeout 300 python -c "
import time, numpy as np, jax, jax.numpy as jnp
t0=time.time(); x=jnp.ones((500,500)); np.asarray(x@x)
print('fetch %.1fs' % (time.time()-t0))
t0=time.time(); np.asarray(x@x); print('fetch2 %.1fs' % (time.time()-t0))
" || { echo "TUNNEL DOWN — aborting"; exit 1; }

echo "--- [1] GEMM microbench: vits16 b24 shapes (m=21624, D=384) ---"
timeout 1800 python -u scripts/bench_gemm_shapes.py --m 21624 --d 384

echo "--- [1b] GEMM microbench: vitb8 b8 shapes (m=28808, D=768) ---"
timeout 1800 python -u scripts/bench_gemm_shapes.py --m 28808 --d 768

echo "--- [2] dino_vitb8 composite (T=3601, D=768, b8) ---"
timeout 5400 python -u scripts/bench_backbone_composite.py \
    --model dino_vitb8 --batch 8

echo "--- [3] at-scale 2000-image features->eigs (host-inclusive) ---"
timeout 7200 python -u scripts/at_scale_pipeline.py \
    --data-root /tmp/dss_at_scale --fresh

echo "--- [4] train soak: 1000 steps bs96 crop224 bf16 + bucketed eval ---"
timeout 7200 python -u scripts/train_tpu_soak.py --steps 1000 --batch 96 \
    --eval-every 500

echo "--- [4b] train-step op breakdown at b96 ---"
timeout 3600 python -u scripts/profile_train_step.py --batch 96

echo "--- [5] headline bench + numerics gates ---"
timeout 3600 python -u bench.py
timeout 3600 python -u scripts/validate_tpu_numerics.py

echo "=== done $(date -u +%FT%TZ) ==="
