#!/bin/bash
# Round-5b device session: finish the round-5 measurements the first r5
# session left open (its log: the GEMM microbench printed negative times —
# the XLA slice-narrowing trap, fixed in bench_gemm_shapes.py; the vitb8
# chained bench died on the remote-compile HTTP 413 body limit — fixed by
# passing weights as jit arguments; the 1k-step b96 train soak was killed at
# step 150 when the session ended). Ordered quick-wins-first so a tunnel
# degradation mid-session still leaves the headline numbers recorded:
#   [1] GEMM-only microbench, vits16 + vitb8 shapes (verdict r4 #7)
#   [2] dino_vitb8 fwd + composite (verdict r4 #2)
#   [3] headline bench + numerics gates (round regression check)
#   [4] train soak 1000 steps bs96 crop224 bf16 + bucketed eval (verdict #4)
#   [5] train-step op breakdown at b96
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/device_session_r5b.log}
exec > >(tee -a "$LOG") 2>&1

echo "=== device session r5b $(date -u +%FT%TZ) ==="

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

echo "--- [2] dino_vitb8 fwd + composite (T=3601, D=768, b8) ---"
timeout 5400 python -u scripts/bench_backbone_composite.py \
    --model dino_vitb8 --batch 8

echo "--- [3] headline bench + numerics gates ---"
timeout 3600 python -u bench.py
timeout 3600 python -u scripts/validate_tpu_numerics.py

echo "--- [4] train soak: 1000 steps bs96 crop224 bf16 + bucketed eval ---"
timeout 10800 python -u scripts/train_tpu_soak.py --steps 1000 --batch 96 \
    --eval-every 500

echo "--- [5] train-step op breakdown at b96 ---"
timeout 3600 python -u scripts/profile_train_step.py --batch 96

echo "=== done $(date -u +%FT%TZ) ==="
