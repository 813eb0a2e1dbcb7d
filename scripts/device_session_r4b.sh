#!/bin/bash
# Round-4 follow-up device session: the steps the first r4 session did not
# finish (it died after the vits8 lobpcg composite line) plus the batch-knee
# stability check the sweep raised. Ordered by value-per-minute.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/device_session_r4b.log}
exec > >(tee -a "$LOG") 2>&1

echo "=== device session r4b $(date -u +%FT%TZ) ==="

echo "--- [0] tunnel health ---"
timeout 300 python -c "
import time, numpy as np, jax, jax.numpy as jnp
t0=time.time(); x=jnp.ones((500,500)); np.asarray(x@x)
print('fetch %.1fs' % (time.time()-t0))
t0=time.time(); np.asarray(x@x); print('fetch2 %.1fs' % (time.time()-t0))
" || { echo "TUNNEL DOWN — aborting"; exit 1; }

echo "--- [1] batch-knee stability: b16/24/32 x seeds 0,1,2 (b24=1564.8 in"
echo "    the r4 sweep was 25% above BOTH neighbors — adaptive-outer batch-max"
echo "    luck suspected; multi-seed decides the honest BATCH default) ---"
timeout 7200 python -u scripts/sweep_bench_batch.py \
    --batches 16,24,32 --seeds 0,1,2

echo "--- [2] vits8 attention MXU-ceiling probe (VERDICT #7) ---"
timeout 5400 python -u scripts/probe_vits8_attn.py

echo "--- [3] eigs phase profile under the pallas filter (the W-fusion"
echo "    'before' numbers: how much of the phase is W-construction) ---"
timeout 3600 python -u scripts/profile_eigs.py --n 900 --batch 64 \
    --solver chebyshev --filter-impl pallas

echo "--- [4] vits8 composite rerun (r4 session died before the chebyshev"
echo "    line; compile cache makes the lobpcg half cheap) ---"
timeout 5400 python -u scripts/bench_vits8_composite.py

echo "=== done $(date -u +%FT%TZ) ==="
