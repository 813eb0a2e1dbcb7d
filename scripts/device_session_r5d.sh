#!/bin/bash
# Round-5d device session: explain the r5c features regression and settle
# the in-flight-depth defaults with a same-session A/B.
#
# r5c (2000 images, post stage-1+2 pipelining): eigs 13.0 -> 35.1 img/s,
# but features 6.0 -> 3.2. Confounds to kill:
#   - per-process backend init (8..236 s across sessions) was INSIDE the
#     features stage wall clock; at_scale_pipeline.py now warms up untimed.
#   - tunnel state varies across sessions; only same-session A/Bs count.
# DSS_TPU_INFLIGHT={0,1,2} sets the stages' in-flight depth (0 = pre-r5
# fetch-immediately), DSS_TPU_STAGE_TIMING=1 prints the upload/dispatch/
# fetch wall split from the REAL stage code path.
#
# Then the train-step items: name the 5.2 ms/step 'copy' category at b96
# and try TPU-side cost_analysis for the ceiling arithmetic.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/device_session_r5d.log}
exec > >(tee -a "$LOG") 2>&1

echo "=== device session r5d $(date -u +%FT%TZ) ==="

echo "--- [0] tunnel health ---"
timeout 600 python -c "
import time, numpy as np, jax, jax.numpy as jnp
t0=time.time(); x=jnp.ones((500,500)); np.asarray(x@x)
print('fetch %.1fs' % (time.time()-t0))
t0=time.time(); np.asarray(x@x); print('fetch2 %.1fs' % (time.time()-t0))
" || { echo "TUNNEL DOWN — aborting"; exit 1; }

AB="timeout 3600 python -u scripts/at_scale_pipeline.py --data-root /tmp/dss_at_scale --n-images 360 --fresh --device-ref 1305.7"

echo "--- [1] in-flight depth A/B, 360 images (features + eigs) ---"
echo "--- [1a] depth=1 (current default) ---"
DSS_TPU_STAGE_TIMING=1 DSS_TPU_INFLIGHT=1 $AB --output-root /tmp/dss_ab/d1
echo "--- [1b] depth=0 (pre-r5 fetch-immediately) ---"
DSS_TPU_STAGE_TIMING=1 DSS_TPU_INFLIGHT=0 $AB --output-root /tmp/dss_ab/d0
echo "--- [1c] depth=2 ---"
DSS_TPU_STAGE_TIMING=1 DSS_TPU_INFLIGHT=2 $AB --output-root /tmp/dss_ab/d2
echo "--- [1d] depth=1 repeat (session-drift control) ---"
DSS_TPU_STAGE_TIMING=1 DSS_TPU_INFLIGHT=1 $AB --output-root /tmp/dss_ab/d1b

echo "--- [2] train-step: name the copies (top individual ops, b96) ---"
timeout 3600 python -u scripts/profile_train_step.py --batch 96 --top-ops 25

echo "--- [3] train-step ceiling: TPU-side cost model ---"
timeout 3600 python -u scripts/train_step_ceiling.py --platform device \
    --batch 96 --measured-ms 38.4 || echo "device cost_analysis unavailable"

echo "--- [4] train soak rerun: 1000 steps bs96 + eval (eval-unpack fix) ---"
timeout 10800 python -u scripts/train_tpu_soak.py --steps 1000 --batch 96 \
    --eval-every 500 || echo "soak failed"

echo "=== done $(date -u +%FT%TZ) ==="
