#!/bin/bash
# Round-5c device session: re-measure the at-scale pipeline AFTER the
# stage-1+2 fixes (one-batch-in-flight dispatch + fp16 feature upload,
# commit 3e8ea3a). The r5 baseline on this host was features 6.0 /
# eigs 13.0 img/s host-inclusive, with the tunnel (~15 MB/s each way)
# the measured binding constraint:
#   - eigs ran exactly at its f32-upload floor (12.6 predicted, 13.0
#     measured) -> fp16 upload halves it -> ~25 img/s expected.
#   - features paid ~2x its 79 ms/img serial transport floor to
#     un-overlapped per-batch RPC -> the in-flight deque should
#     recover most of the 2x (up and down legs now overlap).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/device_session_r5c.log}
exec > >(tee -a "$LOG") 2>&1

echo "=== device session r5c $(date -u +%FT%TZ) ==="

echo "--- [0] tunnel health ---"
timeout 300 python -c "
import time, numpy as np, jax, jax.numpy as jnp
t0=time.time(); x=jnp.ones((500,500)); np.asarray(x@x)
print('fetch %.1fs' % (time.time()-t0))
t0=time.time(); np.asarray(x@x); print('fetch2 %.1fs' % (time.time()-t0))
" || { echo "TUNNEL DOWN — aborting"; exit 1; }

echo "--- [1] at-scale 2000-image features->eigs (post-fix re-measure) ---"
if [ ! -f /tmp/dss_at_scale/lists/images.txt ]; then
    timeout 1800 python -u scripts/make_synthetic_dataset.py \
        --out /tmp/dss_at_scale --n-images 2000
fi
timeout 14400 python -u scripts/at_scale_pipeline.py \
    --data-root /tmp/dss_at_scale --fresh --device-ref 1305.7

echo "=== done $(date -u +%FT%TZ) ==="
