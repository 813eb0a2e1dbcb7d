#!/bin/bash
# Round-3 on-device validation + measurement sequence (run when the axon
# tunnel is healthy). Each step is independently timeout-bounded; output is
# self-labelling so the log can be read asynchronously.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/device_session_r3.log}
exec > >(tee -a "$LOG") 2>&1

echo "=== device session $(date -u +%FT%TZ) ==="

echo "--- [0] tunnel health ---"
timeout 300 python -c "
import time, numpy as np, jax, jax.numpy as jnp
t0=time.time(); x=jnp.ones((500,500)); np.asarray(x@x)
print('fetch %.1fs' % (time.time()-t0))
t0=time.time(); np.asarray(x@x); print('fetch2 %.1fs' % (time.time()-t0))
" || { echo "TUNNEL STILL DOWN — aborting"; exit 1; }

echo "--- [1] numerics validation (convergence gates incl. pallas) ---"
timeout 3600 python -u scripts/validate_tpu_numerics.py

echo "--- [2] pallas-vs-xla chebyshev filter A/B ---"
timeout 3600 python -u scripts/bench_cheb_filter.py

echo "--- [3] flagship bench (auto = pallas filter now) ---"
timeout 3600 python -u bench.py

echo "--- [4] batch knee sweep ---"
timeout 5400 python -u scripts/sweep_bench_batch.py --batches 32,64,96,128

echo "--- [5] eigs phase profile (pallas impl, flagship N=900 b64) ---"
timeout 3600 python -u scripts/profile_eigs.py --n 900 --batch 64 \
    --solver chebyshev --filter-impl pallas

echo "--- [6] vits8 N=3600 composite: lobpcg vs (now-adaptive) chebyshev ---"
timeout 5400 python -u scripts/bench_vits8_composite.py

echo "=== done $(date -u +%FT%TZ) ==="
