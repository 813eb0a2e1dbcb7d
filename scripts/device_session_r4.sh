#!/bin/bash
# Round-4 on-device validation + measurement sequence (run when the axon
# tunnel is healthy). Each step is independently timeout-bounded; output is
# self-labelling so the log can be read asynchronously. Steps ordered by
# value-per-minute in case the tunnel dies mid-way (round 3 lost its tail).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/device_session_r4.log}
exec > >(tee -a "$LOG") 2>&1

echo "=== device session r4 $(date -u +%FT%TZ) ==="

echo "--- [0] tunnel health ---"
timeout 300 python -c "
import time, numpy as np, jax, jax.numpy as jnp
t0=time.time(); x=jnp.ones((500,500)); np.asarray(x@x)
print('fetch %.1fs' % (time.time()-t0))
t0=time.time(); np.asarray(x@x); print('fetch2 %.1fs' % (time.time()-t0))
" || { echo "TUNNEL STILL DOWN — aborting"; exit 1; }

echo "--- [1] pallas VMEM boundary probe (THE r3 blocker: N=2025 must run) ---"
timeout 5400 python -u scripts/probe_cheb_vmem.py

echo "--- [2] numerics validation (convergence gates incl. pallas) ---"
timeout 3600 python -u scripts/validate_tpu_numerics.py

echo "--- [3] flagship bench (auto = pallas filter) ---"
timeout 3600 python -u bench.py

echo "--- [4] CRF device time (round-4 exact dense kernel; was 34.5 img/s) ---"
timeout 3600 python -u scripts/profile_crf.py

echo "--- [5] batch knee sweep (r3 landed one point: 32 > 64 by 9%) ---"
timeout 7200 python -u scripts/sweep_bench_batch.py --batches 16,24,32,48,64,96,128

echo "--- [6] pallas-vs-xla chebyshev filter A/B (N=900 b64 + N=2025 b16) ---"
timeout 3600 python -u scripts/bench_cheb_filter.py

echo "--- [7] vits8 N=3600 composite (auto filter now = pallas at 3600) ---"
timeout 5400 python -u scripts/bench_vits8_composite.py

echo "--- [8] eigs phase profile (pallas impl, flagship N=900 b64) ---"
timeout 3600 python -u scripts/profile_eigs.py --n 900 --batch 64 \
    --solver chebyshev --filter-impl pallas

echo "=== done $(date -u +%FT%TZ) ==="
