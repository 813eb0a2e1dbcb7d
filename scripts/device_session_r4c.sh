#!/bin/bash
# Round-4c device session: validate + re-measure after the chebyshev
# window-init retune (wide first window at N <= 1600 = _WIDE_INIT_MAX_N,
# pre-loop estimate above), then close the remaining r4 TODO items: the
# eig_chunk A/B and the
# N=3600 solver-regime decision. Ordered by value-per-minute.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/device_session_r4c.log}
exec > >(tee -a "$LOG") 2>&1

echo "=== device session r4c $(date -u +%FT%TZ) ==="

echo "--- [0] tunnel health ---"
timeout 300 python -c "
import time, numpy as np, jax, jax.numpy as jnp
t0=time.time(); x=jnp.ones((500,500)); np.asarray(x@x)
print('fetch %.1fs' % (time.time()-t0))
t0=time.time(); np.asarray(x@x); print('fetch2 %.1fs' % (time.time()-t0))
" || { echo "TUNNEL DOWN — aborting"; exit 1; }

echo "--- [1] numerics gates with the new window-init default (CPU tests"
echo "    cannot certify TPU numerics — the round-3 rule) ---"
timeout 3600 python -u scripts/validate_tpu_numerics.py || exit 1

echo "--- [2] headline bench at the new default ---"
timeout 3600 python -u bench.py

echo "--- [3] eig_chunk A/B at the flagship (does confining batch-max"
echo "    outers to sub-chunks beat lax.map sequentialization?) ---"
timeout 3600 python -u scripts/sweep_eig_chunk.py --batch 24 --n-tokens 900 \
    --chunks 0,4,8,12
timeout 3600 python -u scripts/sweep_eig_chunk.py --batch 64 --n-tokens 900 \
    --chunks 0,8,16,32

echo "--- [4] N=3600 solver regime: lobpcg in the same harness as the"
echo "    21.06 ms/call estimate:10 measurement (eigs-only) ---"
timeout 3600 python -u scripts/ab_cheb_window.py --configs 3600:16 \
    --variants lobpcg,estimate:10

echo "--- [5] vits8 composite with the new defaults ---"
timeout 5400 python -u scripts/bench_vits8_composite.py

echo "=== done $(date -u +%FT%TZ) ==="
