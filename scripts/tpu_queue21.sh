#!/bin/bash
# Round-2 batch 21 (session 12): lean in-kernel vortex moments — the
# 7-row [x,r,w] layout with constant-permutation-matmul crosses must
# fix BOTH the vort3d Mosaic concatenate failure and the vortgrad3d
# absolute-moment fp32 floor (3.9e-4 at 3e4 growing to 1.2e-2 at 1e7;
# CPU now measures grad 6.1e-5 at theta 1.2/o5). Smoke first, then the
# 1e6/1e7 coverage rows, the vort2d theta calibration, and the 1e8
# dma_i retry with per-phase syncs + HBM watermarks.
cd /root/repo

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

run() {
  name=$1; tmo=$2; shift 2
  until probe; do
    echo "[queue21] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue21] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q21_$name.log" 2>&1
  echo "[queue21] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run vortsmoke 3000 python scripts/exp_vort.py 1e5
run vort6 6000 python scripts/exp_vort.py 1e6
run vort7 10000 python scripts/exp_vort.py 1e7
run v2theta6 6000 python scripts/exp_v2theta.py 1e6
run e8dma15 12000 python scripts/exp_1e8.py 1e8 16 1.15 dma_i 32

echo "[queue21] ALL DONE $(date +%H:%M:%S)" >&2
