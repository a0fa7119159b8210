#!/bin/bash
# Round-2 batch 19 (session 12): queue17 died after bench7 and queue18
# never started — re-queue the outstanding jobs. Order: 1e6 retune sweep
# (exp_r4g6), the 1e8 dma_i+theta1.15 run (headline), vortex 1e7
# coverage, fresh 1e7 phase attribution, treecode2/3 parity rows, and
# the 1e8 pregather control.
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
    echo "[queue19] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue19] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q19_$name.log" 2>&1
  echo "[queue19] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run r4g6 6000 python scripts/exp_r4g6.py 1e6
run e8dma15 12000 python scripts/exp_1e8.py 1e8 16 1.15 dma_i 32
run vort7 10000 python scripts/exp_vort.py 1e7
run profile7 6000 python scripts/profile_phases.py 1e7
run tc6 6000 python scripts/exp_tc.py 1e6
run tc7 8000 python scripts/exp_tc.py 1e7
run e8 12000 python scripts/exp_1e8.py

echo "[queue19] ALL DONE $(date +%H:%M:%S)" >&2
