#!/bin/bash
# Round-2 batch 14: restart of the work lost to the session reset —
# dma_p bundled-fetch sweep (ex-queue12), vortex 1e7 (ex-queue11 tail),
# 1e8 rerun at the reverted group cap (ex-queue13).
cd /root/repo

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

wait_tunnel() {
  until probe; do
    echo "[queue14] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue14] tunnel up $(date +%H:%M:%S)" >&2
}

run() {
  name=$1; tmo=$2; shift 2
  wait_tunnel
  echo "[queue14] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q14_$name.log" 2>&1
  echo "[queue14] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run dmap 8000 python scripts/exp_dmap.py 1e7
run vort7 10000 python scripts/exp_vort.py 1e7
run e8 10000 python scripts/exp_1e8.py

echo "[queue14] ALL DONE $(date +%H:%M:%S)" >&2
