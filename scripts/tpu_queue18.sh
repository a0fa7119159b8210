#!/bin/bash
# Round-2 batch 18 (chained on queue17): fresh phase attribution at the
# committed 1e7 stack, treecode2/3 parity rows (reference pointwise/
# boxwise table), and the 1e8 rerun with the dma_i executor + theta 1.15
# (chunked.py now builds pad8 fm for dma fetches — commit c8b6368).
cd /root/repo

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

while ! grep -q "ALL DONE" /tmp/queue17.log 2>/dev/null; do sleep 60; done

run() {
  name=$1; tmo=$2; shift 2
  until probe; do
    echo "[queue18] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue18] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q18_$name.log" 2>&1
  echo "[queue18] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run profile7 6000 python scripts/profile_phases.py 1e7
run tc6 6000 python scripts/exp_tc.py 1e6
run tc7 8000 python scripts/exp_tc.py 1e7
run e8dma15 10000 python scripts/exp_1e8.py 1e8 16 1.15 dma_i 32

echo "[queue18] ALL DONE $(date +%H:%M:%S)" >&2
