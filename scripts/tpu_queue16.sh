#!/bin/bash
# Round-3 batch 16 (chained on queue15): fixed sortsize microbench,
# prefix-sort + need_r build timing at 1e7, vort re-run with per-kernel
# configs and the vort3d Mosaic concat fix.
cd /root/repo

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

while ! grep -q "ALL DONE" /tmp/queue15.log 2>/dev/null; do sleep 60; done

run() {
  name=$1; tmo=$2; shift 2
  until probe; do
    echo "[queue16] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue16] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q16_$name.log" 2>&1
  echo "[queue16] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run sortsize 4000 python scripts/exp_sortsize.py
run prefix7 8000 python scripts/exp_treecost.py 1e7
run bench7 4000 env ONBODY_BENCH_N=1e7 python bench.py
run vort7 10000 python scripts/exp_vort.py 1e7

echo "[queue16] ALL DONE $(date +%H:%M:%S)" >&2
