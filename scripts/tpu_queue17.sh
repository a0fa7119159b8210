#!/bin/bash
# Round-2 batch 17 (machine reset lost queue16's results; re-harvest):
# bench confirms at the committed theta-1.15 prefix-sort stack (1e6+1e7),
# vortex workloads at 1e7, treecost confirm, and the 1e8 rerun which now
# includes the prefix-sort tree cut (tree phase was 45% of 65.8 s).
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
    echo "[queue17] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue17] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q17_$name.log" 2>&1
  echo "[queue17] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run bench6 4000 env ONBODY_BENCH_N=1e6 python bench.py
run bench7 6000 env ONBODY_BENCH_N=1e7 python bench.py
run treecost7 6000 python scripts/exp_treecost.py 1e7
run vort7 10000 python scripts/exp_vort.py 1e7
run e8 10000 python scripts/exp_1e8.py

echo "[queue17] ALL DONE $(date +%H:%M:%S)" >&2
