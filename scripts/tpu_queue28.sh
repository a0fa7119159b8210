#!/bin/bash
# Round-2 batch 28 (session 14): the /tmp wipe lost queue 26/27, so this
# re-chains the outstanding measurements after the in-flight dma_i/theta
# 1.15 1e8 control (/tmp/e8dma.log): the chunked pair2 1e8 run (commit
# 398d231 plumbs dtt_leaf_pair2 through _dtt_lists_sub + the slab t2
# executor), then bench confirms at 1e7 and 1e6.
cd /root/repo

# wait for the foreground control run (started outside a queue) to exit
while [ -e "/proc/$(cat /tmp/e8.pid 2>/dev/null || echo 0)" ]; do
  sleep 60
done

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
    echo "[queue28] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue28] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q28_$name.log" 2>&1
  echo "[queue28] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run e8p2 6000 python scripts/exp_1e8.py 1e8 16 1.15 dma_i 32 p2
run bench7 3000 env ONBODY_BENCH_N=10000000 python bench.py
run bench6 2000 python bench.py

echo "[queue28] ALL DONE $(date +%H:%M:%S)" >&2
# queue29 gates on this file (ADVICE r2: stderr alone never creates it)
echo "ALL DONE" >> /tmp/queue28.log
