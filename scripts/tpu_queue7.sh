#!/bin/bash
# Round-2 batch 7: measure the pad-step DMA skip + dead-chunk skip.
cd /root/repo

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

echo "[queue7] waiting for TPU tunnel..." >&2
until probe; do
  echo "[queue7] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
  sleep 120
done
echo "[queue7] tunnel up $(date +%H:%M:%S)" >&2

run() {
  name=$1; tmo=$2; shift 2
  echo "[queue7] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q7_$name.log" 2>&1
  echo "[queue7] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run bench7 3600 env ONBODY_BENCH_N=1e7 python bench.py
run bench6 1800 python bench.py
run e8 10000 python scripts/exp_1e8.py
run prof7 4000 python scripts/profile_phases.py 1e7
echo "[queue7] ALL DONE $(date +%H:%M:%S)" >&2
