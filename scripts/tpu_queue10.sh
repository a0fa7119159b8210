#!/bin/bash
# Round-2 batch 10 (relaunch): 1e8 rerun with cap 8 + fused tree
# dispatches + packed deferred gathers; fused-pipeline experiment and
# bench confirm at 1e7 with the adopted dma_i config.
cd /root/repo

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

echo "[queue10] waiting for TPU tunnel..." >&2
until probe; do
  echo "[queue10] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
  sleep 120
done
echo "[queue10] tunnel up $(date +%H:%M:%S)" >&2

run() {
  name=$1; tmo=$2; shift 2
  echo "[queue10] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q10_$name.log" 2>&1
  echo "[queue10] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run e8 10000 python scripts/exp_1e8.py
run fused7 6000 python scripts/exp_fused7.py 1e7
run bench7 3600 env ONBODY_BENCH_N=1e7 python bench.py
run bench6 1800 python bench.py
echo "[queue10] ALL DONE $(date +%H:%M:%S)" >&2
