#!/bin/bash
# Serial TPU experiment queue, round-2 batch 3: key-dedup + dead-tail
# tree sorts, far-point dead geometry, jitted chunk step at 1e8.
cd /root/repo

# wait for the previous queue (tpu_queue2.sh) to release the chip
while pgrep -f tpu_queue2.sh >/dev/null 2>&1; do sleep 60; done

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

echo "[queue3] waiting for TPU tunnel..." >&2
until probe; do
  echo "[queue3] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
  sleep 120
done
echo "[queue3] tunnel up $(date +%H:%M:%S)" >&2

run() {
  name=$1; shift
  echo "[queue3] START $name $(date +%H:%M:%S)" >&2
  timeout 4000 "$@" > "/tmp/q3_$name.log" 2>&1
  echo "[queue3] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run bench7 env ONBODY_BENCH_N=10000000 python bench.py
run bench6 python bench.py
run e8 python scripts/exp_1e8.py
run prof7 python scripts/profile_phases.py 1e7

run_long() {
  name=$1; shift
  echo "[queue3] START $name $(date +%H:%M:%S)" >&2
  timeout 16000 "$@" > "/tmp/q3_$name.log" 2>&1
  echo "[queue3] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}
run_long pareto bash scripts/run_pareto.sh   # rerun: overflow-aware tuner
echo "[queue3] ALL DONE $(date +%H:%M:%S)" >&2
