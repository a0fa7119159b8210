#!/bin/bash
# Serial TPU experiment queue, round-2 batch 6: fixed 1e8 rerun with a
# warm iteration + per-phase profile, then the 1e7 phase breakdown at
# the committed stack (bench7 measured 4.39 s; find the next target).
cd /root/repo

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

echo "[queue6] waiting for TPU tunnel..." >&2
until probe; do
  echo "[queue6] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
  sleep 120
done
echo "[queue6] tunnel up $(date +%H:%M:%S)" >&2

run() {
  name=$1; tmo=$2; shift 2
  echo "[queue6] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q6_$name.log" 2>&1
  echo "[queue6] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run e8 10000 python scripts/exp_1e8.py
run prof7 4000 python scripts/profile_phases.py 1e7
echo "[queue6] ALL DONE $(date +%H:%M:%S)" >&2
