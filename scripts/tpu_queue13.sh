#!/bin/bash
# Round-2 batch 13: 1e8 rerun at the verified cap (chained on queue12).
cd /root/repo

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

while ! grep -q "ALL DONE" /tmp/queue12.log 2>/dev/null; do sleep 60; done

echo "[queue13] waiting for TPU tunnel..." >&2
until probe; do
  echo "[queue13] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
  sleep 120
done
echo "[queue13] tunnel up $(date +%H:%M:%S)" >&2

run() {
  name=$1; tmo=$2; shift 2
  echo "[queue13] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q13_$name.log" 2>&1
  echo "[queue13] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run e8 10000 python scripts/exp_1e8.py

echo "[queue13] ALL DONE $(date +%H:%M:%S)" >&2
