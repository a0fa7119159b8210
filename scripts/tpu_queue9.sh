#!/bin/bash
# Round-2 batch 9: interleaved-issue exec kernel sweep at 1e7.
cd /root/repo

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

while ! grep -q "ALL DONE" /tmp/queue8.log 2>/dev/null; do sleep 60; done

echo "[queue9] waiting for TPU tunnel..." >&2
until probe; do
  echo "[queue9] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
  sleep 120
done
echo "[queue9] tunnel up $(date +%H:%M:%S)" >&2

run() {
  name=$1; tmo=$2; shift 2
  echo "[queue9] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q9_$name.log" 2>&1
  echo "[queue9] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run dmai 8000 python scripts/exp_dmai.py 1e7
echo "[queue9] ALL DONE $(date +%H:%M:%S)" >&2
