#!/bin/bash
# Round-3 batch 15: sort-size microbench (prefix-sort decision) +
# g64/theta sweep (chained on queue14).
cd /root/repo

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

while ! grep -q "ALL DONE" /tmp/queue14.log 2>/dev/null; do sleep 60; done

run() {
  name=$1; tmo=$2; shift 2
  until probe; do
    echo "[queue15] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue15] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q15_$name.log" 2>&1
  echo "[queue15] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run sortsize 4000 python scripts/exp_sortsize.py
run r3b 10000 python scripts/exp_r3b.py 1e7

echo "[queue15] ALL DONE $(date +%H:%M:%S)" >&2
