#!/bin/bash
# Round-2 batch 11: vortex-workload DTT benches (chained on queue10).
cd /root/repo

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

while ! grep -q "ALL DONE" /tmp/queue10.log 2>/dev/null; do sleep 60; done

echo "[queue11] waiting for TPU tunnel..." >&2
until probe; do
  echo "[queue11] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
  sleep 120
done
echo "[queue11] tunnel up $(date +%H:%M:%S)" >&2

run() {
  name=$1; tmo=$2; shift 2
  echo "[queue11] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q11_$name.log" 2>&1
  echo "[queue11] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run vort6 8000 python scripts/exp_vort.py 1e6
run vort7 10000 python scripts/exp_vort.py 1e7
echo "[queue11] ALL DONE $(date +%H:%M:%S)" >&2
