#!/bin/bash
# Round-2 batch 8: tree-build attribution at 1e7, then 1e8 with 8
# chunks (fixed-cost halving after the featurize-peak fix).
cd /root/repo

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

# wait for queue7 to finish (serial TPU access): queue7 logs its
# ALL DONE line when complete
while ! grep -q "ALL DONE" /tmp/queue7.log 2>/dev/null; do sleep 60; done

echo "[queue8] waiting for TPU tunnel..." >&2
until probe; do
  echo "[queue8] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
  sleep 120
done
echo "[queue8] tunnel up $(date +%H:%M:%S)" >&2

run() {
  name=$1; tmo=$2; shift 2
  echo "[queue8] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q8_$name.log" 2>&1
  echo "[queue8] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run treecost 4000 python scripts/exp_treecost.py 1e7
run e8c8 10000 python scripts/exp_1e8.py 1e8 8
echo "[queue8] ALL DONE $(date +%H:%M:%S)" >&2
