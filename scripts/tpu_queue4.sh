#!/bin/bash
# Serial TPU experiment queue, round-2 batch 4: 1e8 retry (flat fm +
# jitted chunk step), tree-fuse sweep, then the fixed Pareto tuner.
cd /root/repo
rm -f new.dat

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

echo "[queue4] waiting for TPU tunnel..." >&2
until probe; do
  echo "[queue4] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
  sleep 120
done
echo "[queue4] tunnel up $(date +%H:%M:%S)" >&2

run() {
  name=$1; tmo=$2; shift 2
  echo "[queue4] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q4_$name.log" 2>&1
  echo "[queue4] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run e8 6000 python scripts/exp_1e8.py
run fuse7 4000 python scripts/exp_fuse.py 1e7
run pareto 16000 bash scripts/run_pareto.sh
echo "[queue4] ALL DONE $(date +%H:%M:%S)" >&2
