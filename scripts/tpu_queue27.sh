#!/bin/bash
# Round-2 batch 27 (session 13): confirm the adopted pair2 g16 tier —
# phase profile at 1e7 (now with n_live slicing + sltl split), vortex
# workloads at 1e7 through the same tier, and a bench.py 1e7 confirm.
# Chains after queue26.
cd /root/repo

until grep -q "ALL DONE" /tmp/queue26.log 2>/dev/null; do
  sleep 120
done

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

run() {
  name=$1; tmo=$2; shift 2
  until probe; do
    echo "[queue27] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue27] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q27_$name.log" 2>&1
  echo "[queue27] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run profile7 4000 python scripts/profile_phases.py 1e7
run vort7 6000 python scripts/exp_vort.py 1e7
run bench7 3000 env ONBODY_BENCH_N=10000000 python bench.py

echo "[queue27] ALL DONE $(date +%H:%M:%S)" >&2
