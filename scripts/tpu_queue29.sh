#!/bin/bash
# Round-2 batch 29 (session 14): measure the explicit bitonic network
# for short tree-level segment sorts (commit 32f145b) — the tree phase
# is 2.23 s of the 1e7 profile and the lax.sort schedule is at the
# primitive's flat ~7 ns/row; the network should undercut it for the
# bottom levels (m <= threshold). Sweep the threshold at 1e7 via
# exp_treecost + one full profile at the best, then a 1e6 check.
# Chains after queue28.
cd /root/repo

until grep -q "ALL DONE" /tmp/queue28.log 2>/dev/null; do
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
    echo "[queue29] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue29] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q29_$name.log" 2>&1
  echo "[queue29] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run tree7_b0 2400 python scripts/exp_treecost.py 1e7
run tree7_b2k 2400 env ONBODY_BITONIC_M=2048 python scripts/exp_treecost.py 1e7
run tree7_b8k 2400 env ONBODY_BITONIC_M=8192 python scripts/exp_treecost.py 1e7
run tree7_b32k 2400 env ONBODY_BITONIC_M=32768 python scripts/exp_treecost.py 1e7
run prof7_b8k 3000 env ONBODY_BITONIC_M=8192 python scripts/profile_phases.py 1e7
run bench7_b8k 3000 env ONBODY_BITONIC_M=8192 ONBODY_BENCH_N=10000000 python bench.py
run bench6_b8k 2000 env ONBODY_BITONIC_M=8192 python bench.py

echo "[queue29] ALL DONE $(date +%H:%M:%S)" >&2
