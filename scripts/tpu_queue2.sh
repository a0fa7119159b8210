#!/bin/bash
# Serial TPU experiment queue, round-2 continuation (picks up after the
# first queue died with the session at r2g7). One chip — one queue.
cd /root/repo

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

echo "[queue] waiting for TPU tunnel..." >&2
until probe; do
  echo "[queue] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
  sleep 120
done
echo "[queue] tunnel up $(date +%H:%M:%S)" >&2

run() {
  name=$1; shift
  echo "[queue] START $name $(date +%H:%M:%S)" >&2
  timeout 4000 "$@" > "/tmp/q_$name.log" 2>&1
  echo "[queue] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run bench7 env ONBODY_BENCH_N=10000000 python bench.py  # committed-config confirm
run bench6 python bench.py                              # 1e6 confirm
run e8 python scripts/exp_1e8.py                        # 1e8 (memory fix)
run prof7 python scripts/profile_phases.py 1e7          # stage attribution
run r2h python scripts/exp_r2h.py 1e7                   # tree per-level attribution
run lst python scripts/exp_listcost.py                  # rows-builder stage split
run gsz python scripts/exp_gathersize.py                # gather cost vs table size

run_long() {
  name=$1; shift
  echo "[queue] START $name $(date +%H:%M:%S)" >&2
  timeout 16000 "$@" > "/tmp/q_$name.log" 2>&1
  echo "[queue] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}
run_long pareto bash scripts/run_pareto.sh              # theta-Pareto (VERDICT 9)
echo "[queue] ALL DONE $(date +%H:%M:%S)" >&2
