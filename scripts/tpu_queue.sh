#!/bin/bash
# Serial TPU experiment queue for the single axon chip. Waits for the
# tunnel to answer a trivial op, then runs every pending round-2
# experiment back-to-back (one chip — never run two at once).
# Ordered most-valuable-first in case the tunnel flaps again.
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

ONBODY_R2K_GROUPS="16,32,64" run r2k python scripts/exp_r2k.py 1e7  # combined confirm + group size
run r2w python scripts/exp_r2w.py 1e7        # frontier width at o5/t1.2
run r2b5 python scripts/exp_r2b5.py 1e7      # bs512 + looser theta
run r2q python scripts/exp_r2q.py 1e7        # span group size (sort passes)
run r2t python scripts/exp_r2t.py 1e7        # transposed MXU contraction
run e8 python scripts/exp_1e8.py             # 1e8 measured number (VERDICT 5)
run r2g6 python scripts/exp_r2g.py 1e6       # 1e6 retune (VERDICT 10)
run ablate7 python scripts/exp_ablate.py 1e7 # stage attribution at 7.0s cfg
run r2i python scripts/exp_r2i.py            # paired/defer build timing
run r2g7 python scripts/exp_r2g.py 1e7       # group size + b128 at 1e7
run r2h python scripts/exp_r2h.py            # tree per-level attribution
run gsz python scripts/exp_gathersize.py     # gather cost vs table size
run lst python scripts/exp_listcost.py       # rows-builder stage split

run_long() {
  name=$1; shift
  echo "[queue] START $name $(date +%H:%M:%S)" >&2
  timeout 16000 "$@" > "/tmp/q_$name.log" 2>&1
  echo "[queue] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}
run bench7 env ONBODY_BENCH_N=10000000 python bench.py  # committed-config confirm
run bench6 python bench.py
run_long pareto bash scripts/run_pareto.sh        # theta-Pareto (VERDICT 9)
echo "[queue] ALL DONE $(date +%H:%M:%S)" >&2
