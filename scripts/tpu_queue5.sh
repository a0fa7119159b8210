#!/bin/bash
# Serial TPU experiment queue, round-2 batch 5: 1e8 retry after the
# featurize-peak fixes (chunked leaf featurize + donated sorted arrays),
# then committed-config bench confirms at 1e7 and 1e6.
cd /root/repo

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
a = jnp.arange(8.0)
assert float(np.asarray((a * a)[3])) == 9.0
PYEOF
}

echo "[queue5] waiting for TPU tunnel..." >&2
until probe; do
  echo "[queue5] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
  sleep 120
done
echo "[queue5] tunnel up $(date +%H:%M:%S)" >&2

run() {
  name=$1; tmo=$2; shift 2
  echo "[queue5] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q5_$name.log" 2>&1
  echo "[queue5] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run e8 7200 python scripts/exp_1e8.py
run bench7 3600 env ONBODY_BENCH_N=1e7 python bench.py
run bench6 1800 python bench.py
echo "[queue5] ALL DONE $(date +%H:%M:%S)" >&2
