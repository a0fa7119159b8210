#!/bin/bash
# Round-2 batch 22 (session 12): tree/exec structure sweep at 1e7 —
# span-3/4 top splits (fewer full-array sorts; top fused dispatch is
# 0.92 s of the 1.83 s build) and block-size 128 at o4/o5 (the
# reference's own granularity halves near-field pair volume; never
# measured against the dma_i + prefix-sort stack). Chains after
# queue21 (waits for its ALL DONE) to keep single-chip discipline.
cd /root/repo

until grep -q "ALL DONE" /tmp/queue21.log 2>/dev/null; do
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
    echo "[queue22] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue22] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q22_$name.log" 2>&1
  echo "[queue22] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run r5tree6 6000 python scripts/exp_r5tree.py 1e6
run r5tree7 12000 python scripts/exp_r5tree.py 1e7

echo "[queue22] ALL DONE $(date +%H:%M:%S)" >&2
