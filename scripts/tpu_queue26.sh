#!/bin/bash
# Round-2 batch 26 (session 13): sibling-paired leaf execution
# (dtt_leaf_pair2, commit ac6551a) at the bench sizes, then the 1e8
# pregather control retry — q25 failed BOTH 1e8 configs with
# RESOURCE_EXHAUSTED in the tree builds while q19 ran the identical
# pregather control to 64.76 s, and the q25 runs also saw 650 s tree
# phases (recompile + degraded tunnel). A clean-tunnel retry separates
# environment from regression. Chains after queue25.
cd /root/repo

until grep -q "ALL DONE" /tmp/queue25.log 2>/dev/null; do
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
    echo "[queue26] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue26] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q26_$name.log" 2>&1
  echo "[queue26] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run p2_7 4000 python scripts/exp_p2.py 1e7
run p2_6 2400 python scripts/exp_p2.py 1e6
run e8ctrl 12000 python scripts/exp_1e8.py 1e8 16 1.2 pregather 16

echo "[queue26] ALL DONE $(date +%H:%M:%S)" >&2
