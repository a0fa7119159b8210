#!/bin/bash
# Round-2 batch 24 (session 12): vortex coverage re-measurement at the
# fixed stack — vortgrad3d oB clamped to the 6xt full-mantissa tier,
# vort2d theta 1.4, vortgrad3d large-N on dma_i (8-row aligned lean
# layout; the pregather path measured 17.5 s at 1e7). Chains after
# queue23.
cd /root/repo

until grep -q "ALL DONE" /tmp/queue23.log 2>/dev/null; do
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
    echo "[queue24] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue24] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q24_$name.log" 2>&1
  echo "[queue24] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run vort6 6000 python scripts/exp_vort.py 1e6
run vort7 10000 python scripts/exp_vort.py 1e7

echo "[queue24] ALL DONE $(date +%H:%M:%S)" >&2
