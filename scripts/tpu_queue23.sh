#!/bin/bash
# Round-2 batch 23 (session 12): vortgrad3d accuracy bisect (precision
# x fetch x backend at 1e6 — q21 shows 3.9e-3 on the tuned stack vs
# 6.1e-5 on the CPU jnp executor at 3e4) and the small-N width smoke
# (tuned_config gained a generous n<=3e5 tier after the 1e5 overflow).
# Chains after queue22.
cd /root/repo

until grep -q "ALL DONE" /tmp/queue22.log 2>/dev/null; do
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
    echo "[queue23] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue23] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q23_$name.log" 2>&1
  echo "[queue23] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run vgprec6 9000 python scripts/exp_vgprec.py 1e6
run vortsmoke 3000 python scripts/exp_vort.py 1e5

echo "[queue23] ALL DONE $(date +%H:%M:%S)" >&2
