#!/bin/bash
# Round-2 batch 25 (session 12): 1e8 environment disambiguation — the
# dma_i variant RESOURCE_EXHAUSTED three times (now localized to the
# SOURCE tree build, before any fetch-dependent code, with the tunnel
# severely degraded: direct ref 552 s vs 88 s in the morning run). A
# pregather CONTROL (the configuration that succeeded at 13:30) tells
# environment from regression; the dma retry follows. Chains after
# queue24.
cd /root/repo

until grep -q "ALL DONE" /tmp/queue24.log 2>/dev/null; do
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
    echo "[queue25] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue25] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q25_$name.log" 2>&1
  echo "[queue25] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run e8ctrl 12000 python scripts/exp_1e8.py 1e8 16 1.2 pregather 16
run e8dma15 12000 python scripts/exp_1e8.py 1e8 16 1.15 dma_i 32

echo "[queue25] ALL DONE $(date +%H:%M:%S)" >&2
