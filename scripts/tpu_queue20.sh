#!/bin/bash
# Round-2 batch 20 (session 12): Mosaic lowering fixes for the vortex
# fm tiles (vort3d 1D-gather slice, vortgrad3d rank-2 recombination) —
# smoke first at 1e5 to fail fast, then the 1e6/1e7 coverage rows; the
# 1e8 dma_i retry (lists_top now built before the pad8 featurize); a
# fresh 1e7 phase attribution (pad8 flag fixed, live-prefix
# _upward_stats in); and a 1e7 bench confirm of the working tree.
cd /root/repo

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
    echo "[queue20] tunnel down $(date +%H:%M:%S), retrying in 120s" >&2
    sleep 120
  done
  echo "[queue20] START $name $(date +%H:%M:%S)" >&2
  timeout "$tmo" "$@" > "/tmp/q20_$name.log" 2>&1
  echo "[queue20] DONE $name exit=$? $(date +%H:%M:%S)" >&2
}

run vortsmoke 3000 python scripts/exp_vort.py 1e5
run vort6 6000 python scripts/exp_vort.py 1e6
run vort7 10000 python scripts/exp_vort.py 1e7
run profile7 6000 python scripts/profile_phases.py 1e7
run e8dma15 12000 python scripts/exp_1e8.py 1e8 16 1.15 dma_i 32
run bench7 6000 env ONBODY_BENCH_N=10000000 python bench.py
run bench6 3000 env ONBODY_BENCH_N=1000000 python bench.py

echo "[queue20] ALL DONE $(date +%H:%M:%S)" >&2
