"""Microbench: TPU gather throughput vs lookup-table size.

The DTT list classify does one u64 gather per candidate slot from a
node-geometry table indexed by global node id (2*NN entries). If gather
cost falls with table size (VMEM-resident tables), the classifier could
slice each level's subtable and gather with level-relative ids.

Dispatch k=16 back-to-back, sync once (tunnel-safe); prints ns/elem.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]).real)


def main():
    n = 1 << 23                       # 8.4M lookups (1e7-scale classify)
    key = jax.random.PRNGKey(0)
    for logt in (10, 13, 16, 19, 22, 24):
        t = 1 << logt
        tbl = jax.random.normal(key, (t,), jnp.float32)
        tblc = jax.lax.complex(tbl, tbl)               # 8B payload
        idx = jax.random.randint(key, (n,), 0, t, jnp.int32)

        @jax.jit
        def f(tblc, idx):
            return tblc[idx].real.sum()

        r = f(tblc, idx)
        _sync(r)
        t0 = time.perf_counter()
        rs = [f(tblc, idx) for _ in range(16)]
        _sync(rs[-1])
        dt = (time.perf_counter() - t0) / 16
        print(f"table 2^{logt:>2}: {dt * 1e3:7.2f} ms "
              f"({dt / n * 1e9:.2f} ns/elem)", flush=True)


if __name__ == "__main__":
    main()
