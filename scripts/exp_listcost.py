"""Microbench: DTT rows-builder primitives at 1e7 deep-level shapes.

The list phase was 2.47 s at 1e7/bs256/W192 (exp_ablate) but the naive
bandwidth model says the frontier only moves a few GB — something is
paying far above bandwidth. Stages timed separately at the dominant
(deepest-level) shape, (nt, W) = (65536, 192):

  gather   — u64 geometry lookup per candidate (1 MB table)
  classify — MAC arithmetic on gathered geometry
  compact  — _compact_rows on the (nt, 3W) children array
  children — concat(2*cand, 2*cand+1, keep) + repeat(nxt, 2)
  sortcmp  — lane-dim sort alternative to compact (is the scatter or
             the sort the better mover at this shape?)

Usage: python scripts/exp_listcost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from onbody_tpu.traverse import lists


def _sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]).real)


def bench(fn, *args, k=16):
    r = fn(*args)
    _sync(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(k):
            r = fn(*args)
        _sync(r)
        ts.append((time.perf_counter() - t0) / k)
    return min(ts)


def main():
    nt, W = 65536, 192
    key = jax.random.PRNGKey(0)
    nn = 1 << 17
    cand = jax.random.randint(key, (nt, W), 1, nn, jnp.int32)
    cand = jnp.where(jax.random.uniform(key, (nt, W)) < 0.35, cand, 0)
    tbl = jax.lax.complex(
        jax.random.normal(key, (nn,), jnp.float32),
        jax.random.normal(key, (nn,), jnp.float32))
    tcm = jax.random.normal(key, (nt, 4), jnp.float32)

    @jax.jit
    def gather(cand):
        return tbl[cand].real.sum()

    @jax.jit
    def classify(cand):
        g = tbl[cand]
        dx = g.real - tcm[:, None, 0]
        dy = g.imag - tcm[:, None, 1]
        d2 = dx * dx + dy * dy
        sep = d2 > (1.2 * (g.imag + tcm[:, None, 2])) ** 2
        return ((cand != 0) & sep).sum()

    kids3 = jnp.concatenate([2 * cand, 2 * cand + 1, cand], axis=1)

    @jax.jit
    def compact(kids3):
        out, ov = lists._compact_rows(kids3, W)
        return out.sum() + ov

    @jax.jit
    def children(cand):
        expand = cand != 0
        kids = jnp.concatenate(
            [jnp.where(expand, 2 * cand, 0),
             jnp.where(expand, 2 * cand + 1, 0)], axis=1)
        return jnp.repeat(kids[:, :W], 2, axis=0).sum()

    @jax.jit
    def sortcmp(kids3):
        # front-compaction by lane sort: key puts zeros last, stable
        key = jnp.where(kids3 != 0, 0, 1).astype(jnp.int32)
        out = jax.lax.sort((key, kids3), dimension=1, num_keys=1,
                           is_stable=True)[1]
        return out[:, :W].sum()

    for name, fn, a in [("gather", gather, cand),
                        ("classify", classify, cand),
                        ("compact", compact, kids3),
                        ("children", children, cand),
                        ("sortcmp", sortcmp, kids3)]:
        dt = bench(fn, a)
        print(f"{name:>9}: {dt * 1e3:7.2f} ms "
              f"({dt / (nt * W) * 1e9:6.2f} ns/slot)", flush=True)


if __name__ == "__main__":
    main()
