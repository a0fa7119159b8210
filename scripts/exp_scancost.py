"""Microbench: global 1-D cumsum / cummax / scatter at flat-list scales,
vs a hierarchical 2-level scan. Decides whether the flat DTT builder's
primitives are the 1e7 regression.

Usage: python scripts/exp_scancost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def bench(fn, *args, iters=3, k=16):
    r = fn(*args)
    _sync(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(k):
            r = fn(*args)
        _sync(r)
        ts.append((time.perf_counter() - t0) / k)
    return min(ts)


@jax.jit
def cumsum1d(x):
    return jnp.cumsum(x)


@jax.jit
def cummax1d(x):
    return jax.lax.cummax(x)


@jax.jit
def cumsum2l(x):
    n = x.shape[0]
    c = 2048
    x2 = x.reshape(-1, c)
    inner = jnp.cumsum(x2, axis=1)
    rows = inner[:, -1]
    offs = jnp.cumsum(rows) - rows
    return (inner + offs[:, None]).reshape(n)


@jax.jit
def scatter1d(vals, idx, n):
    return jnp.zeros((vals.shape[0] + 1,), vals.dtype).at[idx].set(
        vals, mode="drop")


def main():
    for n in [1 << 20, 1 << 23]:
        key = jax.random.PRNGKey(0)
        x = jax.random.randint(key, (n,), 0, 2, jnp.int32)
        idx = jax.random.randint(key, (n,), 0, n, jnp.int32)
        t1 = bench(cumsum1d, x)
        t2 = bench(cumsum2l, x)
        t3 = bench(cummax1d, x)
        t4 = bench(scatter1d, x, idx, n)
        print(f"n=2^{int(np.log2(n))}: cumsum1d={t1*1e3:7.2f}ms "
              f"cumsum2l={t2*1e3:7.2f}ms cummax={t3*1e3:7.2f}ms "
              f"scatter={t4*1e3:7.2f}ms", flush=True)


if __name__ == "__main__":
    main()
