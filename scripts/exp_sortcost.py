"""Micro-benchmark: per-level cost candidates for the tree build on TPU.

Compares (a) the current batched segmented argsort + payload gather,
(b) a stable segmented partition by a precomputed boolean flag
(gather + cumsum + scatter per ordering, the per-level cost of the
presorted-axes kd-build), and (c) a raw global sort, at N=1e6/1e7.

Usage: python scripts/exp_sortcost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def _sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


@partial(jax.jit, static_argnames=("nseg",))
def seg_argsort_gather(keys, payload, nseg: int):
    n = keys.shape[0]
    m = n // nseg
    order = jnp.argsort(keys.reshape(nseg, m), axis=1)
    base = (jnp.arange(nseg, dtype=order.dtype) * m)[:, None]
    flat = (order + base).reshape(-1)
    return payload[flat]


@partial(jax.jit, static_argnames=("nseg",))
def seg_partition3(flag_by_slot, ords, nseg: int):
    """Stable partition of three id-orderings by a per-slot flag."""
    n = ords[0].shape[0]
    m = n // nseg
    outs = []
    for o in ords:
        f = flag_by_slot[o].reshape(nseg, m)          # gather
        left = jnp.cumsum(f.astype(jnp.int32), axis=1) - 1
        right = (jnp.cumsum((~f).astype(jnp.int32), axis=1) - 1
                 + jnp.sum(f, axis=1, keepdims=True))
        pos = jnp.where(f, left, right)
        base = (jnp.arange(nseg, dtype=jnp.int32) * m)[:, None]
        flat = (pos + base).reshape(-1)
        out = jnp.zeros((n,), o.dtype).at[flat].set(o.reshape(-1))
        outs.append(out)
    return tuple(outs)


def bench(fn, *args, iters=3, k=16):
    """Per-call time from k back-to-back async dispatches + ONE sync
    (a single sync through the tunnel costs ~30ms, which would otherwise
    swamp per-call costs of a few ms)."""
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


@partial(jax.jit, static_argnames=("nseg",))
def seg_argsort_only(keys, nseg: int):
    n = keys.shape[0]
    return jnp.argsort(keys.reshape(nseg, n // nseg), axis=1)


@partial(jax.jit, static_argnames=("nseg", "cols"))
def seg_sortkv(keys, payload, nseg: int, cols: int):
    """Variadic sort: payload columns ride through the sort network."""
    n = keys.shape[0]
    m = n // nseg
    ops = [keys.reshape(nseg, m)] + [payload[:, i].reshape(nseg, m)
                                     for i in range(cols)]
    out = jax.lax.sort(tuple(ops), dimension=1, num_keys=1)
    return out[1]


@partial(jax.jit, static_argnames=("cols",))
def gather_only(payload, idx, cols: int):
    return payload[:, :cols][idx]


def main():
    for n in [1 << 20, 1 << 23]:
        k = jax.random.PRNGKey(0)
        keys = jax.random.uniform(k, (n,), jnp.float32)
        payload = jax.random.uniform(k, (n, 7), jnp.float32)
        idx = jnp.asarray(np.random.permutation(n).astype(np.int32))
        for nseg in [1, 64, 4096]:
            t1 = bench(seg_argsort_gather, keys, payload, nseg)
            t3 = bench(seg_argsort_only, keys, nseg)
            t4 = bench(seg_sortkv, keys, payload, nseg, 7)
            t5 = bench(seg_sortkv, keys, payload, nseg, 3)
            print(f"n=2^{int(np.log2(n))} nseg={nseg:5d}: "
                  f"argsort+gather7={t1*1e3:7.2f}ms  "
                  f"argsort={t3*1e3:7.2f}ms  "
                  f"sortkv7={t4*1e3:7.2f}ms  sortkv3={t5*1e3:7.2f}ms",
                  flush=True)
        t6 = bench(gather_only, payload, idx, 7)
        t7 = bench(gather_only, payload, idx, 1)
        print(f"n=2^{int(np.log2(n))}: gather7={t6*1e3:7.2f}ms "
              f"gather1={t7*1e3:7.2f}ms", flush=True)


if __name__ == "__main__":
    main()
