"""Round-2 sweep H: per-level tree-build attribution at N=1e7.

exp_r2f showed sort-pass REDUCTION (span variants) saves almost nothing
(13 -> 8 sorts: 2.67 -> 2.39 s), so the 2.7 s tree phase is not
dominated by sort-network depth. This times each build sub-step
individually: the span top split, every per-level _split_step, the box
capture passes, and the upward stats, with a device sync between steps.

Usage: python scripts/exp_r2h.py [N] [block_size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np

from onbody_tpu import parts as P
from onbody_tpu.tree import build as tb


def _sync(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "ndim") and getattr(l, "size", 0)]
    if leaves:
        a = leaves[0]
        np.asarray(a[(0,) * a.ndim])
    return x


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    ks, _ = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    _sync(srcs.x)

    # whole-build reference timing (min of 2)
    def build():
        return tb.build_tree(srcs, bs, mode="span")
    _sync(build()[0].nc)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        _sync(build()[0].nc)
        times.append(time.perf_counter() - t0)
    print(f"whole build_tree (span): {min(times):.4f}s", flush=True)

    # step-by-step: replicate build_tree's internals with syncs.
    # mirror tree/build.py build_tree + _build_median/span internals
    import jax.numpy as jnp
    from onbody_tpu.parts import pad_to

    levels, n_pad = tb.plan(srcs.n_real, bs)
    p = pad_to(srcs, n_pad)
    pd = p.x.shape[1]
    sd = 0 if p.s is None else p.s.shape[1]
    print(f"n_pad={n_pad} levels={levels}", flush=True)

    cols = tuple([p.x[:, d] for d in range(pd)] + [p.r]
                 + ([p.s[:, j] for j in range(sd)] if sd else [])
                 + [jnp.arange(n_pad, dtype=jnp.int32)])
    n_real = jnp.int32(srcs.n_real)

    def timeit(name, fn, *a, **k):
        r = fn(*a, **k)
        _sync(r)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            r = fn(*a, **k)
            _sync(r)
            ts.append(time.perf_counter() - t0)
        print(f"{name:>28}: {min(ts)*1000:8.1f} ms", flush=True)
        return r

    # mirror build_tree's span loop: sort at level l serves levels
    # l..l+q-1 (box-only captures in between), median splits below
    span_top, q = 6, 2
    lows, highs = [], []
    l = 0
    while l < levels:
        def step(c=cols, l=l):
            # _split_step donates cols: feed it fresh copies so the
            # timing loop can re-run (copy cost ~2 ms, noted)
            return tb._split_step(tuple(jnp.copy(a) for a in c),
                                  n_real, l, pd, True)
        cols, lo, hi = timeit(f"sort split l={l:2d} (m=2^{int(np.log2(n_pad))-l})",
                              step)
        lows.append(lo)
        highs.append(hi)
        l += 1
        if l <= span_top:
            for _ in range(q - 1):
                if l >= levels:
                    break
                lo, hi = timeit(f"box-only    l={l:2d}",
                                lambda c=cols, l=l: tb._box_step(
                                    c, n_real, l, pd))
                lows.append(lo)
                highs.append(hi)
                l += 1

    lo, hi = timeit("leaf boxes (_box_step)",
                    lambda: tb._box_step(cols, n_real, levels, pd))
    lows.append(lo)
    highs.append(hi)
    timeit("finish (boxes+upward stats)",
           lambda: tb._finish_median(cols, n_real, tuple(lows),
                                     tuple(highs), levels, bs, sd,
                                     False))


if __name__ == "__main__":
    main()
