"""Round-2 sweep I: paired tree build (source + target in one program).

The solve builds two same-shape trees back-to-back; every per-level sort
is a separate dispatch over (nseg, m) segments. If per-sort cost is
dominated by fixed overhead (pass setup at full array width — exp_r2h),
stacking both trees' columns into one (2*nseg, m) sort halves the
overhead for the same data volume.

Prototype: reuses _split_step/_box_step by concatenating the two
particle sets as extra segments (targets get a zero strength column so
the variadic operand list matches). Only the finish pass (boxes +
upward stats, are_targets-dependent weights) runs per tree.

Usage: python scripts/exp_r2i.py [N] [block_size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from onbody_tpu import parts as P
from onbody_tpu.parts import pad_to
from onbody_tpu.tree import build as tb


def _sync(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "ndim") and getattr(l, "size", 0)]
    if leaves:
        a = leaves[0]
        np.asarray(a[(0,) * a.ndim])
    return x


def paired_build(srcs, targs, bs, span_top=6, q=2):
    """Both trees from one sequence of stacked sorts."""
    levels, n_pad = tb.plan(srcs.n_real, bs)
    levels_t, n_pad_t = tb.plan(targs.n_real, bs)
    assert (levels, n_pad) == (levels_t, n_pad_t), "paired needs equal N"
    ps = pad_to(srcs, n_pad)
    pt = pad_to(targs, n_pad)
    pd = ps.x.shape[1]
    sd = ps.s.shape[1]
    gidx = jnp.arange(n_pad, dtype=jnp.int32)

    def stack(a, b):
        return jnp.concatenate([a, b])

    cols = tuple(stack(ps.x[:, d], pt.x[:, d]) for d in range(pd))
    cols += (stack(ps.r, pt.r),)
    cols += tuple(stack(ps.s[:, d], jnp.zeros_like(ps.s[:, d]))
                  for d in range(sd))
    cols += (stack(gidx, gidx),)
    n_real = jnp.int32(srcs.n_real)
    assert targs.n_real == srcs.n_real

    # the stacked array is (2*n_pad,): level l of each tree = segments
    # of length n_pad >> l, i.e. level l+1 of the stacked array
    lows, highs = [], []
    l = 0
    while l < levels:
        cols, lo, hi = tb._split_step(cols, n_real, l + 1, pd, True)
        lows.append(lo)
        highs.append(hi)
        l += 1
        if l <= span_top:
            for _ in range(q - 1):
                if l >= levels:
                    break
                lo, hi = tb._box_step(cols, n_real, l + 1, pd)
                lows.append(lo)
                highs.append(hi)
                l += 1
    lo, hi = tb._box_step(cols, n_real, levels + 1, pd)
    lows.append(lo)
    highs.append(hi)

    # split the stacked columns back into the two trees and finish each
    def half(i):
        hcols = tuple(c[i * n_pad:(i + 1) * n_pad] for c in cols)
        hlows = tuple(lo.reshape(2, -1, pd)[i] for lo in lows)
        hhighs = tuple(hi.reshape(2, -1, pd)[i] for hi in highs)
        return hcols, hlows, hhighs

    scols, slo, shi = half(0)
    tree_s, xs, rs, ss, gs = tb._finish_median(
        scols, n_real, slo, shi, levels, bs, sd, False)
    tcols, tlo, thi = half(1)
    # target half: drop the dummy strength column for the finish
    tcols = tcols[:pd + 1] + (tcols[-1],)
    tree_t, xt, rt, st, gt = tb._finish_median(
        tcols, n_real, tlo, thi, levels, bs, 0, True)
    srt = P.Parts(x=xs, r=rs, s=ss, n_real=srcs.n_real)
    trt = P.Parts(x=xt, r=rt, s=None, n_real=targs.n_real)
    return (tree_s, srt, gs), (tree_t, trt, gt)


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync((srcs.x, targs.x))

    def sequential():
        s = tb.build_tree(srcs, bs, mode="span")
        t = tb.build_tree(targs, bs, mode="span")
        return s, t

    def timeit(name, fn):
        r = fn()
        _sync((r[0][0].nc, r[1][0].nc))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn()
            _sync((r[0][0].nc, r[1][0].nc))
            ts.append(time.perf_counter() - t0)
        print(f"{name:>12}: {min(ts):.4f}s", flush=True)
        return r

    rs = timeit("sequential", sequential)
    rp = timeit("paired", lambda: paired_build(srcs, targs, bs))
    # library variants: paired and paired+defer_rs (r/s columns left out
    # of the sort network, gathered once at the end)
    timeit("lib paired", lambda: tb.build_trees_paired(
        srcs, targs, bs, mode="span"))
    timeit("lib pai+def", lambda: tb.build_trees_paired(
        srcs, targs, bs, mode="span", defer_rs=True))
    timeit("seq defer", lambda: (
        tb.build_tree(srcs, bs, mode="span", defer_rs=True),
        tb.build_tree(targs, bs, mode="span", defer_rs=True)))

    # correctness: same trees
    for (ta, _, ga), (tbo, _, gb), nm in [(rs[0], rp[0], "src"),
                                          (rs[1], rp[1], "tgt")]:
        for f in ("nc", "ns", "nr", "x", "s", "pr"):
            a, b = np.asarray(getattr(ta, f)), np.asarray(getattr(tbo, f))
            if not np.allclose(a, b, rtol=1e-5, atol=1e-6):
                print(f"  MISMATCH {nm}.{f}: max {np.abs(a-b).max()}")
                break
        else:
            same_g = bool(jnp.all(ga == gb))
            print(f"  {nm}: trees match, gidx identical={same_g}")


if __name__ == "__main__":
    main()
