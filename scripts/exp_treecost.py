"""Attribute the paired tree-build time at N (default 1e7) on TPU.

Times, warm and with true syncs:
  (a) build_trees_paired end-to-end (the production path),
  (b) each fused _run_steps dispatch of its schedule (sort network),
  (c) the two _finish_median assemblies,
  (d) a raw stacked lax.sort of the same live shape/payload as one
      level-0 split step (the primitive floor),
  (e) the deferred r/s final gathers.

Usage: python scripts/exp_treecost.py [N]
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
from onbody_tpu.config import tuned_config
from onbody_tpu.tree import build as tb


def _sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    cfg = tuned_config(n)
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync(srcs.x)
    _sync(targs.x)

    # ONBODY_TREE_FUSE overrides the tuned fuse width (the bitonic
    # network multiplies per-step intermediates; big fused dispatches
    # can OOM at compile — r3 sweep 1)
    fuse_ov = os.environ.get("ONBODY_TREE_FUSE")
    if fuse_ov:
        cfg = cfg.replace(tree_fuse=int(fuse_ov))
    kw = dict(block_size=cfg.block_size, mode=cfg.tree_mode,
              span=cfg.tree_span, span_top=cfg.tree_span_top,
              defer_rs=cfg.tree_defer_rs, fuse=cfg.tree_fuse)

    # (a) end-to-end paired build
    for it in range(3):
        t0 = time.perf_counter()
        st, ss, sg2 = (None, None, None)
        out = tb.build_trees_paired(srcs, targs, **kw)
        _sync(out[0][0].nc)
        dt = time.perf_counter() - t0
        if it:
            print(f"paired build end-to-end: {dt:.3f} s", flush=True)

    # (b) schedule step timing — rebuild the same column state the
    # paired build starts from and walk its schedule with syncs
    levels, n_pad = tb.plan(srcs.n_real, cfg.block_size)
    pps = tb.pad_to(srcs, n_pad)
    ppt = tb.pad_to(targs, n_pad)
    gidx = jnp.arange(n_pad, dtype=jnp.int32)
    cols = tuple(jnp.concatenate([pps.x[:, d], ppt.x[:, d]])
                 for d in range(3))
    cols = cols + (jnp.concatenate([gidx, gidx]),)
    n_real = jnp.int32(srcs.n_real)
    sched = tb._build_schedule(levels, levels, n_pad, cfg.tree_span,
                               cfg.tree_span_top, None, srcs.n_real, 2,
                               loff=1)
    fuse = max(1, cfg.tree_fuse)
    # warm
    c2 = cols
    for i in range(0, len(sched), fuse):
        c2, _ = tb._run_steps(tuple(jnp.copy(c) for c in c2) if i == 0
                              else c2, n_real, tuple(sched[i:i + fuse]), 3)
    _sync(c2[0])
    c2 = tuple(jnp.copy(c) for c in cols)
    total_sched = 0.0
    for i in range(0, len(sched), fuse):
        t0 = time.perf_counter()
        c2, _ = tb._run_steps(c2, n_real, tuple(sched[i:i + fuse]), 3)
        _sync(c2[0])
        dt = time.perf_counter() - t0
        total_sched += dt
        kinds = ",".join(f"{k[0]}{k[1]}" for k in sched[i:i + fuse])
        print(f"  steps [{kinds}]: {dt*1e3:7.1f} ms", flush=True)
    print(f"schedule total (stacked x2 trees): {total_sched:.3f} s",
          flush=True)

    # (d) raw stacked lax.sort floor at the same shape: 4 columns,
    # live rows only (one segment pair at level 1 of the paired build)
    live = cols[0].shape[0]
    raw = tuple(jnp.copy(c) for c in cols)

    @jax.jit
    def rawsort(c):
        return jax.lax.sort(c, dimension=0, num_keys=1)

    o = rawsort(raw)
    _sync(o[0])
    t0 = time.perf_counter()
    o = rawsort(raw)
    _sync(o[0])
    print(f"raw global lax.sort ({live} rows x 4 cols): "
          f"{time.perf_counter() - t0:.3f} s", flush=True)


if __name__ == "__main__":
    main()
