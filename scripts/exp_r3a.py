"""Round-2 sweep R3A: list movers + static executor pipeline at 1e7.

Follows the committed 7.00s config (span/o5/t1.2/3x, bs256, W192).
Variants:
  ctrl          — committed config (confirms the 2W-kids change)
  gc-sort       — group_compact='sort' (global group compaction as one
                  stable invalid-last variadic sort instead of the
                  cumsum+scatter; sorts measured 10-20x cheaper movers)
  lc-sort       — list_compact='sort' (per-row frontier compaction)
  both-sort     — both movers sorted
  static-g16    — pair_fetch='static' (fully-static pipeline, per-step
                  output rows + segment-add; loses at 1e6 but the
                  dynamic 3.9us/step floor is ~1.1s at 1e7 pair counts)
  static-g32    — same at pair_group 32

Usage: python scripts/exp_r3a.py [N]
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
from onbody_tpu.config import SolverConfig, tuned_config
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, dtt
from onbody_tpu.traverse.treecode import prepare


def _sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    kernel = get_kernel("grav3d")
    base = tuned_config(n)
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync(srcs.x), _sync(targs.x)

    tskip = max(1, n * n // int(4e11))
    ref = direct.direct_tiled(kernel, targs.x[::tskip], targs.r[::tskip],
                              srcs.x, srcs.r, srcs.s)
    ref = np.asarray(ref, np.float64)
    _sync(ref)

    if n >= 4_000_000:
        # tuned_config already stacks paired+defer/W128/3xt/lc-sort
        variants = [
            ("ctrl stacked", {}),
            ("W112", dict(frontier_width=112)),
            ("W96", dict(frontier_width=96)),
            ("gc-sort", dict(group_compact="sort")),
            ("lc-scatter", dict(list_compact="scatter")),
            ("static-g16", dict(pair_fetch="static")),
        ]
    else:
        # 1e6 class: measure the 1e7 winners one at a time on top of
        # the measured-best 0.369s base (exp_r2g)
        variants = [
            ("ctrl", {}),
            ("W128", dict(frontier_width=128)),
            ("3xt", dict(mxu_precision="3xt")),
            ("lc-sort", dict(list_compact="sort")),
            ("gc-sort", dict(group_compact="sort")),
            ("pair+def g16", dict(tree_paired=True, tree_defer_rs=True)),
            ("all stacked", dict(frontier_width=128,
                                 mxu_precision="3xt",
                                 list_compact="sort",
                                 tree_paired=True, tree_defer_rs=True)),
        ]
    for name, kw in variants:
        cfg = base.replace(**kw)
        try:
            def full():
                if n < 4_000_000:   # fused path, the bench convention
                    (out, inv), info = dtt.solve_dtt_fused(
                        kernel, cfg, srcs, targs, unscramble=False)
                    return inv, out, info
                plan = prepare(kernel, cfg, srcs, targs)
                out, info = dtt.solve_dtt(kernel, cfg, plan,
                                          unscramble=False)
                return plan.tgt_inv, out, info
            inv, out, info = full()   # warm (compile)
            _sync(out)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                inv, out, info = full()
                _sync(out)
                times.append(time.perf_counter() - t0)
            o = np.asarray(out[inv[::tskip]],
                           np.float64)[:ref.shape[0]]
            err = np.sqrt(((o - ref) ** 2).sum() / (ref ** 2).sum())
            print(f"{name:14s} {min(times):7.3f} s  rms {err:.2e}  "
                  f"pairs {int(info.n_valid)}  ov {int(info.overflow)}",
                  flush=True)
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
