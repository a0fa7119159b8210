"""Round-2 sweep F at N=1e7: tree-build sort-pass reduction.

Every bitonic compare-exchange pass touches the whole array regardless
of segment size, so BOTTOM-level sorts cost as much as mid-level ones.
Variants sweep span_top deeper and span_bot (multi-way splits from a
level down). Geometry risk: span levels split one axis 4-ways, so
span_bot fattens LEAF boxes -> near-field pair volume; the solve time +
pair count is the real metric, tree time alone the diagnostic.

At bs256/1e7 (levels=16, q=2): top6 = 13 sorts/tree (ctrl), top10 = 11,
bot12/top6 = 11, bot10/top6 = 10, bot8/top8 = 8.

Usage: python scripts/exp_r2f.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np

from onbody_tpu import parts as P
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, dtt, treecode
from onbody_tpu.tree import build as tb


def _sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    kernel = get_kernel("grav3d")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync((srcs.x, targs.x))

    nt_skip = max(1, n // 20000)
    sub = P.Parts(x=targs.x[::nt_skip], r=targs.r[::nt_skip], s=None,
                  n_real=int(targs.x[::nt_skip].shape[0]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    base = dict(block_size=256, order=5, theta_dtt=1.2,
                frontier_width=192, cap_groups_dtt=16, tree_mode="span",
                pair_backend="pallas", pair_group=16, pair_fetch="dma",
                mxu_precision="3x")
    variants = [
        ("top6 ctrl", dict(tree_span_top=6)),
        ("top10", dict(tree_span_top=10)),
        ("top6 bot12", dict(tree_span_top=6, tree_span_bot=12)),
        ("top6 bot10", dict(tree_span_top=6, tree_span_bot=10)),
        ("top8 bot8", dict(tree_span_top=8, tree_span_bot=8)),
    ]
    for name, kw in variants:
        cfg = SolverConfig(**base, **kw)
        try:
            # tree-build-only timing (both trees), min of 2
            def trees():
                st, _, _ = tb.build_tree(srcs, cfg.block_size,
                                         mode="span", span=cfg.tree_span,
                                         span_top=cfg.tree_span_top,
                                         span_bot=cfg.tree_span_bot)
                tt, _, _ = tb.build_tree(targs, cfg.block_size,
                                         mode="span", span=cfg.tree_span,
                                         span_top=cfg.tree_span_top,
                                         span_bot=cfg.tree_span_bot)
                return st, tt
            # sync on the SECOND tree: device execution is in-order, so
            # fetching from the last dispatched result syncs both builds
            _sync(trees()[1].nc)
            tt_times = []
            for _ in range(2):
                t0 = time.perf_counter()
                _sync(trees()[1].nc)
                tt_times.append(time.perf_counter() - t0)

            def full():
                plan = treecode.prepare(kernel, cfg, srcs, targs)
                return dtt.solve_dtt(kernel, cfg, plan)
            out, info = full()
            _sync(out)
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                out, info = full()
                _sync(out)
                times.append(time.perf_counter() - t0)
            rms = (np.linalg.norm(np.asarray(out)[::nt_skip] - ref)
                   / np.linalg.norm(ref))
            print(f"{name:>12}: trees={min(tt_times):.3f}s "
                  f"full={min(times):.4f}s rms={rms:.2e} "
                  f"nvalid={int(info.n_valid)} "
                  f"overflow={int(info.overflow)}", flush=True)
        except Exception as e:
            print(f"{name:>12}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
