"""Round-2 sweep Q: span group size (levels-per-sort) at 1e7.

The span build sorts every `tree_span` levels; passes scale with
log^2(segment), so q=3/4 cuts top-sort passes ~25% at the price of
transiently elongated intermediate boxes (aspect 2^q along the split
axis). Elongation at MAC-critical depths widens the frontier —
overflow and rms are printed so losers are self-evident.

Usage: python scripts/exp_r2q.py [N]
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


def _sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]))


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
                frontier_width=192, cap_groups_dtt=16,
                tree_mode="span", pair_backend="pallas", pair_group=16,
                pair_fetch="dma", mxu_precision="3x", lean_plan=True,
                tree_paired=True, tree_defer_rs=True)
    variants = [
        ("q2 top6 ctrl", dict(tree_span=2, tree_span_top=6)),
        ("q3 top6", dict(tree_span=3, tree_span_top=6)),
        ("q4 top4", dict(tree_span=4, tree_span_top=4)),
        ("q3 top9", dict(tree_span=3, tree_span_top=9)),
        ("q4 top8", dict(tree_span=4, tree_span_top=8)),
        # bisect: exact medians, ONE sort per g levels at every depth.
        # CPU-measured pair volume == median's (span's is +5.6%)
        ("bisect g4", dict(tree_mode="bisect")),
        ("bisect g3", dict(tree_mode="bisect", tree_bisect_group=3)),
    ]

    for name, over in variants:
        cfg = SolverConfig(**{**base, **over})
        try:
            holder = {}

            def run():
                plan = treecode.prepare(kernel, cfg, srcs, targs)
                holder["inv"] = plan.tgt_inv
                return dtt.solve_dtt(kernel, cfg, plan, unscramble=False)
            out, info = run()
            _sync(out)
            ov = int(np.asarray(info.overflow))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out, info = run()
                _sync(out)
                ts.append(time.perf_counter() - t0)
            got = np.asarray(out[holder["inv"][::nt_skip]])[:ref.shape[0]]
            rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            print(f"{name:>16}: t={min(ts):.3f}s rms={rms:.2e} "
                  f"overflow={ov}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>16}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
