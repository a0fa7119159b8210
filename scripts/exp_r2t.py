"""Round-2 sweep T: transposed MXU contraction at 1e7.

_dotg_fm's (B_t, B_s)x(F, B_s)->(B_t, F) lane-pads F to 128: the pass
count is the cost (~0.4 s/pass measured). The '3xt' mode computes the
transpose (F, B_t) instead — F <= 8 lands on ONE sublane tile and the
output fills all 128 lanes. If the MXU streams M rows, a pass costs
F/128 of the padded form; if M also tiles to 128, nothing changes.
This sweep is that measurement (plus the one-pass 'defaultt' floor).

Usage: python scripts/exp_r2t.py [N]
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
                pair_fetch="dma", lean_plan=True,
                tree_paired=True, tree_defer_rs=True)
    variants = [
        ("3x ctrl", dict(mxu_precision="3x")),
        ("3xt", dict(mxu_precision="3xt")),
        ("defaultt (floor)", dict(mxu_precision="defaultt")),
        ("3x sort-compact", dict(mxu_precision="3x",
                                 list_compact="sort")),
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
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out, info = run()
                _sync(out)
                ts.append(time.perf_counter() - t0)
            got = np.asarray(out[holder["inv"][::nt_skip]])[:ref.shape[0]]
            rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            print(f"{name:>18}: t={min(ts):.3f}s rms={rms:.2e} "
                  f"overflow={int(np.asarray(info.overflow))}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>18}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
