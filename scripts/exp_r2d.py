"""Round-2 sweep D at N=1e7: manual MXU pass tiers + split-row bs128.

Sweep C found Mosaic rejects Precision.HIGH, and that dropping the
source-contraction matmuls from 6 bf16 passes ('highest') to 1
('default') saves 2.1 s of 8.26 s — at 9e-3 rel-RMS, far outside the
envelope. kernels._dotg_fm now builds intermediate tiers manually from
bf16-split operands ('3x': ~2^-16, 'w2x': 2 passes). Split equivalent
rows (equivalents.n_eq_parts) unblock order 5 at block 128, which at
order 4 already beats block 256 (9.37 vs 10.27 s at theta 1.4).

Usage: python scripts/exp_r2d.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from onbody_tpu import parts as P
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, dtt, treecode


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

    base = dict(order=5, theta_dtt=1.2, pair_backend="pallas",
                dtt_traversal="level", pair_group=16, pair_fetch="dma",
                tree_mode="span")
    b256 = dict(block_size=256, frontier_width=192, cap_groups_dtt=16)
    b128 = dict(block_size=128, frontier_width=256, cap_groups_dtt=16)
    variants = [
        ("b256 3x", dict(**base, **b256, mxu_precision="3x"), (1.2,)),
        ("b128split 3x W256", dict(**base, **b128, mxu_precision="3x"),
         (1.2,)),
        ("b128split 3x W224", {**base, **b128, "mxu_precision": "3x",
                               "frontier_width": 224}, (1.2,)),
        ("b128split hi W256", dict(**base, **b128,
                                   mxu_precision="highest"), (1.2,)),
        ("b128split 3x preg", {**base, **b128, "mxu_precision": "3x",
                               "pair_fetch": "pregather"}, (1.2,)),
        ("b256 w2x", dict(**base, **b256, mxu_precision="w2x"), (1.2,)),
    ]
    for name, kw, thetas in variants:
        cfg = SolverConfig(**kw)

        def full_eval(th):
            plan = treecode.prepare(kernel, cfg, srcs, targs)
            return dtt.solve_dtt(kernel, cfg, plan, theta=th)

        for th in thetas:
            try:
                out, info = full_eval(th)
                _sync(out)
                times = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    out, info = full_eval(th)
                    _sync(out)
                    times.append(time.perf_counter() - t0)
                rms = (np.linalg.norm(np.asarray(out)[::nt_skip] - ref)
                       / np.linalg.norm(ref))
                print(f"{name:>20} t={th:.2f}: t={min(times):.4f}s "
                      f"rms={rms:.2e} nvalid={int(info.n_valid)} "
                      f"overflow={int(info.overflow)}", flush=True)
            except Exception as e:
                print(f"{name:>20} t={th:.2f}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
