"""Round-2 structural sweep at N=1e7 on the TPU, one process.

Decisions measured:
* tree build: median (r1) vs hybrid Morton-top (k in {8, 12})
* MAC geometry: f32 c64 pairs vs u16-quantized single c64
* block size: 256 (r1 best) vs 128 (kills the 125/256 proxy-lane waste)
* pair group: 16 vs 32 at bs128; pregather vs dma fetch

Usage: python scripts/exp_r2.py [N]
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

    base = dict(order=4, theta_dtt=1.4, pair_backend="pallas",
                dtt_traversal="level", pair_group=16, pair_fetch="dma")
    b256 = dict(block_size=256, frontier_width=192, cap_groups_dtt=16)
    b128 = dict(block_size=128, frontier_width=208, cap_groups_dtt=16)
    # theta is traced through the whole pipeline: one compile per
    # variant serves every theta — the (theta, order) accuracy/time
    # Pareto (speedtest.pl analogue) rides along for free
    # round-2 sweep C: mxu_precision + frontier width at the best config
    # (b256 span2 o5 theta=1.2 dma = 8.26s; b128+o5 measured dead —
    # M=216 proxy slots overflow 128-wide blocks, 13.7-18s)
    best = dict(**b256, tree_mode="span", order=5)
    variants = [
        ("o5 prec=high", dict(**best, mxu_precision="high"), (1.2,)),
        ("o5 prec=default", dict(**best, mxu_precision="default"), (1.2,)),
        ("o5 high W160", {**best, "mxu_precision": "high",
                          "frontier_width": 160}, (1.2,)),
        ("o5 high W144", {**best, "mxu_precision": "high",
                          "frontier_width": 144}, (1.2,)),
        ("o5 high lean preg", dict(**best, mxu_precision="high",
                                   lean_plan=True,
                                   pair_fetch="pregather"), (1.2,)),
        ("o5 high g32", {**best, "mxu_precision": "high",
                         "pair_group": 32}, (1.2,)),
    ]
    for name, kw, thetas in variants:
        cfg = SolverConfig(**{**base, **kw})

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
