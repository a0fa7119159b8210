"""Bench-config confirmation at N=1e6 (fused) and N=1e7 (split) in one
process — mirrors bench.py's exact configurations.

Usage: python scripts/exp_final.py
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


def run(n, cfg, fused):
    kernel = get_kernel("grav3d")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync((srcs.x, targs.x))

    def full_eval():
        if fused:
            return dtt.solve_dtt_fused(kernel, cfg, srcs, targs)
        plan = treecode.prepare(kernel, cfg, srcs, targs)
        return dtt.solve_dtt(kernel, cfg, plan)

    out, info = full_eval()
    _sync(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, info = full_eval()
        _sync(out)
        times.append(time.perf_counter() - t0)
    nt_skip = max(1, n // 20000)
    sub = P.Parts(x=targs.x[::nt_skip], r=targs.r[::nt_skip], s=None,
                  n_real=int(targs.x[::nt_skip].shape[0]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))
    rms = (np.linalg.norm(np.asarray(out)[::nt_skip] - ref)
           / np.linalg.norm(ref))
    print(f"n={n:.0e} fused={fused}: t={min(times):.4f}s rms={rms:.2e} "
          f"nvalid={int(info.n_valid)} overflow={int(info.overflow)}",
          flush=True)


def main():
    cfg6 = SolverConfig(block_size=128, order=4, theta_dtt=1.4,
                        frontier_width=224, list_width=512,
                        cap_groups_dtt=12,
                        pair_backend="pallas", pair_group=16)
    run(1_000_000, cfg6, fused=True)
    cfg7 = SolverConfig(block_size=256, order=4, theta_dtt=1.4,
                        frontier_width=256, list_width=320,
                        cap_groups_dtt=16, pair_backend="pallas",
                        pair_group=16)
    run(10_000_000, cfg7, fused=False)


if __name__ == "__main__":
    main()
