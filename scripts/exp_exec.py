"""One-process sweep of pair-executor variants on the TPU.

Usage: python scripts/exp_exec.py [N]
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
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    kernel = get_kernel("grav3d")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync((srcs.x, targs.x))

    nt_skip = max(1, n // 20000)
    sub = P.Parts(x=targs.x[::nt_skip], r=targs.r[::nt_skip], s=None,
                  n_real=int(targs.x[::nt_skip].shape[0]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    base = dict(block_size=128, order=4, theta_dtt=1.4,
                frontier_width=256, list_width=512,
                pair_backend="pallas", dtt_traversal="level")
    variants = [
        ("W208 cap12", dict(pair_group=16, frontier_width=208,
                            cap_groups_dtt=12)),
    ]
    for name, kw in variants:
        cfg = SolverConfig(**{**base, **kw})
        try:
            out, info = dtt.solve_dtt_fused(kernel, cfg, srcs, targs)
            _sync(out)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out, info = dtt.solve_dtt_fused(kernel, cfg, srcs, targs)
                _sync(out)
                times.append(time.perf_counter() - t0)
            rms = (np.linalg.norm(np.asarray(out)[::nt_skip] - ref)
                   / np.linalg.norm(ref))
            print(f"{name:>15}: t={min(times):.4f}s  rms={rms:.2e} "
                  f"overflow={int(info.overflow)}", flush=True)
        except Exception as e:
            print(f"{name:>15}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
