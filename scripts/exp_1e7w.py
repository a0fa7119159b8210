"""Last 1e7 tuning probe: frontier width 224 and fetch mode, bs256 split.

Usage: python scripts/exp_1e7w.py
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
    n = 10_000_000
    kernel = get_kernel("grav3d")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync((srcs.x, targs.x))
    nt_skip = max(1, n // 20000)
    sub = P.Parts(x=targs.x[::nt_skip], r=targs.r[::nt_skip], s=None,
                  n_real=int(targs.x[::nt_skip].shape[0]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    base = dict(block_size=256, order=4, theta_dtt=1.4, list_width=320,
                cap_groups_dtt=16, pair_backend="pallas", pair_group=16)
    for name, kw in [
        ("W192 dma", dict(frontier_width=192, pair_fetch="dma")),
        ("W208 dma", dict(frontier_width=208, pair_fetch="dma")),
    ]:
        cfg = SolverConfig(**{**base, **kw})
        plan = treecode.prepare(kernel, cfg, srcs, targs)
        out, info = dtt.solve_dtt(kernel, cfg, plan)
        _sync(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            plan = treecode.prepare(kernel, cfg, srcs, targs)
            out, info = dtt.solve_dtt(kernel, cfg, plan)
            _sync(out)
            times.append(time.perf_counter() - t0)
        rms = (np.linalg.norm(np.asarray(out)[::nt_skip] - ref)
               / np.linalg.norm(ref))
        print(f"{name}: t={min(times):.4f}s rms={rms:.2e} "
              f"overflow={int(info.overflow)}", flush=True)


if __name__ == "__main__":
    main()
