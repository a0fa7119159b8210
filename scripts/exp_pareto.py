"""Theta/order time-vs-error Pareto on the TPU chip (SURVEY 4.4 evidence).

The reference's scripts/speedtest.pl publishes (N, blockSize, order,
target-error) -> (theta, time) rows on its CPU; this produces the
equivalent table for the TPU build in ONE process (each (N, order)
config compiles once; theta is a traced argument so the whole theta
sweep reuses that compile). Reference uses the f32 tiled direct sum on
a subsample (its own ~1e-6 error is far below the envelopes measured).

Usage: python scripts/exp_pareto.py
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

THETAS = [0.8, 0.9, 1.0, 1.1, 1.2, 1.3, 1.4, 1.6, 1.8, 2.0]


def _sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def main():
    kernel = get_kernel("grav3d")
    for n in (100_000, 1_000_000):
        ks, kt = jax.random.split(jax.random.PRNGKey(12345))
        srcs = P.random_in_cube(ks, n, 3, 1, True)
        targs = P.random_in_cube(kt, n, 3, 0, False)
        _sync((srcs.x, targs.x))
        nt_skip = max(1, n // 20000)
        sub = P.Parts(x=targs.x[::nt_skip], r=targs.r[::nt_skip], s=None,
                      n_real=int(targs.x[::nt_skip].shape[0]))
        ref = np.asarray(direct.direct(kernel, srcs, sub))

        for order in (3, 4, 5):
            cfg = SolverConfig(block_size=128, order=order,
                               frontier_width=256, list_width=512,
                               cap_groups_dtt=12, pair_backend="pallas",
                               pair_group=16, tree_mode="span",
                               mxu_precision="3x")
            plan = treecode.prepare(kernel, cfg, srcs, targs)
            for th in THETAS:
                try:
                    out, pl = dtt.solve_dtt(kernel, cfg, plan, theta=th)
                    _sync(out)
                    times = []
                    for _ in range(2):
                        t0 = time.perf_counter()
                        out, pl = dtt.solve_dtt(kernel, cfg, plan,
                                                theta=th)
                        _sync(out)
                        times.append(time.perf_counter() - t0)
                    rms = (np.linalg.norm(np.asarray(out)[::nt_skip] - ref)
                           / np.linalg.norm(ref))
                    print(f"N={n:.0e} o={order} th={th:.2f}: "
                          f"t={min(times):.4f}s rms={rms:.3e} "
                          f"overflow={int(pl.overflow)}", flush=True)
                except Exception as e:
                    print(f"N={n:.0e} o={order} th={th:.2f}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
