"""vort2d DTT theta calibration at N (default 1e6).

The 2D Biot-Savart kernel decays as 1/r (one power slower than 3D
gravity), so the grav-tuned MAC leaves it just outside the 1e-4
envelope: theta 1.3 measured 1.03e-4 at 1e6 / 1.21e-4 at 1e7
(docs/PERF.md r2s12). This sweeps the candidate tighter thetas to pick
the envelope-restoring value for config.tuned_config. Reference's own
2D tuning: theta=1.3 at order 4 (interface2dvort.cpp:189-192).

Usage: python scripts/exp_v2theta.py [N]
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
from onbody_tpu.config import tuned_config
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, dtt, treecode


def _sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    kernel = get_kernel("vort2d")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 2, 1, True)
    targs = P.random_in_cube(kt, n, 2, 0, False)
    _sync(srcs.x)

    tskip = max(1, n * n // int(4e11))
    import dataclasses
    sub = dataclasses.replace(targs, x=jnp.copy(targs.x[::tskip]),
                              r=jnp.copy(targs.r[::tskip]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    base = tuned_config(n, "vort2d")
    for theta in (1.3, 1.35, 1.4, 1.45):
        cfg = base.replace(theta_dtt=theta)
        plan = treecode.prepare(kernel, cfg, srcs, targs, want_inv=False)
        out, info = dtt.solve_dtt(kernel, cfg, plan, unscramble=False)
        _sync(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            plan = treecode.prepare(kernel, cfg, srcs, targs,
                                    want_inv=False)
            out, info = dtt.solve_dtt(kernel, cfg, plan, unscramble=False)
            _sync(out)
            ts.append(time.perf_counter() - t0)
        tg = plan.tgt_gidx
        inv = jnp.zeros((n,), jnp.int32).at[tg].set(
            jnp.arange(tg.shape[0], dtype=jnp.int32), mode="drop")
        got = np.asarray(out[inv[::tskip]])[:ref.shape[0]]
        rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        print(f"vort2d t={theta} N={n:.0e}: full {min(ts):.3f}s "
              f"rms {rms:.2e} nvalid {int(info.n_valid)} "
              f"overflow {int(info.overflow)}", flush=True)


if __name__ == "__main__":
    main()
