"""Treecode full-eval timing: pointwise (treecode2) and boxwise
(treecode3) at N, vs the reference's published rows.

The headline bench tracks DTT; the reference table (README.md:82-90,
12-core Threadripper, 1e-4 RMS class) also publishes the O(N log N)
rows this script mirrors:

  N=1e6 pointwise 1.5827 s, boxwise 1.5646 s (+ tree 0.0879 + eq 0.0585)
  N=1e7 pointwise 23.652 s, boxwise 21.128 s (+ tree 0.9067 + eq 0.4713)

Times below are the FULL pipeline (both tree builds, equivalents,
lists, exec, unscramble) min-of-3 with a true device sync, like
bench.py. Thetas sweep around the driver defaults (pointwise 1.05,
boxwise 1.0 — ongrav3d.cpp:477-480) to land the 1e-4 class at the
tuned order.

Usage: python scripts/exp_tc.py [N]
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
from onbody_tpu.traverse import direct, treecode


def _sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    kernel = get_kernel("grav3d")
    base = tuned_config(n)

    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, kernel.pd, kernel.sd, True)
    targs = P.random_in_cube(kt, n, kernel.pd, 0, False)
    _sync(srcs.x)

    tskip = max(1, n * n // int(4e11))
    import dataclasses
    sub = dataclasses.replace(targs, x=jnp.copy(targs.x[::tskip]),
                              r=jnp.copy(targs.r[::tskip]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    cases = [
        ("tc2", treecode.solve_treecode2, 1.05),
        ("tc2", treecode.solve_treecode2, 0.90),
        ("tc3", treecode.solve_treecode3, 1.00),
        ("tc3", treecode.solve_treecode3, 0.90),
    ]
    for label, solve, theta in cases:
        cfg = base.replace(theta_pointwise=theta, theta_boxwise=theta)
        try:
            def run():
                plan = treecode.prepare(kernel, cfg, srcs, targs,
                                        want_inv=True)
                out, info = solve(kernel, cfg, plan)
                return out, info
            out, info = run()
            _sync(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out, info = run()
                _sync(out)
                ts.append(time.perf_counter() - t0)
            got = np.asarray(out[::tskip])[:ref.shape[0]]
            rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            print(f"{label} theta={theta:.2f} N={n:.0e}: "
                  f"full {min(ts):.3f}s rms {rms:.2e} "
                  f"nvalid {int(info.n_valid)} "
                  f"overflow {int(info.overflow)}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must continue
            print(f"{label} theta={theta:.2f}: FAILED "
                  f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
