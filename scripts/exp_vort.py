"""DTT full-eval timing for the three vortex workloads at N (default
1e6), tuned-config, with rms vs the tiled f32 direct sum.

The headline bench (bench.py) tracks grav3d only (the reference's
published table is ongrav3d, README.md:70-90); this records the same
full-pipeline number for onvort2d / onvort3d / onvortgrad3d — including
vortgrad3d DTT, which the reference ships disabled
(onvortgrad3d.cpp:264 has no nbody_fastsumm).

Usage: python scripts/exp_vort.py [N]
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
    for name in ("vort2d", "vort2d_grav_theta", "vort3d", "vortgrad3d"):
        kernel = get_kernel(name.split("_")[0])
        # per-kernel tuned settings (vort2d theta 1.3, vortgrad3d lean
        # plan at large N — config.tuned_config); the _grav_theta row
        # records the out-of-envelope grav-tuned theta for comparison
        cfg = tuned_config(n, kernel.name)
        if name == "vort2d_grav_theta":
            cfg = tuned_config(n)
        ks, kt = jax.random.split(jax.random.PRNGKey(12345))
        srcs = P.random_in_cube(ks, n, kernel.pd, kernel.sd, True)
        targs = P.random_in_cube(kt, n, kernel.pd, 0, False)
        _sync(srcs.x)

        tskip = max(1, n * n // int(4e11))
        import dataclasses
        sub = dataclasses.replace(targs, x=jnp.copy(targs.x[::tskip]),
                                  r=jnp.copy(targs.r[::tskip]))
        ref = np.asarray(direct.direct(kernel, srcs, sub))

        try:
            plan = treecode.prepare(kernel, cfg, srcs, targs,
                                    want_inv=False)
            out, info = dtt.solve_dtt(kernel, cfg, plan,
                                      unscramble=False)
            _sync(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                plan = treecode.prepare(kernel, cfg, srcs, targs,
                                        want_inv=False)
                out, info = dtt.solve_dtt(kernel, cfg, plan,
                                          unscramble=False)
                _sync(out)
                ts.append(time.perf_counter() - t0)
            tg = plan.tgt_gidx
            inv = jnp.zeros((n,), jnp.int32).at[tg].set(
                jnp.arange(tg.shape[0], dtype=jnp.int32), mode="drop")
            got = np.asarray(out[inv[::tskip]])[:ref.shape[0]]
            rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            print(f"{name:11s} N={n:.0e}: full {min(ts):.3f}s "
                  f"rms {rms:.2e} nvalid {int(info.n_valid)} "
                  f"overflow {int(info.overflow)}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must continue
            print(f"{name:11s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
