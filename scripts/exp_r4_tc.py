"""r4: treecode3 (boxwise — the reference's C-ABI production path) and
treecode2 (pointwise) performance at 1e6/1e7 (VERDICT r3 #6).

Reference rows (README.md:82-90, 12-core): pointwise 1.58 s / 23.7 s,
boxwise 1.56 s / 21.1 s at 1e6 / 1e7 (~1e-4 RMS).

Usage: python scripts/exp_r4_tc.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from onbody_tpu import parts as P
from onbody_tpu.config import tuned_config
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, treecode


def sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]))


def main(n):
    kernel = get_kernel("grav3d")
    cfg = tuned_config(n)
    # the treecode lists grow wider than DTT's (no target-side
    # equivalents absorb far pairs): give them room
    cfg = cfg.replace(list_width=max(cfg.list_width, 512),
                      cap_groups_treecode=64,
                      dtt_leaf_pair2=False)
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    sync(srcs.x)
    tskip = max(1, n * n // int(4e11))
    sub = dataclasses.replace(targs, x=jnp.copy(targs.x[::tskip]),
                              r=jnp.copy(targs.r[::tskip]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    t0 = time.perf_counter()
    plan = treecode.prepare(kernel, cfg, srcs, targs, want_inv=False)
    sync(plan.src_fm)
    prep_cold = time.perf_counter() - t0
    # warm prepare (measures the row-gather defer refactor)
    pts = []
    for _ in range(3):
        t0 = time.perf_counter()
        plan = treecode.prepare(kernel, cfg, srcs, targs,
                                want_inv=False)
        sync(plan.src_fm)
        pts.append(time.perf_counter() - t0)
    print(f"prepare warm: {min(pts):.4f} s", flush=True)

    for name, fn, thetas in [
            ("treecode3", treecode.solve_treecode3,
             (0.9, 1.0, 1.1, 1.2)),
            ("treecode2", treecode.solve_treecode2, (1.0, 1.1))]:
        for th in thetas:
            try:
                out, info = fn(kernel, cfg, plan, theta=th)
                sync(out)
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    out, info = fn(kernel, cfg, plan, theta=th)
                    sync(out)
                    ts.append(time.perf_counter() - t0)
                got = np.asarray(out[::tskip])[:ref.shape[0]]
                rel = float(np.linalg.norm(got - ref)
                            / np.linalg.norm(ref))
                ov = int(np.asarray(info.overflow))
                nv = int(np.asarray(info.n_valid))
                print(f"{name} t{th:< 5}: {min(ts):.3f} s  rms {rel:.3e}"
                      f"  overflow {ov}  n_valid {nv}", flush=True)
                del out, info
            except Exception as e:
                print(f"{name} t{th}: FAILED {repr(e)[:140]}",
                      flush=True)
    # prepare cost attribution (tree+equivs shared with DTT)
    print(f"prepare (cold, incl compile): {prep_cold:.2f} s",
          flush=True)


if __name__ == "__main__":
    main(int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000)
