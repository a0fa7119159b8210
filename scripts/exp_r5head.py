"""r5: the last unmeasured 1e7 headline lever — bisect-mode top levels
in the PAIRED production build (VERDICT r4 #3a).

The r2q bisect measurement predates the paired build + prefix-sorted
levels + defer_rs stack; this measures tree_mode='bisect' (one variadic
sort per <=4 levels, splits found by 32-round counting bisection on the
u32 coordinate image, build.py:590) against the tuned span control, both
as prepare-only (vs the 1.648 s r4 ctrl) and as the full evaluation.

Usage: python scripts/exp_r5head.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from onbody_tpu import parts as P
from onbody_tpu.config import tuned_config
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, dtt, treecode


def sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim].astype(jnp.float32)))


def timeit(fn, iters=3):
    out = fn()
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    kernel = get_kernel("grav3d")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    sync(srcs.x)
    sync(targs.x)

    tskip = max(1, n * n // int(4e11))
    import dataclasses
    sub = dataclasses.replace(targs, x=jnp.copy(targs.x[::tskip]),
                              r=jnp.copy(targs.r[::tskip]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    base = tuned_config(n)
    cases = [
        ("ctrl span", base),
        ("bisect g4", base.replace(tree_mode="bisect")),
        ("bisect g3", base.replace(tree_mode="bisect",
                                   tree_bisect_group=3)),
    ]
    for name, cfg in cases:
        try:
            tp, plan = timeit(
                lambda c=cfg: treecode.prepare(kernel, c, srcs, targs,
                                               want_inv=False))
            tf, (out, info) = timeit(
                lambda c=cfg: (lambda p: dtt.solve_dtt(
                    kernel, c, p, unscramble=False))(
                    treecode.prepare(kernel, c, srcs, targs,
                                     want_inv=False)))
            tg = plan.tgt_gidx
            inv = jnp.zeros((n,), jnp.int32).at[tg].set(
                jnp.arange(tg.shape[0], dtype=jnp.int32), mode="drop")
            got = np.asarray(out[inv[::tskip]])[:ref.shape[0]]
            rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            print(f"{name:10s}: prepare {tp:.3f} s  full {tf:.3f} s  "
                  f"rms {rms:.2e}  overflow {int(info.overflow)}",
                  flush=True)
            del plan, out
        except Exception as e:  # noqa: BLE001 — sweep must continue
            print(f"{name:10s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
