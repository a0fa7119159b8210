"""r4 sweep B: (order, theta) exec Pareto at 1e7 (VERDICT r3 #2).

The exec phase is ~1.77 s at o5/theta1.15 because the 1e-4 envelope
binds. Higher order should buy a looser theta inside 1e-4; pair volume
scales ~theta^-3. Measures full eval + rms for:
  o5 theta1.15 (ctrl) | o6 theta {1.25, 1.3, 1.35} | o7 theta {1.4}
  bs512 o6 theta {1.3} (single-row M=343 at width 512; dma_i lifts the
  old g16 VMEM cap that killed bs512 in r2b5)
Reference anchor: BarycentricLagrange.hpp:30 (maxorder=20).
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
    return float(np.asarray(a[(0,) * a.ndim]))


def main(n=10_000_000):
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
    grid = [("o5 t1.15 ctrl", base)]
    for o, ths in [(6, (1.25, 1.3, 1.35)), (7, (1.4,))]:
        for th in ths:
            grid.append((f"o{o} t{th}",
                         base.replace(order=o, theta_dtt=th)))
    grid.append(("bs512 o6 t1.3",
                 base.replace(block_size=512, order=6, theta_dtt=1.3)))

    for name, cfg in grid:
        try:
            plan = treecode.prepare(kernel, cfg, srcs, targs,
                                    want_inv=False)
            out, info = dtt.solve_dtt(kernel, cfg, plan,
                                      unscramble=False)
            sync(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                plan = treecode.prepare(kernel, cfg, srcs, targs,
                                        want_inv=False)
                out, info = dtt.solve_dtt(kernel, cfg, plan,
                                          unscramble=False)
                sync(out)
                ts.append(time.perf_counter() - t0)
            tg = plan.tgt_gidx
            inv = jnp.zeros((n,), jnp.int32).at[tg].set(
                jnp.arange(tg.shape[0], dtype=jnp.int32), mode="drop")
            got = np.asarray(out[inv[::tskip]])[:ref.shape[0]]
            rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
            ov = int(np.asarray(info.overflow))
            nv = int(np.asarray(info.n_valid))
            print(f"{name:16s}: {min(ts):.3f} s  rms {rel:.3e}  "
                  f"overflow {ov}  n_valid {nv}", flush=True)
            del plan, out, info
        except Exception as e:
            print(f"{name:16s}: FAILED {repr(e)[:160]}", flush=True)


def bandwidth():
    """Host<->device transfer rates through the tunnel (sizes the
    out-of-core fm streaming at 1e9)."""
    import numpy as _np
    for mb in (64, 671):
        a = _np.random.default_rng(0).standard_normal(
            (mb * 1024 * 1024 // 4,)).astype(_np.float32)
        t0 = time.perf_counter()
        d = jax.device_put(a)
        sync(d)
        h2d = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = _np.asarray(d)
        d2h = time.perf_counter() - t0
        print(f"xfer {mb:4d} MB: H2D {h2d:.3f} s ({mb/1024/h2d:.2f} GB/s)"
              f"  D2H {d2h:.3f} s ({mb/1024/d2h:.2f} GB/s)", flush=True)


if __name__ == "__main__":
    bandwidth()
    main(int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000)
