"""Interleaved-issue dma kernel (fetch='dma_i') vs plain dma at 1e7.

The plain dma body measured fully serialized issue+compute (~3.9 +
~3.7 us/step at g16/b256): per-block DMA-start scalar work (~225
cycles) and per-block compute (~215 cycles) are almost 1:1, so
software-pipelining the next step's starts through the compute
sub-tiles could hide nearly half the exec phase (2.14 s profiled).
Sweeps tile_g {4, 8} and group {16, 32} (sub-tiling also removes the
VMEM cap that blocked g>16 full-width tiles).

Usage: python scripts/exp_dmai.py [N]
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
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    kernel = get_kernel("grav3d")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync(srcs.x)

    tskip = max(1, n * n // int(4e11))
    import dataclasses
    sub = dataclasses.replace(targs, x=jnp.copy(targs.x[::tskip]),
                              r=jnp.copy(targs.r[::tskip]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    base = tuned_config(n)
    cases = [("dma ctrl", base)]
    for g, tg in ((16, 4), (16, 8), (32, 4), (32, 8)):
        cases.append((f"dma_i g{g} tg{tg}",
                      base.replace(pair_fetch="dma_i", pair_group=g,
                                   pair_tile_g=tg)))

    for name, cfg in cases:
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
            tg_arr = plan.tgt_gidx
            inv = jnp.zeros((n,), jnp.int32).at[tg_arr].set(
                jnp.arange(tg_arr.shape[0], dtype=jnp.int32),
                mode="drop")
            got = np.asarray(out[inv[::tskip]])[:ref.shape[0]]
            rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            print(f"{name:16s}: full {min(ts):.3f}s rms {rms:.2e} "
                  f"nvalid {int(info.n_valid)} "
                  f"overflow {int(info.overflow)}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must continue
            print(f"{name:16s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
