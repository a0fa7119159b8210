"""Adjacent-row bundled fetch ('dma_p') + id-ordered compaction at 1e7.

Measured lists bundle ~92% of entries when rows are id-ordered
(siblings are consecutive integers — nothing sorts between them), so
the 2-row DMA halves the dominant serialized DMA-start cost for those
slots: expected DMA count ~0.54x (docs/PERF.md r2s8).

Usage: python scripts/exp_dmap.py [N]
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
    cases = [
        ("ctrl dma_i g32", base),
        ("dma_p g32 idsort", base.replace(pair_fetch="dma_p",
                                          list_compact="idsort")),
        ("dma_p g16 idsort", base.replace(pair_fetch="dma_p",
                                          pair_group=16,
                                          list_compact="idsort")),
        ("dma_p g32 sort", base.replace(pair_fetch="dma_p")),
        ("dma_i g32 idsort", base.replace(list_compact="idsort")),
    ]

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
            print(f"{name:18s}: full {min(ts):.3f}s rms {rms:.2e} "
                  f"nvalid {int(info.n_valid)} "
                  f"overflow {int(info.overflow)}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
