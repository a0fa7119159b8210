"""Sibling-paired leaf execution (cfg.dtt_leaf_pair2) vs control.

The exec floor is serialized per-block DMA issue (~0.24us) + compute
(docs/PERF.md r2s8); leaf-leaf pairs dominate the pair volume and their
sibling target rows carry identical source lists, so the t2 executor
(ops/pallas_pairs._body_interleaved_t2) halves the issue count on them.
CPU-verified bit-identical (tests/test_traverse.py
test_dtt_leaf_pair2_bit_identical).

Usage: python scripts/exp_p2.py [N]
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
        ("ctrl", base),
        ("pair2", base.replace(dtt_leaf_pair2=True)),
        ("pair2 g16", base.replace(dtt_leaf_pair2=True, pair_group=16)),
        ("pair2 tg8", base.replace(dtt_leaf_pair2=True, pair_tile_g=8)),
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
            print(f"{name:12s}: full {min(ts):.3f}s rms {rms:.2e} "
                  f"nvalid {int(info.n_valid)} "
                  f"overflow {int(info.overflow)}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must continue
            print(f"{name:12s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
