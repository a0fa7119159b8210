"""Fused-path (bench.py 1e6 route) sibling-paired leaf execution sweep.

exp_p2 measured the SPLIT path at 1e6: pair2 g16 0.585 s vs ctrl 0.897
(r3). The bench path at this N is solve_dtt_fused; this measures p2
variants (incl. the new pregather t2) through that exact route.

Usage: python scripts/exp_r3p6.py [N]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from onbody_tpu import parts as P
from onbody_tpu.config import tuned_config
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, dtt


def _sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    kernel = get_kernel("grav3d")
    base = tuned_config(n)
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync(srcs.x)
    tskip = max(1, n * n // int(4e11))
    sub = dataclasses.replace(targs, x=jnp.copy(targs.x[::tskip]),
                              r=jnp.copy(targs.r[::tskip]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    variants = [
        ("ctrl", base),
        ("p2 g16", base.replace(dtt_leaf_pair2=True, pair_group=16)),
        ("p2 g32", base.replace(dtt_leaf_pair2=True)),
        ("p2 g16 pregather", base.replace(dtt_leaf_pair2=True,
                                          pair_group=16,
                                          pair_fetch="pregather")),
        ("p2 g32 pregather", base.replace(dtt_leaf_pair2=True,
                                          pair_fetch="pregather")),
    ]
    for name, cfg in variants:
        try:
            (out, inv), info = dtt.solve_dtt_fused(kernel, cfg, srcs,
                                                   targs,
                                                   unscramble=False)
            _sync(out)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                (out, inv), info = dtt.solve_dtt_fused(
                    kernel, cfg, srcs, targs, unscramble=False)
                _sync(out)
                times.append(time.perf_counter() - t0)
            got = np.asarray(out[inv[::tskip]])[:ref.shape[0]]
            rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            print(f"{name:18s}: {min(times):.3f} s  rms {rms:.2e} "
                  f"nvalid {int(info.n_valid)} ovf {int(info.overflow)}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — sweep robustness
            print(f"{name:18s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
