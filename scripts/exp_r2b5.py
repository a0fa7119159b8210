"""Round-2 sweep B5: block_size 512 and looser-theta variants at 1e7.

bs512 halves list rows and pipeline steps (the two costs that do NOT
shrink with pair volume) at ~1.7x the near-field particle-pair volume;
order 6 (343-pt grid) and order 7 (512-pt grid) still fit ONE block row
at bs512, and their accuracy margin lets theta loosen to cut near
volume back. CPU rms at N=4e4: bs512/o6/t1.2 = 1.2e-5 (8x margin),
o7/t1.1 = 1.5e-5, bs256/o5/t1.2 = 3.7e-5 (2.7x margin).

Usage: python scripts/exp_r2b5.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np

from onbody_tpu import parts as P
from onbody_tpu.config import SolverConfig
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
    _sync((srcs.x, targs.x))

    nt_skip = max(1, n // 20000)
    sub = P.Parts(x=targs.x[::nt_skip], r=targs.r[::nt_skip], s=None,
                  n_real=int(targs.x[::nt_skip].shape[0]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    base = dict(cap_groups_dtt=16, tree_mode="span",
                pair_backend="pallas", pair_group=16, pair_fetch="dma",
                mxu_precision="3x", lean_plan=True,
                tree_paired=True, tree_defer_rs=True)
    variants = [
        ("b256 o5 t1.2 ctrl", dict(block_size=256, order=5,
                                   theta_dtt=1.2, frontier_width=192)),
        ("b256 o5 t1.1", dict(block_size=256, order=5, theta_dtt=1.1,
                              frontier_width=192)),
        ("b512 o6 t1.2 W128", dict(block_size=512, order=6,
                                   theta_dtt=1.2, frontier_width=128)),
        ("b512 o6 t1.1 W128", dict(block_size=512, order=6,
                                   theta_dtt=1.1, frontier_width=128)),
        ("b512 o7 t1.1 W128", dict(block_size=512, order=7,
                                   theta_dtt=1.1, frontier_width=128)),
        ("b512 o6 t1.2 W96", dict(block_size=512, order=6,
                                  theta_dtt=1.2, frontier_width=96)),
        # g8 fallback if (512, 16*512) f32 tiles blow VMEM at g16
        ("b512 o6 t1.2 W128 g8", dict(block_size=512, order=6,
                                      theta_dtt=1.2, frontier_width=128,
                                      pair_group=8)),
    ]

    for name, over in variants:
        cfg = SolverConfig(**{**base, **over})
        try:
            holder = {}

            def run():
                plan = treecode.prepare(kernel, cfg, srcs, targs)
                holder["inv"] = plan.tgt_inv
                return dtt.solve_dtt(kernel, cfg, plan, unscramble=False)
            out, info = run()
            _sync(out)
            ov = int(np.asarray(info.overflow))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out, info = run()
                _sync(out)
                ts.append(time.perf_counter() - t0)
            got = np.asarray(out[holder["inv"][::nt_skip]])[:ref.shape[0]]
            rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            print(f"{name:>20}: t={min(ts):.3f}s rms={rms:.2e} "
                  f"overflow={ov}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>20}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
