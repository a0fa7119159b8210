"""Round-2 sweep E at N=1e6: propagate the 1e7 wins down.

The 1e7 sweeps found span-top tree build, order 5 + theta 1.2 (same
1e-4 error class as o4/t1.4 but ~35% fewer pairs), and the manual '3x'
bf16 MXU tier each pay. This re-tunes the 1e6 headline config (round-1
best: 0.609 s = o4/t1.4/b128/W208/fused) with those pieces.

Usage: python scripts/exp_r2e.py [N]
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
from onbody_tpu.traverse import direct, dtt

def _sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    kernel = get_kernel("grav3d")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync((srcs.x, targs.x))

    nt_skip = max(1, n // 20000)
    sub = P.Parts(x=targs.x[::nt_skip], r=targs.r[::nt_skip], s=None,
                  n_real=int(targs.x[::nt_skip].shape[0]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    r1 = dict(block_size=128, order=4, theta_dtt=1.4, frontier_width=208,
              list_width=512, cap_groups_dtt=12, pair_backend="pallas",
              pair_group=16)
    variants = [
        ("r1-best ctrl", dict(r1)),
        ("span o4", {**r1, "tree_mode": "span"}),
        ("span o4 3x", {**r1, "tree_mode": "span", "mxu_precision": "3x"}),
        ("span o5t12 3x W208", {**r1, "tree_mode": "span", "order": 5,
                                "theta_dtt": 1.2, "mxu_precision": "3x"}),
        ("span o5t12 3x W256", {**r1, "tree_mode": "span", "order": 5,
                                "theta_dtt": 1.2, "mxu_precision": "3x",
                                "frontier_width": 256}),
        ("span o5t12 3x b256", {**r1, "tree_mode": "span", "order": 5,
                                "theta_dtt": 1.2, "mxu_precision": "3x",
                                "block_size": 256, "frontier_width": 192,
                                "cap_groups_dtt": 16}),
    ]
    for name, kw in variants:
        cfg = SolverConfig(**kw)
        try:
            out, info = dtt.solve_dtt_fused(kernel, cfg, srcs, targs)
            _sync(out)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out, info = dtt.solve_dtt_fused(kernel, cfg, srcs, targs)
                _sync(out)
                times.append(time.perf_counter() - t0)
            rms = (np.linalg.norm(np.asarray(out)[::nt_skip] - ref)
                   / np.linalg.norm(ref))
            print(f"{name:>22}: t={min(times):.4f}s rms={rms:.2e} "
                  f"nvalid={int(info.n_valid)} "
                  f"overflow={int(info.overflow)}", flush=True)
        except Exception as e:
            print(f"{name:>22}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
