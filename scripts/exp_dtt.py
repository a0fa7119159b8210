"""One-process sweep of DTT pipeline variants on the TPU.

Measures full-eval wall time (prepare + lists + exec + downward +
unscramble) for combinations of traversal mode, pair group size, and
tree mode, so competing configs compile once and compare fairly.

Usage: python scripts/exp_dtt.py [N]
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


def _sync(x) -> float:
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    kernel = get_kernel("grav3d")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync(srcs.x)
    _sync(targs.x)

    # subsampled direct reference for RMS checks
    nt_skip = max(1, n // 20000)
    sub = P.Parts(x=targs.x[::nt_skip], r=targs.r[::nt_skip], s=None,
                  n_real=int(targs.x[::nt_skip].shape[0]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    variants = [
        ("level g8 fused", dict(dtt_traversal="level", pair_group=8),
         True),
        ("level g8 fused bs256",
         dict(dtt_traversal="level", pair_group=8, block_size=256,
              cap_groups_dtt=12), True),
        ("level g8 fused morton",
         dict(dtt_traversal="level", pair_group=8, tree_mode="morton"),
         True),
        ("level g8 split", dict(dtt_traversal="level", pair_group=8),
         False),
    ]
    base = dict(block_size=128, order=4, theta_dtt=1.4,
                frontier_width=256, list_width=512,
                pair_backend="pallas")

    for name, kw, fused in variants:
        cfg = SolverConfig(**{**base, **kw})

        def full_eval():
            if fused:
                return dtt.solve_dtt_fused(kernel, cfg, srcs, targs)
            plan = treecode.prepare(kernel, cfg, srcs, targs)
            return dtt.solve_dtt(kernel, cfg, plan)

        out, info = full_eval()
        _sync(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out, info = full_eval()
            _sync(out)
            times.append(time.perf_counter() - t0)
        rms = (np.linalg.norm(np.asarray(out)[::nt_skip] - ref)
               / np.linalg.norm(ref))
        print(f"{name:>18}: t={min(times):.4f}s  rms={rms:.2e} "
              f"nvalid={int(info.n_valid)} overflow={int(info.overflow)}",
              flush=True)


if __name__ == "__main__":
    main()
