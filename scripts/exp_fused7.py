"""solve_dtt_fused (whole pipeline as ONE jit) at N=1e7.

The fused path is production below 4e6 (bench 1e6 uses it); above, the
phase-split path bounds peak HBM via donated per-level tree steps. But
under one jit XLA's liveness analysis frees each stage as its consumer
completes — the 1e8 chunk step relies on exactly this — so 1e7 may fit
in 16 GB, and fusing removes every phase-boundary dispatch gap
(~0.3-0.5 s of the 4.4 s split-path bench). OOM here = keep the split
path, nothing lost.

Usage: python scripts/exp_fused7.py [N]
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
from onbody_tpu.traverse import direct, dtt


def _sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    kernel = get_kernel("grav3d")
    cfg = tuned_config(n)
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync(srcs.x)

    tskip = max(1, n * n // int(4e11))
    import dataclasses
    sub = dataclasses.replace(targs, x=jnp.copy(targs.x[::tskip]),
                              r=jnp.copy(targs.r[::tskip]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    try:
        (out, inv), info = dtt.solve_dtt_fused(kernel, cfg, srcs, targs,
                                               unscramble=False)
        _sync(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            (out, inv), info = dtt.solve_dtt_fused(kernel, cfg, srcs,
                                                   targs,
                                                   unscramble=False)
            _sync(out)
            ts.append(time.perf_counter() - t0)
        got = np.asarray(out[inv[::tskip]])[:ref.shape[0]]
        rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        print(f"fused N={n:.0e}: full {min(ts):.3f}s rms {rms:.2e} "
              f"nvalid {int(info.n_valid)} overflow {int(info.overflow)}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"fused N={n:.0e}: FAILED {type(e).__name__}: {e}",
              flush=True)


if __name__ == "__main__":
    main()
