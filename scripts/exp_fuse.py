"""Tree-build dispatch fusion sweep: time prepare() at N with
tree_fuse in {1, 2, 4, 8, 99}.

r2i measured ~35 ms of fixed cost per sort dispatch (paired build
halved dispatches and saved 0.45 s over 13 sorts at N=1e7); _run_steps
fuses `tree_fuse` schedule steps per dispatch. This sweep finds the
point where the dispatch saving stops paying for the extra live
column-set HBM (and any XLA scheduling loss inside the bigger program).

Usage: python scripts/exp_fuse.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np

from onbody_tpu import parts as P
from onbody_tpu.config import tuned_config
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import treecode


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

    for fuse in (1, 2, 4, 8, 99):
        cfg = tuned_config(n).replace(tree_fuse=fuse)
        plan = treecode.prepare(kernel, cfg, srcs, targs)   # compile
        _sync(plan.ttree.nc)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            plan = treecode.prepare(kernel, cfg, srcs, targs)
            _sync(plan.ttree.nc)
            ts.append(time.perf_counter() - t0)
        print(f"fuse={fuse:3d}: prepare {min(ts):.4f} s", flush=True)


if __name__ == "__main__":
    main()
