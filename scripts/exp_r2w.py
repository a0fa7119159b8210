"""Round-2 sweep W: frontier width at the o5/theta1.2 1e7 config.

Frontier width scales ALL the list machinery (measured: 256->224 saved
1.2 s, 224->192 another 0.3 s at 1e7 under o4/t1.4). theta 1.2 accepts
far pairs earlier than 1.4, so the per-level candidate frontier should
be narrower — test how far W can drop before overflow. Overflow is
deterministic for the bench seed (12345), so a zero here certifies the
width for bench.py.

Usage: python scripts/exp_r2w.py [N]
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

    base = dict(block_size=256, order=5, theta_dtt=1.2,
                cap_groups_dtt=16, tree_mode="span",
                pair_backend="pallas", pair_group=16, pair_fetch="dma",
                mxu_precision="3x", lean_plan=True,
                tree_paired=True, tree_defer_rs=True)
    widths = [int(w) for w in os.environ.get(
        "ONBODY_R2W_WIDTHS", "192,160,128").split(",")]

    for w in widths:
        cfg = SolverConfig(**{**base, "frontier_width": w})
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
            print(f"W={w:>4}: t={min(ts):.3f}s rms={rms:.2e} "
                  f"overflow={ov}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must survive OOM
            print(f"W={w:>4}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
