"""Round-2 sweep K: combined confirm at the post-sweep config.

Stacks every round-2 lever measured individually (paired+defer tree
build, fused-3x MXU contraction + ones-row rowsum fold, group-size
winner from sweep G) into one full-eval timing, plus the ablation
candidates around it. One process, all variants.

Usage: python scripts/exp_r2k.py [N] [extra...]
  extra variant toggles via env ONBODY_R2K_GROUPS="16,32,64"
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
    groups = [int(g) for g in os.environ.get(
        "ONBODY_R2K_GROUPS", "16,32").split(",")]
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
                frontier_width=192, cap_groups_dtt=16,
                tree_mode="span", pair_backend="pallas",
                pair_fetch="dma", mxu_precision="3x", lean_plan=True,
                tree_paired=True, tree_defer_rs=True)
    variants = [("ctrl g16 seq-tree", dict(
        pair_group=16, tree_paired=False, tree_defer_rs=False))]
    for g in groups:
        variants.append((f"pair+def g{g}", dict(pair_group=g)))
        if g >= 32:
            variants.append((f"pair+def g{g} pregather", dict(
                pair_group=g, pair_fetch="pregather")))

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
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out, info = run()
                _sync(out)
                ts.append(time.perf_counter() - t0)
            got = np.asarray(out[holder["inv"][::nt_skip]])[:ref.shape[0]]
            rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            print(f"{name:>28}: t={min(ts):.3f}s rms={rms:.2e} "
                  f"nvalid={int(info.n_valid)} "
                  f"overflow={int(info.overflow)}", flush=True)
        except Exception as e:
            print(f"{name:>28}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
