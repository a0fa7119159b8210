"""Round-2 sweep G: executor group size + config retune, one process.

At N>=4e6 (split path): pair_group {16, 32, 64} at the 7.00s config —
the dynamic pipeline costs ~4us/step of fixed overhead, so halving the
step count is worth ~0.5s at 1e7 IF the per-step compute scales.

At N<4e6 (fused path): the round-1 1e6 bench config (bs128/o4/t1.4)
never got the round-2 knobs. Variants: +span build, +3x MXU tier, and
the bs256/o5/t1.2 config that won at 1e7 (fewer, fatter steps).

Usage: python scripts/exp_r2g.py [N]
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
    split_min = int(float(os.environ.get("ONBODY_EXP_SPLIT_MIN", 4e6)))
    kernel = get_kernel("grav3d")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync((srcs.x, targs.x))

    nt_skip = max(1, n // 20000)
    sub = P.Parts(x=targs.x[::nt_skip], r=targs.r[::nt_skip], s=None,
                  n_real=int(targs.x[::nt_skip].shape[0]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    if n >= split_min:
        base = dict(block_size=256, order=5, theta_dtt=1.2,
                    frontier_width=192, cap_groups_dtt=16,
                    tree_mode="span", pair_backend="pallas",
                    pair_fetch="dma", mxu_precision="3x", lean_plan=True)
        variants = [
            ("g16 nolean ctrl", dict(pair_group=16, lean_plan=False)),
            ("g16 lean", dict(pair_group=16)),
            ("g32 lean", dict(pair_group=32)),
            ("g64 lean", dict(pair_group=64)),
            ("g32 pregather lean", dict(pair_group=32,
                                        pair_fetch="pregather")),
            # b128: half the pair-particle volume (near field ~ N*B) at
            # 2x the groups — viable iff the bigger group sizes amortize
            # the ~4us/step pipeline floor (875k steps at g16)
            # frontier width must be a multiple of the group size
            # (group_pairs reshapes rows into G-wide chunks)
            ("b128 o4 t1.4 g32 W224", dict(
                block_size=128, order=4, theta_dtt=1.4,
                frontier_width=224, cap_groups_dtt=12,
                pair_group=32, pair_fetch="pregather")),
            ("b128 o4 t1.4 g64 W256", dict(
                block_size=128, order=4, theta_dtt=1.4,
                frontier_width=256, cap_groups_dtt=12,
                pair_group=64, pair_fetch="pregather")),
        ]
    else:
        base = dict(pair_backend="pallas", pair_group=16)
        variants = [
            ("r1 ctrl b128/o4/t1.4", dict(
                block_size=128, order=4, theta_dtt=1.4,
                frontier_width=208, cap_groups_dtt=12)),
            ("+span+3x", dict(
                block_size=128, order=4, theta_dtt=1.4,
                frontier_width=208, cap_groups_dtt=12,
                tree_mode="span", mxu_precision="3x")),
            ("b256/o5/t1.2 span 3x", dict(
                block_size=256, order=5, theta_dtt=1.2,
                frontier_width=192, cap_groups_dtt=16,
                tree_mode="span", mxu_precision="3x")),
            ("b256/o5/t1.2 g32", dict(
                block_size=256, order=5, theta_dtt=1.2,
                frontier_width=192, cap_groups_dtt=16,
                tree_mode="span", mxu_precision="3x", pair_group=32)),
            ("b128 +span+3x g32 W224", dict(
                block_size=128, order=4, theta_dtt=1.4,
                frontier_width=224, cap_groups_dtt=12,
                tree_mode="span", mxu_precision="3x", pair_group=32)),
            ("b256/o5/t1.2 g64 pair+def", dict(
                block_size=256, order=5, theta_dtt=1.2,
                frontier_width=192, cap_groups_dtt=16,
                tree_mode="span", mxu_precision="3x", pair_group=64,
                tree_paired=True, tree_defer_rs=True)),
            ("b128 span 3x g64 W256 pair+def", dict(
                block_size=128, order=4, theta_dtt=1.4,
                frontier_width=256, cap_groups_dtt=12,
                tree_mode="span", mxu_precision="3x", pair_group=64,
                tree_paired=True, tree_defer_rs=True)),
            ("b256/o5/t1.2 bisect g64 pair+def", dict(
                block_size=256, order=5, theta_dtt=1.2,
                frontier_width=192, cap_groups_dtt=16,
                tree_mode="bisect", mxu_precision="3x", pair_group=64,
                tree_paired=True, tree_defer_rs=True)),
        ]

    for name, kw in variants:
        cfg = SolverConfig(**{**base, **kw})
        try:
            holder = {}

            def full():
                # tree-order results (bench convention, see bench.py)
                if n < split_min:
                    (o, inv), info = dtt.solve_dtt_fused(
                        kernel, cfg, srcs, targs, unscramble=False)
                    holder["inv"] = inv
                    return o, info
                plan = treecode.prepare(kernel, cfg, srcs, targs)
                holder["inv"] = plan.tgt_inv
                return dtt.solve_dtt(kernel, cfg, plan, unscramble=False)
            out, info = full()
            _sync(out)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out, info = full()
                _sync(out)
                times.append(time.perf_counter() - t0)
            got = np.asarray(out[holder["inv"][::nt_skip]])[:ref.shape[0]]
            rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            print(f"{name:>24}: {min(times):.4f}s rms={rms:.2e} "
                  f"nvalid={int(np.asarray(info.n_valid))} "
                  f"overflow={int(np.asarray(info.overflow))}", flush=True)
        except Exception as e:
            print(f"{name:>24}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
