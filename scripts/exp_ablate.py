"""Stage-ablation timing of the fused DTT pipeline on TPU.

Compiles truncated versions of the fused program (trees only, +blocks,
+lists, +group, +exec, full) and times each with a single end sync, so
per-stage cost attribution reflects the real fused schedule rather than
per-phase dispatch+sync overheads.

Usage: python scripts/exp_ablate.py [N]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from onbody_tpu import parts as P
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.tree import build as tb, equivalents as eq
from onbody_tpu.traverse import dtt, lists, treecode
from onbody_tpu.ops import pallas_pairs as pp


def _sync(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "ravel") and getattr(l, "size", 0)]
    return float(np.asarray(leaves[0].ravel()[0]))


@partial(jax.jit, static_argnames=("kernel", "cfg", "n", "stage"))
def staged(kernel, cfg, sx, sr, ss, tx, tr, n: int, stage: int):
    srcs = P.Parts(x=sx, r=sr, s=ss, n_real=n)
    targs = P.Parts(x=tx, r=tr, s=None, n_real=n)
    stree, ssrt, sg = tb.build_tree(srcs, cfg.block_size, mode=cfg.tree_mode)
    ttree, tsrt, tg = tb.build_tree(targs, cfg.block_size, mode=cfg.tree_mode)
    if stage == 0:
        return stree.nr, ttree.nr
    sblocks = eq.barycentric_blocks(stree, ssrt, cfg.order)
    tblocks = eq.target_blocks(ttree, tsrt, cfg.order)
    src_fm = pp.build_fm_blocks(kernel, sblocks.pos, sblocks.rad, sblocks.s)
    tgt_geo = pp.build_tgt_geo(tblocks.pos, tblocks.rad)
    tgt_inv = jnp.zeros((n,), jnp.int32).at[tg].set(
        jnp.arange(tg.shape[0], dtype=jnp.int32), mode="drop")
    if stage == 1:
        return src_fm, tgt_geo
    pl_raw = lists.build_dtt_pairs_level(stree, ttree, cfg.theta_dtt,
                                         cfg.frontier_width)
    if stage == 2:
        return pl_raw.src, pl_raw.n_valid
    g = cfg.pair_group
    n_rows = pl_raw.tgt.shape[0] // cfg.frontier_width
    cap = max(1024, n_rows * cfg.cap_groups_dtt * pp.GROUP // g)
    pg = lists.group_pairs(pl_raw, cap, g, cfg.frontier_width)
    if stage == 3:
        return pg.src, pg.n_valid
    outb = pp.exec_pairs_pallas(kernel, tgt_geo, src_fm, pg.tgt, pg.src,
                                cfg.core_func, cfg.accum_dtype, group=g,
                                fetch=cfg.pair_fetch,
                                precision=cfg.mxu_precision)
    if stage == 4:
        return outb
    outb = dtt._downward(outb, ttree.nc, ttree.ns, tgt_geo, cfg.order,
                         ttree.levels, ttree.block_size)
    nleaf = ttree.nleaf
    bs = ttree.block_size
    leaf = outb[nleaf:, :bs, :].reshape(-1, kernel.od)
    return leaf[tgt_inv]


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    kernel = get_kernel("grav3d")
    if n >= 4_000_000:
        cfg = SolverConfig(block_size=256, order=5, theta_dtt=1.2,
                           frontier_width=192, list_width=320,
                           cap_groups_dtt=16, pair_backend="pallas",
                           pair_group=16, pair_fetch="dma",
                           tree_mode="span", mxu_precision="3x")
    else:
        cfg = SolverConfig(block_size=128, order=4, theta_dtt=1.4,
                           frontier_width=256, list_width=512,
                           pair_backend="pallas", pair_group=16)
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync((srcs.x, targs.x))

    names = ["trees", "+blocks", "+lists", "+group", "+exec", "full"]
    prev = 0.0
    for stage, name in enumerate(names):
        args = (kernel, cfg, srcs.x, srcs.r, srcs.s, targs.x, targs.r,
                n, stage)
        r = staged(*args)
        _sync(r)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = staged(*args)
            _sync(r)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{name:>8}: {t:.4f}s  (delta {t - prev:+.4f}s)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
