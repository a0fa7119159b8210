"""Per-phase timing breakdown of the headline DTT pipeline on the TPU.

Times each stage separately (tree builds, equivalents, feature-major
packing, DTT list build, grouping, pair execution, downward pass,
unscramble) with a device sync after each, so optimization effort goes
where the time is. Stage-level syncs add overhead the fused bench does
not have — totals here are an upper bound on bench.py's number.

Usage: python scripts/profile_phases.py [N]
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
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.tree import build as tb, equivalents as eq
from onbody_tpu.traverse import dtt, lists, treecode
from onbody_tpu.traverse import exec as pexec


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    # through the axon tunnel block_until_ready may not block: fetch 1 scalar
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "ravel") and l.size]
    if leaves:
        np.asarray(leaves[0].ravel()[0])
    return x


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    kernel = get_kernel("grav3d")
    if n >= 4_000_000:
        cfg = SolverConfig(block_size=256, order=4, theta_dtt=1.4,
                           frontier_width=256, list_width=320,
                           cap_groups_dtt=16, pair_backend="pallas")
    else:
        cfg = SolverConfig(block_size=128, order=4, theta_dtt=1.4,
                           frontier_width=256, list_width=512,
                           pair_backend="pallas")
    cfg = cfg.replace(dtt_traversal="level")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    sync((srcs.x, targs.x))

    from onbody_tpu.ops import pallas_pairs as pp

    def stages():
        out = {}
        t = {}

        def run(name, fn):
            t0 = time.perf_counter()
            r = sync(fn())
            t[name] = time.perf_counter() - t0
            return r

        stree, ss, sg = run("src tree", lambda: tb.build_tree(
            srcs, cfg.block_size, refine=cfg.order < 0, mode=cfg.tree_mode))
        ttree, ts, tg = run("tgt tree", lambda: tb.build_tree(
            targs, cfg.block_size, refine=cfg.order < 0, mode=cfg.tree_mode))
        sblocks = run("src equivs", lambda: eq.barycentric_blocks(
            stree, ss, cfg.order))
        tblocks = run("tgt equivs", lambda: eq.target_blocks(
            ttree, ts, cfg.order))
        src_fm = run("featurize", lambda: pp.build_fm_blocks(
            kernel, sblocks.pos, sblocks.rad, sblocks.s))
        tgt_geo = run("tgt geo", lambda: pp.build_tgt_geo(
            tblocks.pos, tblocks.rad))
        tgt_inv = run("tgt inv", lambda: jnp.zeros(
            (targs.n_real,), jnp.int32).at[tg].set(
            jnp.arange(tg.shape[0], dtype=jnp.int32), mode="drop"))
        plan = treecode.Plan(stree=stree, ttree=ttree, src_sorted=ss,
                             tgt_sorted=ts, src_blocks=sblocks,
                             tgt_blocks=tblocks, src_gidx=sg, tgt_gidx=tg,
                             src_fm=src_fm, tgt_geo=tgt_geo, tgt_inv=tgt_inv)
        if cfg.dtt_traversal == "level":
            slot = cfg.frontier_width
            pl_raw = run("dtt lists", lambda: lists.build_dtt_pairs_level(
                stree, ttree, cfg.theta_dtt, cfg.frontier_width))
        else:
            slot = cfg.list_width
            pl_raw = run("dtt lists", lambda: lists.build_dtt_pairs(
                stree, ttree, cfg.theta_dtt, cfg.frontier_width,
                cfg.list_width))
        g = cfg.pair_group
        n_rows = pl_raw.tgt.shape[0] // slot
        cap = max(1024, n_rows * cfg.cap_groups_dtt * pp.GROUP // g)
        pg = run("group pairs", lambda: lists.group_pairs(
            pl_raw, cap, g, slot))
        outb = run("pair exec", lambda: pp.exec_pairs_pallas(
            kernel, plan.tgt_geo, plan.src_fm, pg.tgt, pg.src,
            cfg.core_func, cfg.accum_dtype, group=g))
        outb = run("downward", lambda: dtt._downward(
            outb, ttree.nc, ttree.ns, plan.tgt_geo, cfg.order,
            ttree.levels, ttree.block_size))
        res = run("unscramble", lambda: treecode._leaf_outputs(
            outb, plan, kernel, targs.n_real))
        t["TOTAL"] = sum(t.values())
        t["n_groups"] = int(np.asarray(pg.n_valid)) / g
        t["overflow"] = int(np.asarray(pg.overflow))
        return t, res

    stages()  # warmup/compile
    best = None
    for _ in range(2):
        t, _ = stages()
        if best is None or t["TOTAL"] < best["TOTAL"]:
            best = t
    for k, v in best.items():
        print(f"{k:>12}: {v:.4f}" if isinstance(v, float) else
              f"{k:>12}: {v}")


if __name__ == "__main__":
    main()
