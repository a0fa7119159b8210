"""Per-phase timing breakdown of the headline DTT pipeline on the TPU.

Times each stage separately (tree builds, equivalents/feature-major
packing, DTT list build, grouping, pair execution, downward pass,
unscramble) with a device sync after each, so optimization effort goes
where the time is. Stage-level syncs add overhead the fused bench does
not have — totals here are an upper bound on bench.py's number.

Usage: python scripts/profile_phases.py [N] [theta]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

# the axon sitecustomize imports jax before this file runs, freezing
# config from the env at interpreter start; config.update is the only
# reliable way to enable the persistent compile cache here
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                "/tmp/jax_cache"))

if os.environ.get("ONBODY_PROFILE_PLATFORM"):
    # the JAX_PLATFORMS env var is frozen by sitecustomize; this is the
    # only working switch for CPU smoke runs (see tests/conftest.py)
    jax.config.update("jax_platforms",
                      os.environ["ONBODY_PROFILE_PLATFORM"])

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
    # through the axon tunnel block_until_ready may not block: fetch 1
    # scalar. Index (not ravel) — ravel of a transposed output compiles
    # a full layout-change copy (measured 16 GB padded at 1e7)
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "ravel") and l.size]
    if leaves:
        a = leaves[0]
        np.asarray(a[(0,) * a.ndim])
    return x


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    theta = float(sys.argv[2]) if len(sys.argv) > 2 else None
    kernel = get_kernel("grav3d")
    from onbody_tpu.config import tuned_config
    cfg = tuned_config(n).replace(lean_plan=True)
    if theta is None:
        theta = cfg.theta_dtt
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    sync((srcs.x, targs.x))

    def stages():
        t = {}

        def run(name, fn):
            t0 = time.perf_counter()
            r = sync(fn())
            t[name] = time.perf_counter() - t0
            return r

        if getattr(cfg, "tree_paired", False):
            (stree, ss, sg), (ttree, ts, tg) = run(
                "trees paired", lambda: tb.build_trees_paired(
                    srcs, targs, cfg.block_size, mode=cfg.tree_mode,
                    span=cfg.tree_span, span_top=cfg.tree_span_top,
                    defer_rs=getattr(cfg, "tree_defer_rs", False),
                    fuse=getattr(cfg, "tree_fuse", 1)))
        else:
            stree, ss, sg = run("src tree", lambda: tb.build_tree(
                srcs, cfg.block_size, refine=cfg.order < 0,
                mode=cfg.tree_mode, span=cfg.tree_span,
                span_top=cfg.tree_span_top,
                defer_rs=getattr(cfg, "tree_defer_rs", False),
                fuse=getattr(cfg, "tree_fuse", 1)))
            ttree, ts, tg = run("tgt tree", lambda: tb.build_tree(
                targs, cfg.block_size, refine=cfg.order < 0,
                mode=cfg.tree_mode, span=cfg.tree_span,
                span_top=cfg.tree_span_top,
                defer_rs=getattr(cfg, "tree_defer_rs", False),
                fuse=getattr(cfg, "tree_fuse", 1)))
        src_fm = run("src fm", lambda: eq.barycentric_fm(
            stree, ss, cfg.order, kernel.name,
            pad8=getattr(cfg, "pair_fetch",
                         "pregather").startswith("dma")))
        tgt_geo = run("tgt geo", lambda: eq.target_geo_fm(
            ttree, ts, cfg.order))
        tgt_inv = run("tgt inv", lambda: jnp.zeros(
            (targs.n_real,), jnp.int32).at[tg].set(
            jnp.arange(tg.shape[0], dtype=jnp.int32), mode="drop"))
        plan = treecode.Plan(stree=stree, ttree=ttree, src_sorted=ss,
                             tgt_sorted=ts, src_blocks=None,
                             tgt_blocks=None, src_gidx=sg, tgt_gidx=tg,
                             src_fm=src_fm, tgt_geo=tgt_geo, tgt_inv=tgt_inv)
        if getattr(cfg, "dtt_leaf_pair2", False):
            pl, pl2 = run("dtt lists", lambda: lists.build_dtt_pairs_level2(
                stree, ttree, theta, cfg.frontier_width, cfg.mac_geometry,
                compact=getattr(cfg, "list_compact", "scatter"),
                n_live=targs.n_real))
        else:
            pl = run("dtt lists", lambda: lists.build_dtt_pairs_level(
                stree, ttree, theta, cfg.frontier_width, cfg.mac_geometry,
                compact=getattr(cfg, "list_compact", "scatter"),
                n_live=targs.n_real))
            pl2 = None
        outb, info = run("pair exec", lambda: pexec.exec_pairs(
            kernel, cfg, plan, pl, cfg.frontier_width, cfg.cap_groups_dtt,
            raw2=pl2))
        stats = dtt.fastsumm_stats(pl, stree.nleaf, ttree.nleaf)
        if pl2 is not None:
            stats["sltl"] = stats["sltl"] + 2 * jnp.sum(
                pl2.src != 0, dtype=jnp.int32)
        outb = run("downward", lambda: dtt._downward(
            outb, ttree.nc, ttree.ns, plan.tgt_geo, cfg.order,
            ttree.levels, ttree.block_size))
        res = run("unscramble", lambda: treecode._leaf_outputs(
            outb, plan, kernel, targs.n_real))
        t["TOTAL"] = sum(t.values())
        t["n_valid"] = int(np.asarray(info.n_valid))
        t["overflow"] = int(np.asarray(info.overflow))
        t["sltl"] = int(np.asarray(stats["sltl"]))
        t["sbtb"] = int(np.asarray(stats["sbtb"]))
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
