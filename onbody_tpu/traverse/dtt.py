"""O(N) dual-tree traversal ("fastsumm") solver.

TPU-native equivalent of nbody_fastsumm (ongrav3d.cpp:207-452,
onvort2d.cpp:194-439, onvort3d.cpp:220-465): the work-list recursion
becomes the level-synchronous dual traversal of lists.build_dtt_pairs, the
four interaction types collapse into the unified pair executor (far
contributions accumulate directly into target leaf rows or target
equivalent rows of the same out array), and the prolongation becomes a
top-down per-level barycentric interpolation einsum
(calcBarycentricDownward, BarycentricLagrange.hpp:63-166) or the order<0
parent-copy (ongrav3d.cpp:241-251).

The reference's known stats race (README.md:200) has no analogue here —
everything is a deterministic pure-functional reduction.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import Kernel
from onbody_tpu.tree import equivalents as eq
from onbody_tpu.traverse import exec as pexec
from onbody_tpu.traverse import lists
from onbody_tpu.traverse.treecode import Plan, _leaf_outputs


@partial(jax.jit, static_argnames=("order", "levels", "block_size",
                                   "parts"))
def _downward(out, tree_nc, tree_ns, tgt_geo, order: int, levels: int,
              block_size: int, parts: int = 1):
    """Prolong accumulated equivalent-target outputs down the tree.

    out: (NN + (parts-1)*nleaf, B, OD). For each level top-down,
    children's points (proxies or leaf particles) receive the parent's
    equivalent outputs through barycentric interpolation on the parent
    grid. Points come from the feature-major tgt_geo (rows, 8, B) — the
    only target geometry the lean plan materializes; per-level
    transposes are level-sized. With split equivalent rows (parts > 1,
    equivalents.n_eq_parts) a node's M grid slots are reassembled from
    its main row plus extension rows (j+1)*nleaf + i before prolonging,
    and the children's interpolated additions are scattered back across
    the same split.
    """
    pd = tree_nc.shape[-1]
    ncp = order + 1
    M = ncp ** pd
    nleaf = 1 << levels
    B = tgt_geo.shape[-1]

    def part_rows(j, lo_node, hi_node):
        return slice((j + 1) * nleaf + lo_node, (j + 1) * nleaf + hi_node)

    for l in range(1, levels + 1):
        np_l = 1 << (l - 1)                    # parents at level l-1
        par = slice(np_l, 2 * np_l)
        chl = slice(2 * np_l, 4 * np_l)
        # parent equivalent outputs: reassemble the M grid slots
        if parts == 1:
            parent_u = out[par, :M]
        else:
            pieces = [out[par, :min(M, B)]]
            for j in range(1, parts):
                m_j = min(M, (j + 1) * B) - j * B
                pieces.append(out[part_rows(j, np_l, 2 * np_l), :m_j])
            parent_u = jnp.concatenate(pieces, axis=1)
        # child points: leaf particles, or the M grid slots across parts
        if l == levels:
            width = block_size
            pts = jnp.transpose(tgt_geo[chl, :pd, :width], (0, 2, 1))
        elif parts == 1:
            width = M
            pts = jnp.transpose(tgt_geo[chl, :pd, :width], (0, 2, 1))
        else:
            ppcs = [tgt_geo[chl, :pd, :min(M, B)]]
            for j in range(1, parts):
                m_j = min(M, (j + 1) * B) - j * B
                ppcs.append(tgt_geo[part_rows(j, 2 * np_l, 4 * np_l),
                                    :pd, :m_j])
            pts = jnp.transpose(jnp.concatenate(ppcs, axis=2), (0, 2, 1))
        parent_nc = jnp.repeat(tree_nc[par], 2, axis=0)
        parent_ns = jnp.repeat(tree_ns[par], 2, axis=0)
        parent_u = jnp.repeat(parent_u, 2, axis=0)             # (2np,M,OD)

        def level_add(args):
            cpts, cnc, cns, cu = args
            return eq.prolong_factored(cpts, cnc, cns, order, cu)

        n_ch = 2 * np_l
        chunk = min(n_ch, 2048)   # bound the (nodes, P, M) weight tensor
        if n_ch > chunk:
            def resh(a):
                return a.reshape((n_ch // chunk, chunk) + a.shape[1:])
            add = jax.lax.map(level_add, (resh(pts), resh(parent_nc),
                                          resh(parent_ns), resh(parent_u)))
            add = add.reshape((n_ch,) + add.shape[2:])
        else:
            add = level_add((pts, parent_nc, parent_ns, parent_u))
        if l == levels or parts == 1:
            out = out.at[chl, :pts.shape[1]].add(add)
        else:
            out = out.at[chl, :min(M, B)].add(add[:, :min(M, B)])
            for j in range(1, parts):
                m_j = min(M, (j + 1) * B) - j * B
                out = out.at[part_rows(j, 2 * np_l, 4 * np_l), :m_j].add(
                    add[:, j * B:j * B + m_j])
    return out


@partial(jax.jit, static_argnames=("levels", "block_size"))
def _downward_copy(out, levels: int, block_size: int):
    """order<0 prolongation: child point i inherits parent equivalent
    i//2, with left/right children reading the parent halves that were
    merged from them (ongrav3d.cpp:241-251 + calcEquivalents layout
    barneshut.hpp:974-976)."""
    bs = block_size
    h = bs // 2
    for l in range(1, levels + 1):
        np_l = 1 << (l - 1)
        par = slice(np_l, 2 * np_l)
        chl = slice(2 * np_l, 4 * np_l)
        pu = out[par, :bs]                     # (np_l, bs, OD)
        left = jnp.repeat(pu[:, :h], 2, axis=1)    # (np_l, bs, OD)
        right = jnp.repeat(pu[:, h:], 2, axis=1)
        add = jnp.stack([left, right], axis=1).reshape(
            2 * np_l, bs, -1)
        out = out.at[chl, :bs].add(add)
    return out


def fastsumm_stats(raw: lists.PairList, nleaf_s: int, nleaf_t: int):
    """Interaction-type counters, the analogue of the reference's
    fastsumm_stats {sltl, sbtl, sltb, sbtb} (ongrav3d.cpp:193-196).

    Unlike the reference — whose stats accumulation has a documented race
    without taskwait (README.md:200) and ships disabled — these are
    deterministic reductions over the pair list.
    """
    valid = raw.src != 0
    # extension rows (ids >= 2*nleaf, split proxy rows) are interior
    s_leaf = (raw.src >= nleaf_s) & (raw.src < 2 * nleaf_s)
    t_leaf = (raw.tgt >= nleaf_t) & (raw.tgt < 2 * nleaf_t)
    def cnt(m):
        return jnp.sum(valid & m, dtype=jnp.int32)
    return {
        "sltl": cnt(s_leaf & t_leaf),
        "sbtl": cnt(~s_leaf & t_leaf),
        "sltb": cnt(s_leaf & ~t_leaf),
        "sbtb": cnt(~s_leaf & ~t_leaf),
    }


@partial(jax.jit, static_argnames=("kernel", "cfg", "n_src", "n_tgt",
                                   "unscramble"))
def _full_fused(kernel: Kernel, cfg: SolverConfig, sx, sr, ss, tx, tr,
                n_src: int, n_tgt: int, unscramble: bool = True):
    from onbody_tpu.parts import Parts
    from onbody_tpu.traverse.treecode import prepare
    srcs = Parts(x=sx, r=sr, s=ss, n_real=n_src)
    targs = Parts(x=tx, r=tr, s=None, n_real=n_tgt)
    plan = prepare(kernel, cfg, srcs, targs)
    if not unscramble:
        out, info = solve_dtt(kernel, cfg, plan, unscramble=False)
        return (out, plan.tgt_inv), info
    return solve_dtt(kernel, cfg, plan)


def solve_dtt_fused(kernel: Kernel, cfg: SolverConfig, srcs, targs,
                    unscramble: bool = True):
    """Whole pipeline (tree builds -> equivalents -> lists -> pair
    execution -> downward -> unscramble) as ONE jitted program.

    Removes every dispatch boundary so XLA can overlap phases; peak HBM
    is higher than the phase-split path (the per-level donated tree-build
    steps exist precisely to bound it at large N), so prefer this below
    ~4e6 particles and the split path above.
    """
    return _full_fused(kernel, cfg, srcs.x, srcs.r, srcs.s, targs.x,
                       targs.r, srcs.n_real, targs.n_real, unscramble)


def solve_dtt(kernel: Kernel, cfg: SolverConfig, plan: Plan,
              theta: Optional[float] = None,
              unscramble: bool = True) -> Tuple[jax.Array,
                                                lists.PairList]:
    """unscramble=False returns outputs in SORTED (tree) order,
    (nleaf*block_size, OD) incl. padded slots — the reference drivers'
    convention (makeTree reorders in place and every method's errors are
    computed on the reordered arrays, ongrav3d.cpp:781-790; only the
    C-ABI layer un-permutes, interface2dvort.cpp:301-304). Skips a
    full-N random gather; callers map rows via plan.tgt_inv/tgt_gidx."""
    theta = cfg.theta_dtt if theta is None else theta
    # split equivalent rows (order grids wider than the block row,
    # equivalents.n_eq_parts): both trees share block_size/order, so
    # source and target splits agree
    parts = eq.n_eq_parts(plan.tgt_geo.shape[-1], cfg.order, kernel.pd)
    if cfg.dtt_traversal == "level" and cfg.dtt_lists == "flat":
        assert parts == 1, ("flat DTT lists do not support split "
                            "equivalent rows; use dtt_lists='rows'")
        pg = lists.build_dtt_groups_flat(plan.stree, plan.ttree, theta,
                                         cfg.flat_row_cap,
                                         cfg.pair_group)
        out, info = pexec.exec_groups(kernel, cfg, plan, pg)
    else:
        backend = cfg.pair_backend
        if backend == "auto":
            backend = ("pallas" if jax.devices()[0].platform == "tpu"
                       else "jnp")
        use_p2 = (getattr(cfg, "dtt_leaf_pair2", False)
                  and cfg.dtt_traversal == "level"
                  and backend == "pallas"
                  # dma-family AND pregather have t2 executors; only
                  # the static pipeline lacks a chained-accumulator form
                  and getattr(cfg, "pair_fetch",
                              "pregather") != "static"
                  and jnp.dtype(cfg.accum_dtype) != jnp.float64
                  and plan.stree.levels <= plan.ttree.levels
                  and plan.ttree.levels >= 1)
        pl2 = None
        if cfg.dtt_traversal == "level":
            if use_p2:
                pl, pl2 = lists.build_dtt_pairs_level2(
                    plan.stree, plan.ttree, theta, cfg.frontier_width,
                    cfg.mac_geometry, src_parts=parts, tgt_parts=parts,
                    compact=getattr(cfg, "list_compact", "scatter"),
                    n_live=plan.tgt_sorted.n_real)
            else:
                pl = lists.build_dtt_pairs_level(
                    plan.stree, plan.ttree, theta, cfg.frontier_width,
                    cfg.mac_geometry, src_parts=parts, tgt_parts=parts,
                    compact=getattr(cfg, "list_compact", "scatter"),
                    n_live=plan.tgt_sorted.n_real)
            slot_width = cfg.frontier_width
        else:
            pl = lists.build_dtt_pairs(plan.stree, plan.ttree, theta,
                                       cfg.frontier_width, cfg.list_width,
                                       src_parts=parts, tgt_parts=parts)
            slot_width = cfg.list_width
        out, info = pexec.exec_pairs(kernel, cfg, plan, pl, slot_width,
                                     cfg.cap_groups_dtt, raw2=pl2)
    if cfg.order >= 0:
        out = _downward(out, plan.ttree.nc, plan.ttree.ns,
                        plan.tgt_geo, cfg.order, plan.ttree.levels,
                        plan.ttree.block_size, parts)
    else:
        out = _downward_copy(out, plan.ttree.levels, plan.ttree.block_size)
    if not unscramble:
        nleaf = plan.ttree.nleaf
        bs = plan.ttree.block_size
        leaf = out[nleaf:2 * nleaf, :bs, :].reshape(-1, kernel.od)
        return leaf, info
    return _leaf_outputs(out, plan, kernel, plan.tgt_sorted.n_real), info
