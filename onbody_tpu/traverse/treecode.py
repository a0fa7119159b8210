"""The three O(N log N) treecode solvers.

TPU-native equivalents of nbody_treecode1/2/3 (barneshut.hpp:108-132,
:190-222, :300-337): MAC list construction (traverse/lists.py) followed by
dense pair execution (traverse/exec.py). treecode1 evaluates accepted far
nodes as single pseudo-particles at the node CM with summed strength and
mean particle radius (tpinter, ongrav3d.cpp:174-181) via gathered
per-leaf monopole sets; treecode2/3 evaluate far nodes as equivalent
proxy blocks through the unified pair executor.

Per-point recursion becomes per-leaf-block conservative MAC (see
lists.mac_pointwise_conservative) — accuracy is >= the reference's
pointwise criterion.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import Kernel, get_kernel
from onbody_tpu.parts import Parts
from onbody_tpu.tree import build as tree_build
from onbody_tpu.tree import equivalents as eq
from onbody_tpu.traverse import exec as pexec
from onbody_tpu.traverse import lists


class Plan(NamedTuple):
    """Everything data-independent of theta: trees, sorted parts, blocks."""
    stree: tree_build.Tree
    ttree: tree_build.Tree
    src_sorted: Parts
    tgt_sorted: Parts
    src_blocks: eq.Blocks
    tgt_blocks: eq.Blocks
    src_gidx: jax.Array
    tgt_gidx: jax.Array
    src_fm: jax.Array    # feature-major (NN, C, B) for the Pallas backend
    tgt_geo: jax.Array   # (NN, B, PD+1) [pos | radius]
    tgt_inv: jax.Array   # inverse of tgt_gidx: original index -> slot


def prepare(kernel: Kernel, cfg: SolverConfig, srcs: Parts,
            targs: Parts, want_inv: bool = True) -> Plan:
    """Build both trees and the unified block arrays (the setup phase the
    reference times as 'build tree' + 'calc equivalents',
    ongrav3d.cpp:600-725).

    want_inv=False skips the tgt_inv inverse-permutation scatter
    (~0.17 s at N=1e7 — scatters are slow on TPU): callers that keep
    results in tree order (unscramble=False, the reference drivers'
    convention) never read it and can map validation rows through
    tgt_gidx themselves, outside any timed region."""
    from onbody_tpu import parts as P
    srcs = P.astype(srcs, cfg.storage_dtype)
    targs = P.astype(targs, cfg.storage_dtype)
    refine = cfg.order < 0
    paired = (getattr(cfg, "tree_paired", False)
              and cfg.tree_mode in ("median", "span", "bisect")
              and srcs.n_real == targs.n_real
              and tree_build.plan(srcs.n_real, cfg.block_size)
              == tree_build.plan(targs.n_real, cfg.block_size))
    # tree_quant leaves r/s out of the code sort by construction: the
    # deferred final gather is the only way they rejoin the columns
    defer = (getattr(cfg, "tree_defer_rs", False)
             or getattr(cfg, "tree_quant", "off") != "off")
    bgrp = getattr(cfg, "tree_bisect_group", 4)
    fuse = getattr(cfg, "tree_fuse", 1)
    # kernels with uses_tr=False never read target radii: skip their
    # sort payload / deferred gather (tree/build.py need_r)
    need_tr = kernel.uses_tr
    if paired:
        (stree, ss, sg), (ttree, ts, tg) = tree_build.build_trees_paired(
            srcs, targs, cfg.block_size, refine=refine,
            mode=cfg.tree_mode, span=cfg.tree_span,
            span_top=cfg.tree_span_top, span_bot=cfg.tree_span_bot,
            defer_rs=defer, bisect_group=bgrp, fuse=fuse,
            need_tgt_r=need_tr,
            quant=getattr(cfg, "tree_quant", "off"))
    else:
        stree, ss, sg = tree_build.build_tree(srcs, cfg.block_size,
                                              refine=refine,
                                              mode=cfg.tree_mode,
                                              span=cfg.tree_span,
                                              span_top=cfg.tree_span_top,
                                              span_bot=cfg.tree_span_bot,
                                              defer_rs=defer,
                                              bisect_group=bgrp,
                                              fuse=fuse,
                                              quant=getattr(
                                                  cfg, "tree_quant",
                                                  "off"))
        ttree, ts, tg = tree_build.build_tree(targs, cfg.block_size,
                                              refine=refine,
                                              mode=cfg.tree_mode,
                                              span=cfg.tree_span,
                                              span_top=cfg.tree_span_top,
                                              span_bot=cfg.tree_span_bot,
                                              defer_rs=defer,
                                              bisect_group=bgrp,
                                              fuse=fuse,
                                              need_r=need_tr,
                                              quant=getattr(
                                                  cfg, "tree_quant",
                                                  "off"))
    lean = getattr(cfg, "lean_plan", False)
    if lean and cfg.order >= 0:
        # feature-major arrays built directly, no point-major Blocks:
        # drops ~5.4 GB of never-read intermediates at N=1e8 (the
        # Pallas executor consumes only src_fm/tgt_geo). pad8=False
        # stores the true feature rows; the pregather fetch pads per
        # chunk (grav3d: 5 rows stored instead of 8).
        # the dma fetch DMAs whole fm rows and needs sublane-aligned
        # feature counts; pregather pads per chunk so raw rows are fine
        pad8 = getattr(cfg, "pair_fetch", "pregather").startswith("dma")
        src_fm = eq.barycentric_fm(stree, ss, cfg.order, kernel.name,
                                   pad8=pad8)
        tgt_geo = eq.target_geo_fm(ttree, ts, cfg.order)
        sblocks = tblocks = None
    else:
        if cfg.order >= 0:
            sblocks = eq.barycentric_blocks(stree, ss, cfg.order)
            tblocks = eq.target_blocks(ttree, ts, cfg.order)
        else:
            sblocks = eq.pairmerge_blocks(stree, ss)
            tblocks = eq.target_blocks(ttree, ts, cfg.order)
        from onbody_tpu.ops import pallas_pairs as pp
        src_fm = pp.build_fm_blocks(kernel, sblocks.pos, sblocks.rad,
                                    sblocks.s)
        tgt_geo = pp.build_tgt_geo(tblocks.pos, tblocks.rad)
    tgt_inv = None
    if want_inv:
        tgt_inv = jnp.zeros((targs.n_real,), jnp.int32).at[tg].set(
            jnp.arange(tg.shape[0], dtype=jnp.int32), mode="drop")
    return Plan(stree=stree, ttree=ttree, src_sorted=ss, tgt_sorted=ts,
                src_blocks=sblocks, tgt_blocks=tblocks,
                src_gidx=sg, tgt_gidx=tg, src_fm=src_fm, tgt_geo=tgt_geo,
                tgt_inv=tgt_inv)


def _unscramble(u_sorted: jax.Array, gidx: jax.Array, n_real: int):
    """Scatter sorted-order outputs back to original target order,
    dropping padded slots (the gidx un-permute of the C-ABI layer,
    interface2dvort.cpp:301-304)."""
    out = jnp.zeros((n_real,) + u_sorted.shape[1:], u_sorted.dtype)
    return out.at[gidx].set(u_sorted, mode="drop")


def _leaf_outputs(out_blocks: jax.Array, plan: Plan, kernel: Kernel,
                  n_real: int):
    nleaf = plan.ttree.nleaf
    bs = plan.ttree.block_size
    # [nleaf, 2*nleaf) — rows beyond are split-equivalent extension rows
    leaf = out_blocks[nleaf:2 * nleaf, :bs, :].reshape(-1, kernel.od)
    # gather through the precomputed inverse permutation (TPU gathers
    # are much faster than scatters; the scatter cost moved to prepare)
    if plan.tgt_inv is None:                  # prepare(want_inv=False)
        return _unscramble(leaf, plan.tgt_gidx, n_real)
    return leaf[plan.tgt_inv]


def solve_treecode2(kernel: Kernel, cfg: SolverConfig, plan: Plan,
                    theta: Optional[float] = None) -> jax.Array:
    """Equivalent-particle treecode, pointwise-conservative MAC."""
    theta = cfg.theta_pointwise if theta is None else theta
    parts = eq.n_eq_parts(plan.tgt_geo.shape[-1], cfg.order, kernel.pd)
    pl = lists.build_treecode_pairs(plan.stree, plan.ttree, theta,
                                    "pointwise", cfg.frontier_width,
                                    cfg.list_width, src_parts=parts)
    out, info = pexec.exec_pairs(kernel, cfg, plan, pl, cfg.list_width,
                                 cfg.cap_groups_treecode)
    return _leaf_outputs(out, plan, kernel, plan.tgt_sorted.n_real), info


def solve_treecode3(kernel: Kernel, cfg: SolverConfig, plan: Plan,
                    theta: Optional[float] = None) -> jax.Array:
    """Boxwise treecode — the production path of the C-ABI layer
    (interface2dvort.cpp:289-293)."""
    theta = cfg.theta_boxwise if theta is None else theta
    parts = eq.n_eq_parts(plan.tgt_geo.shape[-1], cfg.order, kernel.pd)
    pl = lists.build_treecode_pairs(plan.stree, plan.ttree, theta,
                                    "boxwise", cfg.frontier_width,
                                    cfg.list_width, src_parts=parts)
    out, info = pexec.exec_pairs(kernel, cfg, plan, pl, cfg.list_width,
                                 cfg.cap_groups_treecode)
    return _leaf_outputs(out, plan, kernel, plan.tgt_sorted.n_real), info


_MONO_SLICE_LEAVES = 4096


@partial(jax.jit, static_argnames=("kernel", "core", "accum_dtype", "maxm"))
def _monopole_eval(kernel: Kernel, tgt_pos, tgt_rad, mono_pos, mono_rad,
                   mono_str, core, accum_dtype, maxm):
    """Evaluate gathered per-leaf monopole sets: (L, bs, OD).

    Sliced with lax.map over leaf blocks: the whole-array vmap at
    L=65536 leaves x K=1024 list width reproducibly crashed the XLA
    TPU compiler (tpu_compile_helper exit 1, r5 1e7 sweep) and its
    gathered operand alone is ~0.8 GB; 4096-leaf slices compile and
    bound the buffers, identically (leaf-independent math)."""
    def per_leaf(tx, trad, mx, mr, ms):
        return kernel.tile(tx, trad, mx, mr, ms, core, accum_dtype, "exact")

    L = tgt_pos.shape[0]
    cap = _MONO_SLICE_LEAVES
    if L <= cap or L % cap:
        return jax.vmap(per_leaf)(tgt_pos, tgt_rad, mono_pos, mono_rad,
                                  mono_str)
    nsl = L // cap

    def body(args):
        return jax.vmap(per_leaf)(*args)

    out = jax.lax.map(body, tuple(
        a.reshape(nsl, cap, *a.shape[1:])
        for a in (tgt_pos, tgt_rad, mono_pos, mono_rad, mono_str)))
    return out.reshape(L, *out.shape[2:])


def solve_treecode1(kernel: Kernel, cfg: SolverConfig, plan: Plan,
                    theta: Optional[float] = None) -> jax.Array:
    """Monopole treecode: far nodes as single CM pseudo-particles."""
    theta = cfg.theta_treecode1 if theta is None else theta
    pl_rows, cnt, ov = lists._treecode_lists(
        plan.stree, plan.ttree, jnp.float32(theta), "treecode1",
        plan.stree.levels, cfg.frontier_width, cfg.list_width)
    nleaf_s = plan.stree.nleaf
    nleaf_t = plan.ttree.nleaf
    bs = plan.ttree.block_size

    # split accepted rows: interior -> monopoles, leaves -> direct pairs
    # (static width: no host syncs in the solve path; node 0 is inert)
    is_interior = (pl_rows > 0) & (pl_rows < nleaf_s)
    mono_ids, mono_ov = lists._compact_rows(
        jnp.where(is_interior, pl_rows, 0), cfg.list_width)
    ov = ov + mono_ov

    mono_pos = plan.stree.x[mono_ids]                 # (L, M, PD)
    mono_rad = plan.stree.pr[mono_ids]
    mono_str = plan.stree.s[mono_ids]
    # node 0 has zero strength sums -> inert padding
    tgt_pos = plan.tgt_sorted.x.reshape(nleaf_t, bs, -1)
    tgt_rad = plan.tgt_sorted.r.reshape(nleaf_t, bs)
    far = _monopole_eval(kernel, tgt_pos, tgt_rad, mono_pos, mono_rad,
                         mono_str, cfg.core_func, cfg.accum_dtype,
                         cfg.list_width)

    # near: leaf-leaf direct via the standard pair executor
    leaf_rows = jnp.where(pl_rows >= nleaf_s, pl_rows, 0)
    tgt_ids = jnp.broadcast_to(
        jnp.arange(nleaf_t, 2 * nleaf_t, dtype=jnp.int32)[:, None],
        leaf_rows.shape)
    pl = lists.PairList(tgt=tgt_ids.reshape(-1), src=leaf_rows.reshape(-1),
                        n_valid=jnp.sum(leaf_rows != 0, dtype=jnp.int32), overflow=ov)
    out, info = pexec.exec_pairs(kernel, cfg, plan, pl, cfg.list_width,
                                 cfg.cap_groups_treecode)
    out = out.at[nleaf_t:2 * nleaf_t, :bs].add(far)
    return _leaf_outputs(out, plan, kernel, plan.tgt_sorted.n_real), info
