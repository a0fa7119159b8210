"""Subtree-chunked DTT solve: N=1e8-scale evaluation on one 16 GB chip.

The owner-major subtree decomposition of parallel/mesh.py, run
SEQUENTIALLY on a single device: the full (lean, feature-major) source
block array stays resident while target-side geometry, interaction
lists, pair execution, and the downward prolongation are materialized
one level-`split` target subtree at a time. Peak HBM is

    src_fm (5 rows x 2*n_pad slots)  +  sorted target particles
    + ONE subtree's tgt_geo/out/lists  (~1/n_chunks of the full arrays)

which at N=1e8 / B=256 / 8 chunks is ~9 GB instead of the ~30 GB the
monolithic plan would need. The top target levels (< split) are
descended once (lists._dtt_lists_top); every chunk re-executes the few
top-level pairs so its replicated top rows carry the same partial sums
the downward pass expects — the same trick the multi-chip path uses
(parallel/mesh.py), with ppermute ring stages replaced by the resident
global source array.

Reference scale anchor: the reference reaches N=1e8 in 114 s (DTT,
README.md:89) and N=1e9 via the same O(N) method on a 128 GB host
(README.md:90); this module is the 16 GB-HBM counterpart.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import functools

from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import Kernel
from onbody_tpu.parts import Parts
from onbody_tpu.tree import build as tree_build
from onbody_tpu.tree import equivalents as eq
from onbody_tpu.traverse import lists
from onbody_tpu.parallel.mesh import _downward_local, local_rows


@functools.partial(
    jax.jit,
    static_argnames=("kernel", "cfg", "levels_s", "levels_t", "split",
                     "cap", "backend", "use_p2"),
    donate_argnames=("out_leaf",))
def _chunk_step(kernel, cfg, stree, ttree, ts, src_fm, out_leaf,
                cand_row, root, c, loc, glob_c, top_t, top_s, theta,
                levels_s, levels_t, split, cap, backend,
                use_p2=False):
    """One target subtree: lists -> groups -> exec -> downward -> leaf
    write, as ONE jitted program (donating out_leaf).

    Eager op-by-op execution of this body kept every ~0.5 GB stage
    buffer (geo slab, exec accumulator, pregather chunks) alive across
    async dispatch boundaries and OOMed at N=1e8; under one jit XLA's
    liveness analysis frees each as soon as its consumer runs, and the
    donated out_leaf avoids a second (n, OD) result buffer.

    use_p2: sibling-paired leaf execution (cfg.dtt_leaf_pair2) — leaf
    pairs come parent-keyed from the sub builder and run through the t2
    executor (one source fetch serves both sibling leaf rows). The t2
    block index k covers slab rows [2k, 2k+2); children of the chunk's
    i-th leaf parent sit at local rows leaf0_loc + 2i, so when leaf0_loc
    is odd the geo/accumulator views are shifted one row (pad-group
    writes then land on top rows 1-2, which is harmless because the t2
    body write-throughs the accumulator unchanged for q == 0 groups —
    pallas_pairs._body_interleaved_t2's identity branch. Note node 0's
    fm row is ALL-zero including its sr^2 row, so an actual evaluation
    against it would rsqrt(0); the identity write-through, not the
    dummy block's strengths, is the safety mechanism — ADVICE r2)."""
    bs = ttree.block_size
    pd = kernel.pd
    W = cfg.frontier_width
    wleaf = 1 << (levels_t - split)
    n_chunks = 1 << split
    leaf0_loc = n_chunks + wleaf - 1

    if use_p2:
        sub_t, sub_s, p2t, p2s, nv, ovc = lists._dtt_lists_sub(
            stree, ttree, theta, cand_row, root, levels_s, levels_t,
            split, W, cfg.mac_geometry, leaf_pair2=True)
    else:
        sub_t, sub_s, nv, ovc = lists._dtt_lists_sub(
            stree, ttree, theta, cand_row, root, levels_s, levels_t,
            split, W, cfg.mac_geometry)
    tl = jnp.concatenate([top_t, loc[sub_t]])
    sl = jnp.concatenate([top_s, sub_s])
    pl = lists.PairList(tgt=tl, src=sl, n_valid=nv,
                        overflow=jnp.int32(0))
    pg = lists.group_pairs(pl, cap, cfg.pair_group, W)

    geo = eq.target_geo_slab(ttree, ts, root, cfg.order, split)
    if use_p2:
        from onbody_tpu.ops import pallas_pairs as pp
        g = cfg.pair_group
        pl2 = lists.PairList(tgt=p2t, src=p2s,
                             n_valid=jnp.sum(p2s != 0, dtype=jnp.int32),
                             overflow=jnp.int32(0))
        pg2 = lists.group_pairs(pl2, max(256, cap // 2), g, W)
        ovc = ovc + pg2.overflow
        interpret = jax.devices()[0].platform == "cpu"
        d2m = "center" if cfg.d2_mode == "center" else "outer"
        prec = getattr(cfg, "mxu_precision", "highest")
        tile_g = getattr(cfg, "pair_tile_g", 4)
        out_fm = pp.exec_pairs_pallas(
            kernel, geo, src_fm, pg.tgt, pg.src, cfg.core_func,
            cfg.accum_dtype, interpret=interpret, d2_mode=d2m, group=g,
            fetch=getattr(cfg, "pair_fetch", "pregather"),
            precision=prec, tile_g=tile_g, final=False)
        # t2 keys: i-th leaf parent of this chunk -> block index k with
        # 2k == local row of its first child (see docstring)
        parent0 = root << (levels_t - 1 - split)
        base = leaf0_loc >> 1
        keys = jnp.where(pg2.tgt != 0, pg2.tgt - parent0 + base, 0)
        fetch = getattr(cfg, "pair_fetch", "pregather")
        if leaf0_loc % 2 == 0:
            out_fm = pp.exec_pairs_pallas_t2(
                kernel, geo, src_fm, keys, pg2.src, out_fm,
                cfg.core_func, cfg.accum_dtype, interpret=interpret,
                d2_mode=d2m, group=g, precision=prec, tile_g=tile_g,
                fetch=fetch)
        else:
            head = out_fm[:1]
            tail = pp.exec_pairs_pallas_t2(
                kernel, geo[1:], src_fm, keys, pg2.src, out_fm[1:],
                cfg.core_func, cfg.accum_dtype, interpret=interpret,
                d2_mode=d2m, group=g, precision=prec, tile_g=tile_g,
                fetch=fetch)
            out_fm = jnp.concatenate([head, tail], axis=0)
        out = jnp.transpose(out_fm[:, :kernel.od, :], (0, 2, 1))
    else:
        out = jnp.zeros((geo.shape[0], bs, kernel.od), cfg.accum_dtype)
        from onbody_tpu.parallel.mesh import _exec_groups_slab
        out = _exec_groups_slab(kernel, cfg, geo, src_fm, pg.tgt,
                                pg.src, out, backend)
    nc_l = ttree.nc[glob_c]
    ns_l = ttree.ns[glob_c]
    pos_l = jnp.transpose(geo[:, :pd, :], (0, 2, 1))
    out = _downward_local(out, nc_l, ns_l, pos_l, cfg.order,
                          levels_t, split, bs, c)
    leaf = out[leaf0_loc:leaf0_loc + wleaf, :bs, :]
    out_leaf = jax.lax.dynamic_update_slice_in_dim(
        out_leaf, leaf.reshape(wleaf * bs, kernel.od),
        c * (wleaf * bs), axis=0)
    return out_leaf, nv, ovc + pg.overflow


def _psync(x):
    """Scalar fetch = true device sync (tunnel-safe, see bench.py)."""
    import numpy as _np
    a = jax.tree_util.tree_leaves(x)[0]
    return float(_np.asarray(a[(0,) * a.ndim]))


def solve_dtt_chunked(kernel: Kernel, cfg: SolverConfig,
                      srcs: Optional[Parts] = None,
                      targs: Optional[Parts] = None, n_chunks: int = 8,
                      theta: Optional[float] = None,
                      make_problem=None, make_srcs=None,
                      make_targs=None, unscramble: bool = True,
                      profile: bool = False):
    """Full DTT evaluation with target subtrees processed sequentially.

    Returns (out (n_real, OD), info PairList-like with n_valid/overflow).
    Requires order >= 0 (lean fm path) and 2^split < nleaf_t.

    make_problem: zero-arg callable returning (srcs, targs); when given,
    the solver owns the ONLY references to the originals and frees them
    as soon as the trees are built — at N=1e8 the ~4.4 GB of original
    particle arrays must not survive into the chunk loop (16 GB HBM).
    Passing srcs/targs directly keeps the caller's references alive.

    make_srcs/make_targs: per-side zero-arg generators — tighter still:
    only ONE side's original arrays are ever materialized at a time
    (deterministic PRNG makes per-side generation identical to a joint
    one). At N=1e8 this keeps the ~2 GB source originals out of HBM
    during the target-side sort network, which OOMed with make_problem.
    """
    import time as _time
    t_last = [_time.perf_counter()]

    def _ph(label, sync_on):
        if not profile:
            return
        _psync(sync_on)
        now = _time.perf_counter()
        mem = ""
        try:
            st = jax.devices()[0].memory_stats()
            mem = (f"  hbm {st['bytes_in_use'] / 2**30:5.2f} GiB"
                   f" (peak {st['peak_bytes_in_use'] / 2**30:5.2f})")
        except Exception:  # noqa: BLE001 — stats are best-effort
            pass
        print(f"[chunked] {label:14s} {now - t_last[0]:7.2f} s{mem}",
              flush=True)
        t_last[0] = now

    if make_problem is not None:
        assert srcs is None and targs is None
        srcs, targs = make_problem()
    if make_targs is not None:
        assert targs is None
        targs = make_targs()
    assert cfg.order >= 0, "chunked solve uses the lean barycentric path"
    assert eq.n_eq_parts(cfg.block_size, cfg.order, kernel.pd) == 1, \
        "chunked solve does not support split equivalent rows (M > B)"
    theta = cfg.theta_dtt if theta is None else theta
    split = int(np.log2(n_chunks))
    assert 1 << split == n_chunks

    # TARGET tree first: the build's sort-network buffers (~6.5 GB at
    # 1e8) must not coexist with src_fm (~5.4 GB). Ordering the phases
    # target-build -> source-build -> featurize keeps peak HBM to
    # max(originals + sort buffers, sorted arrays + src_fm) ~ 11 GB
    # instead of the ~14 GB+ that OOMed with sources first.
    # fuse>1 amortizes per-sort dispatch cost but keeps up to fuse+1
    # live column sets; clamp to 2 here (3 sets ~ 6.4 GB at N=1e8)
    fuse = max(1, min(getattr(cfg, "tree_fuse", 1), 2))
    # ownership transfer ([targs] box): the originals are dropped inside
    # build_tree right after padding, so they never coexist with the
    # sort network's multi-GB temporaries (r3 OOM fix)
    n_tgt_real = targs.n_real
    box = [targs]
    targs = None
    ttree, ts, tg = tree_build.build_tree(
        box, cfg.block_size, mode=cfg.tree_mode,
        span=cfg.tree_span, span_top=cfg.tree_span_top,
        defer_rs=getattr(cfg, "tree_defer_rs", False),
        bisect_group=getattr(cfg, "tree_bisect_group", 4), fuse=fuse,
        need_r=kernel.uses_tr)
    _ph("tgt tree", ttree.nc)

    if make_srcs is not None:
        assert srcs is None
        srcs = make_srcs()
    box = [srcs]
    srcs = None           # as above: pass ownership (see docstring)
    stree, ss, sg = tree_build.build_tree(
        box, cfg.block_size, mode=cfg.tree_mode,
        span=cfg.tree_span, span_top=cfg.tree_span_top,
        defer_rs=getattr(cfg, "tree_defer_rs", False),
        bisect_group=getattr(cfg, "tree_bisect_group", 4), fuse=fuse)
    del sg                # sources are never unscrambled (~0.5 GB at 1e8)
    _ph("src tree", stree.nc)
    # ss is only needed by the featurize; dropping the reference right
    # after lets x/r/s (~2.7 GB at 1e8) free when the program finishes
    # (donation cannot alias these shapes — see equivalents.py)
    # fm layout follows the fetch strategy: the dma kernels need
    # sublane-aligned (C, B) rows per block (pad8 — 8 rows at 1e8 is
    # ~8.6 GB vs the flat 5-row 5.4 GB; the padded rows carry the
    # mass-premultiplied positions, ops/kernels.py featurize), while
    # pregather consumes the lean flat (NN, C*B) layout.
    levels_t = ttree.levels
    assert levels_t > split, "need more target leaves than chunks"
    bs = ttree.block_size
    nleaf = ttree.nleaf

    # top lists need only tree geometry: build them BEFORE the
    # featurize so their frontier buffers never coexist with src_fm
    # (the pad8 dma layout is ~8.6 GB at 1e8 — lists_top after it
    # RESOURCE_EXHAUSTED, docs/PERF.md r2s12)
    top_t, top_s, cand_roots, ov_top = lists._dtt_lists_top(
        stree, ttree, theta, stree.levels, split, cfg.frontier_width,
        cfg.mac_geometry)
    _ph("lists_top", top_t)

    pad8 = getattr(cfg, "pair_fetch", "pregather").startswith("dma")
    src_fm = eq.barycentric_fm(stree, ss, cfg.order, kernel.name,
                               pad8=pad8, flat=not pad8)
    del ss
    _ph("featurize", src_fm)
    glob_all, local = local_rows(levels_t, n_chunks)
    loc = jnp.asarray(local)
    g = cfg.pair_group
    # static group capacity per chunk (overflow-checked)
    rows_chunk = (2 << (levels_t - split)) - 1 + n_chunks
    cap = max(1024, rows_chunk * (cfg.cap_groups_dtt * 8 // g))

    out_leaf = jnp.zeros((nleaf * bs, kernel.od), cfg.accum_dtype)
    total_valid = jnp.sum(top_s != 0, dtype=jnp.int32)
    overflow = ov_top
    from onbody_tpu.parallel.mesh import _resolve_shard_backend
    backend = _resolve_shard_backend(cfg)

    # groups: top pairs target ids are global ids < n_chunks == the
    # replicated slab rows; subtree ids translate through `loc`.
    # Both segments are W-slots-per-target (W % g == 0), so group
    # chunks never straddle a target boundary.
    theta_dev = jnp.asarray(theta, jnp.float32)
    # subtree roots holding only padding clones produce nothing but
    # still cost a full chunk step (~1.6 s each at N=1e8, where 4 of 16
    # roots are dead — power-of-two leaf padding is 34%): skip them on
    # the host. Their out_leaf rows stay zero, matching the masked
    # result the step would have produced.
    alive_roots = np.asarray(ttree.alive[n_chunks:2 * n_chunks])
    use_p2 = (getattr(cfg, "dtt_leaf_pair2", False)
              and backend == "pallas"
              and getattr(cfg, "pair_fetch", "pregather") != "static"
              and jnp.dtype(cfg.accum_dtype) != jnp.float64
              and stree.levels <= levels_t
              and split <= levels_t - 1)
    for c in range(n_chunks):
        if not bool(alive_roots[c]):
            continue
        out_leaf, nv, ovc = _chunk_step(
            kernel, cfg, stree, ttree, ts, src_fm, out_leaf,
            cand_roots[c:c + 1], jnp.int32(n_chunks + c), jnp.int32(c),
            loc, jnp.asarray(glob_all[c]), top_t, top_s, theta_dev,
            levels_s=stree.levels, levels_t=levels_t, split=split,
            cap=cap, backend=backend, use_p2=use_p2)
        total_valid = total_valid + nv
        overflow = overflow + ovc
        _ph(f"chunk {c}", out_leaf)

    ts = None             # free the sorted targets before the scatter
    info = lists.PairList(tgt=jnp.zeros((0,), jnp.int32),
                          src=jnp.zeros((0,), jnp.int32),
                          n_valid=total_valid, overflow=overflow)
    if not unscramble:
        # reference-driver convention: results stay in tree order (see
        # dtt.solve_dtt); return the permutation alongside
        return (out_leaf, tg), info
    res = jnp.zeros((n_tgt_real, kernel.od), out_leaf.dtype)
    res = res.at[tg].set(out_leaf, mode="drop")
    return res, info
