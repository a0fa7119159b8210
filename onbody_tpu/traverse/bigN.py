"""N=1e9 single-chip DTT: stratified generation + slab-rebuild caching.

The generic out-of-core solver (traverse/outofcore.py) uses the host as
the capacity tier; through the axon tunnel the host<->device link
measures ~6.5 MB/s (docs/PERF.md r4) — the ~175 GB it would move at
N=1e9 is hours of wall-clock that a co-located host would do in
minutes. This module reaches the reference's last published row
(N=1e9, README.md:90: 85 s build + 1160 s DTT on a 128 GB host) with
the DEVICE as the only storage tier:

  * STRATIFIED PROBLEM: the benchmark cube is generated per-stratum —
    a 2^split-way k-d grid of equal sub-boxes, each holding exactly
    n/2^split uniform particles from its own fold_in'd PRNG key
    (stratified uniform sampling; the reference's own 1e9 row is the
    same uniform-cube workload). Strata ARE the top-split subtrees, so
    no global partition pass (and none of its tunnel traffic) exists.
  * SUBTREE BUILDS ON DEMAND: each stratum's ~1.6e7-particle tree +
    feature blocks build in ~2-3 s with the standard machinery. Local
    tree GEOMETRY is written straight into resident global tree arrays
    (device-to-device); fm slabs (~0.7 GB each, 43 GB total) cannot all
    stay in 16 GB HBM, so an LRU cache holds the hottest ~8 and a miss
    REBUILDS the slab from its regenerated stratum — compute is the
    capacity tier.
  * CHUNK LOOP: per target stratum — MAC lists against the resident
    global geometry trees (lists._dtt_lists_top/_dtt_lists_sub), pair
    list sorted by source owner, per-owner segments executed against
    the owner's cached/rebuilt slab, downward prolongation, and
    ON-DEVICE validation-subsample extraction. Full outputs live only
    transiently per chunk (the reference driver also never persists
    its 1e9 outputs — they are validated and dropped in-memory,
    ongrav3d.cpp:781-790).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import Kernel
from onbody_tpu.parts import Parts
from onbody_tpu.tree import build as tree_build
from onbody_tpu.tree import equivalents as eq
from onbody_tpu.tree.build import Tree
from onbody_tpu.traverse import lists
from onbody_tpu.parallel.mesh import (_downward_local, _exec_groups_slab,
                                      local_rows)


def _sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim].astype(jnp.float32)))


def stratum_box(t: int, split: int):
    """Sub-box of stratum t in the unit cube [-1, 1]^3: `split` k-d
    halvings cycling axes x,y,z,x,... (the VAMsplit axis choice for a
    cube is the longest axis — cycling matches it exactly for uniform
    strata)."""
    lo = np.array([-1.0, -1.0, -1.0])
    hi = np.array([1.0, 1.0, 1.0])
    for l in range(split):
        ax = l % 3
        bit = (t >> (split - 1 - l)) & 1
        mid = 0.5 * (lo[ax] + hi[ax])
        if bit:
            lo[ax] = mid
        else:
            hi[ax] = mid
    return lo, hi


def make_stratified_gen(key, n: int, split: int, sd: int,
                        sources: bool):
    """gen(t) -> Parts: n/2^split uniform particles in stratum t's box,
    with random_in_cube-style radii/strengths (parts.py conventions:
    r = 1/sqrt(n) spacing class, s ~ U(-1,1)/n)."""
    ndev = 1 << split
    assert n % ndev == 0
    m = n // ndev

    def gen(t: int) -> Parts:
        k = jax.random.fold_in(key, t)
        lo, hi = stratum_box(t, split)
        kx, ks_ = jax.random.split(k)
        x = jax.random.uniform(kx, (m, 3), jnp.float32,
                               minval=0.0, maxval=1.0)
        x = jnp.asarray(lo, jnp.float32) + x * jnp.asarray(
            hi - lo, jnp.float32)
        r = jnp.full((m,), (1.0 / n) ** (1.0 / 3.0), jnp.float32)
        s = None
        if sources and sd:
            s = (jax.random.uniform(ks_, (m, sd), jnp.float32,
                                    minval=-1.0, maxval=1.0) / n)
        return Parts(x=x, r=r, s=s, n_real=m)
    return gen


class _SlabCache:
    """LRU cache of source fm slabs keyed by stratum; a miss rebuilds
    the stratum (regenerate -> build_tree -> featurize)."""

    def __init__(self, build_fn, capacity: int):
        self.build = build_fn
        self.cap = capacity
        self.d: Dict[int, jax.Array] = {}
        self.order = []
        self.hits = 0
        self.misses = 0

    def put(self, t: int, v):
        """Insert without counting a hit/miss (warm-pass seeding: the
        source pass builds every slab once anyway — r4 discarded them
        and chunk 0 immediately rebuilt the first cache-ful)."""
        if t in self.d:
            self.order.remove(t)
        while len(self.order) >= self.cap:
            old = self.order.pop(0)
            del self.d[old]
        self.d[t] = v
        self.order.append(t)

    def get(self, t: int):
        if t in self.d:
            self.hits += 1
            self.order.remove(t)
            self.order.append(t)
            return self.d[t]
        self.misses += 1
        while len(self.order) >= self.cap:
            old = self.order.pop(0)
            del self.d[old]
        v = self.build(t)
        self.d[t] = v
        self.order.append(t)
        return v


def solve_dtt_stratified(kernel: Kernel, cfg: SolverConfig, n: int,
                         key, split: int = 6,
                         theta: Optional[float] = None,
                         slab_cache: int = 8,
                         n_val: int = 256,
                         coarse_depth: int = 6,
                         exec_groups: int = 4096,
                         profile: bool = True,
                         debug_out: dict = None):
    """Full stratified-cube DTT at N up to 1e9 on one chip.

    Returns (stats, info): stats = {"val_rel_rms": float, ...} computed
    against an on-device streamed direct subsample; info carries
    n_valid/overflow. Outputs are validated in-memory per chunk, like
    the reference driver's 1e9 run (ongrav3d.cpp:781-790)."""
    assert cfg.order >= 0
    # exec_groups slices must tile the power-of-two _bucket caps
    # exactly: a ragged final slice per distinct remainder shape means
    # extra compiles through the slow remote-compile tunnel
    assert exec_groups >= 1 and (exec_groups & (exec_groups - 1)) == 0, \
        f"exec_groups must be a power of two, got {exec_groups}"
    bs = cfg.block_size
    pd, sd, od = kernel.pd, kernel.sd, kernel.od
    assert pd == 3, "stratified cube generator is 3D"
    assert eq.n_eq_parts(bs, cfg.order, pd) == 1
    theta = cfg.theta_dtt if theta is None else theta
    ndev = 1 << split
    levels_glob, n_pad = tree_build.plan(n, bs)
    assert levels_glob > split + 1
    levels_loc = levels_glob - split
    n_sub_pad = n_pad // ndev
    m = n // ndev
    nleaf_glob = 1 << levels_glob
    nn_glob = 2 * nleaf_glob
    order = cfg.order
    M = (order + 1) ** pd

    ks, kt = jax.random.split(jax.random.PRNGKey(0) if key is None
                              else key)
    gen_s = make_stratified_gen(ks, n, split, sd, True)
    gen_t = make_stratified_gen(kt, n, split, 0, False)

    t0 = [time.perf_counter()]
    t_start = t0[0]

    def ph(label, sync_on=None):
        if not profile:
            return
        if sync_on is not None:
            _sync(sync_on)
        now = time.perf_counter()
        mem = ""
        try:
            st = jax.devices()[0].memory_stats()
            mem = (f"  hbm {st['bytes_in_use'] / 2**30:5.2f}"
                   f" (peak {st['peak_bytes_in_use'] / 2**30:5.2f})")
        except Exception:
            pass
        print(f"[bigN] {label:22s} {now - t0[0]:8.2f} s{mem}",
              flush=True)
        t0[0] = now

    # resident global tree arrays (geometry + stats), filled in place
    def empty_tree():
        return dict(
            nc=jnp.zeros((nn_glob, pd), jnp.float32),
            ns=jnp.zeros((nn_glob, pd), jnp.float32),
            nr=jnp.zeros((nn_glob,), jnp.float32),
            x=jnp.zeros((nn_glob, pd), jnp.float32),
            s=jnp.zeros((nn_glob, max(sd, 1)), jnp.float32),
            pr=jnp.zeros((nn_glob,), jnp.float32),
            alive=jnp.zeros((nn_glob,), bool))

    @jax.jit
    def _write_local(arr, fields, t):
        """Scatter one local tree's rows into the global arrays."""
        for lam in range(levels_loc + 1):
            w = 1 << lam
            gl0 = (1 << (split + lam)) + t * w
            for f in arr:
                arr[f] = jax.lax.dynamic_update_slice_in_dim(
                    arr[f], fields[f][w:2 * w], gl0, 0)
        return arr

    def build_stratum(gen, t, is_src):
        p = gen(t)
        tree, sp, gl = tree_build.build_tree(
            [p], bs, mode=cfg.tree_mode, span=cfg.tree_span,
            span_top=cfg.tree_span_top,
            defer_rs=getattr(cfg, "tree_defer_rs", True),
            fuse=max(1, min(getattr(cfg, "tree_fuse", 1), 2)),
            need_r=is_src or kernel.uses_tr,
            quant=getattr(cfg, "tree_quant", "off"),
            force_plan=(levels_loc, n_sub_pad))
        return tree, sp, gl

    # ---------------------------------------------------- source pass
    sarr = empty_tree()
    root_grid = jnp.zeros((ndev, M, pd), jnp.float32)
    root_eq = jnp.zeros((ndev, M, sd), jnp.float32)
    w_sub = np.zeros(ndev, np.float64)
    rfirst = np.zeros(ndev, np.float32)

    def tree_fields(tree):
        return {f: getattr(tree, f) for f in
                ("nc", "ns", "nr", "x", "s", "pr", "alive")}

    # cached slabs are stored ALREADY CONCATENATED with the top rows
    # (r4 concatenated per owner VISIT: one extra ~0.7 GB alloc + copy
    # per visit, ~1300 visits at split 6). top_fm exists only after the
    # top assembly below, hence the mutable ref.
    _top_ref = {}

    def build_src_slab(t):
        """Concatenated [top | local] fm slab of source stratum t
        (cache rebuild path)."""
        tree, sp, _ = build_stratum(gen_s, t, True)
        fm = eq.barycentric_fm(tree, sp, order, kernel.name,
                               pad8=False, flat=True)
        return jnp.concatenate([_top_ref["fm"], fm[1:]], axis=0)

    cache = _SlabCache(build_src_slab, slab_cache)

    # resident coarse tier: every stratum's fm rows for local levels
    # 0..k_coarse (global levels split..split+k_coarse) stay on device
    # (~tens of MB total). Distant strata are only ever referenced at
    # these coarse levels, so only spatially-near strata pull full
    # slabs through the rebuild cache — without this, EVERY chunk
    # references EVERY stratum (measured: owners == 2^split at 1e8)
    # and the cache never hits.
    k_coarse = max(0, min(coarse_depth, levels_loc - 1))
    n_crows = (2 << k_coarse) - 1          # local ids 1..2^(k+1)-1
    coarse_rows = []
    for t in range(ndev):
        tree, sp, _ = build_stratum(gen_s, t, True)
        sarr = _write_local(sarr, tree_fields(tree), jnp.int32(t))
        fm, rg, re = eq.barycentric_fm(tree, sp, order, kernel.name,
                                       pad8=False, flat=True,
                                       return_root=True)
        coarse_rows.append(fm[1:1 + n_crows])
        cache.put(t, fm)  # seed the LRU from the warm pass (raw rows;
        # converted to [top | local] layout after the top assembly)
        root_grid = root_grid.at[t].set(rg)
        root_eq = root_eq.at[t].set(re)
        if sd == 1:
            w_sub[t] = float(jnp.sum(jnp.abs(sp.s)))
        else:
            w_sub[t] = float(jnp.sum(jnp.sqrt(jnp.sum(sp.s * sp.s, 1))))
        rfirst[t] = float(sp.r[0])
    ph("src strata geometry", sarr["nc"])

    # ---------------------------------------------------- target pass
    tarr = empty_tree()
    w_tsub = np.full(ndev, float(m), np.float64)
    for t in range(ndev):
        tree, sp, gl = build_stratum(gen_t, t, False)
        tarr = _write_local(tarr, tree_fields(tree), jnp.int32(t))
        del tree, sp, gl
    ph("tgt strata geometry", tarr["nc"])

    # ------------------------------------------------------ top merge
    def top_merge(arr, w_roots):
        w = jnp.asarray(w_roots, jnp.float32)
        cm = arr["x"][ndev:2 * ndev]
        sst = arr["s"][ndev:2 * ndev]
        pr = arr["pr"][ndev:2 * ndev]
        al = arr["alive"][ndev:2 * ndev]
        nc0 = arr["nc"][ndev:2 * ndev]
        ns0 = arr["ns"][ndev:2 * ndev]
        lo = nc0 - 0.5 * ns0
        hi = nc0 + 0.5 * ns0
        for l in range(split - 1, -1, -1):
            n_l = 1 << l
            w0, w1 = w[0::2], w[1::2]
            wp = w0 + w1
            safe = 1e-20 + wp
            anyw = wp > 1e-12
            cm = jnp.where(anyw[:, None],
                           (cm[0::2] * w0[:, None]
                            + cm[1::2] * w1[:, None]) / safe[:, None],
                           0.5 * (cm[0::2] + cm[1::2]))
            pr = jnp.where(anyw, (pr[0::2] * w0 + pr[1::2] * w1) / safe,
                           0.5 * (pr[0::2] + pr[1::2]))
            sst = sst[0::2] + sst[1::2]
            al = al[0::2] | al[1::2]
            lo = jnp.minimum(lo[0::2], lo[1::2])
            hi = jnp.maximum(hi[0::2], hi[1::2])
            w = wp
            sl = slice(n_l, 2 * n_l)
            arr["x"] = arr["x"].at[sl].set(cm)
            arr["s"] = arr["s"].at[sl].set(sst)
            arr["pr"] = arr["pr"].at[sl].set(pr)
            arr["nc"] = arr["nc"].at[sl].set(0.5 * (lo + hi))
            arr["ns"] = arr["ns"].at[sl].set(hi - lo)
            arr["nr"] = arr["nr"].at[sl].set(
                0.5 * jnp.sqrt(jnp.sum((hi - lo) ** 2, axis=1)))
            arr["alive"] = arr["alive"].at[sl].set(al)
        return arr

    sarr = top_merge(sarr, w_sub)
    tarr = top_merge(tarr, w_tsub)

    def to_tree(arr):
        return Tree(nc=arr["nc"], ns=arr["ns"], nr=arr["nr"],
                    x=arr["x"], s=arr["s"], pr=arr["pr"],
                    alive=arr["alive"], levels=levels_glob,
                    block_size=bs)

    stree = to_tree(sarr)
    ttree = to_tree(tarr)
    if debug_out is not None:
        debug_out["stree"] = stree
        debug_out["ttree"] = ttree
    del sarr, tarr

    # top source proxies
    from onbody_tpu.ops.kernels import featurize_flat
    c_flat = None
    child_pos, child_str = root_grid, root_eq
    rf = jnp.asarray(rfirst)
    top_fm_levels = []
    for l in range(split - 1, -1, -1):
        nseg = 1 << l
        nc_l = stree.nc[nseg:2 * nseg]
        ns_l = jnp.maximum(stree.ns[nseg:2 * nseg], 1e-20)
        src_pos = child_pos.reshape(nseg, -1, pd)
        src_str = child_str.reshape(nseg, -1, sd)
        eq_s = eq.anterp_factored(src_pos, nc_l, ns_l, order, src_str)
        grid = eq._grid_positions(nc_l, ns_l, order)
        rf = rf[0::2]
        pos_w = jnp.concatenate(
            [grid, jnp.broadcast_to(nc_l[:, None, :],
                                    (nseg, bs - M, pd))], axis=1)
        st_w = jnp.concatenate(
            [eq_s, jnp.zeros((nseg, bs - M, sd), jnp.float32)], axis=1)
        rad_w = jnp.broadcast_to(rf[:, None], (nseg, bs))
        rows = jax.vmap(lambda p_, r_, s_: featurize_flat(
            kernel.name, p_, r_, s_))(pos_w, rad_w, st_w)
        top_fm_levels.append((nseg, rows))
        child_pos, child_str = grid, eq_s
    c_flat = top_fm_levels[0][1].shape[-1]
    top_fm = jnp.zeros((ndev, c_flat), jnp.float32)
    # row 0 = the inert pad row (every padded group entry gathers it):
    # featurized with RADIUS 1 so a target grid point exactly at the
    # origin cannot produce rsqrt(<=0) — the r5 1e9 NaN (three top
    # nodes corner exactly at (0,0,0) at split 6; see equivalents.py
    # safe0 and docs/PERF.md "r5 1e9 NaN hunt")
    top_fm = top_fm.at[0].set(featurize_flat(
        kernel.name, jnp.zeros((bs, pd), jnp.float32),
        jnp.ones((bs,), jnp.float32),
        jnp.zeros((bs, sd), jnp.float32)))
    for nseg, rows in top_fm_levels:
        top_fm = jax.lax.dynamic_update_slice_in_dim(top_fm, rows,
                                                     nseg, 0)
    # coarse slab layout: rows [0, ndev) top nodes, then stratum t's
    # coarse local ids 1..n_crows at ndev + t*n_crows + (lid-1)
    coarse_slab = jnp.concatenate(
        [top_fm, jnp.concatenate(coarse_rows, axis=0)], axis=0)
    del coarse_rows
    _top_ref["fm"] = top_fm
    # warm-seeded slabs were stored raw (top_fm did not exist yet):
    # rewrite them in the [top | local] cached layout
    for t_seed in list(cache.order):
        cache.d[t_seed] = jnp.concatenate(
            [top_fm, cache.d[t_seed][1:]], axis=0)
    ph("top assembly", top_fm)

    # ------------------------------------------------------- top lists
    W = cfg.frontier_width
    top_t, top_s, cand_roots, ov_top = lists._dtt_lists_top(
        stree, ttree, jnp.float32(theta), levels_glob, split, W,
        cfg.mac_geometry)
    overflow = int(np.asarray(ov_top))
    total_valid = int(np.asarray(jnp.sum(top_s != 0, dtype=jnp.int32)))
    ph("top lists", top_t)

    glob_all, local = local_rows(levels_glob, ndev)
    loc = jnp.asarray(local)
    g = cfg.pair_group
    rows_chunk = ndev + (2 << levels_loc) - 1
    cap = max(1024, rows_chunk * (cfg.cap_groups_dtt * 8 // g))
    backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    wleaf = 1 << levels_loc
    leaf0_loc = ndev + wleaf - 1

    # validation subsample: every tskip-th ORIGINAL target overall ==
    # every tskip-th slot of each stratum's generation order
    tskip = max(1, (n // n_val))
    val_got, val_pos, val_rad = [], [], []

    # NOTE: every large array is threaded as an ARGUMENT, never a
    # closure — jit closure constants are serialized into the compile
    # request, and through the axon remote-compile tunnel the global
    # trees + the 2*2^levels row-translation table overflow the HTTP
    # body limit at split 6 (measured: HTTP 413 at N=1e9).
    @jax.jit
    def _chunk_lists(st, tt, top_t, top_s, loc, cand_row, root):
        sub_t, sub_s, nv, ovc = lists._dtt_lists_sub(
            st, tt, jnp.float32(theta), cand_row, root,
            levels_glob, levels_glob, split, W, cfg.mac_geometry)
        tl = jnp.concatenate([top_t, loc[sub_t]])
        sl = jnp.concatenate([top_s, sub_s])
        # source owner per entry (top rows < ndev are replicated in
        # every slab -> owner -1 rides the first executed owner's pass)
        lev = jnp.int32(31) - jax.lax.clz(jnp.maximum(sl, 1).astype(
            jnp.int32))
        owner = jnp.where(sl == 0, jnp.int32(ndev),
                          jnp.where(sl < ndev, -1,
                                    (sl >> jnp.maximum(lev - split, 0))
                                    - ndev))
        deep = (owner >= 0) & (owner < ndev) & (lev > split + k_coarse)
        sl_loc = jnp.where(sl < ndev, sl, loc[sl])
        # coarse-tier row translation (valid where not deep):
        lam = jnp.maximum(lev - split, 0)
        j = sl - (jnp.int32(1) << lev)
        lid = (jnp.int32(1) << lam) + (j - owner * (jnp.int32(1) << lam))
        crow = jnp.where(sl < ndev, sl,
                         ndev + owner * n_crows + lid - 1)
        # EXACT per-owner group counts: the masked per-owner lists keep
        # entries at their builder positions (never reordered — see
        # _owner_groups), so an owner's entries in one W-row are NOT
        # front-compacted and can touch more G-chunks than
        # ceil(count/g). Count the SURVIVING G-chunKS exactly: a chunk
        # survives for owner o iff it contains >= 1 valid entry of o
        # (mirrors _compact_groups' `keep = any(src != 0)`).
        L = sl.shape[0]
        chunkid = jnp.arange(L, dtype=jnp.int32) // g
        okey = jnp.where(deep, owner, ndev)      # non-deep -> ndev
        valid = (sl != 0).astype(jnp.int32)
        n_ch = L // g
        pres = jnp.zeros((n_ch * (ndev + 1),), jnp.int32).at[
            chunkid * (ndev + 1) + okey].max(valid, mode="drop")
        gcount = jnp.sum(pres.reshape(n_ch, ndev + 1), axis=0)
        oc = jnp.zeros((ndev + 1,), jnp.int32).at[okey].add(
            valid, mode="drop")                  # entry counts
        return tl, sl_loc, crow, deep, owner, oc, gcount, nv, ovc

    def _bucket(k, mins=1 << 12):
        b = mins
        while b < k:
            b *= 2
        return b

    @jax.jit
    def _exec_segment(out, geo, slab, gt, gs):
        return _exec_groups_slab(kernel, cfg, geo, slab, gt, gs, out,
                                 backend)

    # per-owner masked group extraction: the list keeps its W-slots-
    # per-target structure (group_pairs' G-chunks must never mix
    # targets), so owners are selected by MASK, not by reordering
    @partial(jax.jit, static_argnames=("cap_o",))
    def _owner_groups(tl, sl_loc, deep, owner, o, cap_o):
        # mask ONLY src: group_pairs reads each G-chunk's target from
        # its FIRST slot (every W-run shares one target), so a masked
        # tgt would reroute a chunk whose first slot is foreign-owned
        # to the discarded row 0
        m = deep & (owner == o)
        pl_o = lists.PairList(tgt=tl,
                              src=jnp.where(m, sl_loc, 0),
                              n_valid=jnp.sum(m, dtype=jnp.int32),
                              overflow=jnp.int32(0))
        return lists.group_pairs(pl_o, cap_o, g, W)

    @partial(jax.jit, static_argnames=("cap_o",))
    def _coarse_groups(tl, crow, deep, cap_o):
        m = ~deep
        pl_c = lists.PairList(tgt=tl,
                              src=jnp.where(m, crow, 0),
                              n_valid=jnp.sum(m, dtype=jnp.int32),
                              overflow=jnp.int32(0))
        return lists.group_pairs(pl_c, cap_o, g, W)

    @jax.jit
    def _finish_chunk(out, geo, tnc, tns, glob_c, c):
        posl = jnp.transpose(geo[:, :pd, :], (0, 2, 1))
        out = _downward_local(out, tnc[glob_c], tns[glob_c],
                              posl, order, levels_glob, split, bs,
                              c)
        return out[leaf0_loc:leaf0_loc + wleaf, :bs, :]

    seg_pad = {}

    # Chunk order: REVERSED stratum index. Stratum indices are k-d
    # codes (first split = highest bit, axes cycling), i.e. a Morton
    # order — consecutive indices are spatial siblings sharing most of
    # their deep-owner neighborhoods. The warm pass leaves the LRU
    # holding the LAST slab_cache strata, so processing starts at
    # chunk ndev-1 where those seeds are the neighborhood.
    # debug instrumentation (exp_r5_nanprobe stage 2): scan every
    # SHARED array for non-finites, then optionally process only the
    # listed chunks with per-stage NaN counts
    dbg_only = None if debug_out is None else debug_out.get("only_chunks")
    dbg_scan = bool(debug_out) and debug_out.get("stage_scan")

    def _bad(x):
        return int(np.asarray(jnp.sum(~jnp.isfinite(x),
                                      dtype=jnp.int32)))

    if dbg_scan:
        for nm, a in (("coarse_slab", coarse_slab), ("top_fm", top_fm),
                      ("stree.nc", stree.nc), ("stree.ns", stree.ns),
                      ("stree.nr", stree.nr), ("stree.x", stree.x),
                      ("ttree.nc", ttree.nc), ("ttree.ns", ttree.ns),
                      ("ttree.nr", ttree.nr), ("ttree.x", ttree.x)):
            b = _bad(a)
            if b:
                print(f"[scan] {nm}: BAD {b}", flush=True)
        print("[scan] shared arrays done", flush=True)

    for ci, c in enumerate(range(ndev - 1, -1, -1)):
        if dbg_only is not None and c not in dbg_only:
            continue
        root = jnp.int32(ndev + c)
        ov_prev = overflow
        # rebuild the target stratum (sorted positions for geo slab)
        # and extract the validation-sample slot selectors + positions
        # FIRST: the inverse-permutation scatter and position gathers
        # run while HBM is at its emptiest, and tsp/tgl/ttree_l
        # (~470 MB at split 6) are freed before the exec phase — the
        # first r5 1e9 attempt OOMed running this extraction AFTER the
        # chunk's exec with everything still resident.
        ttree_l, tsp, tgl = build_stratum(gen_t, c, False)
        idx = jnp.arange(0, m, tskip, dtype=jnp.int32)
        # original order -> sorted slot: invert tgl on device
        inv = jnp.zeros((n_sub_pad,), jnp.int32).at[tgl].set(
            jnp.arange(tgl.shape[0], dtype=jnp.int32), mode="drop")
        sel = jnp.copy(inv[idx])         # (m//tskip,) tiny
        val_pos.append(np.asarray(tsp.x[sel]))
        val_rad.append(np.asarray(tsp.r[sel]))
        geo = eq._target_geo_slab_impl(
            ttree, tsp.x, tsp.r, root, order, levels_glob, split, bs,
            x_base=jnp.int32(c * n_sub_pad))
        _sync(geo)
        del ttree_l, tsp, tgl, inv, idx

        tl, sl_loc, crow, deep, owner, oc, gcount, nv, ovc = \
            _chunk_lists(stree, ttree, top_t, top_s, loc,
                         cand_roots[c:c + 1], root)
        total_valid += int(np.asarray(nv))
        overflow += int(np.asarray(ovc))
        oc_h = np.asarray(oc)            # (ndev+1,) small fetches
        gc_h = np.asarray(gcount)

        out = jnp.zeros((rows_chunk, bs, od), cfg.accum_dtype)

        # coarse pass: top rows + every stratum's shallow proxies ride
        # the resident coarse slab — one exec, no slab pulls. Group
        # runs are SLICED to <= exec_groups chunks: the pregather
        # executor materializes a (P*g, B, C) gathered-source buffer,
        # and an unbounded per-owner bucket peaks ~2.7 GB at split 6
        # (the r4 1e9 OOM); _bucket yields powers of two >= 4096, so
        # exec_groups=4096 slices are exact and every exec call shares
        # ONE compiled program.
        def _exec_sliced(out, slab, pg):
            for i in range(0, pg.tgt.shape[0], exec_groups):
                out = _exec_segment(out, geo, slab,
                                    pg.tgt[i:i + exec_groups],
                                    pg.src[i:i + exec_groups])
            return out

        if dbg_scan:
            print(f"[scan] chunk {c}: geo BAD {_bad(geo)}  "
                  f"out0 BAD {_bad(out)}", flush=True)
        cap_c = _bucket(int(gc_h[ndev]) + 16)
        pgc = _coarse_groups(tl, crow, deep, cap_c)
        overflow += int(np.asarray(pgc.overflow))
        out = _exec_sliced(out, coarse_slab, pgc)
        if dbg_scan:
            print(f"[scan] chunk {c}: after coarse exec out BAD "
                  f"{_bad(out)}", flush=True)

        # deep pass: only spatially-near strata have deep references.
        # Owner visit order ZIGZAGS across chunks (descending on the
        # first processed chunk — matching the warm-pass seeds — then
        # ascending, ...): with an LRU smaller than the neighborhood,
        # a fixed sweep direction re-evicts exactly the owners the
        # next chunk asks for first; zigzag makes the tail of one
        # chunk's visits the head of the next's.
        owners = [int(o) for o in range(ndev) if oc_h[o] > 0]
        if ci % 2 == 0:
            owners.reverse()
        for o in owners:
            cap_o = _bucket(int(gc_h[o]) + 16)
            pg = _owner_groups(tl, sl_loc, deep, owner, o, cap_o)
            overflow += int(np.asarray(pg.overflow))
            slab = cache.get(o)
            if dbg_scan:
                print(f"[scan] chunk {c}: slab {o} BAD {_bad(slab)}",
                      flush=True)
            out = _exec_sliced(out, slab, pg)
            if dbg_scan:
                print(f"[scan] chunk {c}: after owner {o} out BAD "
                      f"{_bad(out)}", flush=True)
            del slab, pg

        leaf = _finish_chunk(out, geo, ttree.nc, ttree.ns,
                             jnp.asarray(glob_all[c]), jnp.int32(c))
        # free the two biggest chunk buffers before the validation
        # extraction allocates (the r4 1e9 run died on a post-chunk
        # allocation with out+geo still live)
        del out, geo, tl, sl_loc, crow, deep, owner
        # on-device validation extraction at the precomputed slots
        got = leaf.reshape(n_sub_pad, od)[sel]
        got_h = np.asarray(got)
        val_got.append(got_h)
        # localized health counters: a NaN or overflow at 1e9 must
        # name its chunk, not just poison the final rms
        n_nan = int(np.asarray(jnp.sum(jnp.isnan(leaf),
                                       dtype=jnp.int32)))
        ov_c = overflow - ov_prev
        ph(f"chunk {c} (deep owners {len(owners)}, "
           f"cache {cache.hits}h/{cache.misses}m"
           + (f", NAN {n_nan}" if n_nan else "")
           + (f", ovf +{ov_c}" if ov_c else "") + ")", leaf)
        del leaf, sel

    # streamed direct reference for ALL collected subsample targets in
    # ONE pass over the source strata (NOT per chunk: 64x64 stratum
    # regenerations would dominate the whole run at 1e9)
    from onbody_tpu.traverse import direct as direct_mod
    sub = Parts(x=jnp.asarray(np.concatenate(val_pos)),
                r=jnp.asarray(np.concatenate(val_rad)), s=None,
                n_real=sum(v.shape[0] for v in val_pos))
    # Per-stratum partials accumulate HOST-SIDE in np.float64 (ndev
    # tiny D2H fetches): at 1e9 an all-f32 streamed reference's own
    # accumulation random walk across ~1e6 tile partials per target is
    # no longer clearly below the 1e-4 signal being certified. The
    # within-stratum f32 tile walk (~sqrt(6e4 tiles)*eps ~ 1.5e-5,
    # independent across strata -> ~2e-6 of the total) stays
    # negligible. Reference analogue: fp64 ACCUM is its documented
    # accuracy upgrade (README.md:107-110).
    acc = np.zeros((sub.x.shape[0], od), np.float64)
    for ts_ in range(ndev):
        ps = gen_s(ts_)
        acc += np.asarray(direct_mod.direct(kernel, ps, sub),
                          np.float64)
    ref = acc
    ph("validation direct", sub.x)
    got = np.concatenate(val_got)
    rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    stats = {
        "n": n, "split": split, "theta": float(theta),
        "val_rel_rms": rel, "n_val": int(ref.shape[0]),
        "total_s": time.perf_counter() - t_start,
        "cache_hits": cache.hits, "cache_misses": cache.misses,
        "got_nan": int(np.isnan(got).sum()),
        "ref_nan": int(np.isnan(ref).sum()),
    }
    info = {"n_valid": total_valid, "overflow": overflow}
    return stats, info
