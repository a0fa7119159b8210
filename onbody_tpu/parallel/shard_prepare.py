"""Fully-sharded prepare + solve: memory scale-out over the mesh.

parallel/mesh.py shards the SOLVE (ring-streamed source slabs, local
downward) but its prepare is single-device: trees, featurize and lists
are built globally and `_gather_local` materializes global arrays
before sharding — max problem size on D chips equals max size on one
(VERDICT r3 gap #5; SURVEY §5.8 calls for source- and target-tree
sharding over ICI). This module builds EVERYTHING device-local:

  1. TOP SPLIT (collective histograms): the top split = log2(D) k-d
     levels run as exact count-based median splits on u16 codes
     (tree/hsplit.py device kernels + psum'd histograms + device-order
     tie quotas) over each device's batch shard — no particle ever
     leaves its device, only (nnode, 65536) count arrays reduce.
  2. EXCHANGE (all_to_all): each device stable-sorts its shard by owner
     and all_to_all's fixed-size buckets; received rows compact
     valid-first into the owner's n_pad/D-slot subtree slab (exact by
     the VAMsplit slot counts; bucket overflow is detected).
  3. LOCAL BUILD: each device runs the standard build_tree +
     barycentric featurize on ITS slab (static shapes; validity rides
     build_tree's gidx0 hook since per-device real counts are dynamic).
  4. TOP ASSEMBLY: subtree-root stats/geometry all_gather (KB-class),
     the finishTree weighted merges and the continued barycentric
     upward pass run replicated.
  5. LISTS + EXEC: _dtt_lists_top (replicated top) + each device's own
     _dtt_lists_sub against the all_gathered tree GEOMETRY (the one
     permitted global structure — ~11 f32 per node, not the (NN, C, B)
     block arrays), bucketed by source owner into ring stages;
     lax.ppermute streams the LOCALLY-BUILT source fm slabs around the
     ring; downward prolongation and leaf extraction stay local.

No device ever materializes a global (NN, C, B)-class array: particle
shards, fm slabs, geo slabs, lists and outputs are all 1/D-sized.
Reference: no analogue (shared-memory only, barneshut.hpp:701-704);
this is the blueprint's §5.8 scale-out row.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import Kernel
from onbody_tpu.parts import Parts
from onbody_tpu.tree import build as tree_build
from onbody_tpu.tree import equivalents as eq
from onbody_tpu.tree import hsplit
from onbody_tpu.tree.build import Tree
from onbody_tpu.traverse import lists
from onbody_tpu.parallel.mesh import (_downward_local, _exec_groups_slab,
                                      _mesh_axis, _resolve_shard_backend,
                                      local_rows)

_NB = 65536


def _axis_size(mesh):
    return mesh.devices.size


# ----------------------------------------------------------- stage 1+2

def _split_exchange_fn(x, r, s, oid, axis, split: int, n_total: int,
                       n_pad: int, cap_b: int, pd: int, sd: int):
    """shard_map body: top split + all_to_all exchange of ONE side.

    x (m, pd), r (m,), s (m, sd) or None, oid (m,) original global ids
    — this device's batch shard. Returns the device's subtree slab:
    (xs (n_sub, pd), rs, ss, gidx0, orig, count, overflow)."""
    ndev = 1 << split
    m = x.shape[0]
    n_sub = n_pad // ndev
    dev = jax.lax.axis_index(axis)

    # global real box
    lo = jax.lax.pmin(jnp.min(x, axis=0), axis)
    hi = jax.lax.pmax(jnp.max(x, axis=0), axis)
    step = jnp.maximum((hi - lo) / 65534.0, 1e-30)
    codes = jnp.clip(jnp.floor((x - lo[None, :]) / step[None, :]),
                     0, 65534).astype(jnp.int32)

    # exact top split: psum'd histograms + device-order tie quotas
    nid = jnp.zeros((m,), jnp.int32)
    blo = jnp.zeros((1, pd), jnp.float32)
    bhi = jnp.full((1, pd), 65535.0, jnp.float32)
    pads = jnp.array([n_pad - n_total], jnp.int64)
    for l in range(split):
        nnode = 1 << l
        scale = (hi - lo) / 65535.0
        axes = jnp.argmax((bhi - blo) * scale[None, :],
                          axis=1).astype(jnp.int32)
        h = hsplit.chunk_hist(codes, nid, axes, nnode)
        h = jax.lax.psum(h, axis)                      # (nnode, 65536)
        h = h.astype(jnp.int64)
        h = h.at[:, _NB - 1].add(pads)
        target = jnp.int64(n_pad // (2 * nnode))
        cum = jnp.cumsum(h, axis=1)
        planes = jnp.argmax(cum > target, axis=1).astype(jnp.int32)
        less = jnp.where(planes > 0,
                         jnp.take_along_axis(
                             cum, jnp.maximum(planes - 1, 0)[:, None],
                             1)[:, 0], 0)
        need = (target - less).astype(jnp.int32)
        # device-order tie quotas
        ties_d = hsplit.chunk_tie_counts(codes, nid, axes, planes)
        ties_all = jax.lax.all_gather(ties_d, axis)    # (D, nnode)
        before = jnp.sum(
            jnp.where(jnp.arange(ties_all.shape[0])[:, None] < dev,
                      ties_all, 0), axis=0)
        quota = jnp.clip(need - before, 0, ties_d)
        nid = hsplit.chunk_assign(codes, nid, axes, planes, quota)
        # children's pad mass (replicated arithmetic)
        real_cum = cum.at[:, _NB - 1].add(-pads)
        less_r = jnp.where(planes > 0,
                           jnp.take_along_axis(
                               real_cum,
                               jnp.maximum(planes - 1, 0)[:, None],
                               1)[:, 0], 0)
        total_ties = jnp.sum(ties_all, axis=0)
        left_reals = less_r + jnp.minimum(need.astype(jnp.int64),
                                          total_ties.astype(jnp.int64))
        pads_l = target - left_reals
        pads = jnp.stack([pads_l, pads - pads_l], axis=1).reshape(-1)
        # derived child boxes (plane-split, conservative)
        pl_f = planes.astype(jnp.float32)
        onax = (jnp.arange(pd)[None, :]
                == axes[:, None]).astype(jnp.float32)
        bhi_l = bhi * (1 - onax) + jnp.minimum(bhi, pl_f[:, None]) * onax
        blo_r = blo * (1 - onax) + jnp.maximum(blo, pl_f[:, None]) * onax
        blo = jnp.stack([blo, blo_r], axis=1).reshape(2 * nnode, pd)
        bhi = jnp.stack([bhi_l, bhi], axis=1).reshape(2 * nnode, pd)

    # ---------------- exchange: bucket by owner, all_to_all
    cols = [x[:, d] for d in range(pd)] + [r]
    if s is not None:
        cols += [s[:, d] for d in range(sd)]
    k = len(cols)
    iota = jnp.arange(m, dtype=jnp.int32)
    skey, sidx = jax.lax.sort((nid, iota), dimension=0, num_keys=1)
    cnt = jnp.zeros((ndev + 1,), jnp.int32).at[nid].add(1)
    starts = jnp.cumsum(cnt) - cnt                    # (ndev+1,)
    rank = jnp.arange(m, dtype=jnp.int32) - starts[skey]
    overflow = jnp.sum(jnp.maximum(cnt[:ndev] - cap_b, 0))
    # pack (ndev*cap_b, k+1): payload cols + orig id; slot = dest*cap_b+rank
    slot = jnp.where(rank < cap_b, skey * cap_b + rank, ndev * cap_b)
    payload = jnp.stack([c[sidx] for c in cols]
                        + [oid[sidx].astype(jnp.float32)], axis=1)
    buf = jnp.zeros((ndev * cap_b + 1, k + 1), jnp.float32)
    valid_mark = jnp.zeros((ndev * cap_b + 1,), jnp.int32)
    buf = buf.at[slot].set(payload, mode="drop")
    valid_mark = valid_mark.at[slot].set(1, mode="drop")
    buf = buf[:ndev * cap_b].reshape(ndev, cap_b, k + 1)
    vm = valid_mark[:ndev * cap_b].reshape(ndev, cap_b)
    # all_to_all: dim 0 indexes destination
    buf = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0,
                             tiled=True)
    vm = jax.lax.all_to_all(vm, axis, split_axis=0, concat_axis=0,
                            tiled=True)
    buf = buf.reshape(-1, k + 1)
    vm = vm.reshape(-1)

    # valid-first compaction into the n_sub-slot slab
    keyv = 1 - vm                                     # valid first
    order = jax.lax.sort((keyv, jnp.arange(vm.shape[0], dtype=jnp.int32)),
                         dimension=0, num_keys=1)[1]
    take = order[:n_sub]
    slab = buf[take]
    valid = vm[take] > 0
    count = jnp.sum(vm, dtype=jnp.int32)
    overflow = overflow + jnp.maximum(count - n_sub, 0)

    xs = slab[:, :pd]
    rs = slab[:, pd]
    ss = slab[:, pd + 1:pd + 1 + sd] if s is not None else None
    orig = slab[:, k].astype(jnp.int32)

    # pad rows: spread pseudo-randomly in a shell one diameter past the
    # subtree's own max corner (parts.pad_to semantics — keeps pad-leaf
    # barycentric weights conditioned), mean radius, zero strength
    big = jnp.float32(3e38)
    sub_lo = jnp.min(jnp.where(valid[:, None], xs, big), axis=0)
    sub_hi = jnp.max(jnp.where(valid[:, None], xs, -big), axis=0)
    any_v = count > 0
    sub_lo = jnp.where(any_v, sub_lo, 0.0)
    sub_hi = jnp.where(any_v, sub_hi, 1.0)
    diam = sub_hi - sub_lo + 1.0
    ranks = jnp.arange(n_sub, dtype=jnp.uint32)
    frac = []
    for mult in (2654435761, 1885667171, 3267000013):
        frac.append(((ranks * jnp.uint32(mult)) >> 12).astype(jnp.float32)
                    / jnp.float32(1 << 20) % 1.0)
    frac = jnp.stack(frac[:pd], axis=1)
    padx = sub_hi[None, :] + diam[None, :] * (0.5 + frac)
    rmean = (jnp.sum(jnp.where(valid, rs, 0.0))
             / jnp.maximum(count.astype(jnp.float32), 1.0))
    rmean = jnp.maximum(jnp.where(any_v, rmean, 1.0), 1e-6)
    xs = jnp.where(valid[:, None], xs, padx)
    rs = jnp.where(valid, rs, rmean)
    if ss is not None:
        ss = jnp.where(valid[:, None], ss, 0.0)
    ranks_i = jnp.arange(n_sub, dtype=jnp.int32)
    gidx0 = jnp.where(valid, ranks_i, n_sub + ranks_i)
    return xs, rs, ss, gidx0, orig, count, overflow



def _assemble_global_tree(fields, alive_g, roots, levels_loc: int,
                          split: int, nleaf_glob: int, ndev: int,
                          bs: int, levels_glob: int) -> Tree:
    """Replicated global tree from all_gathered local rows + the
    finishTree-style weighted top merge (traced; used inside
    shard_map)."""
    nn = 2 * nleaf_glob
    arr = {f: jnp.zeros((nn,) + fields[f].shape[2:],
                        fields[f].dtype) for f in fields}
    arr["alive"] = jnp.zeros((nn,), bool)
    for lam in range(levels_loc + 1):
        w_l = 1 << lam
        gl0 = (1 << (split + lam))
        sl_loc = slice(w_l - 1, 2 * w_l - 1)   # gathered ids - 1
        for f in fields:
            blk = fields[f][:, sl_loc]          # (D, w_l, ...)
            arr[f] = jax.lax.dynamic_update_slice_in_dim(
                arr[f], blk.reshape((ndev * w_l,)
                                    + blk.shape[2:]), gl0, 0)
        blk = alive_g[:, sl_loc]
        arr["alive"] = jax.lax.dynamic_update_slice_in_dim(
            arr["alive"], blk.reshape(-1), gl0, 0)
    cm = roots["x"]
    sst = roots["s"]
    pr = roots["pr"]
    al = roots["alive"]
    w = roots["w"]
    nc0 = roots["nc"]
    ns0 = roots["ns"]
    lo = nc0 - 0.5 * ns0
    hi = nc0 + 0.5 * ns0
    for l in range(split - 1, -1, -1):
        n_l = 1 << l
        w0, w1 = w[0::2], w[1::2]
        wp = w0 + w1
        safe = 1e-20 + wp
        anyw = wp > 1e-12
        cm_m = (cm[0::2] * w0[:, None] + cm[1::2] * w1[:, None]) \
            / safe[:, None]
        cm = jnp.where(anyw[:, None], cm_m,
                       0.5 * (cm[0::2] + cm[1::2]))
        pr = jnp.where(anyw, (pr[0::2] * w0 + pr[1::2] * w1)
                       / safe, 0.5 * (pr[0::2] + pr[1::2]))
        sst = sst[0::2] + sst[1::2]
        a0, a1 = al[0::2], al[1::2]
        lo_n = jnp.where(a0[:, None] & a1[:, None],
                         jnp.minimum(lo[0::2], lo[1::2]),
                         jnp.where(a0[:, None], lo[0::2],
                                   lo[1::2]))
        hi_n = jnp.where(a0[:, None] & a1[:, None],
                         jnp.maximum(hi[0::2], hi[1::2]),
                         jnp.where(a0[:, None], hi[0::2],
                                   hi[1::2]))
        al = a0 | a1
        w = wp
        lo, hi = lo_n, hi_n
        arr["x"] = jax.lax.dynamic_update_slice_in_dim(
            arr["x"], cm, n_l, 0)
        arr["s"] = jax.lax.dynamic_update_slice_in_dim(
            arr["s"], sst, n_l, 0)
        arr["pr"] = jax.lax.dynamic_update_slice_in_dim(
            arr["pr"], pr, n_l, 0)
        arr["nc"] = jax.lax.dynamic_update_slice_in_dim(
            arr["nc"], 0.5 * (lo + hi), n_l, 0)
        arr["ns"] = jax.lax.dynamic_update_slice_in_dim(
            arr["ns"], hi - lo, n_l, 0)
        arr["nr"] = jax.lax.dynamic_update_slice_in_dim(
            arr["nr"],
            0.5 * jnp.sqrt(jnp.sum((hi - lo) ** 2, axis=1)),
            n_l, 0)
        arr["alive"] = jax.lax.dynamic_update_slice_in_dim(
            arr["alive"], al, n_l, 0)
    diam = jnp.max(hi[0] - lo[0])
    fp = hi[0] + 8.0 * diam + 1.0
    dead = ~arr["alive"]
    arr["nc"] = jnp.where(dead[:, None], fp[None, :], arr["nc"])
    arr["x"] = jnp.where(dead[:, None], fp[None, :], arr["x"])
    arr["ns"] = jnp.where(dead[:, None], 0.0, arr["ns"])
    arr["nr"] = jnp.where(dead, 0.0, arr["nr"])
    return Tree(nc=arr["nc"], ns=arr["ns"], nr=arr["nr"],
                x=arr["x"], s=arr["s"], pr=arr["pr"],
                alive=arr["alive"], levels=levels_glob,
                block_size=bs)


# --------------------------------------------------------------- driver

def prepare_and_solve_sharded(kernel: Kernel, cfg: SolverConfig,
                              mesh: Mesh, srcs: Parts, targs: Parts,
                              theta: Optional[float] = None):
    """Fully-sharded prepare + DTT solve.

    srcs/targs: host-or-device Parts (will be batch-sharded over the
    mesh). Returns (out (n, OD) original target order — assembled from
    per-device shards, overflow int). Every heavy intermediate is
    1/D-sized per device.
    """
    theta = cfg.theta_dtt if theta is None else theta
    ndev = _axis_size(mesh)
    split = int(np.log2(ndev))
    assert 1 << split == ndev
    axis = _mesh_axis(mesh)
    bs = cfg.block_size
    pd, sd, od = kernel.pd, kernel.sd, kernel.od
    order = cfg.order
    assert order >= 0
    assert eq.n_eq_parts(bs, order, pd) == 1
    n = srcs.n_real
    assert targs.n_real == n, "sharded prepare assumes equal N (bench)"
    levels_glob, n_pad = tree_build.plan(n, bs)
    assert levels_glob > split + 1
    levels_loc = levels_glob - split
    n_sub = n_pad // ndev
    M = (order + 1) ** pd
    nleaf_glob = 1 << levels_glob

    # pad the batch axis to a multiple of D for even shards
    def shard_batch(a, fill):
        m = a.shape[0]
        mp = -(-m // ndev) * ndev
        if mp != m:
            padv = jnp.broadcast_to(jnp.asarray(fill, a.dtype),
                                    (mp - m,) + a.shape[1:])
            a = jnp.concatenate([a, padv])
        spec = P(*((mesh.axis_names[0],) + (None,) * (a.ndim - 1))) \
            if len(mesh.axis_names) == 1 else \
            P(*((mesh.axis_names,) + (None,) * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    # batch-padded rows: mark with oid >= n so the split treats them as
    # NON-EXISTENT?  They would pollute counts — instead drop them by
    # folding them into the virtual-pad mass: give them code 65535 via
    # far positions (x = +big) and oid = n (invalid sentinel).
    far = float(np.asarray(jnp.max(srcs.x)) + 1e3)

    def side_arrays(p: Parts, with_s: bool):
        m = p.x.shape[0]
        xs = shard_batch(p.x, far)
        rs = shard_batch(p.r, 1e-6)
        ss = shard_batch(p.s, 0.0) if (with_s and p.s is not None) \
            else None
        oid = jnp.arange(m, dtype=jnp.int32)
        mp = -(-m // ndev) * ndev
        if mp != m:
            oid = jnp.concatenate(
                [oid, jnp.full((mp - m,), n, jnp.int32)])
        oid = shard_batch(oid, n)
        return xs, rs, ss, oid, mp

    # batch-pad rows would sit at a far point yet count as reals,
    # inflating the last subtree's box — keep the contract simple
    assert n % ndev == 0, "sharded prepare needs n divisible by D"
    sxs, srs, sss, soid, mp = side_arrays(srcs, True)
    txs, trs, _tss, toid, _ = side_arrays(targs, False)
    n_total = mp

    cap_b = max(256, int(2.2 * mp // (ndev * ndev)))

    fn = partial(_split_exchange_fn, split=split, n_total=n_total,
                 n_pad=n_pad, cap_b=cap_b, pd=pd, sd=sd)
    in_specs_s = (P(axis), P(axis), P(axis), P(axis))
    out_specs = (P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                 P(axis))

    def body_src(x, r, s, oid):
        xs, rs, ss, g0, orig, cnt, ov = fn(x, r, s, oid, axis)
        return (xs, rs, ss, g0, orig, cnt[None], ov[None])

    def body_tgt(x, r, oid):
        xs, rs, ss, g0, orig, cnt, ov = fn(x, r, None, oid, axis)
        return (xs, rs, g0, orig, cnt[None], ov[None])

    sm = partial(shard_map, mesh=mesh, check_vma=False)
    try:
        s_out = sm(body_src, in_specs=in_specs_s,
                   out_specs=out_specs)(sxs, srs, sss, soid)
    except TypeError:   # older jax: check_rep kwarg
        sm = partial(shard_map, mesh=mesh, check_rep=False)
        s_out = sm(body_src, in_specs=in_specs_s,
                   out_specs=out_specs)(sxs, srs, sss, soid)
    t_out = sm(body_tgt, in_specs=in_specs_s[:3],
               out_specs=out_specs[:6])(txs, trs, toid)
    sxs_l, srs_l, sss_l, sg0, sorig, s_cnt, s_ov = s_out
    txs_l, trs_l, tg0, torig, t_cnt, t_ov = t_out

    # ------------------------------------------- stage 3-5: build+solve
    glob_t, _ = local_rows(levels_glob, ndev)
    backend = _resolve_shard_backend(cfg)
    W = cfg.frontier_width
    g = cfg.pair_group
    rows_dev = ndev + (2 << levels_loc) - 1
    cap_groups = max(1024, rows_dev * (cfg.cap_groups_dtt * 8 // g))
    wleaf = 1 << levels_loc
    leaf0_loc = ndev + wleaf - 1
    perm_ring = [(i, (i - 1) % ndev) for i in range(ndev)]
    theta_f = jnp.float32(theta)

    def build_solve(sx, sr, ss, sg0, tx, tr, tg0):
        dev = jax.lax.axis_index(axis)
        # local builds (static shapes; validity in gidx0)
        ps = Parts(x=sx, r=sr, s=ss, n_real=n_sub)
        pt = Parts(x=tx, r=tr, s=None, n_real=n_sub)
        stree_l, ssp, sgl = tree_build.build_tree(
            ps, bs, mode="median", defer_rs=False, gidx0=sg0)
        ttree_l, tsp, tgl = tree_build.build_tree(
            pt, bs, mode="median", defer_rs=False, gidx0=tg0,
            need_r=kernel.uses_tr)

        # local featurize: fm slab rows [0, ndev) top (filled below),
        # then local tree rows 1.. in level order
        fm_loc, rg, re = eq.barycentric_fm(
            stree_l, ssp, order, kernel.name, pad8=False, flat=False,
            return_root=True)

        # ---- gather tree GEOMETRY (small per-node rows) + root stats
        def gathered_tree(tl, w_root):
            fields = {}
            for f in ("nc", "ns", "nr", "x", "s", "pr"):
                loc_v = getattr(tl, f)
                fields[f] = jax.lax.all_gather(loc_v[1:], axis)
            al = jax.lax.all_gather(tl.alive[1:], axis)
            roots = {f: fields[f][:, 0] for f in fields}
            roots["alive"] = al[:, 0]
            roots["w"] = jax.lax.all_gather(w_root, axis)
            return fields, al, roots

        if sd == 1:
            w_s = jnp.sum(jnp.abs(ssp.s))
        else:
            w_s = jnp.sum(jnp.sqrt(jnp.sum(ssp.s * ssp.s, axis=1)))
        sfields, salive, sroots = gathered_tree(stree_l, w_s)
        w_t = jnp.sum((tgl < n_sub).astype(jnp.float32))
        tfields, talive, troots = gathered_tree(ttree_l, w_t)

        # ---- assemble replicated GLOBAL geometry trees (module fn)
        stree_g = _assemble_global_tree(sfields, salive, sroots,
                                        levels_loc, split, nleaf_glob,
                                        ndev, bs, levels_glob)
        ttree_g = _assemble_global_tree(tfields, talive, troots,
                                        levels_loc, split, nleaf_glob,
                                        ndev, bs, levels_glob)

        # ---- top source proxies (replicated): continue upward pass
        rg_all = jax.lax.all_gather(rg, axis)          # (D, M, pd)
        re_all = jax.lax.all_gather(re, axis)          # (D, M, sd)
        rf_all = jax.lax.all_gather(ssp.r[0], axis)    # (D,)
        b_w = fm_loc.shape[-1]
        c_rows = fm_loc.shape[1]
        top_fm = jnp.zeros((ndev, c_rows, b_w), fm_loc.dtype)
        child_pos, child_str, rf = rg_all, re_all, rf_all
        from onbody_tpu.ops.kernels import featurize
        for l in range(split - 1, -1, -1):
            nseg = 1 << l
            nc_l = jax.lax.dynamic_slice_in_dim(stree_g.nc, nseg, nseg)
            ns_l = jnp.maximum(
                jax.lax.dynamic_slice_in_dim(stree_g.ns, nseg, nseg),
                1e-20)
            src_pos = child_pos.reshape(nseg, -1, pd)
            src_str = child_str.reshape(nseg, -1, sd)
            eq_s = eq.anterp_factored(src_pos, nc_l, ns_l, order,
                                      src_str)
            grid = eq._grid_positions(nc_l, ns_l, order)
            rf = rf[0::2]
            pos_w = jnp.concatenate(
                [grid, jnp.broadcast_to(nc_l[:, None, :],
                                        (nseg, b_w - M, pd))], axis=1)
            st_w = jnp.concatenate(
                [eq_s, jnp.zeros((nseg, b_w - M, sd), jnp.float32)],
                axis=1)
            rad_w = jnp.broadcast_to(rf[:, None], (nseg, b_w))
            rows = jax.vmap(lambda p_, r_, s_: featurize(
                kernel.name, p_, r_, s_, False))(pos_w, rad_w, st_w)
            top_fm = jax.lax.dynamic_update_slice_in_dim(
                top_fm, rows, nseg, 0)
            child_pos, child_str = grid, eq_s

        # local source slab in owner-major layout: top | local rows 1..
        sfm_slab = jnp.concatenate([top_fm, fm_loc[1:]], axis=0)

        # ---- lists: replicated top + own sub
        top_t, top_s, cand_roots, ov_top = lists._dtt_lists_top(
            stree_g, ttree_g, theta_f, levels_glob, split, W,
            cfg.mac_geometry)
        root = ndev + dev
        cand_row = jax.lax.dynamic_slice_in_dim(cand_roots, dev, 1)
        sub_t, sub_s, nv, ov_sub = lists._dtt_lists_sub(
            stree_g, ttree_g, theta_f, cand_row, root, levels_glob,
            levels_glob, split, W, cfg.mac_geometry)
        loc = jnp.asarray(local_rows(levels_glob, ndev)[1])
        tl = jnp.concatenate([top_t, loc[sub_t]])
        sl = jnp.concatenate([top_s, sub_s])

        # ---- ring exec: bucket pairs by source owner per stage
        # owner of src row: top rows (< ndev) -> stage 0 (own slab has
        # the replicated top rows); else level-split ancestor
        lev = jnp.int32(31) - jax.lax.clz(jnp.maximum(sl, 1))
        owner = jnp.where(
            sl < ndev, dev,
            (sl >> jnp.maximum(lev - split, 0)) - ndev)
        stage = jnp.where(sl != 0, (owner - dev) % ndev, 0)
        src_loc = jnp.where(sl < ndev, sl, loc[sl])

        # target geometry slab + chunk-local positions
        tgeo = eq._target_geo_slab_impl(
            ttree_g, tsp.x, tsp.r, jnp.int32(root), order, levels_glob,
            split, bs, x_base=dev * n_sub)

        out = jnp.zeros((rows_dev, bs, od), cfg.accum_dtype)
        buf = sfm_slab
        ov_g = jnp.int32(0)
        for k in range(ndev):
            sel = (stage == k) & (sl != 0)
            # mask ONLY src: group_pairs reads each G-chunk's target
            # from its FIRST slot (every W-run shares one target) — a
            # masked tgt would reroute chunks whose first slot belongs
            # to another ring stage into the discarded row 0
            pl_k = lists.PairList(
                tgt=tl,
                src=jnp.where(sel, src_loc, 0),
                n_valid=jnp.sum(sel, dtype=jnp.int32),
                overflow=jnp.int32(0))
            pg = lists.group_pairs(pl_k, cap_groups, g, W)
            ov_g = ov_g + pg.overflow
            out = _exec_groups_slab(kernel, cfg, tgeo, buf, pg.tgt,
                                    pg.src, out, backend)
            if k + 1 < ndev:
                buf = jax.lax.ppermute(buf, axis, perm_ring)

        glob_c = jnp.asarray(glob_t)[dev]
        nc_l = ttree_g.nc[glob_c]
        ns_l = ttree_g.ns[glob_c]
        posl = jnp.transpose(tgeo[:, :pd, :], (0, 2, 1))
        out = _downward_local(out, nc_l, ns_l, posl, order, levels_glob,
                              split, bs, dev)
        leaf = out[leaf0_loc:leaf0_loc + wleaf, :bs, :]
        ovt = (ov_top + ov_sub + ov_g)
        return (leaf.reshape(1, wleaf * bs, od), tgl[None],
                nv[None], ovt[None])

    leaf_sh, tgl_sh, nv_sh, ov_sh = sm(
        build_solve,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)))(
        sxs_l, srs_l, sss_l, sg0, txs_l, trs_l, tg0)

    # assemble original-order outputs on host (the only global array —
    # the RESULT, unavoidable and owned by the caller)
    leaf = np.asarray(leaf_sh).reshape(ndev, wleaf * bs, od)
    tgl = np.asarray(tgl_sh).reshape(ndev, -1)
    torig_h = np.asarray(torig).reshape(ndev, -1)
    out = np.zeros((n, od), np.float32)
    for d in range(ndev):
        gl = tgl[d]
        real = gl < n_sub
        oo = torig_h[d][gl[real]]
        keep = oo < n
        out[oo[keep]] = leaf[d][real][keep]
    overflow = (int(np.asarray(s_ov).sum()) + int(np.asarray(t_ov).sum())
                + int(np.asarray(ov_sh).sum()))
    return out, overflow
