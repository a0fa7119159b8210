"""Multi-chip execution over a jax.sharding.Mesh.

The reference is shared-memory only (OpenMP + Vc, SURVEY.md §2.2); this
module is the framework's scale-out axis, built the TPU way.

Decomposition (owner-major): with D devices (power of two <= nleaf),
device d owns the target subtree rooted at node D+d. Every per-node
array is stored OWNER-MAJOR — a (D, R, ...) array sharded on its first
axis, where device d's slab holds

    rows [0, D)   : the global top nodes 0..D-1 (row 0 = the inert
                    dummy, rows 1..D-1 = levels above the split),
                    replicated — identical content on every device;
    rows [D, R)   : the nodes of d's subtree, level-contiguous
                    (level l >= split contributes 2^(l-split) rows).

Pair lists are bucketed by owning device with target ids rewritten to
local rows (top-level pairs are replicated into every bucket, so the
replicated top rows stay consistent without any cross-device sum —
ownership of real rows is disjoint by construction). Source blocks ride
an ICI all_gather (replicate-on-read, the scale-out analogue of the
reference's shared-memory reads); at N where sources no longer fit
replicated, shard cap_rows and stream via collective_permute — see
exec_pairs_sharded's docstring.

The DTT downward prolongation runs inside the same shard_map: the top
levels walk the replicated rows identically on every device, the
split-crossing step reads each device's own parent top row, and the
subtree levels are local — no communication at all after the initial
gather.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import Kernel
from onbody_tpu.tree import equivalents as eq
from onbody_tpu.traverse import lists
from onbody_tpu.traverse.treecode import Plan, _unscramble


def make_mesh(n_devices: Optional[int] = None, axis: str = "tgt") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def node_owner(node_ids: np.ndarray, levels: int, split: int) -> np.ndarray:
    """Device owning each tree node: nodes at level >= split belong to the
    device of their level-`split` ancestor; nodes above the split level
    are replicated (owner -1)."""
    node_ids = np.asarray(node_ids)
    lev = np.zeros_like(node_ids)
    nz = node_ids > 0
    lev[nz] = np.floor(np.log2(node_ids[nz])).astype(node_ids.dtype)
    owner = np.where(
        lev >= split,
        (node_ids >> np.maximum(lev - split, 0)) - (1 << split),
        -1)
    owner[~nz] = -1
    return owner


def local_rows(levels: int, ndev: int) -> Tuple[np.ndarray, np.ndarray]:
    """Owner-major layout maps (static, numpy).

    Returns (glob_of_local, local_of_glob):
      glob_of_local: (ndev, R) — global node id stored at each local row;
      local_of_glob: (NN,)     — local row of each global node in its
                                 owner's slab (top nodes: row == id,
                                 valid on every device).
    """
    split = int(np.log2(ndev))
    assert levels >= split
    nn = 2 << levels
    R = ndev + (2 << (levels - split)) - 1
    glob = np.zeros((ndev, R), np.int32)
    local = np.zeros((nn,), np.int32)
    top = np.arange(ndev)
    glob[:, :ndev] = top[None, :]
    local[:ndev] = top
    r = ndev
    for l in range(split, levels + 1):
        w = 1 << (l - split)
        for d in range(ndev):
            ids = (1 << l) + d * w + np.arange(w)
            glob[d, r:r + w] = ids
            local[ids] = r + np.arange(w)
        r += w
    return glob, local


def partition_pairs(pl: lists.PairList, levels_t: int, ndev: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Bucket a (host-side) pair list by owning device, rewriting target
    ids to local slab rows.

    Returns (tgt_local, src) of shape (ndev, Pd), padded with (0, 0).
    Replicated-top pairs (owner -1) are appended to EVERY device's
    bucket so the top target rows are computed identically everywhere.
    """
    split = int(np.log2(ndev))
    tgt = np.asarray(pl.tgt)
    src = np.asarray(pl.src)
    valid = src != 0
    owner = node_owner(tgt, levels_t, split)
    _, local = local_rows(levels_t, ndev)
    tgt_l = local[tgt]
    buckets_t, buckets_s = [], []
    top = valid & (owner == -1)
    for d in range(ndev):
        m = valid & ((owner == d) | top)
        buckets_t.append(tgt_l[m])
        buckets_s.append(src[m])
    pd_max = max(1, max(len(b) for b in buckets_t))
    out_t = np.zeros((ndev, pd_max), np.int32)
    out_s = np.zeros((ndev, pd_max), np.int32)
    for d in range(ndev):
        out_t[d, :len(buckets_t[d])] = buckets_t[d]
        out_s[d, :len(buckets_s[d])] = buckets_s[d]
    return out_t, out_s


def _gather_local(a: jax.Array, glob: np.ndarray) -> jax.Array:
    """(NN, ...) global per-node array -> (ndev, R, ...) owner-major."""
    return a[jnp.asarray(glob.reshape(-1))].reshape(
        glob.shape + a.shape[1:])


def _downward_local(out, nc_loc, ns_loc, pos_loc, order: int, levels: int,
                    split: int, block_size: int, dev: jax.Array):
    """DTT downward prolongation on one device's owner-major slab.

    out: (R, B, OD); nc/ns_loc: (R, pd); pos_loc: (R, B, pd).
    Levels < split walk the replicated top rows with global implicit
    indexing (local row == global id there); the split-crossing step
    reads this device's own parent top row; deeper levels are local.
    """
    pd = nc_loc.shape[-1]
    ncp = order + 1
    M = ncp ** pd
    ndev = 1 << split

    def prolong(pts, pnc, pns, pu):
        return eq.prolong_factored(pts, pnc, pns, order, pu)

    # top levels: parents [2^(l-1), 2^l), children [2^l, 2^(l+1)) — all
    # replicated rows, identical on every device
    for l in range(1, split + 1):
        np_l = 1 << (l - 1)
        par = slice(np_l, 2 * np_l)
        chl = slice(2 * np_l, 4 * np_l)
        if l == split:
            # children are the subtree roots: only THIS device's root
            # (local row ndev) is stored; its parent is top row
            # (ndev + dev) // 2
            proot = (jnp.int32(ndev) + dev) // 2
            pnc = jax.lax.dynamic_index_in_dim(nc_loc, proot, 0)
            pns = jax.lax.dynamic_index_in_dim(ns_loc, proot, 0)
            pu = jax.lax.dynamic_index_in_dim(out, proot, 0)[:, :M]
            width = block_size if l == levels else M
            pts = pos_loc[ndev:ndev + 1, :width]
            add = prolong(pts, pnc, pns, pu)
            out = out.at[ndev:ndev + 1, :width].add(add)
        else:
            width = M
            pts = pos_loc[chl][:, :width]
            pnc = jnp.repeat(nc_loc[par], 2, axis=0)
            pns = jnp.repeat(ns_loc[par], 2, axis=0)
            pu = jnp.repeat(out[par, :M], 2, axis=0)
            add = prolong(pts, pnc, pns, pu)
            out = out.at[chl, :width].add(add)

    # subtree levels: level l rows at [ndev + 2^(l-split) - 1, ...)
    for l in range(split + 1, levels + 1):
        wpar = 1 << (l - 1 - split)
        par0 = ndev + wpar - 1
        chl0 = ndev + 2 * wpar - 1
        width = block_size if l == levels else M
        pts = pos_loc[chl0:chl0 + 2 * wpar, :width]
        pnc = jnp.repeat(nc_loc[par0:par0 + wpar], 2, axis=0)
        pns = jnp.repeat(ns_loc[par0:par0 + wpar], 2, axis=0)
        pu = jnp.repeat(out[par0:par0 + wpar, :M], 2, axis=0)
        add = prolong(pts, pnc, pns, pu)
        out = out.at[chl0:chl0 + 2 * wpar, :width].add(add)
    return out


def solve_dtt_sharded(kernel: Kernel, cfg: SolverConfig, mesh: Mesh,
                      plan: Plan, theta: Optional[float] = None):
    """O(N) dual-tree traversal over the mesh.

    Owner-major target slabs sharded over the device axis; source blocks
    all_gathered over ICI; pair execution, downward prolongation, and
    leaf extraction all inside ONE shard_map (no cross-device traffic
    after the gather). Leaf outputs come back naturally sharded — leaves
    of device d are globally contiguous — and are unscrambled once.
    """
    theta = cfg.theta_dtt if theta is None else theta
    if cfg.dtt_traversal == "level":
        pl = lists.build_dtt_pairs_level(plan.stree, plan.ttree, theta,
                                         cfg.frontier_width)
    else:
        pl = lists.build_dtt_pairs(plan.stree, plan.ttree, theta,
                                   cfg.frontier_width, cfg.list_width)
    ndev = mesh.devices.size
    levels = plan.ttree.levels
    split = int(np.log2(ndev))
    pt, ps = partition_pairs(pl, levels, ndev)
    glob, _ = local_rows(levels, ndev)
    axis = mesh.axis_names[0]
    bs = plan.ttree.block_size
    nleaf = plan.ttree.nleaf

    tb = plan.tgt_blocks
    tpos_l = _gather_local(tb.pos, glob)
    trad_l = _gather_local(tb.rad, glob)
    tnc_l = _gather_local(plan.ttree.nc, glob)
    tns_l = _gather_local(plan.ttree.ns, glob)

    sb = plan.src_blocks

    def shard_rows(a):
        return a.reshape((ndev, -1) + a.shape[1:])

    def device_fn(pt, ps, tpos, trad, tnc, tns, spos, srad, sstr):
        dev = jax.lax.axis_index(axis)

        def gather(a):
            g = jax.lax.all_gather(a, axis, axis=0, tiled=True)
            return g.reshape((-1,) + g.shape[2:])

        sblocks = eq.Blocks(pos=gather(spos), rad=gather(srad),
                            s=gather(sstr))
        tblocks = eq.Blocks(pos=tpos[0], rad=trad[0], s=None)
        pairs = lists.PairList(tgt=pt[0], src=ps[0],
                               n_valid=jnp.int32(0),
                               overflow=jnp.int32(0))
        from onbody_tpu.traverse import exec as pexec
        out = pexec.exec_pairs_jnp(kernel, tblocks, sblocks, pairs,
                                   cfg.core_func, cfg.accum_dtype,
                                   cfg.d2_mode)
        if cfg.order >= 0:
            out = _downward_local(out, tnc[0], tns[0], tpos[0], cfg.order,
                                  levels, split, bs, dev)
        else:
            out = _downward_copy_local(out, levels, split, bs, dev)
        # leaf rows of this device's subtree slab (globally contiguous)
        wleaf = 1 << (levels - split)
        leaf0 = ndev + wleaf - 1
        leaf = out[leaf0:leaf0 + wleaf, :bs, :]
        return leaf.reshape(1, wleaf * bs, kernel.od)

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False)

    leaf = fn(jnp.asarray(pt), jnp.asarray(ps), tpos_l, trad_l, tnc_l,
              tns_l,
              shard_rows(sb.pos), shard_rows(sb.rad), shard_rows(sb.s))
    leaf = leaf.reshape(nleaf * bs, kernel.od)
    return _unscramble(leaf, plan.tgt_gidx, plan.tgt_sorted.n_real), pl


def _downward_copy_local(out, levels: int, split: int, block_size: int,
                         dev: jax.Array):
    """order<0 copy prolongation on an owner-major slab (matches
    dtt._downward_copy's side-aware halves)."""
    bs = block_size
    h = bs // 2
    ndev = 1 << split

    def kids_from(pu):
        left = jnp.repeat(pu[:, :h], 2, axis=1)
        right = jnp.repeat(pu[:, h:], 2, axis=1)
        return jnp.stack([left, right], axis=1).reshape(
            2 * pu.shape[0], bs, -1)

    for l in range(1, split + 1):
        np_l = 1 << (l - 1)
        if l == split:
            proot = (jnp.int32(ndev) + dev) // 2
            pu = jax.lax.dynamic_index_in_dim(out, proot, 0)[:, :bs]
            # this device's root is the (ndev+dev)%2-th child: take the
            # matching half
            side = (jnp.int32(ndev) + dev) % 2
            half = jnp.where(side == 0,
                             jnp.repeat(pu[:, :h], 2, axis=1),
                             jnp.repeat(pu[:, h:], 2, axis=1))
            out = out.at[ndev:ndev + 1, :bs].add(half)
        else:
            par = slice(np_l, 2 * np_l)
            chl = slice(2 * np_l, 4 * np_l)
            out = out.at[chl, :bs].add(kids_from(out[par, :bs]))
    for l in range(split + 1, levels + 1):
        wpar = 1 << (l - 1 - split)
        par0 = ndev + wpar - 1
        chl0 = ndev + 2 * wpar - 1
        out = out.at[chl0:chl0 + 2 * wpar, :bs].add(
            kids_from(out[par0:par0 + wpar, :bs]))
    return out


def exec_pairs_sharded(kernel: Kernel, cfg: SolverConfig, mesh: Mesh,
                       tgt_blocks: eq.Blocks, src_blocks: eq.Blocks,
                       pair_t: np.ndarray, pair_s: np.ndarray,
                       levels: int) -> jax.Array:
    """Owner-major sharded pair execution; returns the full global
    (NN, B, OD) out array (for callers that continue on one device —
    solve_dtt_sharded keeps everything device-local instead).

    pair_t must already hold LOCAL slab rows (partition_pairs output).
    """
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]
    glob, local = local_rows(levels, ndev)

    tpos_l = _gather_local(tgt_blocks.pos, glob)
    trad_l = _gather_local(tgt_blocks.rad, glob)

    def shard_rows(a):
        return a.reshape((ndev, -1) + a.shape[1:])

    def device_fn(pt, ps, tpos, trad, spos, srad, sstr):
        def gather(a):
            g = jax.lax.all_gather(a, axis, axis=0, tiled=True)
            return g.reshape((-1,) + g.shape[2:])
        sb = eq.Blocks(pos=gather(spos), rad=gather(srad), s=gather(sstr))
        tb = eq.Blocks(pos=tpos[0], rad=trad[0], s=None)
        pl = lists.PairList(tgt=pt[0], src=ps[0], n_valid=jnp.int32(0),
                            overflow=jnp.int32(0))
        from onbody_tpu.traverse import exec as pexec
        out = pexec.exec_pairs_jnp(kernel, tb, sb, pl, cfg.core_func,
                                   cfg.accum_dtype, cfg.d2_mode)
        return out[None]

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(axis),) * 7, out_specs=P(axis), check_vma=False)
    out_loc = fn(jnp.asarray(pair_t), jnp.asarray(pair_s),
                 tpos_l, trad_l,
                 shard_rows(src_blocks.pos), shard_rows(src_blocks.rad),
                 shard_rows(src_blocks.s))
    # scatter local slabs back to the global array: real rows are
    # disjoint; top rows identical everywhere (take device 0's)
    nn = 2 << levels
    b = tgt_blocks.pos.shape[1]
    out = jnp.zeros((nn, b, kernel.od), out_loc.dtype)
    flat_rows = jnp.asarray(glob.reshape(-1))
    out = out.at[flat_rows].set(
        out_loc.reshape((-1,) + out_loc.shape[2:]))
    out = out.at[:ndev].set(out_loc[0, :ndev])
    return out


def solve_treecode3_sharded(kernel: Kernel, cfg: SolverConfig, mesh: Mesh,
                            plan: Plan, theta: Optional[float] = None):
    """Boxwise treecode with target subtrees sharded over the mesh."""
    theta = cfg.theta_boxwise if theta is None else theta
    pl = lists.build_treecode_pairs(plan.stree, plan.ttree, theta,
                                    "boxwise", cfg.frontier_width,
                                    cfg.list_width)
    pt, ps = partition_pairs(pl, plan.ttree.levels, mesh.devices.size)
    out = exec_pairs_sharded(kernel, cfg, mesh, plan.tgt_blocks,
                             plan.src_blocks, pt, ps, plan.ttree.levels)
    nleaf = plan.ttree.nleaf
    bs = plan.ttree.block_size
    leaf = out[nleaf:, :bs, :].reshape(-1, kernel.od)
    return _unscramble(leaf, plan.tgt_gidx, plan.tgt_sorted.n_real), pl
