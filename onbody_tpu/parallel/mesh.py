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


def make_mesh_2level(n_slices: int, chips_per_slice: int) -> Mesh:
    """Two-level (DCN x ICI) mesh for multi-slice pods.

    Devices are laid out slice-major, so the owner-major solvers' flat
    ring permutation (shift-by-1 over the combined ("dcn", "ici") axis)
    crosses the DCN exactly once per slice per full rotation — every
    other stage boundary rides ICI. All collectives in this module take
    the full axis_names tuple, so a 2-level mesh drops in wherever a
    flat mesh does (SURVEY.md §5.8: DCN-aware two-level decomposition).
    """
    devs = jax.devices()
    n = n_slices * chips_per_slice
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]).reshape(n_slices, chips_per_slice),
                ("dcn", "ici"))


def _mesh_axis(mesh: Mesh):
    """Collective axis spec: the full axis-name tuple (flattened order)
    for multi-level meshes, the bare name for flat ones."""
    names = mesh.axis_names
    return names if len(names) > 1 else names[0]


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


# ------------------------------------------- on-device pair partitioning
#
# The host-numpy partition_pairs above is kept for small problems and
# tests; the production path is this fully-jitted version — VERDICT r1
# flagged the device->host round trip of the full pair list as unusable
# at 1e7+. Owner arithmetic is bit-shifts on the target id; bucketing is
# ONE two-key variadic sort + rank scatters (the same machinery as
# traverse/lists.py).

def _node_level(ids):
    """floor(log2(id)) for ids >= 1 (level of a tree node)."""
    return 31 - jax.lax.clz(jnp.maximum(ids, 1))


@partial(jax.jit, static_argnames=("levels_t", "levels_s", "ndev",
                                   "slot_width", "group", "caps_stage"))
def partition_groups_device(tgt, src, levels_t: int, levels_s: int,
                            ndev: int, slot_width: int, group: int,
                            caps_stage: Tuple[int, ...]):
    """Bucket a global (tgt, src) pair list into per-device, per-stage
    executor groups, entirely on device.

    Decomposition: device d owns target subtree D+d; a pair's execution
    STAGE is the ring distance (src_owner - tgt_owner) mod D, so stage k
    uses the source-tree shard that ring-streaming (lax.ppermute) has
    rotated onto the device by step k. Top-target pairs (target level <
    split — the first top_prefix_len(split, levels_t, W) entries of the
    level-ordered builder output) are replicated to every device;
    top-SOURCE rows are
    replicated in every source slab (local_rows puts global nodes [0, D)
    at slab rows [0, D)), so pairs with a top source run at stage 0.

    caps_stage[k] = static group capacity per (device, stage-k) bucket.
    Near-field locality makes stage 0 (own shard) the heavy one; caps
    are overflow-checked, never silently truncated.

    Returns (top_t (Tg,), top_s (Tg, G), gt (D, S, C), gs (D, S, C, G),
    overflow) with S = len(caps_stage) == D and C = max(caps_stage)
    (unused tail slots of short stages stay 0); all target ids are LOCAL
    slab rows, all source ids local source-slab rows.
    """
    split = int(np.log2(ndev))
    assert len(caps_stage) == ndev
    _, local_t = local_rows(levels_t, ndev)
    _, local_s = local_rows(levels_s, ndev)
    local_t = jnp.asarray(local_t)
    local_s = jnp.asarray(local_s)

    from onbody_tpu.traverse.lists import top_prefix_len
    n_top = top_prefix_len(split, levels_t, slot_width)
    top_t_raw, top_s_raw = tgt[:n_top], src[:n_top]
    rest_t, rest_s = tgt[n_top:], src[n_top:]

    # ---- replicated top-target groups (identical on every device).
    # Builder output is level-ordered so these are target-sorted; their
    # sources sit at levels < split (level-matched descent) == top rows.
    valid_top = top_s_raw != 0
    prev = jnp.concatenate([jnp.zeros((1,), top_t_raw.dtype),
                            top_t_raw[:-1]])
    is_start = valid_top & (top_t_raw != prev)
    cap_top = max(1, n_top // group + ndev)
    from onbody_tpu.traverse.lists import _emit_groups
    top_t, top_s, ov_top = _emit_groups(
        jnp.where(valid_top, top_t_raw, 0),
        jnp.where(valid_top, local_s[top_s_raw], 0),
        valid_top, is_start, group, cap_top)

    # ---- owned pairs: two-key sort by (device*D + stage, local tgt row)
    valid = rest_s != 0
    lev_t = _node_level(rest_t)
    own_t = (rest_t >> jnp.maximum(lev_t - split, 0)) - ndev
    lev_s = _node_level(rest_s)
    own_s = jnp.where(lev_s >= split,
                      (rest_s >> jnp.maximum(lev_s - split, 0)) - ndev,
                      own_t)                     # top src -> stage 0
    stage = (own_s - own_t) % ndev
    tl = local_t[rest_t]
    sl = local_s[rest_s]
    bucket = own_t * ndev + stage
    big = jnp.int32(2 ** 30)
    k1 = jnp.where(valid, bucket, big)
    k2 = jnp.where(valid, tl, big)
    k1, k2, tl, sl, bucket = jax.lax.sort(
        (k1, k2, tl, sl, jnp.where(valid, bucket, big)),
        dimension=0, num_keys=2)
    valid = k1 < big

    # group emission with bucket boundaries breaking runs
    prev_k1 = jnp.concatenate([jnp.full((1,), -1, k1.dtype), k1[:-1]])
    prev_tl = jnp.concatenate([jnp.full((1,), -1, tl.dtype), tl[:-1]])
    is_start = valid & ((tl != prev_tl) | (k1 != prev_k1))
    from onbody_tpu.traverse.lists import _seg_rank
    war, _, _ = _seg_rank(valid, is_start)
    slot = war % group
    gstart = valid & (slot == 0)
    gid = jnp.cumsum(gstart.astype(jnp.int32)) - 1
    bkt_start = valid & (k1 != prev_k1)
    gid_base = jax.lax.cummax(jnp.where(bkt_start, gid, 0))
    gid_in = gid - gid_base                      # group rank in bucket

    caps = np.asarray(caps_stage, np.int32)
    C = int(caps.max())
    offs = jnp.asarray(np.arange(ndev) * C, jnp.int32)   # stage offsets
    cap_of = jnp.asarray(caps, jnp.int32)
    st = bucket % ndev
    dv = bucket // ndev
    ok = valid & (gid_in < cap_of[jnp.clip(st, 0, ndev - 1)])
    overflow = jnp.sum(valid & ~ok, dtype=jnp.int32) + ov_top
    total = ndev * ndev * C
    dst = jnp.where(ok, dv * (ndev * C) + offs[jnp.clip(st, 0, ndev - 1)]
                    + gid_in, total)
    out_t = jnp.zeros((total + 1,), jnp.int32).at[
        jnp.where(gstart & ok, dst, total)].set(tl, mode="drop")[:total]
    flat = jnp.where(ok, dst * group + slot, total * group)
    out_s = jnp.zeros((total * group + 1,), jnp.int32).at[flat].set(
        jnp.where(ok, sl, 0), mode="drop")[:total * group]
    gt = out_t.reshape(ndev, ndev, C)
    gs = out_s.reshape(ndev, ndev, C, group)
    return top_t, top_s, gt, gs, overflow


_PROLONG_SLICE_ROWS = 2048


def _prolong_sliced(pts, pnc, pns, order: int, pu):
    """prolong_factored with its factored-contraction intermediate
    bounded: the first einsum materializes (rows, ncp, ncp, OD, width)
    — 7.2 GB for 65536 leaf rows at order 5 / width 256, the r4/r5
    1e9 chunk-phase OOM. lax.map over 2048-row slices caps it at
    ~230 MB per step and forces SEQUENTIAL slice execution (a plain
    Python loop of independent slices lets XLA's buffer liveness keep
    them all resident at once — the r3 bitonic lesson)."""
    rows = pts.shape[0]
    cap = _PROLONG_SLICE_ROWS
    if rows <= cap or rows % cap:
        return eq.prolong_factored(pts, pnc, pns, order, pu)
    nsl = rows // cap

    def body(args):
        p, nc_, ns_, u_ = args
        return eq.prolong_factored(p, nc_, ns_, order, u_)

    add = jax.lax.map(body, (pts.reshape(nsl, cap, *pts.shape[1:]),
                             pnc.reshape(nsl, cap, -1),
                             pns.reshape(nsl, cap, -1),
                             pu.reshape(nsl, cap, *pu.shape[1:])))
    return add.reshape(rows, *add.shape[2:])


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
        return _prolong_sliced(pts, pnc, pns, order, pu)

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


def _resolve_shard_backend(cfg) -> str:
    """Grouped executor inside shard_map: Pallas on TPU, XLA-grouped on
    CPU (Mosaic interpret mode is test-only slow). cfg.pair_backend
    'pallas'/'xla' overrides."""
    if cfg.pair_backend in ("pallas", "xla"):
        return cfg.pair_backend
    return "pallas" if jax.devices()[0].platform == "tpu" else "xla"


def _exec_groups_slab(kernel: Kernel, cfg, tgt_geo, src_fm, gt, gs,
                      out, backend: str):
    """Run one stage's groups against the currently-resident source slab;
    accumulates into out (R_t, B, OD)."""
    from onbody_tpu.traverse import exec as pexec
    d2m = "center" if cfg.d2_mode == "center" else "outer"
    if backend == "pallas":
        from onbody_tpu.ops import pallas_pairs as pp
        interpret = jax.devices()[0].platform == "cpu"
        add = pp.exec_pairs_pallas(kernel, tgt_geo, src_fm, gt, gs,
                                   cfg.core_func, cfg.accum_dtype,
                                   interpret=interpret, d2_mode=d2m,
                                   group=gs.shape[1],
                                   fetch=getattr(cfg, "pair_fetch",
                                                 "pregather"),
                                   precision=getattr(cfg, "mxu_precision",
                                                     "highest"),
                                   tile_g=getattr(cfg, "pair_tile_g", 4))
        return out + add
    return pexec._exec_groups_xla_chunked(
        kernel, tgt_geo, src_fm, (gt, gs), out, cfg.core_func,
        cfg.accum_dtype, d2m, gs.shape[1],
        getattr(cfg, "xla_exec_chunk", 1024),
        getattr(cfg, "mxu_precision", "highest"))


def solve_dtt_sharded_stream(kernel: Kernel, cfg: SolverConfig,
                             mesh: Mesh, plan: Plan,
                             theta: Optional[float] = None):
    """O(N) dual-tree traversal with SHARDED sources ring-streamed over
    ICI (SURVEY.md §5.8) — the road past single-chip HBM.

    Both trees are decomposed owner-major: device d holds the target
    slab of subtree D+d AND the source slab of subtree D+d (1/D of the
    source blocks each; top rows replicated). Pairs are bucketed on
    device by (target owner, ring stage) — stage k of device d uses
    source shard (d+k)%D, which lax.ppermute rotates around the ring
    while the grouped Pallas/XLA executor computes the previous stage.
    The downward prolongation and leaf extraction stay device-local
    (replicated top rows), so the ONLY cross-device traffic is the
    source-slab ring — total bytes = (D-1)/D of the source blocks,
    fully overlappable with compute on real ICI.
    """
    theta = cfg.theta_dtt if theta is None else theta
    assert eq.n_eq_parts(plan.tgt_geo.shape[-1], cfg.order,
                         kernel.pd) == 1, \
        "sharded solve does not support split equivalent rows (M > B)"
    ndev = mesh.devices.size
    levels = plan.ttree.levels
    levels_s = plan.stree.levels
    split = int(np.log2(ndev))
    if levels < split or levels_s < split or cfg.dtt_traversal != "level":
        # shallow trees can't be subtree-decomposed this way
        return solve_dtt_sharded(kernel, cfg, mesh, plan, theta)
    pl = lists.build_dtt_pairs_level(plan.stree, plan.ttree, theta,
                                     cfg.frontier_width,
                                     cfg.mac_geometry)

    g = cfg.pair_group
    W = cfg.frontier_width
    # hard per-device bound: owned rows x max groups per row
    rows_dev = (2 << (levels - split)) - 1 + ndev
    cap0 = max(256, rows_dev * (W // g + 2))
    caps = (cap0,) + (max(256, cap0 // 2),) * (ndev - 1)
    top_t, top_s, gt, gs, ov = partition_groups_device(
        pl.tgt, pl.src, levels, levels_s, ndev, W, g, caps)
    info = pl._replace(overflow=pl.overflow + ov)

    glob_t, _ = local_rows(levels, ndev)
    glob_s, _ = local_rows(levels_s, ndev)
    axis = _mesh_axis(mesh)
    bs = plan.ttree.block_size
    nleaf = plan.ttree.nleaf

    tgeo_l = _gather_local(plan.tgt_geo, glob_t)       # (D, R_t, 8, B)
    sfm_l = _gather_local(plan.src_fm, glob_s)         # (D, R_s, C, B)
    tpos_l = _gather_local(plan.tgt_blocks.pos, glob_t)
    tnc_l = _gather_local(plan.ttree.nc, glob_t)
    tns_l = _gather_local(plan.ttree.ns, glob_t)
    backend = _resolve_shard_backend(cfg)
    b = plan.tgt_geo.shape[2]
    perm = [(i, (i - 1) % ndev) for i in range(ndev)]

    def device_fn(gt, gs, top_t, top_s, tgeo, sfm, tpos, tnc, tns):
        dev = jax.lax.axis_index(axis)
        r_t = tgeo.shape[1]
        out = jnp.zeros((r_t, b, kernel.od), cfg.accum_dtype)
        buf = sfm[0]
        for k in range(ndev):
            gt_k, gs_k = gt[0, k], gs[0, k]
            if k == 0:
                # top-target groups (replicated content, top rows only)
                gt_k = jnp.concatenate([top_t, gt_k])
                gs_k = jnp.concatenate([top_s, gs_k])
            out = _exec_groups_slab(kernel, cfg, tgeo[0], buf, gt_k,
                                    gs_k, out, backend)
            if k + 1 < ndev:
                buf = jax.lax.ppermute(buf, axis, perm)
        if cfg.order >= 0:
            out = _downward_local(out, tnc[0], tns[0], tpos[0], cfg.order,
                                  levels, split, bs, dev)
        else:
            out = _downward_copy_local(out, levels, split, bs, dev)
        wleaf = 1 << (levels - split)
        leaf0 = ndev + wleaf - 1
        leaf = out[leaf0:leaf0 + wleaf, :bs, :]
        return leaf.reshape(1, wleaf * bs, kernel.od)

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(axis), P(axis), P(axis),
                  P(axis), P(axis)),
        out_specs=P(axis), check_vma=False)
    leaf = fn(gt, gs, top_t, top_s, tgeo_l, sfm_l, tpos_l, tnc_l, tns_l)
    leaf = leaf.reshape(nleaf * bs, kernel.od)
    return _unscramble(leaf, plan.tgt_gidx, plan.tgt_sorted.n_real), info


def solve_dtt_sharded(kernel: Kernel, cfg: SolverConfig, mesh: Mesh,
                      plan: Plan, theta: Optional[float] = None):
    """O(N) dual-tree traversal over the mesh.

    Owner-major target slabs sharded over the device axis; source blocks
    all_gathered over ICI; pair execution, downward prolongation, and
    leaf extraction all inside ONE shard_map (no cross-device traffic
    after the gather). Leaf outputs come back naturally sharded — leaves
    of device d are globally contiguous — and are unscrambled once.

    This is the replicate-on-read path; solve_dtt_sharded_stream shards
    the source blocks and ring-streams them instead (required once
    sources stop fitting replicated).
    """
    theta = cfg.theta_dtt if theta is None else theta
    assert eq.n_eq_parts(plan.tgt_blocks.width, cfg.order,
                         plan.ttree.nc.shape[-1]) == 1, \
        "sharded solve does not support split equivalent rows (M > B)"
    if cfg.dtt_traversal == "level":
        pl = lists.build_dtt_pairs_level(plan.stree, plan.ttree, theta,
                                         cfg.frontier_width,
                                         cfg.mac_geometry)
    else:
        pl = lists.build_dtt_pairs(plan.stree, plan.ttree, theta,
                                   cfg.frontier_width, cfg.list_width)
    ndev = mesh.devices.size
    levels = plan.ttree.levels
    split = int(np.log2(ndev))
    pt, ps = partition_pairs(pl, levels, ndev)
    glob, _ = local_rows(levels, ndev)
    axis = _mesh_axis(mesh)
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
    axis = _mesh_axis(mesh)
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
    assert eq.n_eq_parts(plan.tgt_blocks.width, cfg.order,
                         plan.ttree.nc.shape[-1]) == 1, \
        "sharded solve does not support split equivalent rows (M > B)"
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
