"""Multi-chip execution over a jax.sharding.Mesh.

The reference is shared-memory only (OpenMP + Vc, SURVEY.md §2.2); this
module is the framework's scale-out axis, built the TPU way: target
subtrees are sharded over the mesh, source blocks are replicated via an
ICI all_gather, and each device runs the same pair executor on its slab.

Decomposition: with D devices (power of two <= nleaf), device d owns the
target subtree rooted at node D+d — every target row below that root plus
its slice of leaf outputs. Pair lists are bucketed by owner on host (they
are already sorted by target row). Rows above the split level (the top
log2(D) levels) are processed identically on every device (replicated
compute, a few dozen pairs), so the DTT downward pass can run replicated
at the top and locally below the split with no cross-device traffic
beyond the initial all_gather.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
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


def partition_pairs(pl: lists.PairList, levels_t: int, ndev: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Bucket a (host-side) pair list by owning device.

    Returns (tgt, src) of shape (ndev, Pd): device d's pairs, padded with
    (0, 0). Replicated-top pairs (owner -1) are appended to EVERY device's
    bucket so the top target rows are computed identically everywhere.
    """
    split = int(np.log2(ndev))
    tgt = np.asarray(pl.tgt)
    src = np.asarray(pl.src)
    valid = src != 0
    owner = node_owner(tgt, levels_t, split)
    buckets_t, buckets_s = [], []
    top = valid & (owner == -1)
    for d in range(ndev):
        m = valid & ((owner == d) | top)
        buckets_t.append(tgt[m])
        buckets_s.append(src[m])
    pd_max = max(1, max(len(b) for b in buckets_t))
    out_t = np.zeros((ndev, pd_max), np.int32)
    out_s = np.zeros((ndev, pd_max), np.int32)
    for d in range(ndev):
        out_t[d, :len(buckets_t[d])] = buckets_t[d]
        out_s[d, :len(buckets_s[d])] = buckets_s[d]
    return out_t, out_s


def exec_pairs_sharded(kernel: Kernel, cfg: SolverConfig, mesh: Mesh,
                       tgt_blocks: eq.Blocks, src_blocks: eq.Blocks,
                       pair_t: np.ndarray, pair_s: np.ndarray,
                       levels: int) -> jax.Array:
    """Run the pair executor over the mesh; returns the full (NN, B, OD)
    out array (top rows replicated-consistent, subtree rows gathered).

    Source blocks are stored sharded along rows and all_gather'd over ICI
    inside the shard_map (the scale-out analogue of the reference's
    shared-memory reads); target blocks are gathered the same way since
    every device may read any source row and its own target rows.
    """
    from onbody_tpu.traverse import exec as pexec

    ndev = mesh.devices.size
    split = int(np.log2(ndev))
    axis = mesh.axis_names[0]

    nn, b = tgt_blocks.pos.shape[:2]

    def device_fn(pt, ps, tpos, trad, spos, srad, sstr):
        # gather the full block arrays over ICI (replicate reads);
        # local shards keep a leading size-1 device axis -> flatten it
        def gather(a):
            g = jax.lax.all_gather(a, axis, axis=0, tiled=True)
            return g.reshape((-1,) + g.shape[2:])
        tb = eq.Blocks(pos=gather(tpos), rad=gather(trad), s=None)
        sb = eq.Blocks(pos=gather(spos), rad=gather(srad), s=gather(sstr))
        pl = lists.PairList(tgt=pt[0], src=ps[0],
                            n_valid=jnp.int32(0), overflow=jnp.int32(0))
        out = pexec.exec_pairs_jnp(kernel, tb, sb, pl, cfg.core_func,
                                   cfg.accum_dtype, cfg.d2_mode)
        return out[None]

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis)),
        out_specs=P(axis),
        check_rep=False)

    # shard block storage by rows (any split works; all_gather restores)
    def shard_rows(a):
        return a.reshape((ndev, -1) + a.shape[1:])

    out = fn(jnp.asarray(pair_t)[:, None, :], jnp.asarray(pair_s)[:, None, :],
             shard_rows(tgt_blocks.pos), shard_rows(tgt_blocks.rad),
             shard_rows(src_blocks.pos), shard_rows(src_blocks.rad),
             shard_rows(src_blocks.s))
    # out: (ndev, NN, B, OD) — each device has the global out array with
    # only its pairs' contributions. Rows at level >= split are owned by
    # exactly one device (disjoint -> sum == select); rows above the split
    # were computed replicated on every device, so take device 0's copy.
    top_rows = 1 << split          # rows [0, 2^split) = levels < split
    summed = jnp.sum(out, axis=0)
    merged = summed.at[:top_rows].set(out[0, :top_rows])
    return merged


# --------------------------------------------------- high-level solvers

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


def solve_dtt_sharded(kernel: Kernel, cfg: SolverConfig, mesh: Mesh,
                      plan: Plan, theta: Optional[float] = None):
    """O(N) dual-tree traversal over the mesh: sharded pair execution,
    then the downward prolongation on the merged out array."""
    from onbody_tpu.traverse import dtt as dtt_mod

    theta = cfg.theta_dtt if theta is None else theta
    pl = lists.build_dtt_pairs(plan.stree, plan.ttree, theta,
                               cfg.frontier_width, cfg.list_width)
    pt, ps = partition_pairs(pl, plan.ttree.levels, mesh.devices.size)
    out = exec_pairs_sharded(kernel, cfg, mesh, plan.tgt_blocks,
                             plan.src_blocks, pt, ps, plan.ttree.levels)
    if cfg.order >= 0:
        out = dtt_mod._downward(out, plan.ttree.nc, plan.ttree.ns,
                                plan.tgt_blocks.pos, cfg.order,
                                plan.ttree.levels, plan.ttree.block_size)
    else:
        out = dtt_mod._downward_copy(out, plan.ttree.levels,
                                     plan.ttree.block_size)
    nleaf = plan.ttree.nleaf
    bs = plan.ttree.block_size
    leaf = out[nleaf:, :bs, :].reshape(-1, kernel.od)
    return _unscramble(leaf, plan.tgt_gidx, plan.tgt_sorted.n_real), pl
