"""Histogram-based exact top-level k-d splitting on u16 codes.

The out-of-core (N=1e9) and sharded-prepare decompositions both need the
top `split` levels of the VAMsplit k-d tree WITHOUT materializing (or
moving) the whole particle set: only exact per-node split planes and an
exact per-particle subtree assignment. Counting gives both:

  * particles are streamed in chunks (regenerated or device-resident
    shards); each chunk scatter-adds a per-node histogram over the
    node's split-axis u16 code (tree/quant.py grid);
  * the host (or a psum across devices) reduces histograms and picks,
    per node, the largest code T with count(code < T) <= target — the
    same MSB-exact split the bisect build does on device
    (build._bisect_group_step), expressed on precomputed codes;
  * ties (code == T) split by GLOBAL rank in (chunk, slot) order:
    count_less of each node's plane leaves `need = target - count_less`
    tie slots for the left child, assigned to chunks in order via
    per-chunk tie counts — slot counts stay EXACT (the VAMsplit
    invariant all downstream fixed shapes rely on).

Split axes come from plane-derived conservative boxes (split axis
halved at the plane), like the bisect build's in-group levels: top
boxes are far too large to MAC-separate at any practical theta, so the
small geometric drift vs refit boxes costs nothing (measured -0.04%
pair volume class, docs/PERF.md r2s3); the recorded top-node boxes are
later recomputed exactly from subtree-root boxes.

Reference anchor: splitNode's pmiddle power-of-two block split
(barneshut.hpp:663) — here the padded target is exactly half the
padded slot count per node, so target = n_slots/2 at every level.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NB = 65536


@partial(jax.jit, static_argnames=("nnode",))
def chunk_hist(codes: jax.Array, nid: jax.Array, axes: jax.Array,
               nnode: int) -> jax.Array:
    """Per-node histogram of each particle's split-axis code.

    codes: (m, pd) u16-in-i32/u32 grid codes; nid: (m,) int32 node id
    at the current level (0..nnode-1); axes: (nnode,) int32 split axis
    per node. Returns (nnode, 65536) int32 counts."""
    pd = codes.shape[1]
    ax = axes[nid]                                   # (m,)
    c = codes[:, 0]
    for d in range(1, pd):
        c = jnp.where(ax == d, codes[:, d], c)
    flat = nid * _NB + c.astype(jnp.int32)
    h = jnp.zeros((nnode * _NB,), jnp.int32)
    h = h.at[flat].add(1, mode="drop")
    return h.reshape(nnode, _NB)


@partial(jax.jit, static_argnames=())
def chunk_tie_counts(codes: jax.Array, nid: jax.Array, axes: jax.Array,
                     planes: jax.Array) -> jax.Array:
    """Per-node count of code == plane ties in this chunk.
    planes: (nnode,) i32. Returns (nnode,) i32."""
    ax = axes[nid]
    c = codes[:, 0]
    for d in range(1, codes.shape[1]):
        c = jnp.where(ax == d, codes[:, d], c)
    tie = (c.astype(jnp.int32) == planes[nid]).astype(jnp.int32)
    nnode = planes.shape[0]
    return jnp.zeros((nnode,), jnp.int32).at[nid].add(tie, mode="drop")


def plan_level(hists: np.ndarray, target: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact plane per node from the REDUCED histograms.

    hists: (nnode, 65536) total counts; target: left-child slot count
    (n_slots_per_node // 2 of the PADDED set — pads carry code 65535 so
    they count like any particle, mirroring the padded VAMsplit).
    Returns (planes (nnode,), need (nnode,)): left = code < plane, plus
    the first `need` ties in global (chunk, slot) order."""
    cum = np.cumsum(hists, axis=1)
    # largest T with count(code < T) <= target  <=>  first index where
    # cumulative count exceeds target
    planes = np.argmax(cum > target, axis=1).astype(np.int64)
    less = np.where(planes > 0,
                    np.take_along_axis(cum, (planes - 1)[:, None],
                                       1)[:, 0], 0)
    need = target - less
    assert (need >= 0).all()
    return planes.astype(np.int32), need.astype(np.int32)


def tie_quotas(per_chunk_ties: List[np.ndarray], need: np.ndarray
               ) -> List[np.ndarray]:
    """Per-chunk left-tie quotas, chunks in order: chunk c takes
    min(ties_c, remaining need)."""
    out = []
    rem = need.astype(np.int64).copy()
    for t in per_chunk_ties:
        q = np.minimum(t.astype(np.int64), np.maximum(rem, 0))
        out.append(q.astype(np.int32))
        rem -= t
    return out


@partial(jax.jit, static_argnames=())
def chunk_assign(codes: jax.Array, nid: jax.Array, axes: jax.Array,
                 planes: jax.Array, quota: jax.Array) -> jax.Array:
    """Advance node ids one level: nid -> 2*nid + (not left).

    left = code < plane, or code == plane and within-chunk tie rank
    (slot order) < this chunk's quota. The per-node tie rank comes from
    ONE stable sort by node id (non-ties parked at a sentinel key) plus
    a run-start subtraction — O(m log m) once, instead of an O(nnode)
    cumsum loop."""
    m = codes.shape[0]
    ax = axes[nid]
    c = codes[:, 0]
    for d in range(1, codes.shape[1]):
        c = jnp.where(ax == d, codes[:, d], c)
    c = c.astype(jnp.int32)
    p = planes[nid]
    tie = c == p
    nnode = planes.shape[0]
    key = jnp.where(tie, nid, jnp.int32(nnode))
    iota = jnp.arange(m, dtype=jnp.int32)
    skey, sidx = jax.lax.sort((key, iota), dimension=0, num_keys=1)
    # start of each nid run = exclusive cumsum of per-nid tie counts
    cnt = jnp.zeros((nnode + 1,), jnp.int32).at[key].add(1)
    starts = jnp.cumsum(cnt) - cnt
    ranks_sorted = iota - starts[skey]
    rank = jnp.zeros((m,), jnp.int32).at[sidx].set(ranks_sorted)
    left = (c < p) | (tie & (rank < quota[nid]))
    return 2 * nid + (1 - left.astype(jnp.int32))


def run_top_split(gen_codes, n_chunks: int, m_chunk: int, split: int,
                  box_lo: np.ndarray, box_hi: np.ndarray,
                  keep_nid: bool = True, virtual_pad_slots: int = 0,
                  chunk_sizes=None):
    """Drive `split` histogram levels over regenerable chunks.

    gen_codes(c) -> (m_c, pd) codes (u16-in-i32); chunks are
    regenerated per level (cheap for PRNG-backed particles). Per-chunk
    node-id arrays persist on device between levels (m_chunk i32 per
    chunk — 4.3 GB total at N=1e9, the cheapest way to avoid an
    O(levels^2) assignment replay).

    virtual_pad_slots: padding clones of the monolithic build
    (parts.pad_to) represented ANALYTICALLY — real codes clamp to
    65534, so pads are pure mass at bin 65535 that never ties with a
    real particle. Per-node pad mass is tracked on the host
    (slots - reals) and added to the histograms before planning; a
    plane of 65535 means every real of that node goes left and the
    remaining left slots are pads — exactly the padded VAMsplit.

    Returns (planes_all, quotas_all, axes_all, nids): per-level planes
    (nnode,), per-level per-chunk tie quotas, per-level axes, and the
    final per-chunk subtree ids (device arrays; None if keep_nid=False).
    """
    pd = box_lo.shape[0]
    lo = box_lo.astype(np.float64)
    hi = box_hi.astype(np.float64)
    sizes = chunk_sizes or [m_chunk] * n_chunks
    # plane-derived conservative boxes per node, in CODE units
    blo = np.zeros((1, pd))
    bhi = np.full((1, pd), 65535.0)
    planes_all, quotas_all, axes_all = [], [], []
    n_slots = sum(sizes) + virtual_pad_slots
    pads = np.array([virtual_pad_slots], np.int64)     # per-node pads
    nids = [jnp.zeros((sizes[c],), jnp.int32) for c in range(n_chunks)]

    for l in range(split):
        nnode = 1 << l
        axes = np.argmax((bhi - blo) * ((hi - lo) / 65535.0)[None, :],
                         axis=1).astype(np.int32)
        axes_j = jnp.asarray(axes)
        target = n_slots // (2 * nnode)
        hist = np.zeros((nnode, _NB), np.int64)
        per_chunk_hists = []
        for c in range(n_chunks):
            codes = gen_codes(c)
            h = np.asarray(chunk_hist(codes, nids[c], axes_j, nnode))
            per_chunk_hists.append(h)
            hist += h
        hist[:, _NB - 1] += pads                       # virtual pads
        planes, need = plan_level(hist, target)
        ties = [h[np.arange(nnode), planes] for h in per_chunk_hists]
        quotas = tie_quotas(ties, need)
        # children's virtual-pad mass: left reals = count_less(real) +
        # real tie quota; left pads fill the remainder of slots/2
        real_cum = np.cumsum(hist, axis=1)
        real_cum[:, _NB - 1] -= pads                   # reals only
        less_r = np.where(planes > 0,
                          np.take_along_axis(real_cum,
                                             (planes - 1)[:, None],
                                             1)[:, 0], 0)
        total_ties = (np.sum(ties, axis=0) if ties
                      else np.zeros(nnode, np.int64))
        left_reals = less_r + np.minimum(need, total_ties)
        pads_l = target - left_reals
        pads_r = pads - pads_l
        pads = np.stack([pads_l, pads_r], axis=1).reshape(-1)
        assert (pads >= 0).all()
        planes_j = jnp.asarray(planes)
        for c in range(n_chunks):
            codes = gen_codes(c)
            nids[c] = chunk_assign(codes, nids[c], axes_j, planes_j,
                                   jnp.asarray(quotas[c]))
        planes_all.append(planes)
        quotas_all.append(quotas)
        axes_all.append(axes)
        # derived child boxes
        nlo = np.repeat(blo, 2, axis=0)
        nhi = np.repeat(bhi, 2, axis=0)
        for i in range(nnode):
            a = axes[i]
            nhi[2 * i, a] = planes[i]
            nlo[2 * i + 1, a] = planes[i]
        blo, bhi = nlo, nhi
    return planes_all, quotas_all, axes_all, (nids if keep_nid else None)
