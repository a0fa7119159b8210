"""Level-synchronous k-d tree construction.

TPU-native replacement for the reference's recursive VAMsplit build
(barneshut.hpp:595-712 splitNode, :718-807 finishTree, :815-854 makeTree).

Design: particles are padded so the leaf count is a power of two and every
leaf holds exactly `block_size` particles (the VAMsplit guarantee of
uniformly full blocks, README.md:117-138, taken to its fixed-shape
conclusion). The tree is then a complete implicit binary tree — node i's
children are 2i/2i+1, level l spans indices [2^l, 2^(l+1)) (Tree.hpp:36-41)
— and construction is a static Python loop over levels where each level is
one batched variadic sort:

    for level l: segments of m = n_pad/2^l particles
      box = per-segment min/max            (reshape + reduce)
      axis = argmax(box size)              (per-segment)
      lax.sort(key, x0..x_pd, r, s.., gidx)  (ONE variadic sort)

The particle payload rides through the sort network as extra operands:
bitonic compare-exchange moves data with regular strides, which is ~9x
faster on TPU than the argsort + random-index gather formulation (the
gather, not the sort, dominates at scale — measured 131ms vs 14ms per
level at 2^23). gidx rides as a native int32 operand, so no f32-index
encoding and no special casing at n >= 2^24.

Exact median splits on padded power-of-two segments reproduce VAMsplit
semantics (left subtree = full power-of-two blocks, barneshut.hpp:663).
`refine` continues the same loop below the leaf level, giving the
hierarchical intra-leaf ordering of refineTree/refineLeaf
(barneshut.hpp:861-936) needed by pair-merge equivalents.

There is no `num`/`ioffset` bookkeeping: node i at level l implicitly owns
the contiguous slot range [k*m, (k+1)*m) with k = i - 2^l. Padding clones
real particles with zero strength, so no node is ever empty and counts
never appear in device code.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from onbody_tpu.parts import Parts, pad_to


def next_pow2(x: int) -> int:
    return 1 if x <= 1 else 1 << (int(x - 1).bit_length())


# Prefix slicing (sort only the real prefix of each segment) pays a
# second sort dispatch per level to skip the pad tail; below this many
# real particles the pad volume cannot cover that fixed cost (and the
# extra per-level compile dominates small/test problems).
PREFIX_SORT_MIN = 1 << 18

# Segment lengths up to this bound sort through the explicit bitonic
# network below instead of lax.sort. XLA's variadic sort measures a
# FLAT ~7 ns/row on TPU regardless of segment length (docs/PERF.md
# r2s10: (parts, m) shapes cost the same per row as flat arrays of
# equal volume — the short-segment advantage is left on the table); an
# explicit network sized to m runs k(k+1)/2 fused compare-exchange
# passes (k = log2 m), ~1.4 KB/row of HBM traffic at m=512 vs the
# sort's flat cost. Break-even is around m ~ 2^14. 0 disables.
BITONIC_MAX_M = int(os.environ.get("ONBODY_BITONIC_M", "0"))


def _seg_sort(ops: tuple, m: int, bitonic: int = -1,
              chunk_elems: int = -1):
    """Sort (nseg, m) columns ascending by ops[0] along axis 1.

    Dispatches to the explicit bitonic network for power-of-two m <=
    `bitonic` (default: the BITONIC_MAX_M module setting, resolved at
    call time), else jax.lax.sort. Jitted callers must thread BOTH the
    threshold and `chunk_elems` (default _BITONIC_CHUNK_ELEMS, the
    per-chunk row budget below) through as static arguments —
    `_split_step_impl` does — so changing either at runtime recompiles
    instead of silently reusing stale traces (ADVICE r2/r3). The network is unstable under
    equal keys where lax.sort is stable — indistinguishable here: the
    split only needs a partition, and equal coordinate keys make the
    tied particles' payloads interchangeable.

    Large inputs run the network row-CHUNKED under a lax.fori_loop
    (read-modify-write on the carried full columns): XLA's buffer
    assignment keeps every pass's full-array temporaries alive when the
    whole network unrolls inside one fused dispatch (measured 24 GB at
    N=1e7 — r3 sweep 1), while the loop bounds liveness to one chunk's
    passes. The clamped final chunk may re-sort rows an earlier chunk
    already sorted; sorting is idempotent, so the overlap is harmless."""
    if bitonic < 0:
        bitonic = BITONIC_MAX_M
    if chunk_elems < 0:
        chunk_elems = _BITONIC_CHUNK_ELEMS
    if not (0 < m <= bitonic) or m & (m - 1) or m == 1:
        return jax.lax.sort(ops, dimension=1, num_keys=1)
    nseg = ops[0].shape[0]
    R = max(1, chunk_elems // m)                 # chunk rows
    if nseg > R:
        nch = -(-nseg // R)

        def body(i, carry):
            start = i * R                        # clamped by XLA if
            ch = [jax.lax.dynamic_slice_in_dim(c, start, R, 0)
                  for c in carry]                # start+R > nseg
            ch = _bitonic_network(ch, m)
            return tuple(jax.lax.dynamic_update_slice_in_dim(
                c, s, start, 0) for c, s in zip(carry, ch))

        return jax.lax.fori_loop(0, nch, body, tuple(ops))
    return tuple(_bitonic_network(list(ops), m))


# per-chunk element budget of the chunked bitonic network: one chunk's
# live pass temporaries stay ~tens of MB (cols x 4 B x this)
_BITONIC_CHUNK_ELEMS = 1 << 21


def _bitonic_network(cols: list, m: int) -> list:
    size = 2
    while size <= m:
        d = size >> 1
        while d:
            p = np.arange(m // (2 * d))
            # direction bit of flat index i = p*(2d)+s*d+q is carried
            # entirely by p (s*d+q < 2d <= size)
            up = jnp.asarray((((p * 2 * d) // size) % 2 == 0)[:, None])
            key = cols[0].reshape(-1, m // (2 * d), 2, d)
            a, b = key[..., 0, :], key[..., 1, :]
            swap = jnp.where(up, a > b, a < b)
            nxt = []
            for c in cols:
                cr = c.reshape(-1, m // (2 * d), 2, d)
                x, y = cr[..., 0, :], cr[..., 1, :]
                nxt.append(jnp.stack(
                    [jnp.where(swap, y, x), jnp.where(swap, x, y)],
                    axis=-2).reshape(c.shape))
            cols = nxt
            d >>= 1
        size <<= 1
    return tuple(cols)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Tree:
    """Implicit complete binary tree over a padded particle set.

    All per-node arrays have shape (2*nleaf, ...); index 0 is unused,
    root is 1, leaves are [nleaf, 2*nleaf). Matches the logical content of
    the reference Tree (Tree.hpp:44-76): nc/ns/nr geometry, x center of
    "mass", s strength sums, pr mean particle radius.
    """

    nc: jax.Array   # (NN, PD) geometric centers
    ns: jax.Array   # (NN, PD) box sizes
    nr: jax.Array   # (NN,)    node radius = 0.5*|ns|
    x: jax.Array    # (NN, PD) center of |strength|-weighted mass
    s: jax.Array    # (NN, SD) summed strengths
    pr: jax.Array   # (NN,)    mean particle radius
    alive: jax.Array  # (NN,) bool — node holds >= 1 real particle.
    # Power-of-two padding can be large (1.68x at N=1e7): whole subtrees
    # of inert clones. Traversals kill dead TARGET rows outright (their
    # outputs are discarded), which also starves dead-source work.
    levels: int = dataclasses.field(metadata=dict(static=True))
    block_size: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nleaf(self) -> int:
        return 1 << self.levels

    @property
    def nnodes(self) -> int:
        return 2 * self.nleaf

    def level_slice(self, l: int) -> slice:
        return slice(1 << l, 1 << (l + 1))


def plan(n: int, block_size: int) -> Tuple[int, int]:
    """Return (levels, n_pad) for a particle count: power-of-two leaves of
    exactly block_size particles each."""
    nleaf = next_pow2(max(1, -(-n // block_size)))
    return int(np.log2(nleaf)), nleaf * block_size


def _morton_keys(x, pd: int):
    """Interleaved-bit Morton codes (uint32) from positions.

    10 bits per dim in 3D, 15 in 2D — cell resolution far below leaf
    granularity at any practical N. The classic parallel-spread bit
    tricks, expressed in jnp integer ops.
    """
    lo = jnp.min(x, axis=0)
    hi = jnp.max(x, axis=0)
    bits = 10 if pd == 3 else 15
    scale = (2 ** bits - 1) / jnp.maximum(hi - lo, 1e-30)
    q = jnp.clip((x - lo) * scale, 0, 2 ** bits - 1).astype(jnp.uint32)

    def spread3(v):  # 10 bits -> every 3rd bit
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    def spread2(v):  # 15 bits -> every 2nd bit
        v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
        v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
        v = (v | (v << 2)) & jnp.uint32(0x33333333)
        v = (v | (v << 1)) & jnp.uint32(0x55555555)
        return v

    if pd == 3:
        return (spread3(q[:, 0]) | (spread3(q[:, 1]) << 1)
                | (spread3(q[:, 2]) << 2))
    return spread2(q[:, 0]) | (spread2(q[:, 1]) << 1)


def _masked_box_cols(xs, mask):
    """Per-segment min/max over REAL particles only, falling back to the
    unmasked box for pure-padding segments.

    Padding clones live outside the real domain (parts.pad_to); letting
    them into node boxes inflates nr/ns for every node on the real/pad
    boundary spine, which wrecks MAC acceptance (huge nodes never
    separate) and overflows the fixed-width interaction lists.
    xs: list of pd (nseg, m) arrays; mask: (nseg, m) bool.
    Returns (lo, hi) of shape (nseg, pd).
    """
    los, his = [], []
    any_real = jnp.any(mask, axis=1)
    for xd in xs:
        big = jnp.asarray(3.0e38, xd.dtype)
        lo_m = jnp.min(jnp.where(mask, xd, big), axis=1)
        hi_m = jnp.max(jnp.where(mask, xd, -big), axis=1)
        los.append(jnp.where(any_real, lo_m, jnp.min(xd, axis=1)))
        his.append(jnp.where(any_real, hi_m, jnp.max(xd, axis=1)))
    return jnp.stack(los, axis=1), jnp.stack(his, axis=1)


def _pad_dead_boxes(lo, hi, parts: int, live: int, nseg_p: int):
    """Extend live-prefix (parts*live, pd) boxes to the full
    (parts*nseg_p, pd) level width. Dead-segment entries are zeros —
    inert placeholders that _dead_geometry_override replaces with
    far-point geometry keyed on the alive mask."""
    pd = lo.shape[1]
    lo = jnp.pad(lo.reshape(parts, live, pd),
                 ((0, 0), (0, nseg_p - live), (0, 0))).reshape(-1, pd)
    hi = jnp.pad(hi.reshape(parts, live, pd),
                 ((0, 0), (0, nseg_p - live), (0, 0))).reshape(-1, pd)
    return lo, hi


def _split_step_impl(cols, n_real, l: int, pd: int, capture_box: bool,
                     n_live: int = 0, parts: int = 1,
                     bitonic: int = -1, prefix_min: int = -1,
                     chunk_elems: int = -1):
    """One median-split level: boxes (pre-split), longest-axis keys, one
    variadic segmented sort carrying every column through the network.

    cols: tuple of (n_pad,) arrays — x0..x_{pd-1}, r, s..., gidx (int32,
    last). A separate donated jit per level keeps peak HBM at ~2x the
    payload: unrolling all levels into one program makes XLA's buffer
    assignment keep every level's temporaries alive.

    The sort key IS a coordinate column (the segment's longest axis), so
    it rides as operand 0 instead of a duplicate 5th column: the other
    pd-1 coordinates are packed in cyclic (axis+j) order and unpacked
    axis-major after the sort. Every bitonic pass moves 4 columns
    instead of 5 (-20% sort traffic — the dominant tree-build cost at
    scale); the permutation, and hence the tree, is bit-identical, and
    the pack/unpack where-chains are cheap elementwise passes.

    live_frac / parts: padding clones sort past every real particle
    (pad_to puts them one diameter beyond the max corner), so after the
    first split each of the `parts` stacked particle sets keeps its
    reals in a slot PREFIX: segments are [full, ..., full, one partial,
    all-pad, ...]. The all-pad tail segments (statically known — 40% of
    slots at N=1e7) are sliced out of the sort entirely; their slots
    pass through untouched and the dead nodes above them get inert
    geometry in the finish pass (_dead_geometry_override).

    Prefix slicing: the same invariant (every pad coordinate exceeds
    every real coordinate on every axis) means the partial segment's
    pad TAIL never moves under its sort either — sorting just the
    [0:lp) real prefix of the partial segment produces the identical
    real layout. Each level therefore sorts exactly n_live rows
    (full segments at (parts*full, m) plus one (parts, lp) prefix
    sort), not n_pad — a 40% volume cut at N=1e7/bs256. Pad slots keep
    their incoming order instead of being coordinate-sorted, which no
    consumer observes: boxes/CM/alive are real-masked, dead nodes get
    far-point geometry, and pad sources carry zero strength.
    """
    n_pad = cols[0].shape[0]
    nseg = 1 << l
    m = n_pad >> l
    # statically-known live segments per stacked particle set
    nseg_p = nseg // parts
    live = min(nseg_p, -(-n_live // m)) if n_live else nseg_p
    full = min(nseg_p, n_live // m) if n_live else nseg_p
    # prefix_min is a STATIC argument (like `bitonic`): resolving the
    # module setting at trace time would let a runtime change silently
    # reuse stale compilations (same trap ADVICE r2 flagged for the
    # bitonic threshold)
    if prefix_min < 0:
        prefix_min = PREFIX_SORT_MIN
    lp = (n_live - full * m
          if (n_live >= prefix_min and full < nseg_p) else 0)

    def _sort_allreal(xs_g, rest_g):
        """Box -> axis keys -> variadic sort -> coord unpack for one
        group of equal-length ALL-REAL segments (unmasked boxes)."""
        lo = jnp.stack([jnp.min(x, axis=1) for x in xs_g], axis=1)
        hi = jnp.stack([jnp.max(x, axis=1) for x in xs_g], axis=1)
        axis_g = jnp.argmax(hi - lo, axis=1)
        keys = xs_g[0]
        for d in range(1, pd):
            keys = jnp.where((axis_g == d)[:, None], xs_g[d], keys)
        oth_g = []
        for j in range(1, pd):
            oj = xs_g[0]
            for d in range(1, pd):
                oj = jnp.where(((axis_g + j) % pd == d)[:, None],
                               xs_g[d], oj)
            oth_g.append(oj)
        out_g = _seg_sort((keys,) + tuple(oth_g) + tuple(rest_g),
                          keys.shape[1], bitonic, chunk_elems)
        sk, so, rest = out_g[0], out_g[1:pd], out_g[pd:]
        new_xs = []
        for d in range(pd):
            xd = sk
            for j in range(1, pd):
                xd = jnp.where(((axis_g + j) % pd == d)[:, None],
                               so[j - 1], xd)
            new_xs.append(xd)
        return list(new_xs) + list(rest), lo, hi

    if lp > 0:
        # prefix slicing (see docstring): sort the full segments at
        # (parts*full, m) and ONLY the [0:lp) real prefix of each
        # part's partial segment; pad slots pass through untouched.
        per_part = nseg_p * m
        trip = [((cp := c.reshape(parts, per_part))[:, :full * m],
                 cp[:, full * m:full * m + lp],
                 cp[:, full * m + lp:]) for c in cols]
        if full:
            fcols = [f.reshape(parts * full, m) for f, _, _ in trip]
            fsorted, lo_f, hi_f = _sort_allreal(fcols[:pd], fcols[pd:])
        pcols = [p for _, p, _ in trip]                  # (parts, lp)
        psorted, lo_p, hi_p = _sort_allreal(pcols[:pd], pcols[pd:])
        # write the sorted live region back over the input columns with
        # dynamic_update_slice instead of concatenating [sorted, tail]:
        # a concat ALWAYS materializes a second full-size buffer while
        # the input is still alive (the N=1e8 chunked build OOMed on
        # exactly that extra column set — r3), while XLA can lower an
        # update-slice over an otherwise-dead operand in place.
        new_cols = []
        for i in range(len(cols)):
            cp = cols[i].reshape(parts, per_part)
            if full:
                cp = jax.lax.dynamic_update_slice(
                    cp, fsorted[i].reshape(parts, full * m), (0, 0))
            cp = jax.lax.dynamic_update_slice(cp, psorted[i],
                                              (0, full * m))
            new_cols.append(cp.reshape(n_pad))
        new_cols = tuple(new_cols)
        if not capture_box:
            return new_cols, None, None
        live_n = full + 1
        if full:
            lo = jnp.concatenate([lo_f.reshape(parts, full, pd),
                                  lo_p[:, None, :]],
                                 axis=1).reshape(parts * live_n, pd)
            hi = jnp.concatenate([hi_f.reshape(parts, full, pd),
                                  hi_p[:, None, :]],
                                 axis=1).reshape(parts * live_n, pd)
        else:
            lo, hi = lo_p, hi_p
        lo, hi = _pad_dead_boxes(lo, hi, parts, live_n, nseg_p)
        return new_cols, lo, hi

    sliced = live < nseg_p
    if sliced:
        def head(c):
            cp = c.reshape(parts, nseg_p * m)
            return cp[:, :live * m].reshape(parts * live, m)
        segs = [head(c) for c in cols]
        nseg_s = parts * live
    else:
        segs = [c.reshape(nseg, m) for c in cols]
        nseg_s = nseg
    xs = segs[:pd]
    mask = segs[-1] < n_real
    lo, hi = _masked_box_cols(xs, mask)
    axis = jnp.argmax(hi - lo, axis=1)                    # (nseg_s,)
    keys = xs[0]
    for d in range(1, pd):
        keys = jnp.where((axis == d)[:, None], xs[d], keys)
    oth = []                       # non-axis coords, cyclic (axis+j)%pd
    for j in range(1, pd):
        oj = xs[0]
        for d in range(1, pd):
            oj = jnp.where(((axis + j) % pd == d)[:, None], xs[d], oj)
        oth.append(oj)
    out = _seg_sort((keys,) + tuple(oth) + tuple(segs[pd:]),
                    keys.shape[1], bitonic, chunk_elems)
    skeys, soth, rest = out[0], out[1:pd], out[pd:]
    new_xs = []
    for d in range(pd):
        xd = skeys                                        # axis == d
        for j in range(1, pd):
            xd = jnp.where(((axis + j) % pd == d)[:, None], soth[j - 1],
                           xd)
        new_xs.append(xd)
    sorted_segs = new_xs + list(rest)
    if sliced:
        # update-slice over the input instead of [sorted, tail] concat
        # — same in-place rationale as the prefix path above
        new_cols = tuple(
            jax.lax.dynamic_update_slice(
                c.reshape(parts, nseg_p * m),
                s.reshape(parts, live * m), (0, 0)).reshape(n_pad)
            for c, s in zip(cols, sorted_segs))
        if capture_box:
            lo, hi = _pad_dead_boxes(lo, hi, parts, live, nseg_p)
    else:
        new_cols = tuple(c.reshape(n_pad) for c in sorted_segs)
    if capture_box:
        return new_cols, lo, hi
    return new_cols, None, None


def _box_step_impl(cols, n_real, l: int, pd: int, n_live: int = 0,
                   parts: int = 1):
    n_pad = cols[0].shape[0]
    nseg = 1 << l
    m = n_pad >> l
    nseg_p = nseg // parts
    live = min(nseg_p, -(-n_live // m)) if n_live else nseg_p
    if live < nseg_p:
        def head(c):
            cp = c.reshape(parts, nseg_p * m)
            return cp[:, :live * m].reshape(parts * live, m)
        xs = [head(c) for c in cols[:pd]]
        mask = head(cols[-1]) < n_real
        lo, hi = _masked_box_cols(xs, mask)
        return _pad_dead_boxes(lo, hi, parts, live, nseg_p)
    xs = [c.reshape(nseg, m) for c in cols[:pd]]
    mask = cols[-1].reshape(nseg, m) < n_real
    return _masked_box_cols(xs, mask)


_split_step = partial(jax.jit,
                      static_argnames=("l", "pd", "capture_box",
                                       "n_live", "parts", "bitonic",
                                       "prefix_min", "chunk_elems"),
                      donate_argnums=(0,))(_split_step_impl)
_box_step = partial(jax.jit,
                    static_argnames=("l", "pd", "n_live",
                                     "parts"))(_box_step_impl)


@partial(jax.jit, static_argnames=("schedule", "pd", "bitonic",
                                   "prefix_min", "chunk_elems"),
         donate_argnums=(0,))
def _run_steps(cols, n_real, schedule, pd: int, bitonic: int = -1,
               prefix_min: int = -1, chunk_elems: int = -1):
    """Execute a static slice of the build schedule as ONE program.

    schedule: tuple of ('sort'|'box', level, capture, n_live, parts).
    Fusing `tree_fuse` consecutive steps per dispatch trades peak HBM
    (up to fuse+1 column sets live) for dispatch count — measured ~35 ms
    of fixed cost per sort dispatch at N=1e7 (docs/PERF.md r2i: paired
    halves dispatches and saves 0.45 s over 13 sorts). Large-N callers
    keep fuse=1, which is exactly the old one-donated-jit-per-level
    behavior. Returns (cols, [(lo, hi) per capturing step])."""
    boxes = []
    for kind, l, capture, n_live, parts in schedule:
        if kind == "sort":
            cols, lo, hi = _split_step_impl(cols, n_real, l, pd,
                                            capture, n_live, parts,
                                            bitonic, prefix_min,
                                            chunk_elems)
        else:
            lo, hi = _box_step_impl(cols, n_real, l, pd, n_live, parts)
        if capture:
            boxes.append((lo, hi))
    return cols, boxes


def _build_schedule(levels: int, sort_levels: int, n_pad_seg: int,
                    q: int, span_top: int, span_bot, n_live: int,
                    parts: int, loff: int = 0):
    """The median/span level walk as a static op list (the exact loop
    both build_tree and build_trees_paired used to run inline)."""
    sched = []
    l = 0
    while True:
        capture = l <= levels
        if l == sort_levels or (n_pad_seg >> l) < 2:
            if capture:
                sched.append(("box", l + loff, True, n_live, parts))
            break
        sched.append(("sort", l + loff, capture, n_live, parts))
        l += 1
        if l <= span_top or (span_bot is not None and l >= span_bot):
            for _ in range(q - 1):
                if l == sort_levels or (n_pad_seg >> l) < 2:
                    break
                if l <= levels:
                    sched.append(("box", l + loff, True, n_live, parts))
                l += 1
    return sched


def _run_schedule(cols, n_real, sched, pd: int, fuse: int):
    lows, highs = [], []
    fuse = max(1, fuse)
    # resolve the module thresholds HERE (outside jit) so they key the
    # compile cache — a runtime change recompiles instead of reusing a
    # stale trace (ADVICE r2)
    bitonic = BITONIC_MAX_M
    prefix_min = PREFIX_SORT_MIN
    chunk_elems = _BITONIC_CHUNK_ELEMS
    for i in range(0, len(sched), fuse):
        cols, boxes = _run_steps(cols, n_real, tuple(sched[i:i + fuse]),
                                 pd, bitonic, prefix_min, chunk_elems)
        for lo, hi in boxes:
            lows.append(lo)
            highs.append(hi)
    return cols, lows, highs


# --------------------------------------------------- bisect group build
#
# Exact per-level median splits WITHOUT a sort per level: split planes
# are found by 32-round integer bisection on the monotone-u32 image of
# the coordinates (counts only — no data movement), and ONE variadic
# sort per `g` levels then moves every element straight to its level-
# (l0+g) segment. Sort passes scale with log^2(segment length), so
# replacing g sorts with one cuts the dominant tree cost ~g-fold at the
# top while the bisection adds only ~32 cheap elementwise sweeps per
# level. Counts are exact (ties split by block-order rank), preserving
# the VAMsplit slot-exactness invariant; in-group split axes come from
# plane-derived (untight) boxes — the tree's recorded boxes are exact,
# recomputed from the contiguous post-sort segments.

_U32 = jnp.uint32


def _u32_key(x):
    """f32 -> order-preserving u32 (sign-flip trick)."""
    b = jax.lax.bitcast_convert_type(x, _U32)
    return jnp.where(b >> 31 == 1, ~b, b | _U32(0x80000000))


def _u32_val(u):
    """Inverse of _u32_key."""
    b = jnp.where(u >> 31 == 1, u ^ _U32(0x80000000), ~u)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _code_counts(pred, code, nsub: int, nblk: int, m: int):
    """count[c] (nblk,) of pred elements per sub-segment code, without
    scatters: pack per-code 1-bit terms into 4-bit digits of one u32
    (code < 8), sum within chunks of 8 (digit <= 8, no carry), then
    extract digits and reduce. One full sweep + nsub light sweeps."""
    term = pred.astype(_U32) << (code * 4)
    ch = jnp.sum(term.reshape(nblk, m // 8, 8), axis=2, dtype=_U32)
    return [jnp.sum((ch >> (4 * c)) & 0xF, axis=1, dtype=_U32)
            for c in range(nsub)]


def _sel_by_code(code, vals, nsub: int):
    """Per-element lookup vals[block, code] via a where-chain (vals is
    (nblk, nsub); code is (nblk, m) or broadcastable)."""
    out = jnp.broadcast_to(vals[:, 0:1], code.shape)
    for c in range(1, nsub):
        out = jnp.where(code == c, vals[:, c:c + 1], out)
    return out


@partial(jax.jit, static_argnames=("l0", "g", "pd", "ncap"),
         donate_argnums=(0,))
def _bisect_group_step(cols, n_real, l0: int, g: int, pd: int, ncap: int):
    """Split array-levels l0..l0+g-1 exactly, with ONE sort at the end.

    Returns (new_cols, lows, highs): exact masked pre-split boxes for
    the first `ncap` levels of the group (level l0 from the incoming
    contiguous segments; deeper ones from the post-sort segments — boxes
    are per-segment set properties, order-independent).
    """
    n_pad = cols[0].shape[0]
    nblk = 1 << l0
    m = n_pad >> l0
    segs = [c.reshape(nblk, m) for c in cols]
    xs = segs[:pd]
    real = segs[-1] < n_real
    lo0, hi0 = _masked_box_cols(xs, real)              # exact, level l0
    # derived boxes for in-group axis choice: (nblk, nsub, pd)
    lo_d, hi_d = lo0[:, None, :], hi0[:, None, :]
    us = [_u32_key(xd) for xd in xs]
    code = jnp.zeros((nblk, m), _U32)

    for j in range(g):
        nsub = 1 << j
        target = _U32((m >> j) >> 1)
        axis = jnp.argmax(hi_d - lo_d, axis=-1).astype(_U32)  # (nblk,nsub)
        ax_word = jnp.zeros((nblk,), _U32)
        for c in range(nsub):
            ax_word = ax_word | (axis[:, c] << _U32(2 * c))
        ax_e = (ax_word[:, None] >> (code * 2)) & 3
        u = us[0]
        for d in range(1, pd):
            u = jnp.where(ax_e == d, us[d], u)

        # 32-round MSB-greedy bisection for the largest T with
        # count(u < T) <= target, per sub-segment, tracked per element.
        # cnt_acc carries the count at the last ACCEPTED candidate ==
        # count(u < t_final), sparing a 33rd counting pass.
        t = jnp.zeros((nblk, m), _U32)
        cnt_acc = [jnp.zeros((nblk,), _U32) for _ in range(nsub)]
        for r in range(31, -1, -1):
            cand = t | _U32(1 << r)
            cnts = _code_counts(u < cand, code, nsub, nblk, m)
            word = jnp.zeros((nblk,), _U32)
            for c in range(nsub):
                keep_c = cnts[c] <= target
                word = word | (keep_c.astype(_U32) << _U32(c))
                cnt_acc[c] = jnp.where(keep_c, cnts[c], cnt_acc[c])
            k_e = (word[:, None] >> code) & 1
            t = jnp.where(k_e == 1, cand, t)

        # exact tie split: first (target - count_less) ties, in block
        # order, go left. Rank among own-code ties via chunked packed
        # cumsum (4-bit digits, chunks of 8 — no carries).
        cnt_less = cnt_acc
        need = jnp.stack([(target - cnt_less[c]).astype(jnp.int32)
                          for c in range(nsub)], axis=1)  # (nblk, nsub)
        tie = u == t
        term = tie.astype(_U32) << (code * 4)
        c8 = jnp.cumsum(term.reshape(nblk, m // 8, 8), axis=2,
                        dtype=_U32)
        tot = c8[:, :, -1]                              # (nblk, m//8)
        totc = jnp.stack([((tot >> (4 * c)) & 0xF).astype(jnp.int32)
                          for c in range(nsub)], axis=-1)
        pre = jnp.cumsum(totc, axis=1) - totc           # exclusive
        code_r = code.reshape(nblk, m // 8, 8)
        inc = ((c8 >> (code_r * 4)) & 0xF).astype(jnp.int32)
        pre_e = jnp.broadcast_to(pre[:, :, 0:1], code_r.shape)
        for c in range(1, nsub):
            pre_e = jnp.where(code_r == c, pre[:, :, c:c + 1], pre_e)
        rank = (pre_e + inc - 1).reshape(nblk, m)
        need_e = _sel_by_code(code, need, nsub)
        left = (u < t) | (tie & (rank < need_e))

        # plane value per sub-segment (t is uniform within one) for the
        # derived child boxes of the next in-group level
        if j + 1 < g:
            t_bc = jnp.stack(
                [jnp.max(jnp.where(code == c, t, 0), axis=1)
                 for c in range(nsub)], axis=1)          # (nblk, nsub)
            plane = _u32_val(t_bc)[:, :, None]           # (nblk,nsub,1)
            onax = (jnp.arange(pd)[None, None, :]
                    == axis[:, :, None].astype(jnp.int32))
            lo_l, hi_l = lo_d, jnp.where(onax, jnp.minimum(hi_d, plane),
                                         hi_d)
            lo_r, hi_r = jnp.where(onax, jnp.maximum(lo_d, plane),
                                   lo_d), hi_d
            lo_d = jnp.stack([lo_l, lo_r], axis=2).reshape(nblk,
                                                           2 * nsub, pd)
            hi_d = jnp.stack([hi_l, hi_r], axis=2).reshape(nblk,
                                                           2 * nsub, pd)

        code = code * 2 + (1 - left.astype(_U32))

    out = jax.lax.sort((code,) + tuple(segs), dimension=1, num_keys=1)
    new_cols = tuple(o.reshape(n_pad) for o in out[1:])

    lows, highs = [], []
    if ncap > 0:
        lows.append(lo0)
        highs.append(hi0)
    for j in range(1, min(g, ncap)):
        l = l0 + j
        nseg = 1 << l
        mj = n_pad >> l
        xs_j = [c.reshape(nseg, mj) for c in new_cols[:pd]]
        mask_j = new_cols[-1].reshape(nseg, mj) < n_real
        lo, hi = _masked_box_cols(xs_j, mask_j)
        lows.append(lo)
        highs.append(hi)
    return new_cols, lows, highs


def _upward_stats(x, r, s, mask, levels: int, block_size: int, sd: int,
                  are_targets: bool, dtype, n_live: int = 0):
    """Leaf + interior centers of mass, strength sums, mean radii
    (finishTree, barneshut.hpp:718-807), excluding padding clones.

    CM weights: |strength| for sources (pads are zero-strength), the
    real-particle mask for targets (a pad-polluted target CM shifts the
    DTT MAC distance and breaks acceptance near the real/pad boundary).
    Interior merges are weight-sum-weighted (the analogue of the
    reference's count-weighted merge, barneshut.hpp:733-746).
    Returns (cm_all, s_all, pr_all) of shapes (NN, pd)/(NN, sd)/(NN,).

    n_live (static): real-particle count. Reals occupy a slot prefix
    (pads sort last), so stats are computed only for the live prefix of
    every level; dead rows keep zeros (alive=False, zero strengths —
    inert by the padding contract, and their cm/box geometry is
    overridden with the far point in _finish_median anyway). At
    N=1e7/bs256 this skips 40% of the leaf reductions. 0 disables.
    """
    nleaf = 1 << levels
    nn = 2 * nleaf
    pd = x.shape[1]
    n_pad = nleaf * block_size
    lleaf = min(nleaf, -(-n_live // block_size)) if n_live else nleaf

    cm_all = jnp.zeros((nn, pd), dtype)
    s_all = jnp.zeros((nn, max(sd, 1)), dtype)
    pr_all = jnp.zeros((nn,), dtype)
    alive_all = jnp.zeros((nn,), jnp.bool_)

    lb = lleaf * block_size
    xs = x[:lb].reshape(lleaf, block_size, pd)
    maskf = mask[:lb].reshape(lleaf, block_size).astype(dtype)
    if s is not None and not are_targets:
        ss = s[:lb].reshape(lleaf, block_size, sd)
        if sd == 1:
            w = jnp.abs(ss[..., 0])
        else:
            w = jnp.sqrt(jnp.sum(ss * ss, axis=-1))
    else:
        w = maskf
    wsum = jnp.sum(w, axis=1)
    leaf_cm = (jnp.einsum("lbp,lb->lp", xs, w,
                          precision=jax.lax.Precision.HIGHEST)
               / (1e-20 + wsum[:, None]))
    # zero-weight leaves (pure padding) fall back to the mean position
    # so their CM is never a bogus origin inside the real domain
    leaf_cm = jnp.where((wsum > 1e-12)[:, None], leaf_cm,
                        jnp.mean(xs, axis=1))
    leaf_s = (jnp.sum(s[:lb].reshape(lleaf, block_size, sd), axis=1)
              if s is not None else jnp.zeros((lleaf, 1), dtype))
    # mean radius over real particles (falling back to the plain mean)
    rs = r[:lb].reshape(lleaf, block_size)
    msum = jnp.sum(maskf, axis=1)
    leaf_pr = jnp.where(msum > 0,
                        jnp.sum(rs * maskf, axis=1) / (1e-20 + msum),
                        jnp.mean(rs, axis=1))

    cm_all = cm_all.at[nleaf:nleaf + lleaf].set(leaf_cm)
    s_all = s_all.at[nleaf:nleaf + lleaf].set(leaf_s)
    pr_all = pr_all.at[nleaf:nleaf + lleaf].set(leaf_pr)
    alive_l = msum > 0
    alive_all = alive_all.at[nleaf:nleaf + lleaf].set(alive_l)

    def pad_even(a):
        # the merge consumes children two at a time: pad an odd live
        # prefix with one dead (zero-weight) row
        return jnp.pad(a, ((0, a.shape[0] % 2),) + ((0, 0),) * (a.ndim - 1))

    cm_l, s_l, pr_l, w_l = (pad_even(leaf_cm), pad_even(leaf_s),
                            pad_even(leaf_pr), pad_even(wsum))
    alive_l = pad_even(alive_l)
    for l in range(levels - 1, -1, -1):
        nseg = 1 << l
        w0, w1 = w_l[0::2], w_l[1::2]
        wp = w0 + w1
        safe = 1e-20 + wp
        any_w = (wp > 1e-12)
        cm_m = (cm_l[0::2] * w0[:, None] + cm_l[1::2] * w1[:, None]) \
            / safe[:, None]
        cm_l = jnp.where(any_w[:, None], cm_m,
                         0.5 * (cm_l[0::2] + cm_l[1::2]))
        pr_m = (pr_l[0::2] * w0 + pr_l[1::2] * w1) / safe
        pr_l = jnp.where(any_w, pr_m, 0.5 * (pr_l[0::2] + pr_l[1::2]))
        s_l = s_l[0::2] + s_l[1::2]
        w_l = wp
        alive_l = alive_l[0::2] | alive_l[1::2]
        lseg = cm_l.shape[0]                     # live nodes this level
        cm_all = cm_all.at[nseg:nseg + lseg].set(cm_l)
        s_all = s_all.at[nseg:nseg + lseg].set(s_l)
        pr_all = pr_all.at[nseg:nseg + lseg].set(pr_l)
        alive_all = alive_all.at[nseg:nseg + lseg].set(alive_l)
        if l:
            cm_l, s_l, pr_l = pad_even(cm_l), pad_even(s_l), pad_even(pr_l)
            w_l, alive_l = pad_even(w_l), pad_even(alive_l)
    return cm_all, s_all, pr_all, alive_all


@partial(jax.jit, static_argnames=("levels", "block_size", "sd",
                                   "are_targets", "n_live"),
         donate_argnums=(0,))
def _finish_median(cols, n_real, lows, highs, levels: int,
                   block_size: int, sd: int, are_targets: bool,
                   n_live: int = 0):
    """Assemble Tree arrays and upward stats from the sorted columns and
    per-level pre-split boxes (finishTree, barneshut.hpp:718-807)."""
    pd = lows[0].shape[-1]
    dtype = cols[0].dtype
    nleaf = 1 << levels
    nn = 2 * nleaf

    nc_all = jnp.zeros((nn, pd), dtype)
    ns_all = jnp.zeros((nn, pd), dtype)
    for l, (lo, hi) in enumerate(zip(lows, highs)):
        sl = slice(1 << l, 2 << l)
        nc_all = nc_all.at[sl].set(0.5 * (lo + hi))
        ns_all = ns_all.at[sl].set(hi - lo)
    nr_all = 0.5 * jnp.sqrt(jnp.sum(ns_all * ns_all, axis=1))

    x = jnp.stack(cols[:pd], axis=1)
    r = cols[pd]
    s = jnp.stack(cols[pd + 1:pd + 1 + sd], axis=1) if sd else None
    gidx = cols[-1]
    mask = gidx < n_real

    cm_all, s_all, pr_all, alive = _upward_stats(x, r, s, mask, levels,
                                                 block_size, sd,
                                                 are_targets, dtype,
                                                 n_live=n_live)

    # dead nodes (pure padding) become zero-size boxes at a far point:
    # the MAC separates them from every real node on their FIRST
    # frontier appearance, so padding subtrees cost one accepted
    # zero-strength pair instead of a multi-level descent — and the
    # unsorted dead-tail slots (_split_step n_live) never need real
    # geometry at all
    diam = jnp.max(highs[0] - lows[0])
    fp = (highs[0] + 8.0 * diam + 1.0).astype(dtype)     # (1, pd)
    dead = ~alive
    nc_all = jnp.where(dead[:, None], fp, nc_all)
    ns_all = jnp.where(dead[:, None], 0.0, ns_all)
    nr_all = jnp.where(dead, 0.0, nr_all)
    cm_all = jnp.where(dead[:, None], fp, cm_all)
    # dead pr is 0 regardless of n_live slicing (the unsliced path's
    # fallback mean over pad clones was never read — zero-strength far
    # pairs contribute nothing — but keep the two paths bit-identical)
    pr_all = jnp.where(dead, 0.0, pr_all)

    tree = Tree(nc=nc_all, ns=ns_all, nr=nr_all, x=cm_all, s=s_all,
                pr=pr_all, alive=alive, levels=levels,
                block_size=block_size)
    return tree, x, r, s, gidx


@partial(jax.jit, static_argnames=("levels", "block_size", "sd",
                                   "are_targets"))
def _build_morton(cols, n_real, levels: int, block_size: int, sd: int,
                  are_targets: bool):
    """One global space-filling-curve sort; equal-count splits of the
    sorted order. Boxes are computed from the actual REAL particles per
    segment, so they stay tight; split planes follow the Morton curve
    instead of per-level medians (slightly fatter nodes, ~1 sort instead
    of `levels`). Intra-leaf order is hierarchically local by
    construction (refine comes free)."""
    pd = len(cols) - 2 - sd
    n_pad = cols[0].shape[0]
    dtype = cols[0].dtype
    nleaf = 1 << levels
    nn = 2 * nleaf

    x = jnp.stack(cols[:pd], axis=1)
    keys = _morton_keys(x, pd)
    out = jax.lax.sort((keys,) + tuple(cols), dimension=0, num_keys=1)
    cols = out[1:]
    gidx = cols[-1]
    mask_flat = gidx < n_real

    nc_all = jnp.zeros((nn, pd), dtype)
    ns_all = jnp.zeros((nn, pd), dtype)
    for l in range(levels + 1):
        nseg = 1 << l
        m = n_pad >> l
        xs = [c.reshape(nseg, m) for c in cols[:pd]]
        lo, hi = _masked_box_cols(xs, mask_flat.reshape(nseg, m))
        sl = slice(nseg, 2 * nseg)
        nc_all = nc_all.at[sl].set(0.5 * (lo + hi))
        ns_all = ns_all.at[sl].set(hi - lo)
    nr_all = 0.5 * jnp.sqrt(jnp.sum(ns_all * ns_all, axis=1))

    x = jnp.stack(cols[:pd], axis=1)
    r = cols[pd]
    s = jnp.stack(cols[pd + 1:pd + 1 + sd], axis=1) if sd else None
    cm_all, s_all, pr_all, alive = _upward_stats(x, r, s, mask_flat,
                                                 levels, block_size, sd,
                                                 are_targets, dtype)
    tree = Tree(nc=nc_all, ns=ns_all, nr=nr_all, x=cm_all, s=s_all,
                pr=pr_all, alive=alive, levels=levels,
                block_size=block_size)
    return tree, x, r, s, gidx


def build_tree(p: Parts, block_size: int = 128, refine: bool = False,
               mode: str = "median", span: int = 2,
               span_top: int = 6,
               span_bot: Optional[int] = None,
               defer_rs: bool = False,
               bisect_group: int = 4,
               fuse: int = 1,
               need_r: bool = True,
               quant: str = "off",
               force_plan: Optional[Tuple[int, int]] = None,
               gidx0: Optional[jax.Array] = None
               ) -> Tuple[Tree, Parts, jax.Array]:
    """Build the tree; returns (tree, reordered+padded parts, gidx).

    gidx[i] = original index of the particle now in slot i (the
    un-scrambling permutation the C-ABI layer needs,
    interface2dvort.cpp:301-304). Padded slots have gidx >= n_real.

    need_r=False (targets of a kernel with uses_tr=False — grav3d,
    vort3d, vortgrad3d ignore target radii entirely): the sorted radius
    column comes back as zeros instead of riding the sort payload /
    paying the deferred ~7.4 ns/element gather. Node pr stats are then
    zeros too (never read for such kernels).

    mode:
    * 'median' — VAMsplit-equivalent per-level median splits, one
      variadic sort per level.
    * 'span' — for the top `span_top` levels, one variadic sort serves
      `span` consecutive levels as a 2^span-way equal split along the
      level's longest axis (the padded tree is fully balanced, so every
      VAMsplit point is an exact quantile of the sorted segment); exact
      per-level median splits below. Boxes stay non-overlapping with
      exact counts — the property the rejected Morton-hybrid build
      lacked (curve-segment boxes overlap siblings; measured +31%
      accepted pairs and frontier overflow at N=1e6). Top levels are
      where the segmented bitonic sorts are most expensive (cost ~
      log^2(segment)) and where boxes are far too large to separate at
      any practical theta, so the elongated intermediate boxes (aspect
      up to 2^span along the split axis) cost nothing: by the depth
      where MAC separation begins, median splits have restored cubish
      boxes. Full-depth span measured 55k frontier overflows at N=1e6
      (W208); span_top=8 measured zero with nvalid == median's.
      `span_bot` (a level index; None disables) additionally applies
      the multi-way skip from that level DOWN: every bitonic pass
      touches the whole array regardless of segment size, so bottom
      levels cost as much as mid levels; below MAC-critical depth the
      elongated intermediates fatten LEAF boxes (near-field volume) —
      a measured tradeoff, not a free win like span_top.
    * 'morton' — one global space-filling-curve sort; fastest build,
      fatter overlapping boxes (measured to overflow DTT frontiers at
      theta=1.4 — fine for treecodes, not the production DTT choice).

    quant ('off' | 'gather' | 'dequant'): run the median/span sort
    schedule on packed u16 coordinate codes (tree/quant.py) — 3 sort
    columns in 3D instead of 4 — recovering f32 coordinates after the
    last sort by an exact packed gather ('gather') or by cell-center
    dequantization ('dequant', error <= half a grid step ~1.5e-5 of
    the domain). Requires defer_rs and mode in {median, span}.
    """
    # ownership transfer: a caller that passes `[parts]` (a one-element
    # list) hands the ORIGINAL arrays over — they are dropped right
    # after padding, so the ~2 GB of originals at N=1e8 never coexist
    # with the sort network's temporaries (the chunked solve's src-tree
    # phase OOMed on exactly that overlap — r3)
    owned = isinstance(p, list)
    if owned:
        p = p.pop()
    n_real_static = p.n_real
    # force_plan: build a tree of a FIXED (levels, n_pad) shape even if
    # the real count would size it smaller — the out-of-core subtree
    # builds need every subtree to have exactly n_pad_global/2^split
    # slots for the global implicit-binary assembly to line up
    levels, n_pad = force_plan or plan(n_real_static, block_size)
    assert n_pad >= n_real_static and (1 << levels) * block_size == n_pad
    pp = pad_to(p, n_pad)
    # gidx0: caller-provided slot ids whose `>= n_real` values mark pad
    # rows — lets a DYNAMICALLY-sized particle set (sharded exchange
    # slabs, parallel/shard_prepare.py) build under static shapes: the
    # caller passes already-padded arrays with n_real == n_pad and
    # encodes the true validity in gidx0
    if gidx0 is not None:
        assert gidx0.shape == (n_pad,)
        gidx = gidx0.astype(jnp.int32)
    else:
        gidx = jnp.arange(n_pad, dtype=jnp.int32)
    n_real = jnp.int32(n_real_static)
    are_targets = not p.are_sources
    if owned:
        p = None
    pd = pp.x.shape[1]
    sd = 0 if pp.s is None else pp.s.shape[1]

    # jnp.copy(r): every other column is a fresh buffer (slices, iota,
    # concat), but r would alias the caller's array — the donated
    # per-level split steps would delete it out from under the caller.
    # defer_rs: radii/strengths never influence the splits or boxes —
    # leave them out of the sort network (fewer operands per bitonic
    # pass) and gather them once through the final permutation.
    defer = defer_rs and mode != "morton"
    skip_r = (not need_r) and mode != "morton"
    qgeo = x_keep = None
    if quant != "off":
        assert defer and mode in ("median", "span"), (
            "tree_quant requires defer_rs and mode in {median, span}")
        from onbody_tpu.tree import quant as qm
        qc, glo, gstep = qm.make_qcols(pp.x, gidx, n_real_static)
        qgeo = (glo[None, :], gstep[None, :])          # (parts=1, pd)
        cols = qc + (gidx,)
        if quant == "gather":
            x_keep = tuple(pp.x[:, d] for d in range(pd))
    else:
        cols = tuple(pp.x[:, d] for d in range(pd))
        if not defer:
            if not skip_r:
                cols = cols + (jnp.copy(pp.r),)
            if pp.s is not None:
                cols = cols + tuple(pp.s[:, d] for d in range(sd))
        cols = cols + (gidx,)
    # the per-axis column slices above are fresh buffers — drop the
    # padded (n_pad, pd) x array now so it does not sit in HBM through
    # the whole sort network (1.6 GB at N=1e8); keep only the r/s
    # columns the deferred final gather still needs
    pp_r, pp_s = pp.r, pp.s
    pp = None

    if mode == "morton":
        tree, x, r, s, gidx = _build_morton(cols, n_real, levels,
                                            block_size, sd, are_targets)
        sorted_parts = Parts(x=x, r=r, s=s, n_real=n_real_static)
        return tree, sorted_parts, gidx

    if mode == "bisect":
        sort_levels = levels if not refine else int(np.log2(n_pad))
        lows, highs = [], []
        l = 0
        while l < sort_levels:
            # 4-bit count digits cap nsub at 8 -> at most 4 levels/sort
            geff = min(bisect_group, 4, sort_levels - l)
            if geff >= 2 and (n_pad >> l) >= 16:
                ncap = max(0, min(geff, levels + 1 - l))
                cols, los, his = _bisect_group_step(cols, n_real, l,
                                                    geff, pd, ncap)
                lows.extend(los)
                highs.extend(his)
                l += geff
            else:
                cols, lo, hi = _split_step(cols, n_real, l, pd,
                                           l <= levels,
                                           n_live=n_real_static,
                                           bitonic=BITONIC_MAX_M,
                                           prefix_min=PREFIX_SORT_MIN,
                                           chunk_elems=(
                                               _BITONIC_CHUNK_ELEMS))
                if l <= levels:
                    lows.append(lo)
                    highs.append(hi)
                l += 1
        if len(lows) == levels:  # leaf-level box still missing
            lo, hi = _box_step(cols, n_real, levels, pd,
                               n_live=n_real_static)
            lows.append(lo)
            highs.append(hi)
        if defer:
            perm = cols[-1]
            cols = (cols[:pd]
                    + _gather_rs_packed(perm, pp_r, pp_s, sd, need_r)
                    + (perm,))
        elif skip_r:
            cols = cols[:pd] + (jnp.zeros_like(cols[0]),) + cols[pd:]
        tree, x, r, s, gidx = _finish_median(
            cols, n_real, tuple(lows), tuple(highs), levels, block_size,
            sd, are_targets, n_live=n_real_static)
        sorted_parts = Parts(x=x, r=r, s=s, n_real=n_real_static)
        return tree, sorted_parts, gidx

    # median/span mode: donated jit steps over the static schedule
    # (`fuse` consecutive steps per dispatch; fuse=1 bounds peak HBM at
    # large N, fuse>1 amortizes per-dispatch fixed cost); span mode
    # skips the sort on levels already ordered by the previous
    # multi-way split and only captures their boxes
    q = span if mode == "span" else 1
    assert q >= 1
    sort_levels = levels if not refine else int(np.log2(n_pad))
    sched = _build_schedule(levels, sort_levels, n_pad, q, span_top,
                            span_bot, n_real_static, 1)
    if quant != "off":
        from onbody_tpu.tree import quant as qm
        cols, lows, highs = qm.qrun_schedule(cols, n_real, qgeo[0],
                                             qgeo[1], sched, pd, fuse)
        perm = cols[-1]
        cols = qm.finalize_cols(cols[:-1], perm, qgeo[0][0],
                                qgeo[1][0], n_real_static, pd, quant,
                                x_keep, pp_r, pp_s, sd,
                                need_r) + (perm,)
    else:
        cols, lows, highs = _run_schedule(cols, n_real, sched, pd, fuse)

        if defer:
            perm = cols[-1]
            cols = (cols[:pd]
                    + _gather_rs_packed(perm, pp_r, pp_s, sd, need_r)
                    + (perm,))
        elif skip_r:
            cols = cols[:pd] + (jnp.zeros_like(cols[0]),) + cols[pd:]
    tree, x, r, s, gidx = _finish_median(
        cols, n_real, tuple(lows), tuple(highs), levels, block_size, sd,
        are_targets, n_live=n_real_static)
    sorted_parts = Parts(x=x, r=r, s=s, n_real=n_real_static)
    return tree, sorted_parts, gidx


def build_trees_paired(ps: Parts, pt: Parts, block_size: int = 128,
                       refine: bool = False, mode: str = "median",
                       span: int = 2, span_top: int = 6,
                       span_bot: Optional[int] = None,
                       defer_rs: bool = False,
                       bisect_group: int = 4,
                       fuse: int = 1,
                       need_tgt_r: bool = True,
                       quant: str = "off"):
    """Build the source AND target trees from ONE sequence of stacked
    sorts (bit-identical to two build_tree calls; tests/test_tree.py).

    The solve builds two same-shape trees back-to-back and every
    per-level variadic sort is a separate dispatch: stacking both
    particle sets as extra segments of one (2*nseg, m) sort moves the
    same data volume through half the dispatches, halving the fixed
    per-pass cost (pass setup at full array width — docs/PERF.md round-2
    tree attribution). Targets carry zero-filled strength columns so the
    variadic operand list matches the source's; only the finish pass
    (boxes + upward stats, are_targets-dependent weights) runs per tree.

    Requires plan(ns)==plan(nt) (equal padded sizes) and mode in
    {'median', 'span'}; callers fall back to two build_tree calls
    otherwise. Returns ((stree, src_sorted, sgidx),
    (ttree, tgt_sorted, tgidx))."""
    assert mode in ("median", "span", "bisect"), mode
    levels, n_pad = plan(ps.n_real, block_size)
    levels_t, n_pad_t = plan(pt.n_real, block_size)
    assert (levels, n_pad) == (levels_t, n_pad_t), "paired needs equal N"
    pps, ppt = pad_to(ps, n_pad), pad_to(pt, n_pad)
    pd = pps.x.shape[1]
    sd = 0 if pps.s is None else pps.s.shape[1]
    gidx = jnp.arange(n_pad, dtype=jnp.int32)

    def stk(a, b):
        return jnp.concatenate([a, b])

    qgeo = None
    if quant != "off":
        assert defer_rs and mode in ("median", "span"), (
            "tree_quant requires defer_rs and mode in {median, span}")
        from onbody_tpu.tree import quant as qm
        qs, slo, sstep = qm.make_qcols(pps.x, gidx, ps.n_real)
        qt, tlo, tstep = qm.make_qcols(ppt.x, gidx, pt.n_real)
        cols = tuple(stk(a, b) for a, b in zip(qs, qt))
        cols += (stk(gidx, gidx),)
        qgeo = (jnp.stack([slo, tlo]), jnp.stack([sstep, tstep]))
    else:
        cols = tuple(stk(pps.x[:, d], ppt.x[:, d]) for d in range(pd))
        if not defer_rs:
            cols += (stk(pps.r, ppt.r),)
            if sd:
                zs = jnp.zeros((n_pad,), pps.s.dtype)
                cols += tuple(stk(pps.s[:, d], zs) for d in range(sd))
        cols += (stk(gidx, gidx),)
    n_real = jnp.int32(ps.n_real)
    assert pt.n_real == ps.n_real

    # tree level l of each half == stacked level l+1 (the level-0 split
    # of the stacked array is the src/tgt boundary, already in place)
    q = span if mode == "span" else 1
    sort_levels = levels if not refine else int(np.log2(n_pad))
    lows, highs = [], []
    if mode == "bisect":
        l = 0
        while l < sort_levels:
            geff = min(bisect_group, 4, sort_levels - l)
            if geff >= 2 and (n_pad >> l) >= 16:
                ncap = max(0, min(geff, levels + 1 - l))
                cols, los, his = _bisect_group_step(
                    cols, n_real, l + 1, geff, pd, ncap)
                lows.extend(los)
                highs.extend(his)
                l += geff
            else:
                cols, lo, hi = _split_step(cols, n_real, l + 1, pd,
                                           l <= levels,
                                           n_live=ps.n_real, parts=2,
                                           bitonic=BITONIC_MAX_M,
                                           prefix_min=PREFIX_SORT_MIN)
                if l <= levels:
                    lows.append(lo)
                    highs.append(hi)
                l += 1
        if len(lows) == levels:
            lo, hi = _box_step(cols, n_real, levels + 1, pd,
                               n_live=ps.n_real, parts=2)
            lows.append(lo)
            highs.append(hi)
        return _finish_paired(cols, lows, highs, pd, sd, n_pad,
                              defer_rs, pps, ppt, ps, pt, n_real,
                              levels, block_size, need_tgt_r)
    sched = _build_schedule(levels, sort_levels, n_pad, q, span_top,
                            span_bot, ps.n_real, 2, loff=1)
    if quant != "off":
        from onbody_tpu.tree import quant as qm
        cols, lows, highs = qm.qrun_schedule(cols, n_real, qgeo[0],
                                             qgeo[1], sched, pd, fuse)
    else:
        cols, lows, highs = _run_schedule(cols, n_real, sched, pd, fuse)

    return _finish_paired(cols, lows, highs, pd, sd, n_pad, defer_rs,
                          pps, ppt, ps, pt, n_real, levels, block_size,
                          need_tgt_r, quant=quant, qgeo=qgeo)


def _gather_rs_packed(perm, r_pad, s_pad, sd: int, need_r: bool = True):
    """Apply the final permutation to the deferred radius/strength
    columns as ONE (n, k) row gather: measured on v5e at 16.8 M rows
    (docs/PERF.md r4), a row gather is ~flat in width (13.9 ns/row at
    k=4) while the previously-used complex64 pair packing costs 24.9
    ns/row — rows win for every k >= 2 and tie at k=1. Bit-exact.
    need_r=False skips the radius gather (kernel ignores these radii)
    and substitutes zeros."""
    from onbody_tpu.tree import quant as qm
    cols = ([r_pad] if need_r else []) + (
        [s_pad[:, d] for d in range(sd)] if s_pad is not None else [])
    out = qm.gather_rows(perm, cols) if cols else []
    if not need_r:
        out.insert(0, jnp.zeros_like(r_pad))
    return tuple(out)


def _finish_paired(cols, lows, highs, pd, sd, n_pad, defer_rs, pps, ppt,
                   ps, pt, n_real, levels, block_size,
                   need_tgt_r: bool = True, quant: str = "off",
                   qgeo=None):
    """Split the stacked columns back into halves and finish each tree."""
    def half(i, keep_s):
        hcols = tuple(c[i * n_pad:(i + 1) * n_pad] for c in cols)
        if quant != "off":
            from onbody_tpu.tree import quant as qm
            perm = hcols[-1]
            xp = (pps if i == 0 else ppt).x
            pr_pad = (pps if i == 0 else ppt).r
            hcols = qm.finalize_cols(
                hcols[:-1], perm, qgeo[0][i], qgeo[1][i], ps.n_real,
                pd, quant,
                None if quant != "gather" else
                [xp[:, d] for d in range(pd)],
                pr_pad, pps.s if keep_s and sd else None, sd,
                need_r=(i == 0 or need_tgt_r)) + (perm,)
        elif defer_rs:
            perm = hcols[-1]
            pr_pad = (pps if i == 0 else ppt).r
            rs = _gather_rs_packed(perm, pr_pad,
                                   pps.s if keep_s and sd else None,
                                   sd, need_r=(i == 0 or need_tgt_r))
            hcols = hcols[:pd] + rs + (perm,)
        elif not keep_s and sd:
            hcols = hcols[:pd + 1] + (hcols[-1],)
        hlows = tuple(lo.reshape(2, -1, pd)[i] for lo in lows)
        hhighs = tuple(hi.reshape(2, -1, pd)[i] for hi in highs)
        return hcols, hlows, hhighs

    scols, slo, shi = half(0, keep_s=True)
    stree, xs, rs, ss, gs = _finish_median(scols, n_real, slo, shi,
                                           levels, block_size, sd,
                                           not ps.are_sources,
                                           n_live=ps.n_real)
    tcols, tlo, thi = half(1, keep_s=False)
    ttree, xt, rt, st, gt = _finish_median(tcols, n_real, tlo, thi,
                                           levels, block_size, 0, True,
                                           n_live=pt.n_real)
    src = Parts(x=xs, r=rs, s=ss, n_real=ps.n_real)
    tgt = Parts(x=xt, r=rt, s=st, n_real=pt.n_real)
    return (stree, src, gs), (ttree, tgt, gt)
