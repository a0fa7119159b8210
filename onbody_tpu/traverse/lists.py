"""Interaction-list construction: MAC-driven tree traversals as dense,
fixed-shape frontier expansions.

The reference walks trees with per-target recursion (barneshut.hpp:66-102,
:138-184, :229-294) and a per-node work-list for the dual-tree traversal
(ongrav3d.cpp:307-402). On TPU, recursion and data-dependent lists become
level-synchronous frontier expansion over padded arrays:

  every target block keeps a candidate list of source nodes; each round,
  the MAC classifies all (target, candidate) pairs at once into
  accept / keep-for-near / expand-children / defer-to-target-children,
  lists are compacted with argsort-by-validity, and accepted pairs are
  appended to fixed-width output lists.

All shapes are static; overflow of any fixed width is *detected* and
reported so callers can re-run with wider lists (two-phase count/fill,
SURVEY.md §7 hard part (a)).

Node id conventions match tree/build.py: root 1, children 2i/2i+1, leaves
[nleaf, 2*nleaf). Source node id == row in the unified Blocks array, which
is what lets one pair kernel serve every interaction type. Invalid slots
are id 0, whose block row is all-zero strength (inert).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from onbody_tpu.tree.build import Tree

INVALID = jnp.int32(0)


class PairGroups(NamedTuple):
    """Grouped interaction lists: each entry is one target row with G
    source rows (padded with inert row 0). The Pallas executor computes
    all G source blocks in one grid step (a (B, G*B) tile), amortizing
    per-step overheads ~Gx over single-pair execution."""
    tgt: jax.Array      # (P,) int32
    src: jax.Array      # (P, G) int32
    n_valid: jax.Array  # () int32 — valid (tgt, src) pairs
    overflow: jax.Array


class PairList(NamedTuple):
    """Padded (tgt_row, src_row) interactions, sorted by tgt_row.

    Invalid padding entries are (tgt_row, 0) or (0, 0); both are inert in
    the executor. overflow > 0 means a fixed width was exceeded and the
    result is incomplete — rebuild with larger widths.
    """
    tgt: jax.Array      # (P,) int32
    src: jax.Array      # (P,) int32
    n_valid: jax.Array  # () int32
    overflow: jax.Array  # () int32


def _compact_rows(vals: jax.Array, width: int,
                  mode: str = "scatter") -> Tuple[jax.Array, jax.Array]:
    """Move valid (!=0) entries of each row to the front; truncate/pad to
    `width` columns. Returns (compacted, overflow_count).

    mode='scatter': row-local cumsum + one flat scatter (round-1
    measurement: beat per-row argsort + take_along_axis gathers).
    mode='sort': a stable lane-dim variadic sort with a zeros-last key —
    identical rows (verified), different mover; scripts/exp_listcost.py
    measures which wins at 1e7 frontier shapes.
    mode='idsort': zeros-last + ASCENDING source ids (same pair set;
    per-row order differs). Sibling nodes (2c, 2c+1) end up in adjacent
    slots — the layout a sibling-bundled fetch kernel needs — and
    ascending ids give the pregather row-gather monotone indices."""
    L, K = vals.shape
    valid = vals != 0
    counts = jnp.sum(valid, axis=1, dtype=jnp.int32)
    overflow = jnp.sum(jnp.maximum(counts - width, 0), dtype=jnp.int32)
    if mode in ("sort", "idsort"):
        if mode == "idsort":
            big = jnp.int32(2 ** 30)
            out = jax.lax.sort(
                (jnp.where(valid, vals, big),) + (vals,),
                dimension=1, num_keys=1, is_stable=False)[1]
        else:
            key = (~valid).astype(jnp.int32)
            out = jax.lax.sort((key, vals), dimension=1, num_keys=1,
                               is_stable=True)[1]
        if width > K:
            out = jnp.pad(out, ((0, 0), (0, width - K)))
        return out[:, :width], overflow
    pos = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    keep = valid & (pos < width)
    dump = L * width
    flat = jnp.where(
        keep,
        jnp.arange(L, dtype=jnp.int32)[:, None] * width + pos,
        dump)
    out = jnp.zeros((L * width + 1,), vals.dtype)
    out = out.at[flat.reshape(-1)].set(
        jnp.where(keep, vals, 0).reshape(-1), mode="drop")
    return out[:L * width].reshape(L, width), overflow


def _append_rows(out, out_cnt, vals):
    """Append each row's valid entries of `vals` to `out` at out_cnt.

    out: (L, K+1) with a dump column at K; out_cnt: (L,).
    """
    K = out.shape[1] - 1
    valid = vals != 0
    pos_in_row = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    pos = out_cnt[:, None] + pos_in_row
    pos = jnp.where(valid & (pos < K), pos, K)
    out = _put_along_axis(out, pos, jnp.where(valid, vals, 0))
    new_cnt = out_cnt + jnp.sum(valid, axis=1, dtype=jnp.int32)
    overflow = jnp.sum(jnp.maximum(new_cnt - K, 0), dtype=jnp.int32)
    return out, jnp.minimum(new_cnt, K), overflow


def _ext_src(out, nleaf_s: int, parts: int):
    """Append extension-row ids for accepted interior sources.

    With split proxy rows (equivalents.n_eq_parts > 1: the grid M
    exceeds the block width, e.g. order 5 at block 128), part j >= 1 of
    interior node i lives at block row (j+1)*nleaf + i; an accepted far
    node therefore emits `parts` source-row entries. Leaf rows (real
    particles) are untouched. out: (L, W) accepted ids -> (L, parts*W).
    """
    if parts == 1:
        return out
    interior = (out > 0) & (out < nleaf_s)
    extras = [jnp.where(interior, out + (j + 1) * nleaf_s, 0)
              for j in range(1, parts)]
    return jnp.concatenate([out] + extras, axis=1)


def _put_along_axis(out, pos, vals):
    """Row-wise scatter: out[i, pos[i, j]] = vals[i, j] (vals==0 are inert
    because they land in the dump column or write 0 over 0). One flat 1D
    scatter — 2D scatters are much slower on TPU."""
    L, K1 = out.shape
    flat = (jnp.arange(L, dtype=jnp.int32)[:, None] * K1
            + pos).reshape(-1)
    return out.reshape(-1).at[flat].set(vals.reshape(-1),
                                        mode="drop").reshape(L, K1)


# ------------------------------------------------------------------- MACs
#
# Node geometry is gathered per component as flat 1-D gathers whose
# outputs are dense (nt, W) arrays (lane dim = W). Packing components
# into a trailing dim looks cheaper but XLA tiles every array to
# T(8,128): a (nt*W, 10) gather output lane-pads 10 -> 128, an 8 GB
# blowup at N=1e7. Targets are contiguous level slices: sliced, never
# gathered.

def _g(a, cand):
    """Dense per-component gather: a (NN,), cand (nt, W) -> (nt, W)."""
    return a[cand.reshape(-1)].reshape(cand.shape)


def _gv(a, cand, pd):
    """Per-axis gathers of a (NN, pd) array -> tuple of (nt, W)."""
    return tuple(_g(a[:, d], cand) for d in range(pd))


def _dist2_comp(av, bv):
    d2 = None
    for a, b in zip(av, bv):
        diff = a - b
        d2 = diff * diff if d2 is None else d2 + diff * diff
    return d2


def mac_boxwise(stree, cand, pd, tnc, tns, tnr, theta):
    """treecode3 MAC (barneshut.hpp:250-283): geometric-center distance vs
    2*(max(snr,tnr)+0.25*min(snr,tnr))."""
    snc = _gv(stree.nc, cand, pd)
    snr = _g(stree.nr, cand)
    d2 = _dist2_comp(snc, tuple(tnc[:, :, d] for d in range(pd)))
    dist = jnp.sqrt(d2)
    testrad = jnp.maximum(snr, tnr) + 0.25 * jnp.minimum(snr, tnr)
    return dist / (2.0 * testrad) > theta


def mac_pointwise_conservative(stree, cand, pd, tnc, tns, tnr, theta):
    """Leaf-conservative version of the treecode2 pointwise MAC
    (barneshut.hpp:160-175: |nc_s - x_t| / (2 snr) > theta). Using the
    minimum possible distance from any point in the target leaf box
    (center distance minus target node radius) guarantees acceptance is
    valid for every point in the block — accuracy is >= the reference's
    per-point criterion at slightly more work."""
    snc = _gv(stree.nc, cand, pd)
    snr = _g(stree.nr, cand)
    d2 = _dist2_comp(snc, tuple(tnc[:, :, d] for d in range(pd)))
    dist = jnp.maximum(jnp.sqrt(d2) - tnr, 0.0)
    return dist / (2.0 * snr) > theta


def mac_treecode1_conservative(stree, cand, pd, tnc, tns, tnr, theta):
    """Leaf-conservative version of the treecode1 surface-distance MAC
    (barneshut.hpp:85-93): per-axis distance from the source box surface
    (box centered on the CM) to the nearest possible target point."""
    snr = _g(stree.nr, cand)
    d2 = None
    for d in range(pd):
        scm = _g(stree.x[:, d], cand)
        sns = _g(stree.ns[:, d], cand)
        dd = jnp.maximum(jnp.abs(scm - tnc[:, :, d]) - 0.5 * sns
                         - 0.5 * tns[:, :, d], 0.0)
        d2 = dd * dd if d2 is None else d2 + dd * dd
    dist = jnp.sqrt(d2)
    return dist / (2.0 * snr) > theta


_MACS = {
    "boxwise": mac_boxwise,
    "pointwise": mac_pointwise_conservative,
    "treecode1": mac_treecode1_conservative,
}


# ------------------------------------------------- single-tree traversal

@partial(jax.jit, static_argnames=("mac", "levels_s", "frontier_width",
                                   "list_width", "leaves_only"))
def _treecode_lists(stree: Tree, ttree: Tree, theta, mac: str,
                    levels_s: int, frontier_width: int, list_width: int,
                    leaves_only: bool = True):
    """Per-target-leaf accepted interaction rows.

    Returns (out (L, K+1), counts (L,), overflow). Accepted rows are far
    nodes (MAC pass: proxies/monopoles) and near source-leaf rows (direct);
    both live in the same list because the unified Blocks array makes them
    the same kind of source.
    """
    nleaf_s = 1 << levels_s
    nleaf_t = ttree.nleaf
    L = nleaf_t
    pd = stree.nc.shape[1]

    W = frontier_width
    K = list_width
    mac_fn = _MACS[mac]
    # target leaves are the contiguous tail slice: no gathers
    tnc = ttree.nc[nleaf_t:][:, None, :]
    tns = ttree.ns[nleaf_t:][:, None, :]
    tnr = ttree.nr[nleaf_t:][:, None]

    # dead target leaves (pure padding, outputs discarded) start empty
    leaf_alive = ttree.alive[nleaf_t:]
    cand = jnp.zeros((L, W), jnp.int32).at[:, 0].set(
        jnp.where(leaf_alive, 1, 0))
    out = jnp.zeros((L, K + 1), jnp.int32)
    out_cnt = jnp.zeros((L,), jnp.int32)
    overflow = jnp.int32(0)

    for _ in range(levels_s + 1):
        valid = cand != 0
        passes = mac_fn(stree, cand, pd, tnc, tns, tnr, theta)
        is_leaf = cand >= nleaf_s
        accept = valid & (passes | is_leaf)
        expand = valid & ~passes & ~is_leaf

        out, out_cnt, ov1 = _append_rows(out, out_cnt,
                                         jnp.where(accept, cand, 0))
        kids = jnp.concatenate(
            [jnp.where(expand, 2 * cand, 0),
             jnp.where(expand, 2 * cand + 1, 0)], axis=1)
        cand, ov2 = _compact_rows(kids, W)
        overflow = overflow + ov1 + ov2
    # anything still in cand after the last level is a bug (leaves always
    # terminate); count it as overflow
    overflow = overflow + jnp.sum(cand != 0, dtype=jnp.int32)
    return out[:, :K], out_cnt, overflow


def build_treecode_pairs(stree: Tree, ttree: Tree, theta, mac: str,
                         frontier_width: int = 256,
                         list_width: int = 1024,
                         src_parts: int = 1) -> PairList:
    """Build the (tgt_leaf_row, src_row) pair list for a treecode sweep."""
    out, cnt, ov = _treecode_lists(stree, ttree, jnp.float32(theta), mac,
                                   stree.levels, frontier_width, list_width)
    nleaf_s = stree.nleaf
    n_valid = jnp.sum(cnt, dtype=jnp.int32)
    if src_parts > 1:
        # split proxy rows: accepted interior nodes span extra block rows
        out, ov2 = _compact_rows(_ext_src(out, nleaf_s, src_parts),
                                 out.shape[1])
        ov = ov + ov2
        n_valid = jnp.sum(out != 0, dtype=jnp.int32)
    L, K = out.shape
    nleaf_t = ttree.nleaf
    tgt_rows = jnp.broadcast_to(
        jnp.arange(nleaf_t, 2 * nleaf_t, dtype=jnp.int32)[:, None],
        (L, K)).reshape(-1)
    src_rows = out.reshape(-1)
    return PairList(tgt=tgt_rows, src=src_rows,
                    n_valid=n_valid, overflow=ov)


# --------------------------------------------------- dual-tree traversal

@partial(jax.jit, static_argnames=("levels_s", "levels_t", "frontier_width",
                                   "list_width", "src_parts", "tgt_parts"))
def _dtt_lists(stree: Tree, ttree: Tree, theta,
               levels_s: int, levels_t: int,
               frontier_width: int, list_width: int,
               src_parts: int = 1, tgt_parts: int = 1):
    """Dual-tree traversal (ongrav3d.cpp:307-402) as a level-synchronous
    sweep over target levels with an inner source-refinement loop.

    Returns per-target-node accepted source rows for every target level,
    flattened into one padded (tgt_row, src_row) list.
    """
    nleaf_s = 1 << levels_s
    W = frontier_width
    K = list_width
    pd = stree.nc.shape[1]
    theta = jnp.asarray(theta, stree.nc.dtype)

    all_tgt = []
    all_src = []
    total_valid = jnp.int32(0)
    overflow = jnp.int32(0)

    cand = jnp.zeros((1, W), jnp.int32).at[0, 0].set(1)  # root's work list

    for l in range(levels_t + 1):
        nt = 1 << l
        tgt_ids = jnp.arange(nt, 2 * nt, dtype=jnp.int32)
        t_is_leaf = (l == levels_t)
        # target nodes at this level are a contiguous slice: no gathers
        tnr = ttree.nr[nt:2 * nt]                    # (nt,)
        tcm = ttree.x[nt:2 * nt]
        # dead (pure-padding) target subtrees produce nothing
        cand = jnp.where(ttree.alive[nt:2 * nt][:, None], cand, 0)

        out = jnp.zeros((nt, K + 1), jnp.int32)
        out_cnt = jnp.zeros((nt,), jnp.int32)

        def classify(cand):
            valid = cand != 0
            s_is_leaf = cand >= nleaf_s
            snr = _g(stree.nr, cand)
            d2 = _dist2_comp(_gv(stree.x, cand, pd),
                             tuple(tcm[:, None, d] for d in range(pd)))
            dist = jnp.sqrt(d2)
            sep = dist / (snr + tnr[:, None]) > theta
            both_leaf = s_is_leaf & t_is_leaf
            accept = valid & (both_leaf | sep)
            tgt_bigger = tnr[:, None] > snr
            if t_is_leaf:
                # target cannot refine: expand non-separated interior srcs
                expand = valid & ~accept & ~s_is_leaf
                defer = jnp.zeros_like(valid)
            else:
                expand = valid & ~accept & ~s_is_leaf & ~tgt_bigger
                defer = valid & ~accept & (s_is_leaf | tgt_bigger)
            return accept, expand, defer

        # inner refinement: expand sources until none left to expand.
        # classification is carried in the loop state so each iteration
        # classifies exactly once (cond only reads a flag).
        defer_out = jnp.zeros((nt, W + 1), jnp.int32)
        defer_cnt = jnp.zeros((nt,), jnp.int32)
        masks = classify(cand)

        def cond(state):
            expand = state[1][1]
            return jnp.any(expand) & (state[-1] < levels_s + 2)

        def body(state):
            cand, (accept, expand, defer), out, out_cnt, defer_out, \
                defer_cnt, ov, it = state
            out, out_cnt, ov1 = _append_rows(
                out, out_cnt,
                _ext_src(jnp.where(accept, cand, 0), nleaf_s, src_parts))
            defer_out, defer_cnt, ov2 = _append_rows(
                defer_out, defer_cnt, jnp.where(defer, cand, 0))
            kids = jnp.concatenate(
                [jnp.where(expand, 2 * cand, 0),
                 jnp.where(expand, 2 * cand + 1, 0)], axis=1)
            cand, ov3 = _compact_rows(kids, W)
            masks = classify(cand)
            return (cand, masks, out, out_cnt, defer_out, defer_cnt,
                    ov + ov1 + ov2 + ov3, it + 1)

        state = (cand, masks, out, out_cnt, defer_out, defer_cnt,
                 overflow, jnp.int32(0))
        state = jax.lax.while_loop(cond, body, state)
        (cand, (accept, expand, defer), out, out_cnt, defer_out,
         defer_cnt, overflow, _) = state
        # flush the final round (no expands left: accepts + defers remain)
        out, out_cnt, ov1 = _append_rows(
            out, out_cnt,
            _ext_src(jnp.where(accept, cand, 0), nleaf_s, src_parts))
        defer_out, defer_cnt, ov2 = _append_rows(
            defer_out, defer_cnt, jnp.where(defer, cand, 0))
        overflow = overflow + ov1 + ov2

        all_tgt.append(jnp.broadcast_to(tgt_ids[:, None], (nt, K)).reshape(-1))
        all_src.append(out[:, :K].reshape(-1))
        total_valid = total_valid + jnp.sum(out_cnt, dtype=jnp.int32)
        if tgt_parts > 1 and not t_is_leaf:
            nleaf_t = 1 << levels_t
            for j in range(1, tgt_parts):
                all_tgt.append(jnp.broadcast_to(
                    (tgt_ids + (j + 1) * nleaf_t)[:, None],
                    (nt, K)).reshape(-1))
                all_src.append(out[:, :K].reshape(-1))
                total_valid = total_valid + jnp.sum(out_cnt,
                                                    dtype=jnp.int32)

        if l < levels_t:
            # children inherit the deferred list (ongrav3d.cpp:418-422)
            cand = jnp.repeat(defer_out[:, :W], 2, axis=0)

    tgt = jnp.concatenate(all_tgt)
    src = jnp.concatenate(all_src)
    return tgt, src, total_valid, overflow


def build_dtt_pairs(stree: Tree, ttree: Tree, theta,
                    frontier_width: int = 256,
                    list_width: int = 256, src_parts: int = 1,
                    tgt_parts: int = 1) -> PairList:
    tgt, src, nv, ov = _dtt_lists(stree, ttree, theta, stree.levels,
                                  ttree.levels, frontier_width, list_width,
                                  src_parts, tgt_parts)
    return PairList(tgt=tgt, src=src, n_valid=nv, overflow=ov)


def _quant_pack_u16(vals):
    """Pack four grid-unit f32 arrays into one complex64 of 4x uint16.

    The MAC classifier's per-candidate cost is dominated by random
    gathers of source-node geometry (docs/PERF.md: gathers are the
    enemy). Quantizing (cm_x, cm_y, cm_z, nr) onto a shared 16-bit grid
    packs a node's whole MAC geometry into 8 bytes -> ONE c64 gather per
    candidate instead of two (half the bytes, half the gather elements).
    Grid resolution is (domain+pad extent)/65535 ~ 1e-4 of the domain, a
    <0.2% perturbation of leaf-level MAC distances — two orders below
    the theta=1.40-vs-1.35 accuracy margin.
    """
    u = [jnp.clip(jnp.round(v), 0.0, 65535.0).astype(jnp.uint16)
         for v in vals]
    st = jnp.stack(u, axis=-1)                         # (NN, 4) u16
    f2 = jax.lax.bitcast_convert_type(
        st.reshape(-1, 2, 2), jnp.float32)             # (NN, 2) f32
    return jax.lax.complex(f2[:, 0], f2[:, 1])


def _quant_unpack_u16(g):
    """(..., ) c64 -> four (...,) f32 grid-unit components."""
    f2 = jnp.stack([g.real, g.imag], axis=-1)          # (..., 2)
    u = jax.lax.bitcast_convert_type(f2, jnp.uint16)   # (..., 2, 2)
    f = u.astype(jnp.float32)
    return f[..., 0, 0], f[..., 0, 1], f[..., 1, 0], f[..., 1, 1]


def _quant_grid(stree: Tree, ttree: Tree, pd: int):
    """Shared quantization grid covering both trees' CMs (including the
    out-of-domain padding cluster — clipping pad nodes into the real
    domain would make them look near, never separate, and overflow the
    frontier) and the node-radius range. Returns (lo (pd,), scale ())."""
    lo = jnp.minimum(jnp.min(stree.x, axis=0), jnp.min(ttree.x, axis=0))
    hi = jnp.maximum(jnp.max(stree.x, axis=0), jnp.max(ttree.x, axis=0))
    ext = jnp.max(hi - lo)
    nr_max = jnp.maximum(jnp.max(stree.nr), jnp.max(ttree.nr))
    scale = jnp.maximum(ext, nr_max) / 65534.0
    scale = jnp.maximum(scale, 1e-30)
    return lo, scale


def top_prefix_len(split: int, levels_t: int, W: int) -> int:
    """Flat pair-list length of target levels 0..split-1 (the replicated
    'top' prefix of the sharded/chunked decompositions)."""
    return sum((1 << l) * W
               for l in range(split))


@partial(jax.jit, static_argnames=("levels_s", "levels_t", "frontier_width",
                                   "mac_geometry", "src_parts",
                                   "tgt_parts", "compact", "n_live",
                                   "leaf_pair2"))
def _dtt_lists_level(stree: Tree, ttree: Tree, theta,
                     levels_s: int, levels_t: int, frontier_width: int,
                     mac_geometry: str = "quant", src_parts: int = 1,
                     tgt_parts: int = 1, compact: str = "scatter",
                     n_live: int = 0, leaf_pair2: bool = False):
    """Simultaneous-descent dual-tree traversal: ONE MAC classification
    per target level.

    Where _dtt_lists mirrors the reference's refine-the-larger-box walk
    (ongrav3d.cpp:374-397) with an inner source-refinement loop, this
    variant descends both trees in lockstep: a target node's candidates
    are exactly the children of its parent's non-separated list, so every
    candidate source node sits at the target's own level (clamped to the
    source leaf level) and no inner loop is needed. The MAC criterion is
    identical — acceptance still guarantees dist/(snr+tnr) > theta — so
    the error envelope is unchanged; only the level at which a given pair
    separates can shift. Per-level output slot width equals the frontier
    width (accepted <= candidates), which shrinks every downstream
    compaction ~4x vs the list_width slots of the refine builder.

    If the source tree is deeper than the target tree, leaf-level target
    nodes may still hold interior source candidates; a (statically
    emitted) refinement loop finishes those off.

    n_live (static): the number of REAL target particles. Padding clones
    sort past every real particle on every axis (parts.pad_to puts them
    beyond the max corner — the same invariant build._split_step's
    prefix sorts rely on), so reals occupy slot prefix [0, n_live) and
    node k at level l is alive iff k < ceil(n_live / m_l). Each level is
    then statically sliced to its live-row prefix — at N=1e7/bs256 the
    padded tree is 1.68x the real size, so 40% of every classify gather,
    MAC evaluation, and row compaction vanishes, and the emitted flat
    pair list shrinks the same way (less group-compaction volume
    downstream). The alive-row mask becomes redundant (alive == within
    the prefix). 0 disables (callers whose trees do not carry the
    invariant, e.g. sharded subtree slices).
    """
    nleaf_s = 1 << levels_s
    W = frontier_width
    pd = stree.nc.shape[1]
    theta = jnp.asarray(theta, jnp.float32)
    n_pad_t = (1 << levels_t) * ttree.block_size

    def live_rows(l: int) -> int:
        if not n_live:
            return 1 << l
        return min(1 << l, -(-n_live // (n_pad_t >> l)))

    if mac_geometry == "quant":
        # ONE c64 gather per candidate: 16-bit grid-quantized geometry
        # (see _quant_pack_u16); target side stays exact f32 (sliced,
        # never gathered)
        lo, scale = _quant_grid(stree, ttree, pd)
        inv = 1.0 / scale
        comps = [(stree.x[:, d] - lo[d]) * inv for d in range(pd)]
        comps.append(stree.nr * inv)
        while len(comps) < 4:
            comps.append(jnp.zeros_like(comps[0]))
        sq = _quant_pack_u16(comps)
    else:
        # complex64-packed f32 geometry: (x0+i*x1, x2+i*nr) — two
        # gathers per candidate
        lo = jnp.zeros((pd,), stree.x.dtype)
        inv = jnp.asarray(1.0, stree.x.dtype)
        sg1 = jax.lax.complex(stree.x[:, 0], stree.x[:, 1])
        if pd == 3:
            sg2 = jax.lax.complex(stree.x[:, 2], stree.nr)
        else:
            sg2 = stree.nr

    all_tgt = []
    all_src = []
    total_valid = jnp.int32(0)
    overflow = jnp.int32(0)

    W0 = W
    cand = jnp.zeros((1, W0), jnp.int32).at[0, 0].set(1)  # root vs root

    for l in range(levels_t + 1):
        nt = 1 << l
        rows = live_rows(l)
        Wl = W
        tgt_ids = jnp.arange(nt, nt + rows, dtype=jnp.int32)
        t_is_leaf = (l == levels_t)
        tnr = ttree.nr[nt:nt + rows]
        tcm = ttree.x[nt:nt + rows]
        if mac_geometry == "quant":
            # target geometry in grid units (f32, unrounded)
            tcm_u = (tcm - lo[None, :]) * inv
            tnr_u = tnr * inv
        if not n_live:
            # dead target subtrees (pure padding — 40% of all leaves at
            # N=1e7) produce no pairs and starve immediately: their
            # outputs are discarded, so killing the row loses nothing.
            # With n_live the static prefix slice already excludes them.
            cand = jnp.where(ttree.alive[nt:nt + rows][:, None], cand, 0)

        def classify(cand):
            valid = cand != 0
            s_is_leaf = cand >= nleaf_s
            if mac_geometry == "quant":
                x0, x1, x2, snr = _quant_unpack_u16(_g(sq, cand))
                dx = x0 - tcm_u[:, None, 0]
                dy = x1 - tcm_u[:, None, 1]
                if pd == 3:
                    dz = x2 - tcm_u[:, None, 2]
                    d2 = dx * dx + dy * dy + dz * dz
                else:
                    snr = x2
                    d2 = dx * dx + dy * dy
                sep = d2 > (theta * (snr + tnr_u[:, None])) ** 2
            else:
                g1 = _g(sg1, cand)
                g2 = _g(sg2, cand)
                dx = g1.real - tcm[:, None, 0]
                dy = g1.imag - tcm[:, None, 1]
                if pd == 3:
                    dz = g2.real - tcm[:, None, 2]
                    snr = g2.imag
                    d2 = dx * dx + dy * dy + dz * dz
                else:
                    snr = g2
                    d2 = dx * dx + dy * dy
                sep = d2 > (theta * (snr + tnr[:, None])) ** 2
            accept = valid & ((s_is_leaf & t_is_leaf) | sep)
            if t_is_leaf:
                expand = valid & ~accept & ~s_is_leaf
                defer = jnp.zeros_like(valid)
            else:
                expand = jnp.zeros_like(valid)
                defer = valid & ~accept
            return accept, expand, defer

        if t_is_leaf and levels_s <= levels_t:
            # every candidate here is a source LEAF (ids descend one
            # source level per target level), and leaf-leaf pairs always
            # accept — a leaf's fm row holds its real particles, so the
            # far/near distinction is vacuous at this level. Skip the
            # classify (the single biggest gather+MAC round: nt*W
            # candidates) AND the output compaction (cand rows are
            # already front-packed by the previous level's compaction).
            out = cand
            overflow = overflow + jnp.int32(0)
            total_valid = total_valid + jnp.sum(out != 0,
                                                dtype=jnp.int32)
            all_tgt.append(jnp.broadcast_to(
                tgt_ids[:, None], (rows, out.shape[1])).reshape(-1))
            all_src.append(out.reshape(-1))
            continue
        accept, expand, defer = classify(cand)
        out = jnp.where(accept, cand, 0)
        if t_is_leaf and levels_s > levels_t:
            # deep source tree: refine remaining interior sources in place
            out_ext = jnp.zeros((rows, W + 1), jnp.int32)
            out_cnt = jnp.zeros((rows,), jnp.int32)
            out_ext, out_cnt, ov0 = _append_rows(
                out_ext, out_cnt, _ext_src(out, nleaf_s, src_parts))
            overflow = overflow + ov0
            for _ in range(levels_s - levels_t):
                kids = jnp.concatenate(
                    [jnp.where(expand, 2 * cand, 0),
                     jnp.where(expand, 2 * cand + 1, 0)], axis=1)
                cand, ovc = _compact_rows(kids, W, compact)
                overflow = overflow + ovc
                accept, expand, defer = classify(cand)
                out_ext, out_cnt, ovc = _append_rows(
                    out_ext, out_cnt,
                    _ext_src(jnp.where(accept, cand, 0), nleaf_s,
                             src_parts))
                overflow = overflow + ovc
            overflow = overflow + jnp.sum(expand, dtype=jnp.int32)
            out = out_ext[:, :W]
            total_valid = total_valid + jnp.sum(out_cnt, dtype=jnp.int32)
        else:
            out, ovc = _compact_rows(_ext_src(out, nleaf_s, src_parts), Wl,
                                     compact)
            overflow = overflow + ovc + jnp.sum(expand, dtype=jnp.int32)
            total_valid = total_valid + jnp.sum(out != 0, dtype=jnp.int32)

        all_tgt.append(jnp.broadcast_to(tgt_ids[:, None],
                                        (rows, out.shape[1])).reshape(-1))
        all_src.append(out.reshape(-1))
        if tgt_parts > 1 and not t_is_leaf:
            # split equivalent-target rows: interior target node i's
            # slots [j*B, (j+1)*B) live at extension row (j+1)*nleaf+i
            # and must receive the SAME accepted source list
            nleaf_t = 1 << levels_t
            for j in range(1, tgt_parts):
                all_tgt.append(jnp.broadcast_to(
                    (tgt_ids + (j + 1) * nleaf_t)[:, None],
                    (rows, out.shape[1])).reshape(-1))
                all_src.append(out.reshape(-1))
                total_valid = total_valid + jnp.sum(out != 0,
                                                    dtype=jnp.int32)

        if l < levels_t:
            # children of the deferred list, clamped at source leaves:
            # a non-separated source leaf rides along unrefined until the
            # target reaches its own leaf level (sltl direct there)
            s_leaf = cand >= nleaf_s
            keep_leaf = defer & s_leaf
            split = defer & ~s_leaf
            # keep_leaf and split are disjoint, so riding leaves share the
            # first child slot: a 2W compaction input instead of 3W
            kids = jnp.concatenate(
                [jnp.where(split, 2 * cand, jnp.where(keep_leaf, cand, 0)),
                 jnp.where(split, 2 * cand + 1, 0)], axis=1)
            nxt, ovc = _compact_rows(kids, W,
                                     compact)
            overflow = overflow + ovc
            if leaf_pair2 and l == levels_t - 1:
                # sibling-paired leaf emission: the leaf level's candidate
                # rows would be exactly jnp.repeat(nxt, 2) with
                # accept == valid (the classify there is vacuous — see
                # the leaf-skip branch above), so emit ONE entry per
                # parent node q instead; the executor evaluates it
                # against BOTH children leaf rows (2q, 2q+1) from one
                # source fetch (ops/pallas_pairs.exec_pairs_pallas_t2).
                # n_valid counts both siblings WHEN both are alive. At
                # a live boundary with an odd leaf count the dead right
                # sibling is evaluated too (its output row is discarded
                # downstream) but is not counted, so n_valid matches
                # the unpaired builder exactly on ragged N (ADVICE r2).
                # Reals sort first, so a dead child is always the right
                # one of an alive parent.
                ch_alive = ttree.alive[2 * nt:2 * nt + 2 * rows
                                       ].reshape(rows, 2)
                n_ch = jnp.sum(ch_alive, axis=1).astype(jnp.int32)
                p2_tgt = jnp.broadcast_to(tgt_ids[:, None],
                                          nxt.shape).reshape(-1)
                p2_src = nxt.reshape(-1)
                total_valid = total_valid + jnp.sum(
                    (nxt != 0) * n_ch[:, None], dtype=jnp.int32)
                break
            # children of the live rows, sliced to the next level's live
            # prefix (the boundary node's dead child, if any, is exactly
            # the row the slice drops)
            cand = jnp.repeat(nxt, 2, axis=0)[:live_rows(l + 1)]

    tgt = jnp.concatenate(all_tgt)
    src = jnp.concatenate(all_src)
    if leaf_pair2:
        return tgt, src, p2_tgt, p2_src, total_valid, overflow
    return tgt, src, total_valid, overflow


def _mk_classifier(stree: Tree, ttree: Tree, theta, pd: int,
                   nleaf_s: int, mac_geometry: str):
    """Shared MAC classifier over dense candidate rows, parameterized by
    the per-level target slice. Returns (classify, prep_level) where
    prep_level(tcm, tnr) precomputes the level's target-side geometry."""
    theta = jnp.asarray(theta, jnp.float32)
    if mac_geometry == "quant":
        lo, scale = _quant_grid(stree, ttree, pd)
        inv = 1.0 / scale
        comps = [(stree.x[:, d] - lo[d]) * inv for d in range(pd)]
        comps.append(stree.nr * inv)
        while len(comps) < 4:
            comps.append(jnp.zeros_like(comps[0]))
        sq = _quant_pack_u16(comps)

        def prep(tcm, tnr):
            return (tcm - lo[None, :]) * inv, tnr * inv

        def classify(cand, tgeo, t_is_leaf):
            tcm_u, tnr_u = tgeo
            valid = cand != 0
            s_is_leaf = cand >= nleaf_s
            x0, x1, x2, snr = _quant_unpack_u16(_g(sq, cand))
            dx = x0 - tcm_u[:, None, 0]
            dy = x1 - tcm_u[:, None, 1]
            if pd == 3:
                dz = x2 - tcm_u[:, None, 2]
                d2 = dx * dx + dy * dy + dz * dz
            else:
                snr = x2
                d2 = dx * dx + dy * dy
            sep = d2 > (theta * (snr + tnr_u[:, None])) ** 2
            accept = valid & ((s_is_leaf & t_is_leaf) | sep)
            if t_is_leaf:
                expand = valid & ~accept & ~s_is_leaf
                defer = jnp.zeros_like(valid)
            else:
                expand = jnp.zeros_like(valid)
                defer = valid & ~accept
            return accept, expand, defer
        return classify, prep

    sg1 = jax.lax.complex(stree.x[:, 0], stree.x[:, 1])
    sg2 = (jax.lax.complex(stree.x[:, 2], stree.nr) if pd == 3
           else stree.nr)

    def prep(tcm, tnr):
        return tcm, tnr

    def classify(cand, tgeo, t_is_leaf):
        tcm, tnr = tgeo
        valid = cand != 0
        s_is_leaf = cand >= nleaf_s
        g1 = _g(sg1, cand)
        g2 = _g(sg2, cand)
        dx = g1.real - tcm[:, None, 0]
        dy = g1.imag - tcm[:, None, 1]
        if pd == 3:
            dz = g2.real - tcm[:, None, 2]
            snr = g2.imag
            d2 = dx * dx + dy * dy + dz * dz
        else:
            snr = g2
            d2 = dx * dx + dy * dy
        sep = d2 > (theta * (snr + tnr[:, None])) ** 2
        accept = valid & ((s_is_leaf & t_is_leaf) | sep)
        if t_is_leaf:
            expand = valid & ~accept & ~s_is_leaf
            defer = jnp.zeros_like(valid)
        else:
            expand = jnp.zeros_like(valid)
            defer = valid & ~accept
        return accept, expand, defer
    return classify, prep


@partial(jax.jit, static_argnames=("levels_s", "split", "frontier_width",
                                   "mac_geometry"))
def _dtt_lists_top(stree: Tree, ttree: Tree, theta, levels_s: int,
                   split: int, frontier_width: int,
                   mac_geometry: str = "quant"):
    """Simultaneous descent of target levels 0..split-1 only.

    The shared prefix of the subtree-chunked solve (traverse/chunked.py):
    returns the accepted pairs of the top levels plus the deferred
    candidate rows for every level-`split` subtree root (2^split, W) —
    each chunk continues its own descent from its row. Requires
    split < levels_t (roots must not be leaves).
    """
    W = frontier_width
    levels_t = ttree.levels
    pd = stree.nc.shape[1]
    nleaf_s = 1 << levels_s
    classify, prep = _mk_classifier(stree, ttree, theta, pd, nleaf_s,
                                    mac_geometry)
    all_tgt, all_src = [], []
    overflow = jnp.int32(0)
    cand = jnp.zeros((1, W),
                     jnp.int32).at[0, 0].set(1)
    for l in range(split):
        nt = 1 << l
        Wl = W
        tgeo = prep(ttree.x[nt:2 * nt], ttree.nr[nt:2 * nt])
        cand = jnp.where(ttree.alive[nt:2 * nt][:, None], cand, 0)
        accept, expand, defer = classify(cand, tgeo, False)
        out, ovc = _compact_rows(jnp.where(accept, cand, 0), Wl)
        overflow = overflow + ovc + jnp.sum(expand, dtype=jnp.int32)
        all_tgt.append(jnp.broadcast_to(
            jnp.arange(nt, 2 * nt, dtype=jnp.int32)[:, None],
            (nt, Wl)).reshape(-1))
        all_src.append(out.reshape(-1))
        s_leaf = cand >= nleaf_s
        keep_leaf = defer & s_leaf
        split_m = defer & ~s_leaf
        kids = jnp.concatenate(
            [jnp.where(split_m, 2 * cand,
                       jnp.where(keep_leaf, cand, 0)),
             jnp.where(split_m, 2 * cand + 1, 0)], axis=1)
        nxt, ovc = _compact_rows(kids, W)
        overflow = overflow + ovc
        cand = jnp.repeat(nxt, 2, axis=0)
    return (jnp.concatenate(all_tgt), jnp.concatenate(all_src),
            cand, overflow)


@partial(jax.jit, static_argnames=("levels_s", "levels_t", "split",
                                   "frontier_width", "mac_geometry",
                                   "leaf_pair2"))
def _dtt_lists_sub(stree: Tree, ttree: Tree, theta, cand0, root,
                   levels_s: int, levels_t: int, split: int,
                   frontier_width: int, mac_geometry: str = "quant",
                   leaf_pair2: bool = False):
    """Continue the descent for ONE target subtree rooted at traced node
    id `root` (level `split`), from its deferred row cand0 (1, W).

    Emits GLOBAL (tgt, src) pairs for levels split..levels_t of the
    subtree. One compilation serves every chunk (root is traced; target
    slices are dynamic_slice_in_dim).

    leaf_pair2: sibling-paired leaf emission, the chunked counterpart of
    build_dtt_pairs_level2 — instead of the (vacuous-classify) leaf
    level, return one parent-keyed list (p2_tgt global PARENT ids,
    p2_src) whose every entry stands for both children leaf pairs.
    Requires levels_s <= levels_t and split <= levels_t - 1. Returns
    (tgt, src, p2_tgt, p2_src, n_valid, overflow); n_valid counts each
    leaf entry once per ALIVE sibling, matching _dtt_lists_level."""
    assert not leaf_pair2 or (levels_s <= levels_t
                              and split <= levels_t - 1)
    W = frontier_width
    pd = stree.nc.shape[1]
    nleaf_s = 1 << levels_s
    classify, prep = _mk_classifier(stree, ttree, theta, pd, nleaf_s,
                                    mac_geometry)
    all_tgt, all_src = [], []
    total_valid = jnp.int32(0)
    overflow = jnp.int32(0)
    cand = cand0
    for l in range(split, levels_t + 1):
        w = 1 << (l - split)
        Wl = W
        id0 = root << (l - split)
        tgt_ids = id0 + jnp.arange(w, dtype=jnp.int32)
        t_is_leaf = (l == levels_t)
        tcm = jax.lax.dynamic_slice_in_dim(ttree.x, id0, w)
        tnr = jax.lax.dynamic_slice_in_dim(ttree.nr, id0, w)
        alive = jax.lax.dynamic_slice_in_dim(ttree.alive, id0, w)
        tgeo = prep(tcm, tnr)
        cand = jnp.where(alive[:, None], cand, 0)
        if t_is_leaf and levels_s <= levels_t:
            # vacuous leaf classify — see _dtt_lists_level
            out = cand
            total_valid = total_valid + jnp.sum(out != 0,
                                                dtype=jnp.int32)
            all_tgt.append(jnp.where(out != 0, tgt_ids[:, None], 0
                                     ).reshape(-1))
            all_src.append(out.reshape(-1))
            continue
        accept, expand, defer = classify(cand, tgeo, t_is_leaf)
        out = jnp.where(accept, cand, 0)
        if t_is_leaf and levels_s > levels_t:
            out_ext = jnp.zeros((w, W + 1), jnp.int32)
            out_cnt = jnp.zeros((w,), jnp.int32)
            out_ext, out_cnt, ov0 = _append_rows(out_ext, out_cnt, out)
            overflow = overflow + ov0
            for _ in range(levels_s - levels_t):
                kids = jnp.concatenate(
                    [jnp.where(expand, 2 * cand, 0),
                     jnp.where(expand, 2 * cand + 1, 0)], axis=1)
                cand, ovc = _compact_rows(kids, W)
                overflow = overflow + ovc
                accept, expand, defer = classify(cand, tgeo, t_is_leaf)
                out_ext, out_cnt, ovc = _append_rows(
                    out_ext, out_cnt, jnp.where(accept, cand, 0))
                overflow = overflow + ovc
            overflow = overflow + jnp.sum(expand, dtype=jnp.int32)
            out = out_ext[:, :W]
            total_valid = total_valid + jnp.sum(out_cnt, dtype=jnp.int32)
        else:
            out, ovc = _compact_rows(out, Wl)
            overflow = overflow + ovc + jnp.sum(expand, dtype=jnp.int32)
            total_valid = total_valid + jnp.sum(out != 0,
                                               dtype=jnp.int32)
        all_tgt.append(jnp.where(out != 0, tgt_ids[:, None], 0
                                 ).reshape(-1))
        all_src.append(out.reshape(-1))
        if l < levels_t:
            s_leaf = cand >= nleaf_s
            keep_leaf = defer & s_leaf
            split_m = defer & ~s_leaf
            kids = jnp.concatenate(
                [jnp.where(split_m, 2 * cand,
                           jnp.where(keep_leaf, cand, 0)),
                 jnp.where(split_m, 2 * cand + 1, 0)], axis=1)
            nxt, ovc = _compact_rows(kids, W)
            overflow = overflow + ovc
            if leaf_pair2 and l == levels_t - 1:
                # sibling-paired leaf emission (see docstring and
                # build_dtt_pairs_level2): the leaf candidates would be
                # exactly repeat(nxt, 2) with a vacuous classify, so
                # emit one parent-keyed entry per (q, src) instead. A
                # dead right sibling is evaluated too; its output rows
                # are never read downstream — but it must NOT be
                # counted (ADVICE r2: n_valid must match the unpaired
                # builder on ragged N, where boundary parents have a
                # dead right child). Reals sort first, so a dead child
                # is always the right one: count per-parent alive
                # children instead of a flat 2.
                ch_alive = jax.lax.dynamic_slice_in_dim(
                    ttree.alive, 2 * id0, 2 * w).reshape(w, 2)
                n_ch = jnp.sum(ch_alive, axis=1).astype(jnp.int32)
                p2_tgt = jnp.where(nxt != 0, tgt_ids[:, None], 0
                                   ).reshape(-1)
                p2_src = nxt.reshape(-1)
                total_valid = total_valid + jnp.sum(
                    (nxt != 0) * n_ch[:, None], dtype=jnp.int32)
                return (jnp.concatenate(all_tgt),
                        jnp.concatenate(all_src), p2_tgt, p2_src,
                        total_valid, overflow)
            cand = jnp.repeat(nxt, 2, axis=0)
    return (jnp.concatenate(all_tgt), jnp.concatenate(all_src),
            total_valid, overflow)


def build_dtt_pairs_level(stree: Tree, ttree: Tree, theta,
                          frontier_width: int = 128,
                          mac_geometry: str = "quant",
                          src_parts: int = 1,
                          tgt_parts: int = 1,
                          compact: str = "scatter",
                          n_live: int = 0) -> PairList:
    """Simultaneous-descent DTT pair list; slot width == frontier_width.

    n_live: static real-target count enabling live-prefix level slicing
    (see _dtt_lists_level) — pass targs.n_real for trees built by
    tree.build (the pad-sorts-last invariant holds in every mode)."""
    tgt, src, nv, ov = _dtt_lists_level(stree, ttree, theta, stree.levels,
                                        ttree.levels, frontier_width,
                                        mac_geometry, src_parts, tgt_parts,
                                        compact, n_live)
    return PairList(tgt=tgt, src=src, n_valid=nv, overflow=ov)


def build_dtt_pairs_level2(stree: Tree, ttree: Tree, theta,
                           frontier_width: int = 128,
                           mac_geometry: str = "quant",
                           src_parts: int = 1,
                           tgt_parts: int = 1,
                           compact: str = "scatter",
                           n_live: int = 0) -> Tuple[PairList, PairList]:
    """Simultaneous-descent DTT lists with sibling-paired leaf emission
    (cfg.dtt_leaf_pair2).

    Returns (interior, leaf2). `interior` holds target levels
    0..levels_t-1 in the standard (tgt_row, src_row) form; `leaf2` holds
    ONE entry per (target PARENT node q, source leaf row) standing for
    the two pairs (2q, src) and (2q+1, src) — both children's accepted
    leaf lists are identical by construction. interior.n_valid carries
    the COMBINED valid-pair count (leaf entries counted twice);
    leaf2.n_valid counts leaf2 entries once (the executor group count).

    Requires equal-or-shallower source trees (the deep-source leaf
    refinement loop has no paired form) and at least one target level.
    """
    if stree.levels > ttree.levels or ttree.levels < 1:
        raise ValueError("leaf_pair2 needs levels_s <= levels_t >= 1")
    tgt, src, p2t, p2s, nv, ov = _dtt_lists_level(
        stree, ttree, theta, stree.levels, ttree.levels, frontier_width,
        mac_geometry, src_parts, tgt_parts, compact, n_live,
        leaf_pair2=True)
    interior = PairList(tgt=tgt, src=src, n_valid=nv, overflow=ov)
    leaf2 = PairList(tgt=p2t, src=p2s,
                     n_valid=jnp.sum(p2s != 0, dtype=jnp.int32),
                     overflow=jnp.int32(0))
    return interior, leaf2


# ------------------------------------------- flat simultaneous descent
#
# The dense (targets, W) frontier pays gather + compaction cost for every
# padded slot: measured occupancy is ~67 of W=256 (a ~3.8x overfetch), and
# random gathers are the dominant cost of list construction at scale.
# The flat builder keeps ONE compacted (tgt, src) candidate array per
# level — classification touches exactly the real candidates — and emits
# executor-ready G-wide groups directly (no group_pairs pass).

def _pack_c64(x, w):
    return jax.lax.complex(x, w)


def _runs(pt, valid):
    """Run machinery over a front-compacted, pt-sorted flat list.

    Returns (is_start, run_id): is_start marks each run's first valid
    entry; run_id numbers runs 0.. (valid entries only; junk elsewhere).
    Invalid holes inside a run are harmless — every rank below is
    computed by cumsums of flags that are False on holes.
    """
    prev = jnp.concatenate([jnp.zeros((1,), pt.dtype), pt[:-1]])
    is_start = valid & (pt != prev)
    run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    return is_start, run_id


def _seg_rank(flag, is_start):
    """Within-run rank among flagged entries (0-based, valid where flag)."""
    c = jnp.cumsum(flag.astype(jnp.int32))
    excl = c - flag.astype(jnp.int32)
    base = jax.lax.cummax(jnp.where(is_start, excl, 0))
    return c - 1 - base, excl, base


def _emit_groups(pt, ps, accept, is_start, group: int, cap_g: int):
    """Compacted G-wide groups from accepted entries of a flat run list.

    Groups of the same target stay consecutive (executor revisiting).
    Returns (out_t (capG,), out_s (capG, G), n_groups_overflowed).
    """
    war, _, _ = _seg_rank(accept, is_start)
    slot = war % group
    gstart = accept & (slot == 0)
    gid = jnp.cumsum(gstart.astype(jnp.int32)) - 1
    ok = accept & (gid < cap_g)
    overflow = jnp.sum(accept & (gid >= cap_g), dtype=jnp.int32)
    out_t = jnp.zeros((cap_g + 1,), jnp.int32).at[
        jnp.where(ok, gid, cap_g)].set(pt, mode="drop")[:cap_g]
    flat = jnp.where(ok, gid * group + slot, cap_g * group)
    out_s = jnp.zeros((cap_g * group + 1,), jnp.int32).at[flat].set(
        jnp.where(ok, ps, 0), mode="drop")[:cap_g * group]
    return out_t, out_s.reshape(cap_g, group), overflow


def _flat_caps(levels_t: int, row_cap: int):
    caps = []
    c = 8
    for l in range(levels_t + 1):
        nt = 1 << l
        c = min(max(4096, nt * row_cap), 4 * c)
        caps.append(c)
    return caps


@partial(jax.jit, static_argnames=("levels_s", "levels_t", "row_cap",
                                   "group"))
def _dtt_groups_flat(stree: Tree, ttree: Tree, theta,
                     levels_s: int, levels_t: int, row_cap: int,
                     group: int):
    """Flat-list simultaneous-descent DTT, emitting executor groups.

    Same MAC and same traversal as _dtt_lists_level; only the data
    structure differs (compacted flat candidate pairs instead of dense
    per-target rows).
    """
    nleaf_s = 1 << levels_s
    pd = stree.nc.shape[1]
    theta = jnp.asarray(theta, stree.nc.dtype)

    if pd == 3:
        sgeo = (_pack_c64(stree.x[:, 0], stree.x[:, 1]),
                _pack_c64(stree.x[:, 2], stree.nr))
        tgeo = (_pack_c64(ttree.x[:, 0], ttree.x[:, 1]),
                _pack_c64(ttree.x[:, 2], ttree.nr))
    else:
        sgeo = (_pack_c64(stree.x[:, 0], stree.x[:, 1]), stree.nr)
        tgeo = (_pack_c64(ttree.x[:, 0], ttree.x[:, 1]), ttree.nr)
    t_alive = ttree.alive

    caps = _flat_caps(levels_t, row_cap)
    group_ts, group_ss = [], []
    total_valid = jnp.int32(0)
    overflow = jnp.int32(0)

    pt = jnp.zeros((8,), jnp.int32).at[0].set(1)
    ps = jnp.zeros((8,), jnp.int32).at[0].set(1)

    def classify(pt, ps, t_is_leaf):
        valid = (ps != 0) & t_alive[pt]
        s_is_leaf = ps >= nleaf_s
        g1 = sgeo[0][ps]
        t1 = tgeo[0][pt]
        dx = g1.real - t1.real
        dy = g1.imag - t1.imag
        if pd == 3:
            g2 = sgeo[1][ps]
            t2 = tgeo[1][pt]
            dz = g2.real - t2.real
            snr = g2.imag
            tnr = t2.imag
            d2 = dx * dx + dy * dy + dz * dz
        else:
            snr = sgeo[1][ps]
            tnr = tgeo[1][pt]
            d2 = dx * dx + dy * dy
        sep = d2 > (theta * (snr + tnr)) ** 2
        accept = valid & ((s_is_leaf & t_is_leaf) | sep)
        rest = valid & ~accept
        return accept, rest, s_is_leaf

    for l in range(levels_t + 1):
        t_is_leaf = (l == levels_t)
        accept, rest, s_is_leaf = classify(pt, ps, t_is_leaf)

        if t_is_leaf and levels_s > levels_t:
            # deep source tree: expand remaining interior sources. Each
            # round's accepts are stashed and merged by ONE sort at the
            # end — a target's groups must stay consecutive for the
            # executor's output-revisiting accumulation (non-consecutive
            # revisits race the writeback of the earlier run).
            C = pt.shape[0]
            acc_pt = [jnp.where(accept, pt, 0)]
            acc_ps = [jnp.where(accept, ps, 0)]
            for _ in range(levels_s - levels_t):
                valid0 = ps != 0
                is_start, _ = _runs(pt, valid0)
                expand = rest & ~s_is_leaf
                wdr, _, d_base = _seg_rank(expand, is_start)
                npos = 2 * d_base + 2 * wdr
                npt = jnp.zeros((C + 1,), jnp.int32)
                nps = jnp.zeros((C + 1,), jnp.int32)
                for b in (0, 1):
                    dst = jnp.where(expand & (npos + b < C), npos + b, C)
                    npt = npt.at[dst].set(pt, mode="drop")
                    nps = nps.at[dst].set(2 * ps + b, mode="drop")
                overflow += jnp.sum(expand & (npos + 1 >= C),
                                    dtype=jnp.int32)
                pt, ps = npt[:C], nps[:C]
                accept, rest, s_is_leaf = classify(pt, ps, t_is_leaf)
                acc_pt.append(jnp.where(accept, pt, 0))
                acc_ps.append(jnp.where(accept, ps, 0))
            overflow += jnp.sum(rest & ~s_is_leaf, dtype=jnp.int32)
            # merge rounds: sort by (padding-last, target) and fall
            # through to the shared emission below
            apt = jnp.concatenate(acc_pt)
            aps = jnp.concatenate(acc_ps)
            key = jnp.where(apt != 0, apt, jnp.int32(2 ** 30))
            _, pt, ps = jax.lax.sort((key, apt, aps), dimension=0,
                                     num_keys=1)
            accept = ps != 0
            rest = jnp.zeros_like(accept)

        valid0 = ps != 0
        is_start, run_id = _runs(pt, valid0)
        cap_g = caps[l] // group + (1 << l) + 1
        gt, gs, ovg = _emit_groups(pt, ps, accept, is_start, group, cap_g)
        group_ts.append(gt)
        group_ss.append(gs)
        total_valid += jnp.sum(accept, dtype=jnp.int32)
        overflow += ovg

        if l < levels_t:
            # children: deferred (t,s) -> (2t+a, kids(s)); source leaves
            # ride along unrefined (hole at b=1)
            dfr = rest
            wdr, _, d_base = _seg_rank(dfr, is_start)
            C = pt.shape[0]
            cnt_by_run = jnp.zeros((C + 1,), jnp.int32).at[
                jnp.where(dfr, run_id, C)].add(1, mode="drop")
            cnt = cnt_by_run[jnp.minimum(run_id, C)]
            Cn = caps[l + 1]
            npt = jnp.zeros((Cn + 1,), jnp.int32)
            nps = jnp.zeros((Cn + 1,), jnp.int32)
            ov_new = jnp.int32(0)
            for a in (0, 1):
                for b in (0, 1):
                    npos = 4 * d_base + a * 2 * cnt + 2 * wdr + b
                    src_kid = jnp.where(s_is_leaf,
                                        jnp.where(b == 0, ps, 0),
                                        2 * ps + b)
                    ok = dfr & (npos < Cn)
                    dst = jnp.where(ok, npos, Cn)
                    npt = npt.at[dst].set(2 * pt + a, mode="drop")
                    nps = nps.at[dst].set(jnp.where(ok, src_kid, 0),
                                          mode="drop")
                    ov_new += jnp.sum(dfr & (npos >= Cn),
                                      dtype=jnp.int32)
            overflow += ov_new
            pt, ps = npt[:Cn], nps[:Cn]

    # compact the per-level buffers' padding holes so real groups are
    # front-packed (executor steps then stop at the real tail)
    gt = jnp.concatenate(group_ts)
    gs = jnp.concatenate(group_ss)
    keep = gt != 0
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    capT = gt.shape[0]
    dst = jnp.where(keep, pos, capT)
    out_t = jnp.zeros((capT + 1,), jnp.int32).at[dst].set(
        gt, mode="drop")[:capT]
    flat = (dst[:, None] * group
            + jnp.arange(group, dtype=jnp.int32)[None, :]).reshape(-1)
    out_s = jnp.zeros((capT * group + group,), jnp.int32).at[
        jnp.where(keep[:, None], flat.reshape(-1, group),
                  capT * group).reshape(-1)].set(
        gs.reshape(-1), mode="drop")[:capT * group]
    return out_t, out_s.reshape(capT, group), total_valid, overflow


def build_dtt_groups_flat(stree: Tree, ttree: Tree, theta,
                          row_cap: int = 128,
                          group: int = 8) -> PairGroups:
    """Flat simultaneous-descent DTT -> executor-ready groups."""
    gt, gs, nv, ov = _dtt_groups_flat(stree, ttree, theta, stree.levels,
                                      ttree.levels, row_cap, group)
    return PairGroups(tgt=gt, src=gs, n_valid=nv, overflow=ov)


@partial(jax.jit, static_argnames=("cap",))
def _compact_grouped(tgt, src, cap: int):
    keep = src != 0
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    pos = jnp.where(keep & (pos < cap), pos, cap)
    out_t = jnp.zeros((cap + 1,), jnp.int32).at[pos].set(tgt, mode="drop")
    out_s = jnp.zeros((cap + 1,), jnp.int32).at[pos].set(src, mode="drop")
    n = jnp.sum(keep, dtype=jnp.int32)
    return out_t[:cap], out_s[:cap], n, jnp.maximum(n - cap, 0)


def finalize_pairs(pl: PairList, cap: int, nn_t: int = 0) -> PairList:
    """Sort-free compaction for builder output.

    Both builders emit pairs already grouped by ascending target row
    (levels in order, nodes in order), so compaction is a cumsum +
    scatter — no argsort. Rows with no valid pairs simply don't appear;
    the executors accumulate into a zero-initialized aliased output, so
    absent rows stay zero."""
    tgt, src, n, ov = _compact_grouped(pl.tgt, pl.src, cap)
    return PairList(tgt=tgt, src=src, n_valid=n,
                    overflow=pl.overflow + ov)


@partial(jax.jit, static_argnames=("cap", "group", "slot_width", "mover"))
def _compact_groups(tgt, src, cap: int, group: int, slot_width: int,
                    mover: str = "scatter"):
    """Compact flat padded (tgt, src) pairs into G-wide groups.

    Builder output has slot_width entries per target row (slot_width %
    group == 0), so reshaping to (n_chunks, group) never straddles a row
    boundary; chunks with any valid source survive.

    mover='scatter' front-packs via cumsum + one flat scatter;
    mover='sort' uses a stable variadic sort with an invalid-last key
    (same chunks, same order — stability preserves the by-target
    grouping the executor's output revisiting relies on). Sorts move
    data ~10-20x cheaper than random scatters at these shapes
    (docs/PERF.md finding 1); which wins here is measured, not assumed.
    """
    assert slot_width % group == 0
    n_valid = jnp.sum(src != 0, dtype=jnp.int32)
    tgt_c = tgt.reshape(-1, group)[:, 0]
    src_c = src.reshape(-1, group)
    keep = jnp.any(src_c != 0, axis=1)
    n_chunks = jnp.sum(keep, dtype=jnp.int32)
    if mover == "sort":
        key = (~keep).astype(jnp.int32)
        ops = jax.lax.sort(
            (key, tgt_c) + tuple(src_c[:, j] for j in range(group)),
            dimension=0, num_keys=1, is_stable=True)
        out_t = jnp.where(ops[0] == 0, ops[1], 0)
        out_s = jnp.stack(ops[2:], axis=1)
        m = out_t.shape[0]
        if m >= cap:
            out_t, out_s = out_t[:cap], out_s[:cap]
        else:
            out_t = jnp.pad(out_t, (0, cap - m))
            out_s = jnp.pad(out_s, ((0, cap - m), (0, 0)))
        return out_t, out_s, n_valid, jnp.maximum(n_chunks - cap, 0)
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    pos = jnp.where(keep & (pos < cap), pos, cap)
    out_t = jnp.zeros((cap + 1,), jnp.int32).at[pos].set(tgt_c, mode="drop")
    out_s = jnp.zeros((cap + 1, group), jnp.int32).at[pos].set(
        src_c, mode="drop")
    return (out_t[:cap], out_s[:cap], n_valid,
            jnp.maximum(n_chunks - cap, 0))


def group_pairs(pl: PairList, cap: int, group: int, slot_width: int,
                mover: str = "scatter") -> PairGroups:
    """Builder output -> G-wide grouped chunks for the Pallas executor."""
    tgt, src, n, ov = _compact_groups(pl.tgt, pl.src, cap, group,
                                      slot_width, mover)
    return PairGroups(tgt=tgt, src=src, n_valid=n,
                      overflow=pl.overflow + ov * group)


def compact_pairs(pl: PairList, cap: int) -> PairList:
    """Sort valid pairs first (by tgt row), truncate to a static cap.

    Keeps executor cost proportional to real work instead of padded
    widths. cap overflow is detected.
    """
    valid = pl.src != 0
    big = jnp.int32(2 ** 30)
    key = jnp.where(valid, pl.tgt, big)
    order = jnp.argsort(key, stable=True)
    tgt = jnp.where(valid[order], pl.tgt[order], 0)
    src = jnp.where(valid[order], pl.src[order], 0)
    n = tgt.shape[0]
    ov = pl.overflow
    if n > cap:
        ov = ov + jnp.maximum(pl.n_valid - cap, 0)
        tgt, src = tgt[:cap], src[:cap]
    elif n < cap:
        tgt = jnp.pad(tgt, (0, cap - n))
        src = jnp.pad(src, (0, cap - n))
    return PairList(tgt=tgt, src=src, n_valid=pl.n_valid, overflow=ov)
