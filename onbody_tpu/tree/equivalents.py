"""Far-field proxy construction: equivalent particles.

Two families, as in the reference:

* Barycentric Lagrange proxies (order >= 0) — Chebyshev-2nd-kind tensor
  grids per interior node (BarycentricLagrange.hpp:256-417, after
  Wang-Tlupova-Krasny 2020). The recursive anterpolation becomes one
  batched weight-build + einsum per tree level: leaves' particles are
  anterpolated onto their parents' grids, then proxies onto grandparents'
  grids, and so on. The singularity capture (CLOSE_THRESH branch,
  BarycentricLagrange.hpp:118-131) is a `where` with one-hot rows.

* Pair-merge equivalents (order < 0) — strength-weighted pairwise merging
  of children's particles/proxies (barneshut.hpp:947-1061), requiring the
  hierarchically-refined intra-leaf ordering (build_tree(refine=True)).
  Level-synchronous: each level merges adjacent pairs with one reshape.

Output is a `Blocks` structure — the unified source/target block array:
row i holds node i's proxies if i is interior, or its particles if i is a
leaf. This collapses the reference's four DTT interaction types
(sltl/sltb/sbtl/sbtb, ongrav3d.cpp:326-365) and both treecode far/near
cases into a single (target_row, source_row) pair kernel.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from onbody_tpu.parts import Parts
from onbody_tpu.tree.build import Tree

CLOSE_THRESH = 1e-10


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Blocks:
    """Unified per-node interaction blocks.

    pos: (NN, B, PD); rad: (NN, B); s: (NN, B, SD) or None.
    Row 0 is the inert pad row (zero strength, RADIUS 1, position 0) —
    pair lists padded with row 0 contribute nothing, and the radius-1
    convention keeps core_func finite even for a target exactly at the
    origin. Leaf rows [nleaf, 2*nleaf) hold real particles;
    interior rows hold proxies (unused slots parked at the node center
    with zero strength, ref BarycentricLagrange.hpp:335-347).
    """

    pos: jax.Array
    rad: jax.Array
    s: Optional[jax.Array]

    @property
    def width(self) -> int:
        return self.pos.shape[1]


# ------------------------------------------------------------- Chebyshev

def chebyshev_sk_wk(order: int, dtype=jnp.float32):
    """Chebyshev-2nd-kind nodes on [-1,1] and barycentric weights
    (BarycentricLagrange.hpp:29-48)."""
    k = np.arange(order + 1)
    sk = -np.cos(k * np.pi / order)
    wk = np.where(k % 2 == 0, 1.0, -1.0)
    wk[0] *= 0.5
    wk[-1] *= 0.5
    return jnp.asarray(sk, dtype), jnp.asarray(wk, dtype)


def bary_weights(pts, nc, ns, order: int):
    """Barycentric interpolation weights of `pts` on a node's Chebyshev grid.

    pts: (..., P, PD); nc/ns: (..., PD). Returns (..., P, M), M=(order+1)^PD,
    multi-index flattened with dimension 0 fastest (kidx convention,
    BarycentricLagrange.hpp:311-319).
    """
    dtype = pts.dtype
    sk, wk = chebyshev_sk_wk(order, dtype)
    ncp = order + 1
    # grid coords per dim: (..., PD, ncp)
    lsk = nc[..., :, None] + 0.5 * sk * ns[..., :, None]
    # dist: (..., P, PD, ncp)
    dist = pts[..., :, :, None] - lsk[..., None, :, :]
    sing = jnp.abs(dist) < CLOSE_THRESH
    has_sing = jnp.any(sing, axis=-1, keepdims=True)
    safe = jnp.where(sing, 1.0, dist)
    amat = wk / safe
    onehot = sing.astype(dtype)
    amat = jnp.where(has_sing, onehot, amat)
    rowsum = jnp.sum(amat, axis=-1)                      # (..., P, PD)
    prod = jnp.prod(rowsum, axis=-1)                     # (..., P)
    # Points far OUTSIDE the grid (always zero-strength padding clones:
    # real points lie inside their node's box by construction) can hit
    # rowsum == 0.0 exactly through f32 cancellation of the alternating
    # wk/(x-sk) terms; 1/0 = inf then turns inert pads into NaN proxy
    # strengths (inf * 0) that poison the whole upward pass. Vanishing
    # normalizer -> zero weights.
    denom = jnp.where(jnp.abs(prod) > 1e-35, 1.0 / prod, 0.0)

    pd = pts.shape[-1]
    w = amat[..., 0, :]                                  # (..., P, ncp)
    for d in range(1, pd):
        w = (amat[..., d, :][..., :, None] * w[..., None, :]).reshape(
            w.shape[:-1] + (ncp ** (d + 1),))
    return w * denom[..., None]


def bary_factors(pts, nc, ns, order: int):
    """Per-dimension NORMALIZED barycentric factor rows.

    The full weight tensor factorizes over dimensions:
        w[p, (i,j,k)] = f_0[p,i] * f_1[p,j] * f_2[p,k]
    with f_d = amat_d / rowsum_d (the joint denominator of bary_weights
    distributes across dims). Keeping the factors unexpanded turns the
    (P, ncp^PD) weight build + einsum into a chain of (P, ncp)-sized
    contractions — ~8x fewer flops and ~25x less memory traffic at
    order 4 in 3D.

    pts: (..., P, PD); nc/ns: (..., PD). Returns (..., P, PD, ncp).
    Zero-rowsum rows (out-of-domain padding clones) get all-zero
    factors, matching bary_weights' vanishing-normalizer guard.
    """
    dtype = pts.dtype
    sk, wk = chebyshev_sk_wk(order, dtype)
    lsk = nc[..., :, None] + 0.5 * sk * ns[..., :, None]
    dist = pts[..., :, :, None] - lsk[..., None, :, :]
    sing = jnp.abs(dist) < CLOSE_THRESH
    has_sing = jnp.any(sing, axis=-1, keepdims=True)
    safe = jnp.where(sing, 1.0, dist)
    amat = wk / safe
    amat = jnp.where(has_sing, sing.astype(dtype), amat)
    rowsum = jnp.sum(amat, axis=-1, keepdims=True)
    inv = jnp.where(jnp.abs(rowsum) > 1e-35, 1.0 / rowsum, 0.0)
    return amat * inv


def anterp_factored(pts, nc, ns, order: int, s):
    """Upward anterpolation via per-dim factors: (n,P,SD) -> (n,M,SD).

    M = ncp^PD flattened with dim 0 fastest (kidx convention,
    BarycentricLagrange.hpp:311-319) — index (i,j,k) sits at
    i + ncp*j + ncp^2*k, matching _grid_positions and bary_weights.
    """
    f = bary_factors(pts, nc, ns, order)            # (n, P, PD, ncp)
    pd = pts.shape[-1]
    hi = jax.lax.Precision.HIGHEST
    if pd == 3:
        t = jnp.einsum("npk,nps->npks", f[..., 2, :], s, precision=hi)
        t = jnp.einsum("npj,npks->npjks", f[..., 1, :], t, precision=hi)
        eq = jnp.einsum("npi,npjks->nkjis", f[..., 0, :], t,
                        precision=hi)
        n, ncp = eq.shape[0], eq.shape[1]
        # (k, j, i) -> flat m with i fastest
        return eq.reshape(n, ncp ** 3, s.shape[-1])
    t = jnp.einsum("npj,nps->npjs", f[..., 1, :], s, precision=hi)
    eq = jnp.einsum("npi,npjs->njis", f[..., 0, :], t, precision=hi)
    n, ncp = eq.shape[0], eq.shape[1]
    return eq.reshape(n, ncp ** 2, s.shape[-1])


def prolong_factored(pts, nc, ns, order: int, U):
    """Downward prolongation via per-dim factors: (n,M,OD) -> (n,P,OD)."""
    f = bary_factors(pts, nc, ns, order)            # (n, P, PD, ncp)
    pd = pts.shape[-1]
    ncp = order + 1
    hi = jax.lax.Precision.HIGHEST
    n, M, od = U.shape
    if pd == 3:
        Uk = U.reshape(n, ncp, ncp, ncp, od)        # (n, k, j, i, o)
        t = jnp.einsum("nkjio,npk->njiop", Uk, f[..., 2, :],
                       precision=hi)
        t = jnp.einsum("njiop,npj->niop", t, f[..., 1, :], precision=hi)
        u = jnp.einsum("niop,npi->npo", t, f[..., 0, :], precision=hi)
        return u
    Uj = U.reshape(n, ncp, ncp, od)                 # (n, j, i, o)
    t = jnp.einsum("njio,npj->niop", Uj, f[..., 1, :], precision=hi)
    return jnp.einsum("niop,npi->npo", t, f[..., 0, :], precision=hi)


def _grid_positions(nc, ns, order: int):
    """Tensor Chebyshev grid points for nodes: nc,ns (N, PD) -> (N, M, PD)."""
    ncp = order + 1
    pd = nc.shape[-1]
    sk = -np.cos(np.arange(ncp) * np.pi / order)
    # kidx[i, d] = (i // ncp^d) % ncp  — dim 0 fastest
    idx = np.arange(ncp ** pd)
    kidx = np.stack([(idx // ncp ** d) % ncp for d in range(pd)], axis=1)
    skg = jnp.asarray(sk[kidx], nc.dtype)                 # (M, PD)
    return nc[:, None, :] + 0.5 * skg * ns[:, None, :]


# ------------------------------------------------- barycentric (order>=0)

@partial(jax.jit, static_argnames=("order", "width", "levels", "block_size",
                                   "parts"))
def _bary_impl(tree: Tree, x, r, s, order: int, width: int,
               levels: int, block_size: int, parts: int = 1):
    pd = x.shape[1]
    sd = s.shape[1]
    dtype = x.dtype
    ncp = order + 1
    M = ncp ** pd
    nleaf = 1 << levels
    # split proxy rows (parts > 1): an interior node's M > width proxy
    # slots span `parts` block rows — the analogue of the reference's
    # independent eqBlockSize (ongrav3d.cpp:543-550). Part j >= 1 of node
    # i lives at extension row (j+1)*nleaf + i, appended after the NN
    # unified rows; pair lists reference parts as separate source rows.
    nn = 2 * nleaf + (parts - 1) * nleaf
    n_pad = x.shape[0]

    pos = jnp.zeros((nn, width, pd), dtype)
    # radius defaults to 1.0: inert (zero-strength) slots must never hit
    # rsqrt(0) even if a target coincides with their parked position
    rad = jnp.ones((nn, width), dtype)
    st = jnp.zeros((nn, width, sd), dtype)

    # leaf rows: the particles themselves
    pos = pos.at[nleaf:2 * nleaf, :block_size].set(
        x.reshape(nleaf, block_size, pd))
    rad = rad.at[nleaf:2 * nleaf, :block_size].set(
        r.reshape(nleaf, block_size))
    st = st.at[nleaf:2 * nleaf, :block_size].set(
        s.reshape(nleaf, block_size, sd))

    # interior rows, bottom-up
    child_pos = None  # (n_nodes_below, P, pd) proxy positions of level l+1
    child_str = None
    for l in range(levels - 1, -1, -1):
        nseg = 1 << l
        sl = tree.level_slice(l)
        nc_l = tree.nc[sl]
        ns_l = tree.ns[sl]
        grid = _grid_positions(nc_l, ns_l, order)        # (nseg, M, pd)
        if l == levels - 1:
            m = n_pad >> l
            src_pos = x.reshape(nseg, m, pd)
            src_str = s.reshape(nseg, m, sd)
        else:
            src_pos = child_pos.reshape(nseg, 2 * M, pd)
            src_str = child_str.reshape(nseg, 2 * M, sd)
        def anterp(args):
            cpos, cnc, cns, cstr = args
            return anterp_factored(cpos, cnc, cns, order, cstr)

        # chunk the (nodes, P, M) weight tensor (7.8 GB unchunked at 1e7)
        chunk = min(nseg, 2048)
        if nseg > chunk:
            def resh(a):
                return a.reshape((nseg // chunk, chunk) + a.shape[1:])
            eq_s = jax.lax.map(anterp, (resh(src_pos), resh(nc_l),
                                        resh(ns_l), resh(src_str)))
            eq_s = eq_s.reshape((nseg,) + eq_s.shape[2:])
        else:
            eq_s = anterp((src_pos, nc_l, ns_l, src_str))
        # proxy radius: first particle of the node (ref :349-354)
        m_node = n_pad >> l
        r_first = r.reshape(nseg, m_node)[:, 0]
        id0 = 1 << l
        for j in range(parts):
            lo = j * width
            m_j = min(M, lo + width) - lo
            rows = (sl if j == 0 else
                    slice((j + 1) * nleaf + id0, (j + 1) * nleaf + 2 * id0))
            pos = pos.at[rows, :m_j].set(grid[:, lo:lo + m_j])
            # park unused slots at node center (ref :335-337)
            if m_j < width:
                pos = pos.at[rows, m_j:].set(
                    jnp.broadcast_to(nc_l[:, None, :],
                                     (nseg, width - m_j, pd)))
            st = st.at[rows, :m_j].set(eq_s[:, lo:lo + m_j])
            rad = rad.at[rows].set(jnp.broadcast_to(r_first[:, None],
                                                    (nseg, width)))
        child_pos, child_str = grid, eq_s
    return pos, rad, st


LANE = 128


def _block_width(block_size: int, M: int) -> int:
    """Unified block width: holds leaf particles AND proxies, rounded up
    to a lane multiple (Mosaic requires last-dim slices aligned to 128;
    a width of 125 = 5^3 fails to compile on real TPUs)."""
    w = max(block_size, M)
    return -(-w // LANE) * LANE


def block_width(block_size: int) -> int:
    """Lane-aligned block row width (independent of proxy count M —
    oversized grids split across extension rows instead of widening
    every row, see n_eq_parts)."""
    return -(-block_size // LANE) * LANE


def n_eq_parts(width: int, order: int, pd: int) -> int:
    """Number of `width`-wide block rows an interior node's proxy grid
    spans.

    The reference sizes equivalent blocks independently of the leaf
    blockSize (eqBlockSize = padded (order+1)^PD, ongrav3d.cpp:543-550).
    Here rows have one fixed width; an M > width Chebyshev grid spans
    ceil(M/width) rows — slots [j*width, (j+1)*width) of node i live at
    extension row (j+1)*nleaf + i for j >= 1. This is what makes
    order 5 (M=216) usable at block 128 without doubling every near
    tile's width in padding."""
    if order < 0:
        return 1
    return -(-((order + 1) ** pd) // width)


def ext_offset(part: int, nleaf: int) -> int:
    """Row offset of extension part j >= 1: row = (j+1)*nleaf + node_id."""
    return (part + 1) * nleaf


def barycentric_blocks(tree: Tree, sorted_parts: Parts, order: int,
                       width: Optional[int] = None) -> Blocks:
    """Build the unified Blocks with barycentric-Lagrange interior proxies."""
    pd = sorted_parts.pd
    M = (order + 1) ** pd
    parts = 1
    if width is None:
        width = block_width(tree.block_size)
        parts = n_eq_parts(width, order, pd)
    assert M <= width * parts
    pos, rad, st = _bary_impl(tree, sorted_parts.x, sorted_parts.r,
                              sorted_parts.s, order, width,
                              tree.levels, tree.block_size, parts)
    return Blocks(pos=pos, rad=rad, s=st)


# ------------------------------------------------- pair-merge (order<0)

def _merge_pairs(pos, rad, st):
    """Strength-weighted merge of adjacent pairs (barneshut.hpp:986-1000).

    pos: (N, 2k, PD) -> (N, k, PD) etc.
    """
    n, twok, pd = pos.shape
    k = twok // 2
    p2 = pos.reshape(n, k, 2, pd)
    r2 = rad.reshape(n, k, 2)
    s2 = st.reshape(n, k, 2, st.shape[-1])
    if st.shape[-1] == 1:
        w = jnp.abs(s2[..., 0])
    else:
        w = jnp.sqrt(jnp.sum(s2 * s2, axis=-1))
    w = jnp.maximum(w, 1e-20)
    wsum = jnp.sum(w, axis=-1, keepdims=True)            # (n, k, 1)
    mpos = jnp.sum(p2 * w[..., None], axis=2) / wsum
    mrad = jnp.sqrt(jnp.sum(r2 * r2 * w, axis=2) / wsum[..., 0])
    mstr = jnp.sum(s2, axis=2)
    return mpos, mrad, mstr


@partial(jax.jit, static_argnames=("levels", "block_size"))
def _pairmerge_impl(x, r, s, levels: int, block_size: int):
    pd = x.shape[1]
    sd = s.shape[1]
    dtype = x.dtype
    nleaf = 1 << levels
    nn = 2 * nleaf

    pos = jnp.zeros((nn, block_size, pd), dtype)
    rad = jnp.ones((nn, block_size), dtype)
    st = jnp.zeros((nn, block_size, sd), dtype)

    pos = pos.at[nleaf:].set(x.reshape(nleaf, block_size, pd))
    rad = rad.at[nleaf:].set(r.reshape(nleaf, block_size))
    st = st.at[nleaf:].set(s.reshape(nleaf, block_size, sd))

    # bottom-up: node at level l merges its children's 2*bs entries to bs
    cp = x.reshape(nleaf // 2, 2 * block_size, pd)
    cr = r.reshape(nleaf // 2, 2 * block_size)
    cs = s.reshape(nleaf // 2, 2 * block_size, sd)
    for l in range(levels - 1, -1, -1):
        nseg = 1 << l
        mp, mr, ms = _merge_pairs(cp, cr, cs)
        sl = slice(nseg, 2 * nseg)
        pos = pos.at[sl].set(mp)
        rad = rad.at[sl].set(mr)
        st = st.at[sl].set(ms)
        if l > 0:
            cp = mp.reshape(nseg // 2, 2 * block_size, pd)
            cr = mr.reshape(nseg // 2, 2 * block_size)
            cs = ms.reshape(nseg // 2, 2 * block_size, sd)
    return pos, rad, st


def _pad_block_width(pos, rad, st, width: int):
    """Pad blocks to a lane-aligned width with inert slots (zero
    strength, radius 1, position = the block's slot-0 point so padded
    slots never sit at a bogus in-domain origin)."""
    nn, w0 = pos.shape[:2]
    extra = width - w0
    if extra <= 0:
        return pos, rad, st
    park = jnp.broadcast_to(pos[:, :1, :], (nn, extra, pos.shape[2]))
    pos = jnp.concatenate([pos, park], axis=1)
    rad = jnp.concatenate([rad, jnp.ones((nn, extra), rad.dtype)], axis=1)
    if st is not None:
        st = jnp.concatenate(
            [st, jnp.zeros((nn, extra, st.shape[2]), st.dtype)], axis=1)
    return pos, rad, st


def pairmerge_blocks(tree: Tree, sorted_parts: Parts) -> Blocks:
    """Pair-merge equivalents (order<0 mode). Requires refine=True ordering."""
    pos, rad, st = _pairmerge_impl(sorted_parts.x, sorted_parts.r,
                                   sorted_parts.s, tree.levels,
                                   tree.block_size)
    pos, rad, st = _pad_block_width(pos, rad, st,
                                    _block_width(tree.block_size, 0))
    return Blocks(pos=pos, rad=rad, s=st)


# ------------------------------------------------- lean feature-major path
#
# At N=1e8 the point-major Blocks intermediates ((NN, B, PD) etc.) cost
# ~5.4 GB that the Pallas executor never reads — it consumes only the
# feature-major (NN, C, B) array. These builders emit fm/geo layouts
# DIRECTLY, level by level, so peak HBM is the output plus one level's
# temporaries (SolverConfig.lean_plan).

def _bary_fm_fn(tree: Tree, x, r, s, order: int, levels: int,
                block_size: int, kernel_name: str, pad8: bool,
                parts: int = 1, flat: bool = False,
                leaf_chunk: int = 4096, return_root: bool = False):
    from onbody_tpu.ops.kernels import featurize, featurize_flat
    pd = x.shape[1]
    sd = s.shape[1]
    dtype = x.dtype
    ncp = order + 1
    M = ncp ** pd
    assert M <= block_size * parts
    nleaf = 1 << levels
    nn = 2 * nleaf + (parts - 1) * nleaf
    n_pad = x.shape[0]
    width = block_size

    if flat:
        # (NN, C*B): exact T(8,128) tiling for unaligned row counts —
        # see ops/kernels.py featurize_flat. No (.., C, B) intermediate
        # is ever materialized (C=5 would sublane-pad 1.6x).
        assert not pad8

        def feat(pos, rad, st):
            return jax.vmap(lambda p, rr, ss2: featurize_flat(
                kernel_name, p, rr, ss2))(pos, rad, st)
    else:
        def feat(pos, rad, st):
            return jax.vmap(lambda p, rr, ss2: featurize(
                kernel_name, p, rr, ss2, pad8))(pos, rad, st)

    # Row 0 is the inert pad row every padded pair list gathers. It must
    # be FEATURIZED inert — position 0, RADIUS 1, strength 0 — not
    # all-zero: a radius-0 row at the origin meets any target slot whose
    # grid point lands exactly at (or, under the bf16-split MXU d2,
    # within cancellation of) the origin with d2+sr^2 <= 0, and
    # rsqrt(0)*0-strength = NaN. Analytic box corners at the origin make
    # this REAL at 1e9/split 6 (docs/PERF.md "r5 1e9 NaN hunt": three
    # top nodes cornered exactly at (0,0,0) went non-finite in the
    # coarse exec and the downward pass spread them to every leaf of
    # chunks 57-59).
    safe0 = feat(jnp.zeros((1, width, pd), dtype),
                 jnp.ones((1, width), dtype),
                 jnp.zeros((1, width, sd), dtype))
    c_out = safe0.shape[1]
    fm = jnp.zeros((nn, c_out) if flat else (nn, c_out, width), dtype)
    fm = fm.at[0].set(safe0[0])
    # Leaf featurize in fixed chunks through a fori_loop: the carry fm
    # is updated in place, so peak HBM is fm + one ~20 MB chunk instead
    # of fm + a full (nleaf, C*B) temporary (2.7 GB at N=1e8 — the
    # difference between fitting and OOM on a 16 GB chip).
    if nleaf > leaf_chunk and nleaf % leaf_chunk == 0:
        xb = x.reshape(nleaf, width, pd)
        rb = r.reshape(nleaf, width)
        sb = s.reshape(nleaf, width, sd)

        def leaf_body(i, fmc):
            lo = i * leaf_chunk
            fx = feat(
                jax.lax.dynamic_slice_in_dim(xb, lo, leaf_chunk),
                jax.lax.dynamic_slice_in_dim(rb, lo, leaf_chunk),
                jax.lax.dynamic_slice_in_dim(sb, lo, leaf_chunk))
            return jax.lax.dynamic_update_slice_in_dim(
                fmc, fx, nleaf + lo, axis=0)

        fm = jax.lax.fori_loop(0, nleaf // leaf_chunk, leaf_body, fm)
    else:
        fm = fm.at[nleaf:2 * nleaf].set(
            feat(x.reshape(nleaf, width, pd), r.reshape(nleaf, width),
                 s.reshape(nleaf, width, sd)))

    # per-level first-radius rows come from this (nleaf,) vector, not
    # from the full (n_pad,) radius array — lets a donated r free early
    r_leaf_first = r.reshape(nleaf, width)[:, 0]

    child_pos = None
    child_str = None
    for l in range(levels - 1, -1, -1):
        nseg = 1 << l
        sl = tree.level_slice(l)
        nc_l = tree.nc[sl]
        ns_l = tree.ns[sl]
        grid = _grid_positions(nc_l, ns_l, order)        # (nseg, M, pd)
        if l == levels - 1:
            m = n_pad >> l
            src_pos = x.reshape(nseg, m, pd)
            src_str = s.reshape(nseg, m, sd)
        else:
            src_pos = child_pos.reshape(nseg, 2 * M, pd)
            src_str = child_str.reshape(nseg, 2 * M, sd)

        def anterp(args):
            cpos, cnc, cns, cstr = args
            return anterp_factored(cpos, cnc, cns, order, cstr)

        chunk = min(nseg, 2048)
        if nseg > chunk:
            def resh(a):
                return a.reshape((nseg // chunk, chunk) + a.shape[1:])
            eq_s = jax.lax.map(anterp, (resh(src_pos), resh(nc_l),
                                        resh(ns_l), resh(src_str)))
            eq_s = eq_s.reshape((nseg,) + eq_s.shape[2:])
        else:
            eq_s = anterp((src_pos, nc_l, ns_l, src_str))

        r_first = r_leaf_first[::(nleaf >> l)]
        rad_w = jnp.broadcast_to(r_first[:, None], (nseg, width))
        id0 = 1 << l
        for j in range(parts):
            lo = j * width
            m_j = min(M, lo + width) - lo
            rows = (sl if j == 0 else
                    slice((j + 1) * nleaf + id0, (j + 1) * nleaf + 2 * id0))
            pos_w = jnp.concatenate(
                [grid[:, lo:lo + m_j],
                 jnp.broadcast_to(nc_l[:, None, :],
                                  (nseg, width - m_j, pd))], axis=1)
            st_w = jnp.concatenate(
                [eq_s[:, lo:lo + m_j],
                 jnp.zeros((nseg, width - m_j, sd), dtype)], axis=1)
            fm = fm.at[rows].set(feat(pos_w, rad_w, st_w))
        child_pos, child_str = grid, eq_s
    if return_root:
        # raw (un-featurized) root proxies: the out-of-core top-tree
        # assembly anterpolates these upward across subtree roots
        return fm, child_pos[0], child_str[0]
    return fm


_STATIC_FM = ("order", "levels", "block_size", "kernel_name", "pad8",
              "parts", "flat", "leaf_chunk", "return_root")
# NOTE: donating x/r/s was tried for the 1e8 path and does nothing —
# XLA donation is output-aliasing only, and none of them matches the fm
# output shape (the runtime reports "not usable" and keeps them alive
# through the program). The real 1e8 memory win is the chunked leaf
# featurize above; callers just drop their references after the call.
_bary_fm_impl = jax.jit(_bary_fm_fn, static_argnames=_STATIC_FM)


def barycentric_fm(tree: Tree, sorted_parts: Parts, order: int,
                   kernel_name: str, pad8: bool = True,
                   flat: bool = False, donate: bool = False,
                   leaf_chunk: int = 4096,
                   return_root: bool = False) -> jax.Array:
    """Feature-major source blocks with barycentric proxies, built
    without point-major intermediates. Oversized grids (M > B, e.g.
    order 5 at block 128) split across extension rows (n_eq_parts).
    flat=True returns (NN, C*B) — exact TPU tiling for lean row counts
    (see ops/kernels.py featurize_flat); requires pad8=False.
    donate is accepted for API compatibility and ignored (see note
    above: donation cannot alias these shapes). leaf_chunk bounds the
    flat leaf featurize's per-dispatch temporary (tests shrink it to
    exercise the chunked path at small N)."""
    parts = n_eq_parts(tree.block_size, order, sorted_parts.pd)
    return _bary_fm_impl(tree, sorted_parts.x, sorted_parts.r,
                         sorted_parts.s, order, tree.levels,
                         tree.block_size, kernel_name, pad8, parts,
                         flat, leaf_chunk, return_root)


@partial(jax.jit, static_argnames=("order", "levels", "block_size",
                                   "parts"))
def _target_geo_fm_impl(tree: Tree, x, r, order: int, levels: int,
                        block_size: int, parts: int = 1):
    pd = x.shape[1]
    dtype = x.dtype
    ncp = order + 1
    M = ncp ** pd
    assert M <= block_size * parts
    nleaf = 1 << levels
    nn = 2 * nleaf + (parts - 1) * nleaf
    n_pad = x.shape[0]
    width = block_size

    geo = jnp.zeros((nn, 8, width), dtype)
    leaf = jnp.concatenate(
        [jnp.transpose(x.reshape(nleaf, width, pd), (0, 2, 1)),
         r.reshape(nleaf, 1, width)], axis=1)
    geo = geo.at[nleaf:2 * nleaf, :pd + 1].set(leaf)
    for l in range(levels - 1, -1, -1):
        nseg = 1 << l
        sl = tree.level_slice(l)
        nc_l = tree.nc[sl]
        grid = _grid_positions(nc_l, tree.ns[sl], order)
        r_first = r.reshape(nseg, n_pad >> l)[:, 0]
        id0 = 1 << l
        for j in range(parts):
            lo = j * width
            m_j = min(M, lo + width) - lo
            rows = (sl if j == 0 else
                    slice((j + 1) * nleaf + id0, (j + 1) * nleaf + 2 * id0))
            pos_w = jnp.concatenate(
                [grid[:, lo:lo + m_j],
                 jnp.broadcast_to(nc_l[:, None, :],
                                  (nseg, width - m_j, pd))], axis=1)
            row = jnp.concatenate(
                [jnp.transpose(pos_w, (0, 2, 1)),
                 jnp.broadcast_to(r_first[:, None, None],
                                  (nseg, 1, width))], axis=1)
            geo = geo.at[rows, :pd + 1].set(row)
    return geo


def target_geo_fm(tree: Tree, sorted_targs: Parts,
                  order: int) -> jax.Array:
    """(NN, 8, B) target geometry [pos | radius | 0..] built directly —
    the lean-path replacement for target_blocks + build_tgt_geo."""
    parts = n_eq_parts(tree.block_size, order, sorted_targs.pd)
    return _target_geo_fm_impl(tree, sorted_targs.x, sorted_targs.r,
                               order, tree.levels, tree.block_size, parts)


@partial(jax.jit, static_argnames=("order", "levels", "split",
                                   "block_size"))
def _target_geo_slab_impl(tree: Tree, x, r, root, order: int, levels: int,
                          split: int, block_size: int, x_base=None):
    """Owner-major target-geometry slab for ONE level-`split` subtree.

    Row layout matches parallel.mesh.local_rows: rows [0, 2^split) are
    the global top nodes (replicated geometry), then the subtree's
    levels split..levels in order. `root` is traced — one compilation
    serves every chunk of traverse/chunked.py.

    x_base: slot offset of x[0]/r[0] within the GLOBAL sorted particle
    array — the out-of-core path passes only the chunk's own particles
    (x of shape (n_pad/2^split, pd)) with x_base = chunk * that size;
    None means x/r are the full global arrays (base 0).
    """
    pd = x.shape[1]
    dtype = x.dtype
    ncp = order + 1
    M = ncp ** pd
    nleaf = 1 << levels
    width = block_size
    ndev = 1 << split

    def grid_rows(nc_l, ns_l, rad):
        nseg = nc_l.shape[0]
        grid = _grid_positions(nc_l, ns_l, order)
        pos_w = jnp.concatenate(
            [grid, jnp.broadcast_to(nc_l[:, None, :],
                                    (nseg, width - M, pd))], axis=1)
        row = jnp.concatenate(
            [jnp.transpose(pos_w, (0, 2, 1)),
             jnp.broadcast_to(rad[:, None, None], (nseg, 1, width))],
            axis=1)
        return jnp.pad(row, ((0, 0), (0, 8 - pd - 1), (0, 0)))

    rows = []
    # top rows: nodes 0..ndev-1 (node 0 inert — its grid is junk but its
    # row is never read: pair lists never reference local row 0's output
    # and node 0 has no geometry)
    r_top = jnp.full((ndev,), jnp.mean(r), dtype)
    rows.append(grid_rows(tree.nc[:ndev], jnp.maximum(tree.ns[:ndev],
                                                      1e-20), r_top))
    for l in range(split, levels + 1):
        w = 1 << (l - split)
        id0 = root << (l - split)
        if l == levels:
            p0 = (id0 - nleaf) * block_size
            if x_base is not None:
                p0 = p0 - x_base
            xs = jax.lax.dynamic_slice_in_dim(x, p0, w * block_size)
            rs = jax.lax.dynamic_slice_in_dim(r, p0, w * block_size)
            leaf = jnp.concatenate(
                [jnp.transpose(xs.reshape(w, width, pd), (0, 2, 1)),
                 rs.reshape(w, 1, width)], axis=1)
            rows.append(jnp.pad(leaf, ((0, 0), (0, 8 - pd - 1), (0, 0))))
        else:
            nc_l = jax.lax.dynamic_slice_in_dim(tree.nc, id0, w)
            ns_l = jax.lax.dynamic_slice_in_dim(tree.ns, id0, w)
            # n_lvl from the GLOBAL slot count (x may be a chunk slice)
            n_lvl = (nleaf * block_size) >> l
            p0 = (id0 - (1 << l)) * n_lvl
            if x_base is not None:
                p0 = p0 - x_base
            # per-node first-particle radius (matches _target_grid_impl)
            r_first = r[p0 + jnp.arange(w, dtype=jnp.int32) * n_lvl]
            rows.append(grid_rows(nc_l, ns_l, r_first))
    return jnp.concatenate(rows, axis=0)


def target_geo_slab(tree: Tree, sorted_targs: Parts, root, order: int,
                    split: int) -> jax.Array:
    """(R, 8, B) owner-major target-geometry slab for subtree `root`."""
    return _target_geo_slab_impl(tree, sorted_targs.x, sorted_targs.r,
                                 jnp.asarray(root, jnp.int32), order,
                                 tree.levels, split, tree.block_size)


# ----------------------------------------------------- target-side blocks

@partial(jax.jit, static_argnames=("order", "width", "levels", "block_size",
                                   "parts"))
def _target_grid_impl(tree: Tree, x, r, order: int, width: int,
                      levels: int, block_size: int, parts: int = 1):
    """Positions-and-radii-only Blocks build for the target side.

    Equivalent-target points are just the Chebyshev grids of each node
    (BarycentricLagrange.hpp:325-332) — no anterpolation happens on the
    target side (strengths flow downward, not upward), so skipping the
    weight-build/einsum machinery of _bary_impl makes this pass nearly
    free. parts > 1 splits oversized grids across extension rows
    (see n_eq_parts).
    """
    pd = x.shape[1]
    dtype = x.dtype
    ncp = order + 1
    M = ncp ** pd
    nleaf = 1 << levels
    nn = 2 * nleaf + (parts - 1) * nleaf
    n_pad = x.shape[0]

    pos = jnp.zeros((nn, width, pd), dtype)
    rad = jnp.ones((nn, width), dtype)
    pos = pos.at[nleaf:2 * nleaf, :block_size].set(
        x.reshape(nleaf, block_size, pd))
    rad = rad.at[nleaf:2 * nleaf, :block_size].set(
        r.reshape(nleaf, block_size))

    for l in range(levels - 1, -1, -1):
        nseg = 1 << l
        sl = tree.level_slice(l)
        nc_l = tree.nc[sl]
        grid = _grid_positions(nc_l, tree.ns[sl], order)
        r_first = r.reshape(nseg, n_pad >> l)[:, 0]
        id0 = 1 << l
        for j in range(parts):
            lo = j * width
            m_j = min(M, lo + width) - lo
            rows = (sl if j == 0 else
                    slice((j + 1) * nleaf + id0, (j + 1) * nleaf + 2 * id0))
            pos = pos.at[rows, :m_j].set(grid[:, lo:lo + m_j])
            if m_j < width:
                pos = pos.at[rows, m_j:].set(
                    jnp.broadcast_to(nc_l[:, None, :],
                                     (nseg, width - m_j, pd)))
            rad = rad.at[rows].set(jnp.broadcast_to(r_first[:, None],
                                                    (nseg, width)))
    return pos, rad


def target_blocks(tree: Tree, sorted_targs: Parts, order: int,
                  width: Optional[int] = None) -> Blocks:
    """Target-side unified blocks: leaf rows = target particles, interior
    rows = equivalent target points (the DTT accumulates far-field there,
    then prolongs downward). Strengths are not needed."""
    pd = sorted_targs.pd
    bs = tree.block_size
    if order >= 0:
        M = (order + 1) ** pd
        parts = 1
        if width is None:
            width = block_width(bs)
            parts = n_eq_parts(width, order, pd)
        assert M <= width * parts
        pos, rad = _target_grid_impl(tree, sorted_targs.x, sorted_targs.r,
                                     order, width, tree.levels, bs, parts)
        return Blocks(pos=pos, rad=rad, s=None)
    # pair-merge targets: positions merged with unit weights
    dummy_s = jnp.ones((sorted_targs.n, 1), sorted_targs.x.dtype)
    pos, rad, _ = _pairmerge_impl(sorted_targs.x, sorted_targs.r, dummy_s,
                                  tree.levels, bs)
    pos, rad, _ = _pad_block_width(pos, rad, None, _block_width(bs, 0))
    return Blocks(pos=pos, rad=rad, s=None)
