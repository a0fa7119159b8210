"""Quantized-payload tree-build sort: 16-bit coordinate codes packed so
each level's variadic sort carries 3 columns in 3D (2 in 2D) instead of
4 (5), cutting the dominant tree-build cost — sort traffic — by ~25%.

The reference sorts f32 coordinates directly (barneshut.hpp:344-587);
the exact-coordinate TPU formulation (tree/build.py _split_step_impl)
carries pd f32 coordinate columns + gidx through every level's
lax.sort. But the sort only needs a PARTITION, not exact coordinates:

  * per-axis codes c_d = floor((x_d - lo_d) / step_d) on a u16 grid over
    the REAL bounding box (step = ext/65534) are order-consistent with
    the f32 coordinates up to ties within one grid cell;
  * lax.sort is stable, so equal codes split by incoming slot order —
    slot counts stay EXACT (the VAMsplit invariant every downstream
    fixed shape relies on); only the geometric split plane moves by at
    most one grid step (~1.5e-5 of the domain);
  * node boxes are dequantized OUTWARD (floor the lo cell, ceil the hi
    cell), so MAC geometry stays conservative;
  * padding clones get code 65535 on every axis (> any real code 65534),
    preserving the pads-sort-last prefix invariant that the live-row
    slicing and upward stats rely on (tree/build.py _split_step_impl).

Column layout between levels (axis-major, canonical):
  3D: A = (cx << 16) | cy  (u32),  B = cz (u32),  gidx (i32)
  2D: A = (cx << 16) | cy  (u32),  gidx (i32)
Each level unpacks, picks the longest axis per segment, re-packs the
sort key as (c_axis << 16) | c_(axis+1 mod pd) — the off-axis low bits
act as a deterministic secondary tie-break (any consistent partition is
a valid k-d split) — sorts, and restores axis-major packing.

Exact f32 coordinates re-enter after the LAST sort, one of two ways
(SolverConfig.tree_quant):
  * 'gather'  — gather the original coordinates + deferred r/s through
    the final permutation as ONE (n, pd+1+sd) row gather (measured
    ~flat in width, gather_rows): positions downstream are bit-exact.
  * 'dequant' — dequantize codes to cell centers (error <= step/2 ~
    1.5e-5 of the domain; measured direct-sum impact at that scale):
    zero gather cost. Pads collapse to one far point (their geometry is
    overridden with the far point anyway, and their strengths are zero).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32


# ----------------------------------------------------------- pack/unpack

def _unpack(segs, pd: int):
    """Axis-major code arrays [cx, cy(, cz)] from packed sort columns."""
    a = segs[0]
    cs = [a >> 16, a & _U32(0xFFFF)]
    if pd == 3:
        cs.append(segs[1])
    return cs


def _pack(cs, pd: int):
    out = [(cs[0] << 16) | cs[1]]
    if pd == 3:
        out.append(cs[2])
    return out


def _ncode(pd: int) -> int:
    """Packed code columns (excluding gidx)."""
    return 2 if pd == 3 else 1


# ------------------------------------------------------------- quantize

def make_qcols(x_pad: jax.Array, gidx: jax.Array, n_real: int):
    """Quantize padded coordinates to packed u16 code columns.

    Grid covers the REAL bounding box only (rows [0, n_real) — callers
    quantize BEFORE any sorting, when reals occupy the slot prefix);
    pads get code 65535 everywhere. Returns (code_cols, glo, gstep)
    with glo/gstep of shape (pd,)."""
    pd = x_pad.shape[1]
    xr = x_pad[:n_real]
    glo = jnp.min(xr, axis=0)
    ghi = jnp.max(xr, axis=0)
    gstep = jnp.maximum((ghi - glo) / 65534.0, 1e-30)
    pad = gidx >= n_real
    cs = []
    for d in range(pd):
        c = jnp.clip(jnp.floor((x_pad[:, d] - glo[d]) / gstep[d]),
                     0, 65534).astype(_U32)
        cs.append(jnp.where(pad, _U32(65535), c))
    return tuple(_pack(cs, pd)), glo, gstep


# ----------------------------------------------------------------- boxes

def _code_box(cs, mask=None):
    """Per-segment min/max codes (u32), real-masked with pure-pad
    fallback (mirrors build._masked_box_cols)."""
    los, his = [], []
    if mask is not None:
        any_real = jnp.any(mask, axis=1)
    for c in cs:
        if mask is None:
            los.append(jnp.min(c, axis=1))
            his.append(jnp.max(c, axis=1))
        else:
            lo_m = jnp.min(jnp.where(mask, c, _U32(0xFFFFFFFF)), axis=1)
            hi_m = jnp.max(jnp.where(mask, c, _U32(0)), axis=1)
            los.append(jnp.where(any_real, lo_m, jnp.min(c, axis=1)))
            his.append(jnp.where(any_real, hi_m, jnp.max(c, axis=1)))
    return jnp.stack(los, axis=1), jnp.stack(his, axis=1)


def _dq_box(lo_c, hi_c, glo, gstep, parts: int):
    """Dequantize (nseg, pd) u32 code boxes to conservative f32 boxes.

    glo/gstep: (parts, pd); segment i belongs to part i // (nseg/parts).
    lo -> floor of its cell, hi -> ceil of its cell (+1 step), so the
    true coordinates of every particle in the segment are contained."""
    nseg, pd = lo_c.shape
    per = nseg // parts
    g0 = glo.reshape(parts, 1, pd)
    g1 = gstep.reshape(parts, 1, pd)
    lo = (lo_c.astype(jnp.float32).reshape(parts, per, pd) * g1 + g0)
    hi = ((hi_c.astype(jnp.float32) + 1.0).reshape(parts, per, pd) * g1
          + g0)
    return lo.reshape(nseg, pd), hi.reshape(nseg, pd)


def _pad_dead_boxes(lo, hi, parts: int, live: int, nseg_p: int):
    pd = lo.shape[1]
    lo = jnp.pad(lo.reshape(parts, live, pd),
                 ((0, 0), (0, nseg_p - live), (0, 0))).reshape(-1, pd)
    hi = jnp.pad(hi.reshape(parts, live, pd),
                 ((0, 0), (0, nseg_p - live), (0, 0))).reshape(-1, pd)
    return lo, hi


# ------------------------------------------------------------ level step

def _sort_group_q(segs, pd: int, mask=None):
    """Boxes -> axis keys -> one packed variadic sort for a group of
    equal-length segments. segs: [A(,B), gidx] each (nseg_s, m).
    Returns (sorted_segs, lo_c, hi_c)."""
    cs = _unpack(segs, pd)
    lo_c, hi_c = _code_box(cs, mask)
    axis = jnp.argmax((hi_c - lo_c).astype(jnp.int32), axis=1)
    key = cs[0]
    for d in range(1, pd):
        key = jnp.where((axis == d)[:, None], cs[d], key)
    o1 = cs[0]
    for d in range(pd):
        o1 = jnp.where(((axis + 1) % pd == d)[:, None], cs[d], o1)
    ops = [(key << 16) | o1]
    if pd == 3:
        o2 = cs[0]
        for d in range(pd):
            o2 = jnp.where(((axis + 2) % pd == d)[:, None], cs[d], o2)
        ops.append(o2)
    ops.append(segs[-1])
    out = jax.lax.sort(tuple(ops), dimension=1, num_keys=1)
    k2, o1b = out[0] >> 16, out[0] & _U32(0xFFFF)
    o2b = out[1] if pd == 3 else None
    ncs = []
    for d in range(pd):
        cd = k2                                     # axis == d
        cd = jnp.where(((axis + 1) % pd == d)[:, None], o1b, cd)
        if pd == 3:
            cd = jnp.where(((axis + 2) % pd == d)[:, None], o2b, cd)
        ncs.append(cd)
    return _pack(ncs, pd) + [out[-1]], lo_c, hi_c


def _qsplit_step_impl(cols, n_real, glo, gstep, l: int, pd: int,
                      capture_box: bool, n_live: int = 0,
                      parts: int = 1, prefix_min: int = -1):
    """One median-split level on packed code columns. Mirrors
    build._split_step_impl's prefix-sliced live-row structure: all-pad
    tail segments pass through untouched; the partial segment sorts only
    its real prefix (pad codes 65535 exceed every real code on every
    axis, so the pad tail never moves)."""
    from onbody_tpu.tree.build import PREFIX_SORT_MIN
    if prefix_min < 0:
        prefix_min = PREFIX_SORT_MIN
    n_pad = cols[0].shape[0]
    nseg = 1 << l
    m = n_pad >> l
    nseg_p = nseg // parts
    live = min(nseg_p, -(-n_live // m)) if n_live else nseg_p
    full = min(nseg_p, n_live // m) if n_live else nseg_p
    lp = (n_live - full * m
          if (n_live >= prefix_min and full < nseg_p) else 0)

    if lp > 0:
        per_part = nseg_p * m
        trip = [((cp := c.reshape(parts, per_part))[:, :full * m],
                 cp[:, full * m:full * m + lp],
                 cp[:, full * m + lp:]) for c in cols]
        if full:
            fcols = [f.reshape(parts * full, m) for f, _, _ in trip]
            fsorted, lo_f, hi_f = _sort_group_q(fcols, pd)
        pcols = [p for _, p, _ in trip]                  # (parts, lp)
        psorted, lo_p, hi_p = _sort_group_q(pcols, pd)
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
            lo_c = jnp.concatenate(
                [lo_f.reshape(parts, full, pd), lo_p[:, None, :]],
                axis=1).reshape(parts * live_n, pd)
            hi_c = jnp.concatenate(
                [hi_f.reshape(parts, full, pd), hi_p[:, None, :]],
                axis=1).reshape(parts * live_n, pd)
        else:
            lo_c, hi_c = lo_p, hi_p
        lo, hi = _dq_box(lo_c, hi_c, glo, gstep, parts)
        lo, hi = _pad_dead_boxes(lo, hi, parts, live_n, nseg_p)
        return new_cols, lo, hi

    sliced = live < nseg_p
    if sliced:
        def head(c):
            cp = c.reshape(parts, nseg_p * m)
            return cp[:, :live * m].reshape(parts * live, m)
        segs = [head(c) for c in cols]
    else:
        segs = [c.reshape(nseg, m) for c in cols]
    mask = segs[-1] < n_real
    sorted_segs, lo_c, hi_c = _sort_group_q(segs, pd, mask)
    if sliced:
        new_cols = []
        for i in range(len(cols)):
            cp = cols[i].reshape(parts, nseg_p * m)
            cp = jax.lax.dynamic_update_slice(
                cp, sorted_segs[i].reshape(parts, live * m), (0, 0))
            new_cols.append(cp.reshape(n_pad))
        new_cols = tuple(new_cols)
    else:
        new_cols = tuple(s.reshape(n_pad) for s in sorted_segs)
    if not capture_box:
        return new_cols, None, None
    lo, hi = _dq_box(lo_c, hi_c, glo, gstep, parts)
    if sliced:
        lo, hi = _pad_dead_boxes(lo, hi, parts, live, nseg_p)
    return new_cols, lo, hi


def _qbox_step_impl(cols, n_real, glo, gstep, l: int, pd: int,
                    n_live: int = 0, parts: int = 1):
    """Box-only capture (span mode's skipped levels) from code columns."""
    n_pad = cols[0].shape[0]
    nseg = 1 << l
    m = n_pad >> l
    nseg_p = nseg // parts
    live = min(nseg_p, -(-n_live // m)) if n_live else nseg_p
    if live < nseg_p:
        def head(c):
            cp = c.reshape(parts, nseg_p * m)
            return cp[:, :live * m].reshape(parts * live, m)
        segs = [head(c) for c in cols]
    else:
        segs = [c.reshape(nseg, m) for c in cols]
    cs = _unpack(segs, pd)
    mask = segs[-1] < n_real
    lo_c, hi_c = _code_box(cs, mask)
    lo, hi = _dq_box(lo_c, hi_c, glo, gstep, parts)
    if live < nseg_p:
        lo, hi = _pad_dead_boxes(lo, hi, parts, live, nseg_p)
    return lo, hi


@partial(jax.jit, static_argnames=("schedule", "pd", "prefix_min"),
         donate_argnums=(0,))
def _qrun_steps(cols, n_real, glo, gstep, schedule, pd: int,
                prefix_min: int = -1):
    """Quantized twin of build._run_steps: a static slice of the build
    schedule as ONE donated program over the packed code columns."""
    boxes = []
    for kind, l, capture, n_live, parts in schedule:
        if kind == "sort":
            cols, lo, hi = _qsplit_step_impl(cols, n_real, glo, gstep,
                                             l, pd, capture, n_live,
                                             parts, prefix_min)
        else:
            lo, hi = _qbox_step_impl(cols, n_real, glo, gstep, l, pd,
                                     n_live, parts)
        if capture:
            boxes.append((lo, hi))
    return cols, boxes


def qrun_schedule(cols, n_real, glo, gstep, sched, pd: int, fuse: int):
    from onbody_tpu.tree.build import PREFIX_SORT_MIN
    lows, highs = [], []
    fuse = max(1, fuse)
    prefix_min = PREFIX_SORT_MIN
    for i in range(0, len(sched), fuse):
        cols, boxes = _qrun_steps(cols, n_real, glo, gstep,
                                  tuple(sched[i:i + fuse]), pd,
                                  prefix_min)
        for lo, hi in boxes:
            lows.append(lo)
            highs.append(hi)
    return cols, lows, highs


# ------------------------------------------------------------- finalize

def gather_rows(perm, cols):
    """Gather f32 columns through perm as ONE (n, k) row gather.

    Measured on v5e at 16.8 M rows (docs/PERF.md r4): a row gather is
    ~flat in width — (n,4) 13.9 ns/row, (n,8) 16.3 ns/row vs 10.2 for a
    single f32 column and 24.9 for a complex64-packed pair — so one row
    gather of [x | r | s] replaces what would be 3+ column/packed
    gathers. The pre-stack concat is linear HBM traffic (~2% of the
    gather cost). Bit-exact."""
    stacked = jnp.stack(cols, axis=1) if len(cols) > 1 else None
    if stacked is None:
        return [cols[0][perm]]
    g = stacked[perm]
    return [g[:, i] for i in range(len(cols))]


def finalize_cols(qcols, perm, glo, gstep, n_real: int, pd: int,
                  mode: str, x_cols, r_pad, s_pad, sd: int,
                  need_r: bool):
    """All f32 particle columns (x0..x_{pd-1}, r, s...) after the last
    sort, via ONE row gather (gather_rows).

    mode='gather': exact coordinates + deferred r/s in a single
    (n, pd+1+sd) row gather through the final permutation (x_cols: the
    pd original padded coordinate columns).
    mode='dequant': coordinates from cell centers (error <= step/2;
    pads collapse to one far point one domain-diameter past the max
    corner — pad geometry is overridden by the dead-node far point and
    pad strengths are zero, so only finiteness matters); r/s still
    gather. need_r=False substitutes zeros for the radius column
    (kernel never reads it — build_tree need_r)."""
    gcols = []
    if mode == "gather":
        gcols += list(x_cols)
    if need_r:
        gcols.append(r_pad)
    if s_pad is not None and sd:
        gcols += [s_pad[:, d] for d in range(sd)]
    got = gather_rows(perm, gcols) if gcols else []
    if mode == "gather":
        xs, got = got[:pd], got[pd:]
    else:
        cs = _unpack(qcols, pd)
        pad = perm >= n_real
        xs = []
        for d in range(pd):
            x = (cs[d].astype(jnp.float32) + 0.5) * gstep[d] + glo[d]
            ext = 65534.0 * gstep[d]
            far = glo[d] + 2.0 * ext + 1.0
            xs.append(jnp.where(pad, far, x))
    r = got[0] if need_r else jnp.zeros_like(xs[0])
    ss = got[1:] if need_r else got[0:]
    return tuple(xs) + (r,) + tuple(ss)
