"""The four physics kernels, in TPU-native tile form.

Each workload from the reference gets two implementations here:

* ``pairwise`` — a direct broadcast transliteration of the reference's
  scalar kernel semantics (ongrav3d.cpp:44-58, onvort2d.cpp:44-57,
  onvort3d.cpp:44-62, onvortgrad3d.cpp:45-79). Used as the fp64-capable
  oracle and for validating the tile form. O(T*S*OD) memory.

* ``tile`` — the production form: the all-pairs interaction of a target
  block against a source block decomposed into MXU matmuls. The key
  identity is that every kernel's output is ``sum_j W_ij * poly(t_i, s_j)``
  with poly multilinear in target/source coordinates, so the j-sum factors
  into ``(T,S) @ (S,F)`` matmuls over a small per-source feature matrix,
  followed by per-target recombination. Distances use either an exact
  elementwise broadcast or a tile-centered Gram matmul (subtracting the
  tile mean bounds the fp32 cancellation by the tile's spatial extent).

Sign conventions follow the reference exactly:
  grav3d:     d = s - t, u += m*(d2+sr^2)^-1.5 * d
  vort2d:     d = t - s, u -= ss*cf*dy ; v += ss*cf*dx (cf uses sr and tr)
  vort3d:     d = s - t, u += cf * (omega x d)
  vortgrad3d: d = t - s, u += r3*(omega x d); 9 gradients via bbb
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax.numpy as jnp
from jax import lax

from onbody_tpu.ops import core_funcs as cf


def _dot(a, b, accum_dtype):
    # HIGHEST keeps true-fp32 MXU passes; the TPU default would silently
    # drop to bf16 mantissas, blowing the reference's ~6e-6 RMS floor
    # (README.md:99-101).
    return jnp.dot(a, b, preferred_element_type=accum_dtype,
                   precision=lax.Precision.HIGHEST)


def _pm(accum_dtype, *arrays):
    """Promote inputs to the accumulator dtype (the mycast<S,A> contract,
    MathHelper.hpp:50-59): with accum_dtype=float64 the whole per-pair
    chain — distances, core function, weights, reductions — runs in fp64
    over fp32-stored particles, the reference's documented accuracy
    upgrade (README.md:107-110, ~4e-7 RMS floor vs ~6e-6 for fp32).
    Upcasting before the subtraction is exact (every fp32 is an fp64),
    so this is >= the reference's subtract-then-cast accuracy. No-op
    when storage == accumulation dtype."""
    if arrays[0].dtype == jnp.dtype(accum_dtype):
        return arrays if len(arrays) > 1 else arrays[0]
    out = tuple(a.astype(accum_dtype) for a in arrays)
    return out if len(out) > 1 else out[0]


def dist2(tx, sx, mode: str = "exact"):
    """Squared distances (T,S) between target and source positions.

    'exact'  — elementwise broadcast, no cancellation (VPU).
    'center' — tile-centered Gram trick |t'|^2 - 2 t'.s' + |s'|^2 (MXU);
               centering bounds fp32 cancellation by the tile extent.
    """
    if mode == "exact":
        diff = tx[:, None, :] - sx[None, :, :]
        return jnp.sum(diff * diff, axis=-1)
    c = 0.5 * (jnp.mean(tx, axis=0) + jnp.mean(sx, axis=0))
    t = tx - c
    s = sx - c
    t2 = jnp.sum(t * t, axis=-1)
    s2 = jnp.sum(s * s, axis=-1)
    g = jnp.dot(t, s.T, preferred_element_type=t.dtype,
                precision=lax.Precision.HIGHEST)
    d2 = t2[:, None] - 2.0 * g + s2[None, :]
    return jnp.maximum(d2, 0.0)


def _cross(a, b):
    return jnp.cross(a, b)


# Cyclic-shift permutation matrices, generated INLINE via 2D iota
# (pallas_call rejects captured array constants, and Mosaic lowers
# iota+compare+convert everywhere). Cross products inside Pallas
# kernels are built from these via tiny matmuls (always-lowerable
# dot_general + elementwise) instead of per-row slice/stack patterns,
# several of which Mosaic cannot lay out ('result/input offset
# mismatch' tpu.concatenate, 1D-gather from slice+newaxis).

def _perm3(shift: int, dtype):
    """(3, 3) cyclic permutation: (P @ v)[i] = v[(i+shift)%3]."""
    r = lax.broadcasted_iota(jnp.int32, (3, 3), 0)
    c = lax.broadcasted_iota(jnp.int32, (3, 3), 1)
    return ((c - r) % 3 == shift).astype(dtype)


def _mdot(m, a):
    # exact 0/1-matrix matmul — HIGHEST so Mosaic never bf16-truncates
    return jnp.dot(m, a, preferred_element_type=a.dtype,
                   precision=lax.Precision.HIGHEST)


def _cross_rows(a, b):
    """(3, B) x (3, B) row-major cross product, Mosaic-safe."""
    p1 = _perm3(1, a.dtype)
    p2 = _perm3(2, a.dtype)
    return (_mdot(p1, a) * _mdot(p2, b) - _mdot(p2, a) * _mdot(p1, b))


def _cross_lanes(a, b):
    """(B, 3) x (B, 3) lane-major cross product, Mosaic-safe: column
    rolls via (B,3) @ (3,3)^T permutation matmuls."""
    p1 = _perm3(1, a.dtype).T
    p2 = _perm3(2, a.dtype).T
    return (_mdot(a, p1) * _mdot(b, p2) - _mdot(a, p2) * _mdot(b, p1))


@dataclasses.dataclass(frozen=True)
class Kernel:
    """One physics workload: dims, flop model, pairwise + tile forms."""

    name: str
    pd: int
    sd: int
    od: int
    uses_tr: bool
    pairwise: Callable  # (tx,tr,sx,sr,ss,core) -> (T,S,OD)
    tile: Callable      # (tx,tr,sx,sr,ss,core,accum_dtype,d2_mode) -> (T,OD)
    flops_fn: Callable  # (core_name) -> flops per source-target pair


# ------------------------------------------------------------------ grav3d
# ongrav3d.cpp:44-58 — 19 flops, d = s - t, r3 = m/(d2+sr^2)^1.5.
# The gravity driver hard-codes the RM denominator (no CoreFunc use).

def _grav3d_pairwise(tx, tr, sx, sr, ss, core="rm"):
    d = sx[None, :, :] - tx[:, None, :]          # (T,S,3)
    d2 = jnp.sum(d * d, axis=-1)
    r2 = d2 + (sr * sr)[None, :]
    r3 = ss[None, :, 0] * lax.rsqrt(r2) ** 3
    return r3[:, :, None] * d


def _grav3d_tile(tx, tr, sx, sr, ss, core="rm",
                 accum_dtype=jnp.float32, d2_mode="exact"):
    tx, sx, sr, ss = _pm(accum_dtype, tx, sx, sr, ss)
    d2 = dist2(tx, sx, d2_mode)
    r2 = d2 + (sr * sr)[None, :]
    rinv = lax.rsqrt(r2)
    w = ss[None, :, 0] * rinv * rinv * rinv      # (T,S)
    feats = jnp.concatenate(
        [sx, jnp.ones((sx.shape[0], 1), sx.dtype)], axis=1)  # (S,4)
    o = _dot(w, feats, accum_dtype)              # (T,4)
    return o[:, :3] - o[:, 3:4] * tx.astype(accum_dtype)


# ------------------------------------------------------------------ vort2d
# onvort2d.cpp:44-57 — d = t - s; w = ss*cf(d2, sr, tr);
# u -= w*dy ; v += w*dx.

def _vort2d_pairwise(tx, tr, sx, sr, ss, core="rm"):
    d = tx[:, None, :] - sx[None, :, :]
    d2 = jnp.sum(d * d, axis=-1)
    c = cf.core_2d(core)(d2, sr[None, :], tr[:, None])
    w = ss[None, :, 0] * c
    u = -w * d[:, :, 1]
    v = w * d[:, :, 0]
    return jnp.stack([u, v], axis=-1)


def _vort2d_tile(tx, tr, sx, sr, ss, core="rm",
                 accum_dtype=jnp.float32, d2_mode="exact"):
    tx, tr, sx, sr, ss = _pm(accum_dtype, tx, tr, sx, sr, ss)
    d2 = dist2(tx, sx, d2_mode)
    c = cf.core_2d(core)(d2, sr[None, :], tr[:, None])
    w = ss[None, :, 0] * c                       # (T,S)
    feats = jnp.concatenate(
        [sx, jnp.ones((sx.shape[0], 1), sx.dtype)], axis=1)  # [sx, sy, 1]
    o = _dot(w, feats, accum_dtype)              # (T,3)
    txa = tx.astype(accum_dtype)
    u = o[:, 1] - o[:, 2] * txa[:, 1]
    v = o[:, 2] * txa[:, 0] - o[:, 0]
    return jnp.stack([u, v], axis=-1)


# ------------------------------------------------------------------ vort3d
# onvort3d.cpp:44-62 — d = s - t; u += cf * (omega x d).

def _vort3d_pairwise(tx, tr, sx, sr, ss, core="rm"):
    d = sx[None, :, :] - tx[:, None, :]
    d2 = jnp.sum(d * d, axis=-1)
    c = cf.core_3d(core)(d2, sr[None, :])
    w = jnp.broadcast_to(ss[None, :, :], d.shape)
    return c[:, :, None] * _cross(w, d)


def _vort3d_tile(tx, tr, sx, sr, ss, core="rm",
                 accum_dtype=jnp.float32, d2_mode="exact"):
    tx, sx, sr, ss = _pm(accum_dtype, tx, sx, sr, ss)
    d2 = dist2(tx, sx, d2_mode)
    c = cf.core_3d(core)(d2, sr[None, :])        # (T,S)
    # center on the target tile mean: every pair term depends only on
    # d = s - t, so e may be built from s' = s - cc. The absolute form
    # e = w x s carries domain-scale magnitude whose recombination
    # cancels to the interaction scale — an fp32 floor ~1e-7*|s|/d.
    cc = jnp.mean(tx, axis=0)
    e = _cross(ss, sx - cc[None, :])             # omega_j x s'_j, (S,3)
    feats = jnp.concatenate([e, ss], axis=1)     # (S,6)
    o = _dot(c, feats, accum_dtype)              # (T,6)
    txa = tx.astype(accum_dtype) - cc[None, :]
    # omega x d = omega x s' - omega x t'  =>  u = C@e - (C@omega) x t'
    return o[:, :3] - _cross(o[:, 3:6], txa)


# -------------------------------------------------------------- vortgrad3d
# onvortgrad3d.cpp:45-79 — d = t - s; u += r3*(omega x d);
# grads A_ab = sum_j bbb*(omega x d)_a d_b + r3 epsilon terms.
# Output layout: [u,v,w, du/dx,dv/dx,dw/dx, du/dy,.., du/dz,..] i.e.
# out[3 + 3*b + a] = A[a, b].

def _vortgrad3d_pairwise(tx, tr, sx, sr, ss, core="rm"):
    d = tx[:, None, :] - sx[None, :, :]          # (T,S,3)
    d2 = jnp.sum(d * d, axis=-1)
    r3, bbb = cf.core_3d_grads(core)(d2, sr[None, :])
    w = jnp.broadcast_to(ss[None, :, :], d.shape)
    oxd = _cross(w, d)                           # (T,S,3)
    vel = r3[:, :, None] * oxd
    # A[a,b] = bbb * oxd_a * d_b
    A = bbb[:, :, None, None] * oxd[:, :, :, None] * d[:, :, None, :]
    # epsilon terms: out[a,b] += eps_bac * r3 * omega_c   (see ref :62-75)
    # tvx += ssz*r3 -> A[1,0]+=r3*wz ; twx -= ssy*r3 -> A[2,0]-=r3*wy
    # tuy -= ssz*r3 ; twy += ssx*r3 ; tuz += ssy*r3 ; tvz -= ssx*r3
    rw = r3[:, :, None] * ss[None, :, :]         # (T,S,3)
    A = A.at[:, :, 1, 0].add(rw[:, :, 2])
    A = A.at[:, :, 2, 0].add(-rw[:, :, 1])
    A = A.at[:, :, 0, 1].add(-rw[:, :, 2])
    A = A.at[:, :, 2, 1].add(rw[:, :, 0])
    A = A.at[:, :, 0, 2].add(rw[:, :, 1])
    A = A.at[:, :, 1, 2].add(-rw[:, :, 0])
    T, S = d2.shape
    grads = jnp.transpose(A, (0, 1, 3, 2)).reshape(T, S, 9)
    return jnp.concatenate([vel, grads], axis=-1)


def _vortgrad3d_tile(tx, tr, sx, sr, ss, core="rm",
                     accum_dtype=jnp.float32, d2_mode="exact"):
    tx, sx, sr, ss = _pm(accum_dtype, tx, sx, sr, ss)
    d2 = dist2(tx, sx, d2_mode)
    r3, bbb = cf.core_3d_grads(core)(d2, sr[None, :])
    # center every position on the target tile mean: each pair term
    # depends only on d = s - t, so the factored moments may be built
    # from (s - c, t - c) — absolute second moments w(x)s / e(x)s carry
    # domain-scale magnitudes whose recombination cancels to the
    # interaction scale, an fp32 floor measured at ~9e-4 rel-RMS on the
    # gradient components (theta-independent); centered moments leave
    # truncation relative to the local scale (~4e-5, docs/PERF.md)
    c = jnp.mean(tx, axis=0)
    sxc = sx - c[None, :]
    e = _cross(ss, sxc)                          # (S,3)
    # R-features: [omega, e] ; B-features: [omega, e, omega(x)s, e(x)s]
    outer_ws = (ss[:, :, None] * sxc[:, None, :]).reshape(-1, 9)
    outer_es = (e[:, :, None] * sxc[:, None, :]).reshape(-1, 9)
    featsR = jnp.concatenate([ss, e], axis=1)            # (S,6)
    featsB = jnp.concatenate([ss, e, outer_ws, outer_es], axis=1)  # (S,24)
    oR = _dot(r3, featsR, accum_dtype)           # (T,6)
    oB = _dot(bbb, featsB, accum_dtype)          # (T,24)
    txa = tx.astype(accum_dtype) - c[None, :]

    G, He = oR[:, 0:3], oR[:, 3:6]
    vel = _cross(G, txa) - He                    # u = (R@w) x t - R@e

    P, Rv = oB[:, 0:3], oB[:, 3:6]
    Q = oB[:, 6:15].reshape(-1, 3, 3)            # Q[i,c,b] = sum B w_c s_b
    Sm = oB[:, 15:24].reshape(-1, 3, 3)          # Sm[i,a,b] = sum B e_a s_b
    # T1: (P x t)_a t_b ; T2: -(Q[:,b] x t)_a ; T3: -Rv_a t_b ; T4: +Sm
    Pt = _cross(P, txa)
    T1 = Pt[:, :, None] * txa[:, None, :]
    Qcols = jnp.transpose(Q, (0, 2, 1))          # (T, b, c)
    T2 = -jnp.transpose(_cross(Qcols, txa[:, None, :]), (0, 2, 1))
    T3 = -Rv[:, :, None] * txa[:, None, :]
    A = T1 + T2 + T3 + Sm
    A = A.at[:, 1, 0].add(G[:, 2])
    A = A.at[:, 2, 0].add(-G[:, 1])
    A = A.at[:, 0, 1].add(-G[:, 2])
    A = A.at[:, 2, 1].add(G[:, 0])
    A = A.at[:, 0, 2].add(G[:, 1])
    A = A.at[:, 1, 2].add(-G[:, 0])
    grads = jnp.transpose(A, (0, 2, 1)).reshape(-1, 9)
    return jnp.concatenate([vel, grads], axis=-1)


# ---------------------------------------------------- feature-major forms
#
# Pallas-friendly layout: source blocks are stored feature-major (C, B) so
# per-dim coordinate rows broadcast along lanes with no transposes and no
# (B, B, PD) 3D intermediates in VMEM. Feature rows (omega x s, outer
# products) are precomputed once per block by `featurize`, moving that
# work out of the per-pair hot loop.

FM_ROWS = {  # used rows of the feature-major source block, per kernel
    "grav3d": 5,        # x, y, z, sr2, m (pad8 adds m*x, m*y, m*z)
    "vort2d": 4,        # x, y, sr, ss (pad8 adds ss*x, ss*y)
    "vort3d": 7,        # x, y, z, r, w(3) — e built in-kernel, centered
    "vortgrad3d": 7,    # x(3), r, w(3) — all moments built in-kernel
}


def featurize(name: str, pos, rad, s, pad8: bool = True):
    """Build the (C, B) feature-major block from point-major arrays.

    pos (B, PD), rad (B,), s (B, SD) -> (C, B) with C padded to a
    multiple of 8 when pad8 (Mosaic requires DMA sublane slices aligned
    to the f32 tile; the pregather fetch pads per chunk instead, so
    lean storage can keep the raw row count — 5 vs 8 for grav3d is
    3.2 GB of HBM at N=1e8). Works batched via vmap at the call site.
    """
    if name == "grav3d":
        # rows: x, y, z, sr^2, m (+ m*x, m*y, m*z when padding to 8):
        # the gravity kernel is fixed RM-form (ongrav3d.cpp:44-60), so
        # sr^2 replaces a per-pair multiply, and the dma fetch pads to
        # 8 rows anyway — the spare rows carry mass-premultiplied
        # positions, folding the per-pair mass multiply into the MXU
        # contraction (see _grav3d_tile_fm)
        base = [pos.T, (rad * rad)[None, :], s.T]
        if pad8:
            base.append((s * pos).T)
        out = jnp.concatenate(base, axis=0)
    elif name == "vort2d":
        # rows: x, y, sr, ss (+ ss*x, ss*y when padding to 8): sr stays
        # raw (the exp core needs it); the spare pad rows fold the
        # per-pair strength multiply into the MXU contraction
        base = [pos.T, rad[None, :], s.T]
        if pad8:
            base.append((s * pos).T)
        out = jnp.concatenate(base, axis=0)
    elif name in ("vort3d", "vortgrad3d"):
        # lean 7 rows: the cross/outer moment rows are built in-kernel
        # from tile-centered positions (see _vort3d_tile_fm — storing
        # them absolute was an fp32 cancellation floor and, for
        # vortgrad3d, 4x the fetch volume)
        out = jnp.concatenate([pos.T, rad[None, :], s.T], axis=0)
    else:
        raise KeyError(name)
    pad = -out.shape[0] % 8
    if pad and pad8:
        out = jnp.pad(out, ((0, pad), (0, 0)))
    return out


def featurize_flat(name: str, pos, rad, s):
    """Lean feature rows flattened to ONE (C*B,) vector per block.

    A (NN, C, B) array with C not a multiple of 8 tiles on TPU with the
    sublane dim padded to 8 — grav3d's lean C=5 occupies 1.6x its bytes
    (8 GB instead of 5 GB at N=1e8), and XLA was additionally observed
    to re-copy the padded operand inside the chunked program. The flat
    (NN, C*B) layout tiles exactly; the pregather fetch reshapes each
    chunk back to (C, B) blocks after the row gather."""
    if name == "grav3d":
        rows = [pos.T, (rad * rad)[None, :], s.T]
    elif name == "vort2d":
        rows = [pos.T, rad[None, :], s.T]
    elif name in ("vort3d", "vortgrad3d"):
        rows = [pos.T, rad[None, :], s.T]   # moments built in-kernel
    else:
        raise KeyError(name)
    return jnp.concatenate([r.reshape(-1) for r in rows])


def pad_fm_rows(name: str, blocks):
    """Pad lean feature-major blocks (..., C, B) to the f32 sublane tile
    (8 rows), filling the kernel-defined DERIVED rows — not zeros —
    where the padded layout carries folded products (featurize: grav3d
    rows 5-7 = m*pos, vort2d rows 4-5 = ss*pos). The tile kernels
    dispatch on the row count (>= 8 rows selects the folded path), so a
    zero-padded lean block would silently contract zeros."""
    c = blocks.shape[-2]
    c8 = -(-c // 8) * 8
    if c8 == c:
        return blocks
    shp = blocks.shape[:-2]
    if name == "grav3d" and c == 5:
        extra = blocks[..., 4:5, :] * blocks[..., 0:3, :]
    elif name == "vort2d" and c == 4:
        sspos = blocks[..., 3:4, :] * blocks[..., 0:2, :]
        zeros = jnp.zeros(shp + (2, blocks.shape[-1]), blocks.dtype)
        extra = jnp.concatenate([sspos, zeros], axis=-2)
    else:
        extra = jnp.zeros(shp + (c8 - c, blocks.shape[-1]), blocks.dtype)
    return jnp.concatenate([blocks, extra], axis=-2)


def _d2_fm(tpos, srcT, pd, mode: str = "outer"):
    """(B_t, B_s) squared distances from a feature-major source block.

    'outer'  — per-dim lane/sublane broadcast (pure VPU, exact).
    'center' — tile-centered Gram: |t'|^2 - 2 t'.s' + |s'|^2 with the
               rank-pd contraction on the MXU; centering on the target
               tile mean bounds fp32 cancellation by the tile extent,
               which for near tiles is the particle spacing scale.
    """
    if mode == "outer":
        d2 = None
        for d in range(pd):
            diff = tpos[:, d:d + 1] - srcT[d:d + 1, :]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        return d2
    c = jnp.mean(tpos, axis=0)                        # (pd,)
    t = tpos - c                                      # (B, pd)
    s = srcT[:pd, :] - c[:, None]                     # (pd, GB)
    g = lax.dot_general(t, s, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=t.dtype,
                        precision=lax.Precision.HIGHEST)
    t2 = jnp.sum(t * t, axis=1, keepdims=True)        # (B, 1)
    s2 = jnp.sum(s * s, axis=0, keepdims=True)        # (1, GB)
    return jnp.maximum(t2 - 2.0 * g + s2, 0.0)


def _split_bf16(a):
    """Split f32 into a hi+lo bf16 pair (hi carries the top 8 mantissa
    bits, lo the next 8): a ~= hi + lo to ~2^-16 relative."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split3_bf16(a):
    """3-way bf16 split (8+8+8 mantissa bits — the full f32 mantissa):
    a ~= hi + mid + lo to ~2^-24 relative."""
    hi = a.astype(jnp.bfloat16)
    r = a - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dotg_fm(w, rows, accum_dtype, precision: str = "highest"):
    """(B_t, B_s) x (F, B_s) -> (B_t, F), contracting the source axis.

    The F outputs lane-pad to 128 on the MXU, so pass count — not FLOPs
    — is the cost (measured ~0.4s/pass at N=1e7: 'highest' spends ~2.5s
    of an 8.3s solve in this contraction). Mosaic supports only
    HIGHEST/DEFAULT dot precisions, so the intermediate tiers are built
    manually from bf16-split operands:

      'highest' — true f32 (6 bf16 passes).
      '3x'      — split both operands, drop lo*lo: 3 passes, ~2^-16
                  relative — below the fp32 per-pair chain floor.
      'w2x'     — split only the weight matrix, rows in one bf16 pass:
                  2 passes; rows (tile-CENTERED coordinates, see the
                  kernel call sites) carry ~2^-8 of the LOCAL tile
                  scale, averaging down over the source lanes.
      'default' — one bf16 pass (measured 9e-3 rel-RMS at 1e7: too
                  coarse for the 1e-4 envelope; kept for experiments).
      '3xt'/'defaultt' — same arithmetic, output-TRANSPOSED dots:
                  out.T (F, B_t) puts the small dim on SUBLANES (F <= 8
                  = one sublane tile) with a full 128-lane output,
                  instead of lane-padding F to 128. If MXU cost streams
                  the M rows, a pass costs F/128 of the lane-padded
                  form; the (F, B_t) -> (B_t, F) result transpose is a
                  small fixed cost. Measured by scripts/exp_r2t.py.
    """
    def dot(a, b, prec):
        return lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=accum_dtype, precision=prec)

    if precision == "highest":
        return dot(w, rows, lax.Precision.HIGHEST)
    if precision == "default":
        return dot(w, rows, lax.Precision.DEFAULT)
    if precision == "defaultt":
        return dot(rows, w, lax.Precision.DEFAULT).T
    d = lax.Precision.DEFAULT
    if precision == "3xt":
        wh, wl = _split_bf16(w)
        rh, rl = _split_bf16(rows)
        f = rows.shape[0]
        o = dot(jnp.concatenate([rh, rl], axis=0), wh, d)  # (2F, B_t)
        return (o[:f] + o[f:] + dot(rh, wl, d)).T
    if precision == "6xt":
        # full-f32-mantissa tier at transposed-streaming cost: 3-way
        # splits, the 6 significant product terms (hh, mh, lh, hm, mm,
        # hl — XLA's own HIGHEST algorithm) fused into 3 dispatches of
        # 3F/2F/F streamed rows. Per-element accuracy ~2^-24 relative —
        # needed where the contraction CANCELS across sources and the
        # 3x tiers' 2^-16 per-element noise survives the cancellation
        # un-reduced (vortgrad3d gradients: 1.3e-3 at 3xt vs 6e-5 at
        # full f32, N=2e4 DTT).
        wh, wm, wl = _split3_bf16(w)
        rh, rm, rl = _split3_bf16(rows)
        f = rows.shape[0]
        o1 = dot(jnp.concatenate([rh, rm, rl], axis=0), wh, d)  # (3F, .)
        o2 = dot(jnp.concatenate([rh, rm], axis=0), wm, d)      # (2F, .)
        o3 = dot(rh, wl, d)                                     # (F, .)
        return (o1[:f] + o1[f:2 * f] + o1[2 * f:]
                + o2[:f] + o2[f:] + o3).T
    wh, wl = _split_bf16(w)
    if precision == "w2x":
        rb = rows.astype(jnp.bfloat16)
        return dot(wh, rb, d) + dot(wl, rb, d)
    if precision == "3x":
        rh, rl = _split_bf16(rows)
        # wh*(rh|rl) in ONE pass: the two terms share the LHS, and 2F
        # still lane-pads to the same single 128-wide MXU tile, so the
        # fused pass costs exactly one — 2 passes total instead of 3
        f = rows.shape[0]
        o = dot(wh, jnp.concatenate([rh, rl], axis=0), d)
        return o[:, :f] + o[:, f:] + dot(wl, rh, d)
    raise ValueError(f"unknown mxu_precision {precision!r}")


def _grav3d_tile_fm(tpos, trad, srcT, core="rm",
                    accum_dtype=jnp.float32, d2_mode="outer",
                    precision: str = "highest"):
    tpos, srcT = _pm(accum_dtype, tpos, srcT)
    d2 = _d2_fm(tpos, srcT, 3, d2_mode)
    sr2 = srcT[3:4, :]                       # featurize stores sr^2
    rinv = lax.rsqrt(d2 + sr2)
    txa = tpos.astype(accum_dtype)
    if srcT.shape[0] >= 8:
        # mass-premultiplied rows (featurize pad8 layout): the per-pair
        # mass multiply rides the MXU contraction, and the m-row serves
        # as the row-sum column — w is the bare rinv^3 kernel
        w = rinv * rinv * rinv
        mrows = srcT[5:8, :]
        mrow = srcT[4:5, :]
        if precision != "highest":
            # center coords on the target tile mean: sum_j w*m*(x_j - c)
            # and (x_i - c) have interaction-scale magnitude, so the
            # bf16 pass truncation stays relative to the local scale
            # rather than the domain scale
            c = jnp.mean(txa, axis=0)
            mrows = mrows - c[:, None] * mrow
            txa = txa - c[None, :]
        rows4 = jnp.concatenate([mrows, mrow], axis=0)
        o4 = _dotg_fm(w, rows4, accum_dtype, precision)  # (B, 4)
        return o4[:, :3] - o4[:, 3:4] * txa
    # lean 5-row layout (pregather storage): mass multiplies on the VPU
    m = srcT[4:5, :]
    w = m * rinv * rinv * rinv
    xs = srcT[0:3, :]
    if precision != "highest":
        c = jnp.mean(txa, axis=0)
        xs = xs - c[:, None]
        txa = txa - c[None, :]
    # ones-row folds the w row-sum into the contraction (F=4 still
    # lane-pads to one 128-wide MXU tile)
    rows4 = jnp.concatenate([xs, jnp.ones_like(xs[:1])], axis=0)
    o4 = _dotg_fm(w, rows4, accum_dtype, precision)  # (B, 4)
    return o4[:, : 3] - o4[:, 3:4] * txa


def _vort2d_tile_fm(tpos, trad, srcT, core="rm",
                    accum_dtype=jnp.float32, d2_mode="outer",
                    precision: str = "highest"):
    tpos, trad, srcT = _pm(accum_dtype, tpos, trad, srcT)
    d2 = _d2_fm(tpos, srcT, 2, d2_mode)
    sr = srcT[2:3, :]
    c = cf.core_2d(core)(d2, sr, trad[:, None])
    txa = tpos.astype(accum_dtype)
    if srcT.shape[0] >= 6:
        # strength-premultiplied rows (featurize pad8 layout): the
        # per-pair ss multiply rides the MXU; the ss-row is the row-sum
        w = c
        srow = srcT[3:4, :]
        srows = srcT[4:6, :]
        if precision != "highest":
            cc = jnp.mean(txa, axis=0)      # see _grav3d_tile_fm
            srows = srows - cc[:, None] * srow
            txa = txa - cc[None, :]
        rows3 = jnp.concatenate([srows, srow], axis=0)
    else:
        ss = srcT[3:4, :]
        w = ss * c
        xs = srcT[0:2, :]
        if precision != "highest":
            cc = jnp.mean(txa, axis=0)
            xs = xs - cc[:, None]
            txa = txa - cc[None, :]
        # ones-row folds the w row-sum into the MXU contraction (see
        # _grav3d_tile_fm)
        rows3 = jnp.concatenate([xs, jnp.ones_like(xs[:1])], axis=0)
    o3 = _dotg_fm(w, rows3, accum_dtype, precision)  # (B, 3)
    o1 = o3[:, 2]
    u = o3[:, 1] - o1 * txa[:, 1]
    v = o1 * txa[:, 0] - o3[:, 0]
    return jnp.stack([u, v], axis=-1)


def _vort3d_tile_fm(tpos, trad, srcT, core="rm",
                    accum_dtype=jnp.float32, d2_mode="outer",
                    precision: str = "highest"):
    # Lean 7-row layout [x(3), r, w(3)]: the e = w x s feature is built
    # IN-KERNEL from tile-centered positions s' = s - cc instead of
    # being stored absolute. Storing e at domain scale bakes an fp32
    # cancellation floor of ~1e-7*|s|/d into every recombination (d =
    # pair separation — ~1e-5 rel at leaf scale), and its 10-row layout
    # cost 25% more fetch volume. The cross uses constant-permutation
    # matmuls (_cross_rows) — the only formulation of the cyclic shifts
    # Mosaic reliably lays out (row slice/stack forms hit
    # 'offset mismatch' tpu.concatenate, slice+newaxis of 1D traces as
    # an unsupported 1D gather).
    tpos, srcT = _pm(accum_dtype, tpos, srcT)
    d2 = _d2_fm(tpos, srcT, 3, d2_mode)
    sr = srcT[3:4, :]
    c = cf.core_3d(core)(d2, sr)
    txa = tpos.astype(accum_dtype)
    cc = jnp.mean(txa, axis=0)                       # (3,)
    w3 = srcT[4:7, :]
    xc = srcT[0:3, :] - cc[:, None]                  # s' rows (3, B)
    e3 = _cross_rows(w3, xc)                         # w x s' rows
    rows = jnp.concatenate([w3, e3], axis=0)         # (6, B)
    txa = txa - cc[None, :]
    o = _dotg_fm(c, rows, accum_dtype, precision)    # (B, 6): C@w, C@e
    # vel = C@e' - (C@w) x t'
    return o[:, 3:6] - _cross_lanes(o[:, 0:3], txa)


def _vortgrad_combine(oR, oB, txa):
    """Per-target recombination shared by both vortgrad tile forms.

    oR (B, 6): [R@w, R@e]; oB (B, 24): [B@w, B@e, B@(w(x)s), B@(e(x)s)].
    """
    G, He = oR[:, 0:3], oR[:, 3:6]
    vel = _cross(G, txa) - He
    P, Rv = oB[:, 0:3], oB[:, 3:6]
    Q = oB[:, 6:15].reshape(-1, 3, 3)
    Sm = oB[:, 15:24].reshape(-1, 3, 3)
    Pt = _cross(P, txa)
    T1 = Pt[:, :, None] * txa[:, None, :]
    Qcols = jnp.transpose(Q, (0, 2, 1))
    T2 = -jnp.transpose(_cross(Qcols, txa[:, None, :]), (0, 2, 1))
    T3 = -Rv[:, :, None] * txa[:, None, :]
    A = T1 + T2 + T3 + Sm
    A = A.at[:, 1, 0].add(G[:, 2])
    A = A.at[:, 2, 0].add(-G[:, 1])
    A = A.at[:, 0, 1].add(-G[:, 2])
    A = A.at[:, 2, 1].add(G[:, 0])
    A = A.at[:, 0, 2].add(G[:, 1])
    A = A.at[:, 1, 2].add(-G[:, 0])
    grads = jnp.transpose(A, (0, 2, 1)).reshape(-1, 9)
    return jnp.concatenate([vel, grads], axis=-1)


def _vortgrad_combine_2d(oR, oB, txa):
    """_vortgrad_combine re-expressed in pure rank-2 ops for the Pallas
    TPU path: Mosaic cannot lower the (B, 3, 3) scatter-adds /
    transposes of the point-major form (KernelType.TC scatter-add is
    unimplemented), so the 3x3 tensor A is carried as three (B, 3) row
    arrays and the output columns are assembled by lane concatenation.
    Same arithmetic as _vortgrad_combine (validated against it in
    tests/test_kernels.py)."""
    G, He = oR[:, 0:3], oR[:, 3:6]
    tx0, tx1, tx2 = txa[:, 0:1], txa[:, 1:2], txa[:, 2:3]
    g0, g1, g2 = G[:, 0:1], G[:, 1:2], G[:, 2:3]
    vel = jnp.concatenate([g1 * tx2 - g2 * tx1,
                           g2 * tx0 - g0 * tx2,
                           g0 * tx1 - g1 * tx0], axis=-1) - He
    P, Rv = oB[:, 0:3], oB[:, 3:6]
    p0, p1, p2 = P[:, 0:1], P[:, 1:2], P[:, 2:3]
    # Pt = P x t, then T1 - T3 = (Pt - Rv) outer t, built row-wise
    pt = jnp.concatenate([p1 * tx2 - p2 * tx1,
                          p2 * tx0 - p0 * tx2,
                          p0 * tx1 - p1 * tx0], axis=-1) - Rv
    # T2 rows: T2[b,i,:] = eps_{iml} t_m Q[b,l,:] — a cross of t with
    # the ROWS of Q (each row is a contiguous (B, 3) lane slice of oB)
    q0, q1, q2 = oB[:, 6:9], oB[:, 9:12], oB[:, 12:15]
    a0 = pt[:, 0:1] * txa + (tx1 * q2 - tx2 * q1) + oB[:, 15:18]
    a1 = pt[:, 1:2] * txa + (tx2 * q0 - tx0 * q2) + oB[:, 18:21]
    a2 = pt[:, 2:3] * txa + (tx0 * q1 - tx1 * q0) + oB[:, 21:24]
    # antisymmetric velocity-curl part: A[i,j] += -eps_{ijk} G_k;
    # output layout matches transpose(A,(0,2,1)).reshape(-1,9):
    # grads[:, 3j+i] = A[:, i, j] (columns of A, stacked)
    grads = jnp.concatenate([
        a0[:, 0:1],      a1[:, 0:1] + g2, a2[:, 0:1] - g1,
        a0[:, 1:2] - g2, a1[:, 1:2],      a2[:, 1:2] + g0,
        a0[:, 2:3] + g1, a1[:, 2:3] - g0, a2[:, 2:3]], axis=-1)
    return jnp.concatenate([vel, grads], axis=-1)


def _expand9(dtype):
    """Expansion matrices for (9, B) outer-product rows, inline-iota
    generated (see _perm3): (k1 @ v3)[3i+j] = v_i (components repeated
    over 3-row chunks), (k2 @ u3)[3i+j] = u_j (the vector tiled 3x).
    Their elementwise product is the row-major flattened v (x) u."""
    r = lax.broadcasted_iota(jnp.int32, (9, 3), 0)
    c = lax.broadcasted_iota(jnp.int32, (9, 3), 1)
    return (c == r // 3).astype(dtype), (c == r % 3).astype(dtype)


def _vortgrad3d_tile_fm(tpos, trad, srcT, core="rm",
                        accum_dtype=jnp.float32, d2_mode="outer",
                        precision: str = "highest"):
    # Lean 7-row layout [x(3), r, w(3)]: ALL moment rows — e' = w x s',
    # (w (x) s'), (e' (x) s') with s' = s - cc centered on the target
    # tile mean — are built in-kernel via constant-permutation matmuls
    # (_cross_rows / _K1 / _K2; Mosaic-safe, see _vort3d_tile_fm).
    # Storing the absolute 28-row moments was both 3.5x the fetch
    # volume and an fp32 accuracy wall: es = (w x s)(x)s carries
    # |s|^2-scale magnitudes, so its recombination at pair separation d
    # leaves ~1e-7*(|s|/d)^2 relative error — measured 3.9e-4 at
    # N=3e4 (leaf extent 0.03) growing to 1.2e-2 at N=1e7, swamping
    # the 1e-4 envelope. In-kernel centered features restore the
    # grav-class floor. With locally-scaled rows the reduced
    # mxu_precision tiers are valid here too, so `precision` is wired
    # through (the 24-row oB contraction dominates the pass count).
    tpos, srcT = _pm(accum_dtype, tpos, srcT)
    d2 = _d2_fm(tpos, srcT, 3, d2_mode)
    sr = srcT[3:4, :]
    r3, bbb = cf.core_3d_grads(core)(d2, sr)
    txa = tpos.astype(accum_dtype)
    cc = jnp.mean(txa, axis=0)                       # (3,)
    w3 = srcT[4:7, :]
    xc = srcT[0:3, :] - cc[:, None]                  # s' rows (3, B)
    e3 = _cross_rows(w3, xc)                         # e' = w x s'
    k1, k2 = _expand9(xc.dtype)
    x9 = _mdot(k2, xc)                               # (9, B): s'_j rows
    ws9 = _mdot(k1, w3) * x9                         # (w (x) s') rows
    es9 = _mdot(k1, e3) * x9                         # (e' (x) s') rows
    rows_r = jnp.concatenate([w3, e3], axis=0)           # (6, B)
    rows_b = jnp.concatenate([w3, e3, ws9, es9], axis=0)  # (24, B)
    # the gradient (oB) contraction cancels across sources, so the 3x
    # tiers' 2^-16 per-element split noise survives un-averaged
    # (1.3e-3 vs 6e-5 rel at N=2e4); clamp reduced tiers to the
    # full-mantissa 6xt there. oR feeds the velocity (near-positive
    # sums) and the antisymmetric grad terms — reduced tiers hold.
    prec_b = ("highest" if precision == "highest" else "6xt")
    oR = _dotg_fm(r3, rows_r, accum_dtype, precision)
    oB = _dotg_fm(bbb, rows_b, accum_dtype, prec_b)
    return _vortgrad_combine_2d(oR, oB, txa - cc[None, :])


TILE_FM = {
    "grav3d": _grav3d_tile_fm,
    "vort2d": _vort2d_tile_fm,
    "vort3d": _vort3d_tile_fm,
    "vortgrad3d": _vortgrad3d_tile_fm,
}


# ----------------------------------------------------------------- registry

KERNELS = {
    "grav3d": Kernel(
        name="grav3d", pd=3, sd=1, od=3, uses_tr=False,
        pairwise=_grav3d_pairwise, tile=_grav3d_tile,
        flops_fn=lambda core: 19),
    "vort2d": Kernel(
        name="vort2d", pd=2, sd=1, od=2, uses_tr=True,
        pairwise=_vort2d_pairwise, tile=_vort2d_tile,
        flops_fn=lambda core: 10 + cf.FLOPS[(core, "2d_tr")]),
    "vort3d": Kernel(
        name="vort3d", pd=3, sd=3, od=3, uses_tr=False,
        pairwise=_vort3d_pairwise, tile=_vort3d_tile,
        flops_fn=lambda core: 23 + cf.FLOPS[(core, "3d")]),
    "vortgrad3d": Kernel(
        name="vortgrad3d", pd=3, sd=3, od=12, uses_tr=False,
        pairwise=_vortgrad3d_pairwise, tile=_vortgrad3d_tile,
        flops_fn=lambda core: 56 + cf.FLOPS[(core, "3d_grads")]),
}


def get_kernel(name: str) -> Kernel:
    return KERNELS[name]
