"""Direct O(N^2) summation.

Equivalent of the reference's `nbody_naive` (barneshut.hpp:47-53) and the
`external_vel_direct_*` C-ABI twins (interface2dvort.cpp:324-374). Two
forms:

* ``direct_oracle`` — fp64 pairwise broadcast, chunked over targets; the
  accuracy oracle every fast method is validated against (the reference's
  de-facto test suite, SURVEY.md §4).
* ``direct`` — tiled tile-form evaluation in storage/accum precision,
  streaming source chunks through a lax.scan so memory stays bounded and
  XLA can overlap; this is the production direct path (a Pallas variant
  lives in ops/pallas_direct.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from onbody_tpu.ops.kernels import Kernel
from onbody_tpu.parts import Parts


def _target_radii(kernel: Kernel, targs: Parts, dtype):
    if kernel.uses_tr:
        return targs.r.astype(dtype)
    return jnp.zeros_like(targs.r, dtype=dtype)


def direct_oracle(kernel: Kernel, srcs: Parts, targs: Parts,
                  core: str = "rm", tskip: int = 1,
                  chunk: int = 256) -> jax.Array:
    """fp64 direct sum over every tskip-th target. Returns (ceil(M/tskip), OD).

    Mirrors the ntskip subsampling of the reference drivers
    (ongrav3d.cpp:556-568) so validation work stays bounded.
    """
    f64 = jax.config.jax_enable_x64
    dt = jnp.float64 if f64 else jnp.float32
    tx = targs.x[::tskip].astype(dt)
    tr = _target_radii(kernel, targs, dt)[::tskip]
    sx = srcs.x.astype(dt)
    sr = srcs.r.astype(dt)
    ss = srcs.s.astype(dt)

    m = tx.shape[0]
    npad = -m % chunk
    txp = jnp.pad(tx, ((0, npad), (0, 0)))
    trp = jnp.pad(tr, (0, npad))

    def one_chunk(args):
        cx, cr = args
        return jnp.sum(kernel.pairwise(cx, cr, sx, sr, ss, core), axis=1)

    out = jax.lax.map(one_chunk,
                      (txp.reshape(-1, chunk, tx.shape[1]),
                       trp.reshape(-1, chunk)))
    return out.reshape(-1, kernel.od)[:m]


@partial(jax.jit, static_argnames=("kernel", "core", "accum_dtype",
                                   "d2_mode", "tile_t", "tile_s", "form"))
def _direct_impl(kernel: Kernel, tx, tr, sx, sr, ss, core, accum_dtype,
                 d2_mode, tile_t, tile_s, form="tile"):
    nt = tx.shape[0]
    ns = sx.shape[0]
    tpad = -nt % tile_t
    spad = -ns % tile_s
    # pad sources with zero strength (inert), targets with clones
    sxp = jnp.pad(sx, ((0, spad), (0, 0)))
    srp = jnp.pad(sr, (0, spad), constant_values=1.0)
    ssp = jnp.pad(ss, ((0, spad), (0, 0)))
    txp = jnp.pad(tx, ((0, tpad), (0, 0)))
    trp = jnp.pad(tr, (0, tpad))

    s_chunks = (sxp.reshape(-1, tile_s, sx.shape[1]),
                srp.reshape(-1, tile_s),
                ssp.reshape(-1, tile_s, ss.shape[1]))

    def per_target_tile(args):
        ctx, ctr = args

        def add_chunk(acc, sch):
            cx, cr, cs = sch
            if form == "pairwise":
                out = jnp.sum(
                    kernel.pairwise(ctx.astype(accum_dtype),
                                    ctr.astype(accum_dtype),
                                    cx.astype(accum_dtype),
                                    cr.astype(accum_dtype),
                                    cs.astype(accum_dtype), core),
                    axis=1)
            else:
                out = kernel.tile(ctx, ctr, cx, cr, cs, core,
                                  accum_dtype, d2_mode)
            return acc + out, None

        init = jnp.zeros((tile_t, kernel.od), dtype=accum_dtype)
        acc, _ = jax.lax.scan(add_chunk, init, s_chunks)
        return acc

    out = jax.lax.map(per_target_tile,
                      (txp.reshape(-1, tile_t, tx.shape[1]),
                       trp.reshape(-1, tile_t)))
    return out.reshape(-1, kernel.od)[:nt]


def direct(kernel: Kernel, srcs: Parts, targs: Parts,
           core: str = "rm", accum_dtype=jnp.float32,
           d2_mode: str = "exact",
           tile_t: int = 1024, tile_s: int = 1024,
           form: str = "auto") -> jax.Array:
    """Tiled direct sum in production precision. Returns (M, OD).

    form: 'tile' (factored MXU form), 'pairwise' (per-pair exact d,
    VPU, O(tile_t*tile_s*OD) tile memory), or 'auto' — pairwise for
    the 3D vortex kernels. Their factored forms recombine |t'|- and
    |s'|-scale moments around the target-tile mean, but `direct`'s
    tiles are arbitrary (UNSORTED) particle subsets spanning the whole
    domain, so the centering is inert and f32 recombination leaves
    ~1e-7*(domain/d)^k error — measured 3.9e-4 on vortgrad3d gradients
    at N=3e4, i.e. a reference four times noisier than the 1e-4
    envelope it is supposed to validate. The per-pair form keeps the
    f32 reference at the ~1e-7-relative floor; grav3d/vort2d factored
    amplification is first-order only (~1e-5 worst case) and stays on
    the fast MXU path."""
    if form == "auto":
        form = "pairwise" if kernel.name in ("vort3d", "vortgrad3d") \
            else "tile"
    if form == "pairwise":
        # bound the (T, S, OD) tile buffer; the square shape also keeps
        # the XLA:CPU codegen of the broadcast cross products small —
        # the (256, 1024, 12) variant segfaulted LLVM deterministically
        # at the 37th compile of a long pytest session
        tile_t = min(tile_t, 256)
        tile_s = min(tile_s, 256)
    tr = _target_radii(kernel, targs, targs.x.dtype)
    return _direct_impl(kernel, targs.x, tr, srcs.x, srcs.r, srcs.s,
                        core, accum_dtype, d2_mode, tile_t, tile_s,
                        form)
