"""Pallas direct O(N^2) summation.

Production TPU path for the naive method (nbody_naive, barneshut.hpp:47-53)
and the external_vel_direct_* library twins: a (target_tile x source_chunk)
grid where each step evaluates one (TT, SC) all-pairs tile with the
feature-major kernel forms and accumulates into the target tile resident
in VMEM (output revisiting along the source axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onbody_tpu.ops.kernels import TILE_FM, Kernel, featurize

TILE_T = 256
CHUNK_S = 1024


def _body(tgt_ref, src_ref, out_ref, *, kernel_name, core, accum_dtype,
          pd):
    j = pl.program_id(1)
    t = tgt_ref[0]
    s = src_ref[0]
    tile = TILE_FM[kernel_name](t[:, :pd], t[:, pd], s, core, accum_dtype)

    @pl.when(j == 0)
    def _():
        out_ref[0] = tile

    @pl.when(j > 0)
    def _():
        out_ref[0] = out_ref[0] + tile


@functools.partial(jax.jit, static_argnames=("kernel", "core",
                                             "accum_dtype", "interpret"))
def direct_pallas(kernel: Kernel, tx, tr, sx, sr, ss, core="rm",
                  accum_dtype=jnp.float32, interpret: bool = False):
    """Direct sum via Pallas. tx (M, PD), tr (M,), sx (S, PD), sr (S,),
    ss (S, SD). Returns (M, OD)."""
    pd = kernel.pd
    m = tx.shape[0]
    n = sx.shape[0]
    mp = -m % TILE_T
    np_ = -n % CHUNK_S
    # pad targets by cloning (outputs sliced off), sources inertly
    txp = jnp.pad(tx, ((0, mp), (0, 0)), mode="edge")
    trp = jnp.pad(tr, (0, mp), mode="edge")
    sxp = jnp.pad(sx, ((0, np_), (0, 0)))
    srp = jnp.pad(sr, (0, np_), constant_values=1.0)
    ssp = jnp.pad(ss, ((0, np_), (0, 0)))

    tgt_geo = jnp.concatenate([txp, trp[:, None]], axis=1)
    tgt_geo = tgt_geo.reshape(-1, TILE_T, pd + 1)
    src_fm = jax.vmap(lambda p, r, s_: featurize(kernel.name, p, r, s_))(
        sxp.reshape(-1, CHUNK_S, pd), srp.reshape(-1, CHUNK_S),
        ssp.reshape(-1, CHUNK_S, ss.shape[1]))

    nt = tgt_geo.shape[0]
    ns = src_fm.shape[0]
    c = src_fm.shape[1]
    body = functools.partial(_body, kernel_name=kernel.name, core=core,
                             accum_dtype=accum_dtype, pd=pd)
    out = pl.pallas_call(
        body,
        grid=(nt, ns),
        in_specs=[
            pl.BlockSpec((1, TILE_T, pd + 1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, c, CHUNK_S), lambda i, j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, kernel.od),
                               lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nt, TILE_T, kernel.od),
                                       accum_dtype),
        cost_estimate=pl.CostEstimate(
            flops=nt * ns * TILE_T * CHUNK_S * kernel.flops_fn(core),
            bytes_accessed=(nt * TILE_T * (pd + 1) + ns * c * CHUNK_S
                            + nt * TILE_T * kernel.od) * 4,
            transcendentals=nt * ns * TILE_T * CHUNK_S),
        interpret=interpret,
    )(tgt_geo, src_fm)
    return out.reshape(-1, kernel.od)[:m]
