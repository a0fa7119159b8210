"""Pallas pair-list executor: the hot kernel of every fast method.

One grid step per (target_block, 8 source_blocks) group. Pair indices are
scalar-prefetched so BlockSpec index maps gather the right block rows;
groups are ordered by target row, so consecutive steps hitting the same
target keep the accumulator resident in VMEM (output revisiting) — the
Pallas analogue of the reference's per-leaf-block accumulation in
treecode3_block (barneshut.hpp:244-287).

Grouping G=8 source blocks per step turns the work item into a
(B, G*B) = (128, 1024) tile: the distance matrix is pure lane/sublane
broadcast on the VPU at full width, the far-field reduction is one
(B, G*B) x (F, G*B) MXU contraction, and per-grid-step fixed costs are
amortized 8x.

Layout: targets point-major (B, PD+1) [pos | radius]; sources
feature-major (C, B) with precomputed feature rows (ops/kernels.py
featurize). No transposes, no 3D intermediates.

Accumulation contract: the caller's zero-initialized out array is ALIASED
to the output; the kernel reads the previous contents of a target row at
the start of each run and accumulates. Rows with no pairs stay zero, and
the executor is safely chunkable — scalar-prefetch operands live in SMEM
(~1 MB), so long lists are split into SMEM-sized chunks threading the
same buffer (a run split across chunks resumes from the partial sum).

Padding groups are (tgt=0, src=0...): they accumulate garbage into row 0
only, which is never read. Inert src rows inside a real group contribute
exactly zero (row 0 has zero strengths and radius one).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onbody_tpu.ops.kernels import TILE_FM, FM_ROWS, Kernel, featurize

GROUP = 8
# scalar-prefetch budget: tgt (P,) + src (P, G) int32 in SMEM per call
CHUNK_GROUPS = 16384


def _body(pt_ref, ps_ref, tgt_ref, *rest, kernel_name: str, core: str,
          accum_dtype, pd: int, d2_mode: str):
    srcs = rest[:GROUP]
    prev_ref, out_ref = rest[GROUP], rest[GROUP + 1]
    p = pl.program_id(0)

    # padding-tail steps (tgt row 0) skip all compute; their block DMAs
    # hit the cached row-0 blocks, so a generous static cap costs almost
    # nothing per skipped step (no host sync needed to size the list)
    @pl.when(pt_ref[p] != 0)
    def _():
        t = tgt_ref[0]                                   # (B, PD+1)
        s = jnp.concatenate([r[0] for r in srcs], axis=1)  # (C, G*B)
        tile = TILE_FM[kernel_name](t[:, :pd], t[:, pd], s, core,
                                    accum_dtype, d2_mode)
        prev_t = pt_ref[jnp.maximum(p - 1, 0)]
        first = jnp.logical_or(p == 0, prev_t != pt_ref[p])
        out_ref[0] = jnp.where(first, prev_ref[0], out_ref[0]) + tile


@functools.partial(
    jax.jit, static_argnames=("kernel", "core", "accum_dtype", "interpret",
                              "d2_mode"))
def _exec_chunk(kernel: Kernel, tgt_geo, src_fm, pair_t, pair_s, out,
                core: str, accum_dtype, interpret: bool,
                d2_mode: str = "outer"):
    nn_t, b, _ = tgt_geo.shape
    c = src_fm.shape[1]
    p = pair_t.shape[0]
    pd = kernel.pd

    def src_spec(j):
        # pair_s is flattened (P*GROUP,): 2D scalar-prefetch operands get
        # lane-padded 16x in SMEM, 1D ones don't
        return pl.BlockSpec((1, c, b),
                            lambda i, pt, ps, j=j: (ps[i * GROUP + j],
                                                    0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, b, pd + 1), lambda i, pt, ps: (pt[i], 0, 0)),
            *[src_spec(j) for j in range(GROUP)],
            pl.BlockSpec((1, b, kernel.od),
                         lambda i, pt, ps: (pt[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, b, kernel.od),
                               lambda i, pt, ps: (pt[i], 0, 0)),
    )
    body = functools.partial(_body, kernel_name=kernel.name, core=core,
                             accum_dtype=accum_dtype, pd=pd,
                             d2_mode=d2_mode)
    flops_per_step = GROUP * b * b * kernel.flops_fn(core)
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nn_t, b, kernel.od), accum_dtype),
        # inputs: pair_t(0), pair_s(1), tgt_geo(2), src x GROUP, prev
        input_output_aliases={2 + 1 + GROUP: 0},
        cost_estimate=pl.CostEstimate(
            flops=flops_per_step * p,
            bytes_accessed=p * (b * (pd + 1) + GROUP * c * b
                                + 2 * b * kernel.od) * 4,
            transcendentals=p * GROUP * b * b),
        interpret=interpret,
    )(pair_t, pair_s.reshape(-1), tgt_geo, *([src_fm] * GROUP), out)


def exec_pairs_pallas(kernel: Kernel, tgt_geo: jax.Array,
                      src_fm: jax.Array, group_t: jax.Array,
                      group_s: jax.Array, core: str = "rm",
                      accum_dtype=jnp.float32,
                      interpret: bool = False,
                      d2_mode: str = "outer") -> jax.Array:
    """tgt_geo (NN_t, B, PD+1), src_fm (NN_s, C, B), group_t (P,),
    group_s (P, GROUP) — groups ordered by target row. Returns
    out (NN_t, B, OD); rows with no groups are zero."""
    nn_t, b, _ = tgt_geo.shape
    p = group_t.shape[0]
    out = jnp.zeros((nn_t, b, kernel.od), accum_dtype)
    if p > CHUNK_GROUPS:
        pad = -p % CHUNK_GROUPS
        group_t = jnp.pad(group_t, (0, pad))
        group_s = jnp.pad(group_s, ((0, pad), (0, 0)))
        for i in range(0, p + pad, CHUNK_GROUPS):
            out = _exec_chunk(kernel, tgt_geo, src_fm,
                              group_t[i:i + CHUNK_GROUPS],
                              group_s[i:i + CHUNK_GROUPS], out, core,
                              accum_dtype, interpret, d2_mode)
        return out
    return _exec_chunk(kernel, tgt_geo, src_fm, group_t, group_s, out,
                       core, accum_dtype, interpret, d2_mode)


def build_fm_blocks(kernel: Kernel, blocks_pos, blocks_rad, blocks_s,
                    core: str = "rm") -> jax.Array:
    """(NN, B, PD)/(NN, B)/(NN, B, SD) -> feature-major (NN, C, B)."""
    def one(pos, rad, s):
        return featurize(kernel.name, pos, rad, s)
    return jax.vmap(one)(blocks_pos, blocks_rad, blocks_s)


def build_tgt_geo(blocks_pos, blocks_rad) -> jax.Array:
    """(NN, B, PD)/(NN, B) -> (NN, B, PD+1)."""
    return jnp.concatenate([blocks_pos, blocks_rad[:, :, None]], axis=-1)
