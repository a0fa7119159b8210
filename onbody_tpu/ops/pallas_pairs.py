"""Pallas pair-list executor: the hot kernel of every fast method.

One grid step per (target_block, GROUP source_blocks) group. Group
indices are scalar-prefetched; groups are ordered by target row, so
consecutive steps hitting the same target keep the accumulator resident
in VMEM (output revisiting) — the Pallas analogue of the reference's
per-leaf-block accumulation in treecode3_block (barneshut.hpp:244-287).

Source fetch (pair_fetch):
* 'pregather' (default): one XLA row-gather per chunk packs the step's
  GROUP source blocks into a contiguous sublane-stacked (G*C, B) buffer;
  the pipeline issues ONE large fetch per step and the kernel loops the
  sub-blocks. Measured fastest at N<=1e6.
* 'dma': the feature-major array stays resident in HBM (memory_space
  ANY) and the kernel issues GROUP double-buffered row DMAs per step.
  Measured fastest at N=1e7/block 256 (bigger rows amortize the DMA
  latency; the pregather write+readback costs more than it saves).
Both schedules are compute-identical; per-step cost is dominated by the
pipeline itself (~3.9us/step with all arithmetic stubbed out — see
docs/PERF.md), so group size has a flat response beyond 16.

Grouping GROUP source blocks per step turns the work item into a
(B, G*B) tile: the distance matrix is lane/sublane broadcast on the VPU
at full width, the far-field reduction is one MXU contraction, and
per-grid-step fixed costs are amortized G-fold.

Layout: targets point-major (B, PD+1) [pos | radius]; sources
feature-major (C, B) with precomputed feature rows (ops/kernels.py
featurize). No transposes, no 3D intermediates.

Accumulation contract: the caller's zero-initialized out array is ALIASED
to the output; the kernel reads the previous contents of a target row at
the start of each run and accumulates. Rows with no pairs stay zero, and
the executor is safely chunkable — scalar-prefetch operands live in SMEM
(~1 MB), so long lists are split into SMEM-sized chunks threading the
same buffer (a run split across chunks resumes from the partial sum).

Padding groups are (tgt=0, src=0...): they skip compute via the
pt != 0 guard and only ever touch row 0, which is never read. Inert src
rows inside a real group contribute exactly zero (row 0 has zero
strengths and radius one).
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
# scalar-prefetch budget: tgt (P,) + src (P*G,) int32 must fit in ~1MB
# SMEM per call; chunk size scales down as the group size grows
SMEM_BYTES = 900_000


def _chunk_groups(group: int) -> int:
    """Largest power-of-two step count whose prefetch arrays fit SMEM."""
    return 1 << ((SMEM_BYTES // (4 * (group + 1))).bit_length() - 1)


def _body(pt_ref, ps_ref, tgt_ref, src_hbm, prev_ref, out_ref,
          scratch, sems, *, kernel_name: str, core: str, accum_dtype,
          pd: int, od: int, d2_mode: str, group: int,
          precision: str = "highest"):
    p = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(bank, step, j):
        return pltpu.make_async_copy(
            src_hbm.at[ps_ref[step * group + j]],
            scratch.at[bank, j],
            sems.at[bank, j])

    def start(bank, step):
        for j in range(group):
            dma(bank, step, j).start()

    # double-buffered source fetch: warm up on the first step, prefetch
    # the next step's blocks while computing this one. Padding steps
    # (tgt row 0) issue NO DMAs: at 16 small DMAs x ~0.24us issue cost
    # a pad step otherwise costs ~3.8us of pure scalar-core time — with
    # static group caps ~2x the real group count that was ~40% of the
    # whole exec phase (docs/PERF.md r2s7). Every start is paired with
    # the SAME step's wait (guarded identically), so interleaved pad
    # steps cannot leave or consume stale semaphore signals.
    @pl.when(jnp.logical_and(p == 0, pt_ref[0] != 0))
    def _():
        start(0, 0)

    # clamp: the predicate expression is evaluated unconditionally, so
    # pt_ref[p+1] must not read out of bounds on the last step
    @pl.when(jnp.logical_and(p + 1 < n,
                             pt_ref[jnp.minimum(p + 1, n - 1)] != 0))
    def _():
        start((p + 1) % 2, p + 1)

    bank = p % 2

    # padding steps (tgt row 0) skip the waits and all compute
    @pl.when(pt_ref[p] != 0)
    def _():
        for j in range(group):
            dma(bank, p, j).wait()
        # targets and outputs are feature-major (rows, B): blocks with a
        # tiny trailing dim would be lane-padded to 128 by the pipeline
        # (a 32x HBM blowup at scale)
        tg = tgt_ref[0]                                  # (8, B)
        t = tg[:pd + 1].T                                # (B, PD+1)
        s = jnp.concatenate([scratch[bank, j] for j in range(group)],
                            axis=1)                      # (C, G*B)
        tile = TILE_FM[kernel_name](t[:, :pd], t[:, pd], s, core,
                                    accum_dtype, d2_mode,
                                    precision=precision)
        od8 = out_ref.shape[1]
        tile_fm = jnp.pad(tile.T, ((0, od8 - od), (0, 0)))
        prev_t = pt_ref[jnp.maximum(p - 1, 0)]
        first = jnp.logical_or(p == 0, prev_t != pt_ref[p])
        out_ref[0] = jnp.where(first, prev_ref[0], out_ref[0]) + tile_fm


def _body_interleaved(pt_ref, ps_ref, tgt_ref, src_hbm, prev_ref,
                      out_ref, scratch, sems, *, kernel_name: str,
                      core: str, accum_dtype, pd: int, od: int,
                      d2_mode: str, group: int, tile_g: int,
                      precision: str = "highest"):
    """dma fetch with SOFTWARE-PIPELINED issue: the next step's DMA
    starts are spread through this step's compute, one slot batch per
    sub-tile, so the scalar core's ~0.24us-per-start descriptor setup
    runs while the VPU/MXU crunch the current sub-tile. The plain dma
    body measured fully SERIALIZED issue+compute (~3.9 + ~3.7 us/step
    at g16/b256 — docs/PERF.md r2s7); per-block issue (~225 scalar
    cycles) and per-block compute (~215 cycles) are almost perfectly
    matched, so interleaving can hide nearly all of one of them.

    Sub-tiling the compute (tile_g blocks per TILE_FM call) also caps
    the (B, tile_g*B) VPU intermediates, which is what VMEM-capped the
    full-width tile at larger groups."""
    p = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(bank, step, j):
        return pltpu.make_async_copy(
            src_hbm.at[ps_ref[step * group + j]],
            scratch.at[bank, j],
            sems.at[bank, j])

    @pl.when(jnp.logical_and(p == 0, pt_ref[0] != 0))
    def _():
        for j in range(group):
            dma(0, 0, j).start()

    bank = p % 2
    nxt_ok = jnp.logical_and(p + 1 < n,
                             pt_ref[jnp.minimum(p + 1, n - 1)] != 0)

    @pl.when(pt_ref[p] != 0)
    def _():
        for j in range(group):
            dma(bank, p, j).wait()
        tg = tgt_ref[0]                                  # (8, B)
        t = tg[:pd + 1].T
        tile = None
        n_sub = group // tile_g
        for s_i in range(n_sub):
            # issue the NEXT step's DMAs for this slot batch, then
            # compute this step's sub-tile — scalar and vector streams
            # proceed concurrently
            @pl.when(nxt_ok)
            def _(s_i=s_i):
                for j in range(s_i * tile_g, (s_i + 1) * tile_g):
                    dma((p + 1) % 2, p + 1, j).start()
            s = jnp.concatenate(
                [scratch[bank, j]
                 for j in range(s_i * tile_g, (s_i + 1) * tile_g)],
                axis=1)                                  # (C, tg*B)
            tj = TILE_FM[kernel_name](t[:, :pd], t[:, pd], s, core,
                                      accum_dtype, d2_mode,
                                      precision=precision)
            tile = tj if tile is None else tile + tj
        od8 = out_ref.shape[1]
        tile_fm = jnp.pad(tile.T, ((0, od8 - od), (0, 0)))
        prev_t = pt_ref[jnp.maximum(p - 1, 0)]
        first = jnp.logical_or(p == 0, prev_t != pt_ref[p])
        out_ref[0] = jnp.where(first, prev_ref[0], out_ref[0]) + tile_fm

    # a padding step still prefetches the next REAL step's blocks
    # (otherwise the first step after a pad run would stall on cold
    # buffers); issue them all at once — there is no compute to overlap
    @pl.when(jnp.logical_and(pt_ref[p] == 0, nxt_ok))
    def _():
        for j in range(group):
            dma((p + 1) % 2, p + 1, j).start()


def _body_interleaved_t2(pt_ref, ps_ref, tgt_ref, src_hbm, prev_ref,
                         out_ref, scratch, sems, *, kernel_name: str,
                         core: str, accum_dtype, pd: int, od: int,
                         d2_mode: str, group: int, tile_g: int,
                         precision: str = "highest"):
    """Sibling-paired target variant of _body_interleaved: grid step p
    evaluates its GROUP fetched source blocks against BOTH children of
    target parent q = pt[p]. The tgt/prev/out blocks are (2, ., B) with
    block index q -> rows [2q, 2q+2) (heap layout: children of q are
    exactly rows 2q, 2q+1), so one source fetch serves two block pairs
    and the serialized per-block DMA-issue cost (~0.24us/block, the
    measured exec floor — docs/PERF.md r2s8) halves. Valid only for
    pair lists whose two sibling rows share identical source lists —
    the target leaf level of the simultaneous-descent builder
    (lists.build_dtt_pairs_level2). Per-target accumulation order is
    identical to the unpaired executor, so real-row outputs are
    bit-identical.

    Padding steps (q == 0) map to rows [0, 2); row 1 is the ROOT's
    accumulator, so instead of skipping the write (the pipeline would
    write back an unwritten buffer) they copy prev through unchanged.
    Row 0 is never read; row 1 is preserved exactly."""
    p = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(bank, step, j):
        return pltpu.make_async_copy(
            src_hbm.at[ps_ref[step * group + j]],
            scratch.at[bank, j],
            sems.at[bank, j])

    @pl.when(jnp.logical_and(p == 0, pt_ref[0] != 0))
    def _():
        for j in range(group):
            dma(0, 0, j).start()

    bank = p % 2
    nxt_ok = jnp.logical_and(p + 1 < n,
                             pt_ref[jnp.minimum(p + 1, n - 1)] != 0)

    @pl.when(pt_ref[p] != 0)
    def _():
        for j in range(group):
            dma(bank, p, j).wait()
        t0 = tgt_ref[0][:pd + 1].T                       # (B, PD+1)
        t1 = tgt_ref[1][:pd + 1].T
        tile0 = tile1 = None
        n_sub = group // tile_g
        for s_i in range(n_sub):
            # issue the NEXT step's DMAs for this slot batch, then
            # compute BOTH siblings' sub-tiles — twice the compute per
            # issued descriptor of the unpaired body, so the overlap
            # window is wider
            @pl.when(nxt_ok)
            def _(s_i=s_i):
                for j in range(s_i * tile_g, (s_i + 1) * tile_g):
                    dma((p + 1) % 2, p + 1, j).start()
            s = jnp.concatenate(
                [scratch[bank, j]
                 for j in range(s_i * tile_g, (s_i + 1) * tile_g)],
                axis=1)                                  # (C, tg*B)
            tj0 = TILE_FM[kernel_name](t0[:, :pd], t0[:, pd], s, core,
                                       accum_dtype, d2_mode,
                                       precision=precision)
            tj1 = TILE_FM[kernel_name](t1[:, :pd], t1[:, pd], s, core,
                                       accum_dtype, d2_mode,
                                       precision=precision)
            tile0 = tj0 if tile0 is None else tile0 + tj0
            tile1 = tj1 if tile1 is None else tile1 + tj1
        od8 = out_ref.shape[1]
        prev_t = pt_ref[jnp.maximum(p - 1, 0)]
        first = jnp.logical_or(p == 0, prev_t != pt_ref[p])
        out_ref[0] = (jnp.where(first, prev_ref[0], out_ref[0])
                      + jnp.pad(tile0.T, ((0, od8 - od), (0, 0))))
        out_ref[1] = (jnp.where(first, prev_ref[1], out_ref[1])
                      + jnp.pad(tile1.T, ((0, od8 - od), (0, 0))))

    @pl.when(pt_ref[p] == 0)
    def _():
        # identity write-through: pads share out block 0 (rows [0, 2));
        # copying prev keeps row 1 (the root accumulator) intact under
        # the pipeline's block writeback. Idempotent across a pad run.
        out_ref[0] = prev_ref[0]
        out_ref[1] = prev_ref[1]

        # still prefetch the next REAL step's blocks (no compute here
        # to overlap with — issue them all at once)
        @pl.when(nxt_ok)
        def _():
            for j in range(group):
                dma((p + 1) % 2, p + 1, j).start()


def _body_pair(pt_ref, ps_ref, tgt_ref, src_hbm, prev_ref, out_ref,
               scratch, sems, *, kernel_name: str, core: str,
               accum_dtype, pd: int, od: int, d2_mode: str, group: int,
               tile_g: int, precision: str = "highest"):
    """dma fetch with ADJACENT-ROW BUNDLING: slots j, j+1 holding
    consecutive source ids (a, a+1) are fetched by ONE 2-row DMA —
    their feature rows are contiguous in HBM. With id-ordered row
    compaction (lists mode 'idsort') sibling leaf blocks are always
    adjacent (consecutive integers sort together), and measured lists
    bundle ~92% of entries -> ~0.54x the DMA-start count, the dominant
    serialized scalar cost of the dma executor (docs/PERF.md r2s8).

    The greedy head/consumed scan is an unrolled scalar chain: head[j]
    starts a bundle iff ids are adjacent and j is not already covered;
    starts and waits recompute the same predicates, so every issued
    copy is waited exactly once."""
    p = pl.program_id(0)
    n = pl.num_programs(0)

    def sid(step, j):
        return ps_ref[step * group + j]

    def plan_step(step):
        heads, cons = [], []
        consumed = None
        for j in range(group):
            if j < group - 1:
                a = sid(step, j)
                adj = jnp.logical_and(a != 0, sid(step, j + 1) == a + 1)
            else:
                adj = jnp.bool_(False)
            head = (adj if consumed is None
                    else jnp.logical_and(adj, jnp.logical_not(consumed)))
            heads.append(head)
            cons.append(jnp.bool_(False) if consumed is None else consumed)
            consumed = head
        return heads, cons

    def dma1(bank, step, j):
        return pltpu.make_async_copy(src_hbm.at[sid(step, j)],
                                     scratch.at[bank, j],
                                     sems.at[bank, j])

    def dma2(bank, step, j):
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(sid(step, j), 2)],
            scratch.at[bank, pl.ds(j, 2)],
            sems.at[bank, j])

    def start(bank, step):
        heads, cons = plan_step(step)
        for j in range(group):
            if j < group - 1:          # last slot can never head a pair
                @pl.when(heads[j])
                def _(j=j):
                    dma2(bank, step, j).start()

            @pl.when(jnp.logical_not(jnp.logical_or(heads[j], cons[j])))
            def _(j=j):
                dma1(bank, step, j).start()

    def wait(bank, step):
        heads, cons = plan_step(step)
        for j in range(group):
            if j < group - 1:
                @pl.when(heads[j])
                def _(j=j):
                    dma2(bank, step, j).wait()

            @pl.when(jnp.logical_not(jnp.logical_or(heads[j], cons[j])))
            def _(j=j):
                dma1(bank, step, j).wait()

    @pl.when(jnp.logical_and(p == 0, pt_ref[0] != 0))
    def _():
        start(0, 0)

    @pl.when(jnp.logical_and(p + 1 < n,
                             pt_ref[jnp.minimum(p + 1, n - 1)] != 0))
    def _():
        start((p + 1) % 2, p + 1)

    bank = p % 2

    @pl.when(pt_ref[p] != 0)
    def _():
        wait(bank, p)
        tg = tgt_ref[0]                                  # (8, B)
        t = tg[:pd + 1].T
        tile = None
        for s_i in range(0, group, tile_g):
            s = jnp.concatenate(
                [scratch[bank, j] for j in range(s_i, s_i + tile_g)],
                axis=1)                                  # (C, tg*B)
            tj = TILE_FM[kernel_name](t[:, :pd], t[:, pd], s, core,
                                      accum_dtype, d2_mode,
                                      precision=precision)
            tile = tj if tile is None else tile + tj
        od8 = out_ref.shape[1]
        tile_fm = jnp.pad(tile.T, ((0, od8 - od), (0, 0)))
        prev_t = pt_ref[jnp.maximum(p - 1, 0)]
        first = jnp.logical_or(p == 0, prev_t != pt_ref[p])
        out_ref[0] = jnp.where(first, prev_ref[0], out_ref[0]) + tile_fm


def _body_pre(pt_ref, tgt_ref, src_ref, prev_ref, out_ref, *,
              kernel_name: str, core: str, accum_dtype, pd: int, od: int,
              d2_mode: str, group: int, c: int,
              precision: str = "highest"):
    """Pre-gathered variant: the step's GROUP source blocks arrive as ONE
    contiguous (G*C, B) pipeline block — no manual DMAs, no transpose
    (blocks stack along sublanes; the kernel loops sub-blocks and sums
    their tiles, which distributes over the source concatenation).

    The manual 16-small-DMA scheme measured ~3.8us/step of pure fetch
    latency (95% of step time); a single large pipelined fetch amortizes
    it away at the cost of one XLA row-gather pass outside the kernel.
    """
    p = pl.program_id(0)

    @pl.when(pt_ref[p] != 0)
    def _():
        tg = tgt_ref[0]                                  # (8, B)
        t = tg[:pd + 1].T
        s = src_ref[0]                                   # (G*C, B)
        tile = None
        for j in range(group):
            tj = TILE_FM[kernel_name](t[:, :pd], t[:, pd],
                                      s[j * c:(j + 1) * c], core,
                                      accum_dtype, d2_mode,
                                      precision=precision)
            tile = tj if tile is None else tile + tj
        od8 = out_ref.shape[1]
        tile_fm = jnp.pad(tile.T, ((0, od8 - od), (0, 0)))
        prev_t = pt_ref[jnp.maximum(p - 1, 0)]
        first = jnp.logical_or(p == 0, prev_t != pt_ref[p])
        out_ref[0] = jnp.where(first, prev_ref[0], out_ref[0]) + tile_fm


@functools.partial(
    jax.jit, static_argnames=("kernel", "core", "accum_dtype", "interpret",
                              "d2_mode", "group", "precision"),
    donate_argnums=(4,))
def _exec_chunk_pre(kernel: Kernel, tgt_geo, src_gathered, pair_t, out,
                    core: str, accum_dtype, interpret: bool,
                    d2_mode: str = "outer", group: int = GROUP,
                    precision: str = "highest"):
    """src_gathered: (P, G*C, B) — this chunk's source blocks, already
    gathered contiguous (stacked along sublanes, no transpose)."""
    nn_t, _, b = tgt_geo.shape
    p, gc, _ = src_gathered.shape
    c = gc // group
    od8 = -(-kernel.od // 8) * 8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, 8, b), lambda i, pt: (pt[i], 0, 0)),
            pl.BlockSpec((1, gc, b), lambda i, pt: (i, 0, 0)),
            pl.BlockSpec((1, od8, b), lambda i, pt: (pt[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, od8, b),
                               lambda i, pt: (pt[i], 0, 0)),
    )
    body = functools.partial(_body_pre, kernel_name=kernel.name,
                             core=core, accum_dtype=accum_dtype,
                             pd=kernel.pd, od=kernel.od, d2_mode=d2_mode,
                             group=group, c=c, precision=precision)
    flops_per_step = group * b * b * kernel.flops_fn(core)
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nn_t, od8, b), accum_dtype),
        # inputs: pair_t(0), tgt_geo(1), src_gathered(2), prev(3)
        input_output_aliases={3: 0},
        cost_estimate=pl.CostEstimate(
            flops=flops_per_step * p,
            bytes_accessed=p * (b * 8 + gc * b + 2 * b * od8) * 4,
            transcendentals=p * group * b * b),
        interpret=interpret,
    )(pair_t, tgt_geo, src_gathered, out)


def _body_pre_t2(pt_ref, tgt_ref, src_ref, prev_ref, out_ref, *,
                 kernel_name: str, core: str, accum_dtype, pd: int,
                 od: int, d2_mode: str, group: int, c: int,
                 precision: str = "highest"):
    """Sibling-paired pregathered variant: grid step p evaluates its
    ONE pregathered (G*C, B) source block against BOTH children of
    target parent q = pt[p] (blocks are (2, ., B) with index q -> rows
    [2q, 2q+2), as in _body_interleaved_t2) — the XLA row-gather
    outside the kernel fetches each leaf source group ONCE instead of
    once per sibling, halving the dominant pregather volume of the
    leaf-leaf pass.

    Padding steps (q == 0) copy prev through unchanged: rows [0, 2)
    hold the unused node 0 and the ROOT accumulator (see
    _body_interleaved_t2's identity write-through)."""
    p = pl.program_id(0)

    @pl.when(pt_ref[p] != 0)
    def _():
        t0 = tgt_ref[0][:pd + 1].T                       # (B, PD+1)
        t1 = tgt_ref[1][:pd + 1].T
        s = src_ref[0]                                   # (G*C, B)
        tile0 = tile1 = None
        for j in range(group):
            sj = s[j * c:(j + 1) * c]
            tj0 = TILE_FM[kernel_name](t0[:, :pd], t0[:, pd], sj, core,
                                       accum_dtype, d2_mode,
                                       precision=precision)
            tj1 = TILE_FM[kernel_name](t1[:, :pd], t1[:, pd], sj, core,
                                       accum_dtype, d2_mode,
                                       precision=precision)
            tile0 = tj0 if tile0 is None else tile0 + tj0
            tile1 = tj1 if tile1 is None else tile1 + tj1
        od8 = out_ref.shape[1]
        prev_t = pt_ref[jnp.maximum(p - 1, 0)]
        first = jnp.logical_or(p == 0, prev_t != pt_ref[p])
        out_ref[0] = (jnp.where(first, prev_ref[0], out_ref[0])
                      + jnp.pad(tile0.T, ((0, od8 - od), (0, 0))))
        out_ref[1] = (jnp.where(first, prev_ref[1], out_ref[1])
                      + jnp.pad(tile1.T, ((0, od8 - od), (0, 0))))

    @pl.when(pt_ref[p] == 0)
    def _():
        out_ref[0] = prev_ref[0]
        out_ref[1] = prev_ref[1]


@functools.partial(
    jax.jit, static_argnames=("kernel", "core", "accum_dtype", "interpret",
                              "d2_mode", "group", "precision"),
    donate_argnums=(4,))
def _exec_chunk_pre_t2(kernel: Kernel, tgt_geo, src_gathered, pair_t,
                       out, core: str, accum_dtype, interpret: bool,
                       d2_mode: str = "outer", group: int = GROUP,
                       precision: str = "highest"):
    """Pregathered t2: pair_t holds parent KEYS (block index q -> target
    rows [2q, 2q+2)); src_gathered (P, G*C, B) is shared by both
    siblings. tgt_geo/out first dims must be even."""
    nn_t, _, b = tgt_geo.shape
    p, gc, _ = src_gathered.shape
    c = gc // group
    od8 = -(-kernel.od // 8) * 8
    assert nn_t % 2 == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((2, 8, b), lambda i, pt: (pt[i], 0, 0)),
            pl.BlockSpec((1, gc, b), lambda i, pt: (i, 0, 0)),
            pl.BlockSpec((2, od8, b), lambda i, pt: (pt[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((2, od8, b),
                               lambda i, pt: (pt[i], 0, 0)),
    )
    body = functools.partial(_body_pre_t2, kernel_name=kernel.name,
                             core=core, accum_dtype=accum_dtype,
                             pd=kernel.pd, od=kernel.od, d2_mode=d2_mode,
                             group=group, c=c, precision=precision)
    flops_per_step = 2 * group * b * b * kernel.flops_fn(core)
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nn_t, od8, b), accum_dtype),
        # inputs: pair_t(0), tgt_geo(1), src_gathered(2), prev(3)
        input_output_aliases={3: 0},
        cost_estimate=pl.CostEstimate(
            flops=flops_per_step * p,
            bytes_accessed=p * (2 * b * 8 + gc * b + 4 * b * od8) * 4,
            transcendentals=p * 2 * group * b * b),
        interpret=interpret,
    )(pair_t, tgt_geo, src_gathered, out)


@functools.partial(
    jax.jit, static_argnames=("kernel", "core", "accum_dtype", "interpret",
                              "d2_mode", "group", "precision",
                              "body_kind", "tile_g"),
    donate_argnums=(5,))
def _exec_chunk(kernel: Kernel, tgt_geo, src_fm, pair_t, pair_s, out,
                core: str, accum_dtype, interpret: bool,
                d2_mode: str = "outer", group: int = GROUP,
                precision: str = "highest", body_kind: str = "plain",
                tile_g: int = 4):
    nn_t, _, b = tgt_geo.shape
    c = src_fm.shape[1]
    p = pair_t.shape[0]
    pd = kernel.pd
    od8 = -(-kernel.od // 8) * 8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, 8, b), lambda i, pt, ps: (pt[i], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),   # src_fm stays in HBM
            pl.BlockSpec((1, od8, b), lambda i, pt, ps: (pt[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, od8, b),
                               lambda i, pt, ps: (pt[i], 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, group, c, b), src_fm.dtype),
            pltpu.SemaphoreType.DMA((2, group)),
        ],
    )
    if body_kind == "interleaved":
        body = functools.partial(_body_interleaved,
                                 kernel_name=kernel.name, core=core,
                                 accum_dtype=accum_dtype, pd=pd,
                                 od=kernel.od, d2_mode=d2_mode,
                                 group=group, tile_g=tile_g,
                                 precision=precision)
    elif body_kind == "pair":
        body = functools.partial(_body_pair,
                                 kernel_name=kernel.name, core=core,
                                 accum_dtype=accum_dtype, pd=pd,
                                 od=kernel.od, d2_mode=d2_mode,
                                 group=group, tile_g=tile_g,
                                 precision=precision)
    else:
        body = functools.partial(_body, kernel_name=kernel.name, core=core,
                                 accum_dtype=accum_dtype, pd=pd,
                                 od=kernel.od, d2_mode=d2_mode,
                                 group=group, precision=precision)
    flops_per_step = group * b * b * kernel.flops_fn(core)
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nn_t, od8, b), accum_dtype),
        # inputs: pair_t(0), pair_s(1), tgt_geo(2), src_fm(3), prev(4)
        input_output_aliases={4: 0},
        cost_estimate=pl.CostEstimate(
            flops=flops_per_step * p,
            bytes_accessed=p * (b * (pd + 1) + group * c * b
                                + 2 * b * kernel.od) * 4,
            transcendentals=p * group * b * b),
        interpret=interpret,
    )(pair_t, pair_s.reshape(-1), tgt_geo, src_fm, out)


@functools.partial(
    jax.jit, static_argnames=("kernel", "core", "accum_dtype", "interpret",
                              "d2_mode", "group", "precision", "tile_g"),
    donate_argnums=(5,))
def _exec_chunk_t2(kernel: Kernel, tgt_geo, src_fm, pair_t, pair_s, out,
                   core: str, accum_dtype, interpret: bool,
                   d2_mode: str = "outer", group: int = GROUP,
                   precision: str = "highest", tile_g: int = 4):
    """Sibling-paired chunk: pair_t holds target PARENT node ids q; the
    tgt/prev/out pipeline blocks are (2, ., B) so block index q covers
    heap rows [2q, 2q+2). Requires an even target row count (always
    true: the unified node array has 2*nleaf rows)."""
    nn_t, _, b = tgt_geo.shape
    c = src_fm.shape[1]
    p = pair_t.shape[0]
    pd = kernel.pd
    od8 = -(-kernel.od // 8) * 8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((2, 8, b), lambda i, pt, ps: (pt[i], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),   # src_fm stays in HBM
            pl.BlockSpec((2, od8, b), lambda i, pt, ps: (pt[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((2, od8, b),
                               lambda i, pt, ps: (pt[i], 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, group, c, b), src_fm.dtype),
            pltpu.SemaphoreType.DMA((2, group)),
        ],
    )
    body = functools.partial(_body_interleaved_t2,
                             kernel_name=kernel.name, core=core,
                             accum_dtype=accum_dtype, pd=pd,
                             od=kernel.od, d2_mode=d2_mode,
                             group=group, tile_g=tile_g,
                             precision=precision)
    flops_per_step = 2 * group * b * b * kernel.flops_fn(core)
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nn_t, od8, b), accum_dtype),
        # inputs: pair_t(0), pair_s(1), tgt_geo(2), src_fm(3), prev(4)
        input_output_aliases={4: 0},
        cost_estimate=pl.CostEstimate(
            flops=flops_per_step * p,
            bytes_accessed=p * (2 * b * 8 + group * c * b
                                + 4 * b * kernel.od) * 4,
            transcendentals=p * 2 * group * b * b),
        interpret=interpret,
    )(pair_t, pair_s.reshape(-1), tgt_geo, src_fm, out)


def exec_pairs_pallas_t2(kernel: Kernel, tgt_geo: jax.Array,
                         src_fm: jax.Array, group_t: jax.Array,
                         group_s: jax.Array, out_fm: jax.Array,
                         core: str = "rm", accum_dtype=jnp.float32,
                         interpret: bool = False, d2_mode: str = "outer",
                         group: int = GROUP, precision: str = "highest",
                         tile_g: int = 4,
                         fetch: str = "dma_i") -> jax.Array:
    """Run sibling-paired groups (lists.build_dtt_pairs_level2 leaf2)
    into an existing feature-major accumulator out_fm (NN_t, od8, B),
    donated and returned. group_t entries are target PARENT node ids;
    each step's source group is evaluated against both children rows.

    fetch: dma-family (the in-kernel DMA loop the pairing halves) or
    'pregather' — one XLA row-gather per chunk fetches each leaf group
    ONCE for both siblings (_body_pre_t2), halving the gather volume
    that dominates the pregather leaf pass. pregather is the only
    fetch whose fm layout fits N=1e8 on 16 GB (docs/PERF.md r3)."""
    p = group_t.shape[0]
    b = tgt_geo.shape[2]
    if fetch == "pregather":
        c_raw = (src_fm.shape[1] // b if src_fm.ndim == 2
                 else src_fm.shape[1])
        c = -(-c_raw // 8) * 8
        chunk = max(1024, (256 << 20) // (group * c * b * 4))
        chunk = 1 << (chunk.bit_length() - 1)
    else:
        chunk = _chunk_groups(group)
    if p > chunk:
        pad = -p % chunk
        group_t = jnp.pad(group_t, (0, pad))
        group_s = jnp.pad(group_s, ((0, pad), (0, 0)))
        steps = range(0, p + pad, chunk)
    else:
        steps = [0]
    for i in steps:
        gt_c = group_t[i:i + chunk] if p > chunk else group_t
        gs_c = group_s[i:i + chunk] if p > chunk else group_s
        if fetch == "pregather":
            src_c = _pregather(kernel.name, src_fm, gs_c, b)
            out_fm = _exec_chunk_pre_t2(kernel, tgt_geo, src_c, gt_c,
                                        out_fm, core, accum_dtype,
                                        interpret, d2_mode, group,
                                        precision)
        else:
            out_fm = _exec_chunk_t2(kernel, tgt_geo, src_fm, gt_c, gs_c,
                                    out_fm, core, accum_dtype, interpret,
                                    d2_mode, group, precision,
                                    min(tile_g, group))
    return out_fm


def _body_static(tgt_ref, src_ref, out_ref, *, kernel_name: str,
                 core: str, accum_dtype, pd: int, od: int, d2_mode: str,
                 group: int, c: int, kper: int,
                 precision: str = "highest"):
    """Fully-static pipeline: every index map is the grid index, so
    Mosaic prefetches at full depth (dynamic scalar-prefetched index
    maps measured a ~3.9us/step floor even with compute stubbed out).
    Each step evaluates KPER groups; outputs go to per-step rows that
    the caller segment-adds into the accumulator afterwards."""
    for k in range(kper):
        tg = tgt_ref[k]                                  # (8, B)
        t = tg[:pd + 1].T
        tile = None
        for j in range(group):
            tj = TILE_FM[kernel_name](t[:, :pd], t[:, pd],
                                      src_ref[k, j * c:(j + 1) * c],
                                      core, accum_dtype, d2_mode,
                                      precision=precision)
            tile = tj if tile is None else tile + tj
        od8 = out_ref.shape[1]
        out_ref[k] = jnp.pad(tile.T, ((0, od8 - od), (0, 0)))


@functools.partial(
    jax.jit, static_argnames=("kernel", "core", "accum_dtype", "interpret",
                              "d2_mode", "group", "kper", "precision"))
def _exec_chunk_static(kernel: Kernel, tgt_gathered, src_gathered,
                       core: str, accum_dtype, interpret: bool,
                       d2_mode: str = "outer", group: int = GROUP,
                       kper: int = 8, precision: str = "highest"):
    """tgt_gathered (P, 8, B); src_gathered (P, G*C, B); P % kper == 0.
    Returns per-step output rows (P, od8, B)."""
    p, _, b = tgt_gathered.shape
    gc = src_gathered.shape[1]
    c = gc // group
    od8 = -(-kernel.od // 8) * 8
    grid = (p // kper,)
    body = functools.partial(_body_static, kernel_name=kernel.name,
                             core=core, accum_dtype=accum_dtype,
                             pd=kernel.pd, od=kernel.od, d2_mode=d2_mode,
                             group=group, c=c, kper=kper,
                             precision=precision)
    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kper, 8, b), lambda i: (i, 0, 0)),
            pl.BlockSpec((kper, gc, b), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((kper, od8, b), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((p, od8, b), accum_dtype),
        cost_estimate=pl.CostEstimate(
            flops=p * group * b * b * kernel.flops_fn(core),
            bytes_accessed=p * (b * 8 + gc * b + b * od8) * 4,
            transcendentals=p * group * b * b),
        interpret=interpret,
    )(tgt_gathered, src_gathered)


def _pregather(kernel_name, src_fm, gs, b: int):
    """One XLA row-gather: (P, G) block ids -> (P, G*C8, B) contiguous
    sublane-stacked source blocks (a pure reshape — no transpose).

    src_fm may be (NN, C, B) or flat (NN, C*B) — the flat layout tiles
    exactly on TPU for lean row counts (C=5 would sublane-pad 1.6x and
    was observed to trigger a full in-program relayout copy at N=1e8);
    the chunk is reshaped back to blocks after the gather.

    Unaligned feature counts (lean storage without the pad-to-8 rows,
    e.g. grav3d's true 5) are padded to the f32 sublane tile HERE, per
    chunk, with the kernel's DERIVED rows (pad_fm_rows — the tile
    kernels dispatch the folded-product path on the row count, so a
    zero pad would contract zeros)."""
    from onbody_tpu.ops.kernels import pad_fm_rows
    p, g = gs.shape
    srcs = src_fm[gs.reshape(-1)]          # (P*G, C, B) | (P*G, C*B)
    if src_fm.ndim == 2:
        srcs = srcs.reshape(p * g, -1, b)
    srcs = pad_fm_rows(kernel_name, srcs)
    return srcs.reshape(p, -1, b)


def exec_pairs_pallas(kernel: Kernel, tgt_geo: jax.Array,
                      src_fm: jax.Array, group_t: jax.Array,
                      group_s: jax.Array, core: str = "rm",
                      accum_dtype=jnp.float32,
                      interpret: bool = False,
                      d2_mode: str = "outer",
                      group: int = GROUP,
                      fetch: str = "pregather",
                      precision: str = "highest",
                      tile_g: int = 4,
                      out_fm: jax.Array = None,
                      final: bool = True) -> jax.Array:
    """tgt_geo (NN_t, B, PD+1), src_fm (NN_s, C, B), group_t (P,),
    group_s (P, GROUP) — groups ordered by target row. Returns
    out (NN_t, B, OD); rows with no groups are zero.

    fetch: 'pregather' (default — one XLA row-gather per chunk feeds the
    kernel one contiguous (C, G*B) block per step) or 'dma' (the kernel
    issues GROUP small row DMAs per step; measured ~3.8us/step of pure
    fetch latency, ~10x the pregathered fixed cost) or 'dma_i'
    (dma with the next step's starts software-pipelined through the
    compute sub-tiles — see _body_interleaved).

    out_fm: existing feature-major (NN_t, od8, B) accumulator to add
    into (donated) instead of zeros. final=False returns the
    feature-major accumulator without the point-major transpose — for
    callers that chain further executor passes (exec_pairs_pallas_t2)
    over the same buffer."""
    nn_t, _, b = tgt_geo.shape
    p = group_t.shape[0]
    od8 = -(-kernel.od // 8) * 8
    c_raw = (src_fm.shape[1] // b if src_fm.ndim == 2
             else src_fm.shape[1])
    c = -(-c_raw // 8) * 8               # pregather pads unaligned rows
    if src_fm.ndim == 2 and fetch != "pregather":
        raise ValueError("flat (NN, C*B) source blocks need "
                         "fetch='pregather'")
    if fetch.startswith("dma") and c_raw % 8:
        raise ValueError("dma fetch needs sublane-aligned feature rows; "
                         "use fetch='pregather' with lean fm storage")
    if fetch == "static":
        assert out_fm is None and final, \
            "static fetch does not support chained accumulators"
        # fully-static pipeline: gather BOTH sides per chunk, emit
        # per-step rows, one segment scatter-add at the end
        kper = 8
        chunk = max(1024, (256 << 20) // (group * c * b * 4))
        chunk = 1 << (chunk.bit_length() - 1)
        pad = -p % chunk
        gt_p = jnp.pad(group_t, (0, pad))
        gs_p = jnp.pad(group_s, ((0, pad), (0, 0)))
        rows = []
        for i in range(0, p + pad, chunk):
            gt_c = gt_p[i:i + chunk]
            gs_c = gs_p[i:i + chunk]
            src_c = _pregather(kernel.name, src_fm, gs_c, b)
            tgt_c = tgt_geo[gt_c]
            rows.append(_exec_chunk_static(kernel, tgt_c, src_c, core,
                                           accum_dtype, interpret,
                                           d2_mode, group, kper,
                                           precision))
        rows = jnp.concatenate(rows) if len(rows) > 1 else rows[0]
        out = jnp.zeros((nn_t, od8, b), accum_dtype)
        out = out.at[gt_p].add(rows)
        return jnp.transpose(out[:, :kernel.od, :], (0, 2, 1))
    out = (jnp.zeros((nn_t, od8, b), accum_dtype) if out_fm is None
           else out_fm)
    if fetch == "pregather":
        # chunk so the gathered buffer stays ~256 MB
        chunk = max(1024, (256 << 20) // (group * c * b * 4))
        chunk = 1 << ((chunk).bit_length() - 1)
    else:
        chunk = _chunk_groups(group)
    if p > chunk:
        pad = -p % chunk
        group_t = jnp.pad(group_t, (0, pad))
        group_s = jnp.pad(group_s, ((0, pad), (0, 0)))
        steps = range(0, p + pad, chunk)
    else:
        steps = [0]
    for i in steps:
        gt_c = group_t[i:i + chunk] if p > chunk else group_t
        gs_c = group_s[i:i + chunk] if p > chunk else group_s
        if fetch == "pregather":
            src_c = _pregather(kernel.name, src_fm, gs_c, b)
            out = _exec_chunk_pre(kernel, tgt_geo, src_c, gt_c, out,
                                  core, accum_dtype, interpret, d2_mode,
                                  group, precision)
        else:
            kind = {"dma_i": "interleaved", "dma_p": "pair"}.get(
                fetch, "plain")
            out = _exec_chunk(kernel, tgt_geo, src_fm, gt_c, gs_c, out,
                              core, accum_dtype, interpret, d2_mode,
                              group, precision, body_kind=kind,
                              tile_g=min(tile_g, group))
    if not final:
        return out
    # back to the framework-standard (NN, B, OD) point-major layout
    return jnp.transpose(out[:, :kernel.od, :], (0, 2, 1))


def build_fm_blocks(kernel: Kernel, blocks_pos, blocks_rad, blocks_s,
                    core: str = "rm") -> jax.Array:
    """(NN, B, PD)/(NN, B)/(NN, B, SD) -> feature-major (NN, C, B)."""
    def one(pos, rad, s):
        return featurize(kernel.name, pos, rad, s)
    return jax.vmap(one)(blocks_pos, blocks_rad, blocks_s)


def build_tgt_geo(blocks_pos, blocks_rad) -> jax.Array:
    """(NN, B, PD)/(NN, B) -> feature-major (NN, 8, B) [pos | rad | 0...].

    Feature-major with >=8 rows keeps the pallas pipeline block layout
    aligned (a (B, pd+1) block would lane-pad 4 -> 128: 32x HBM)."""
    nn, b, pd = blocks_pos.shape
    g = jnp.concatenate([jnp.transpose(blocks_pos, (0, 2, 1)),
                         blocks_rad[:, None, :]], axis=1)
    return jnp.pad(g, ((0, 0), (0, 8 - pd - 1), (0, 0)))
