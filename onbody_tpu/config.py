"""Typed configuration for the solver.

Replaces the reference's three config tiers (hand-parsed CLI flags
ongrav3d.cpp:484-527, in-source constants like USE_RM_KERNEL
CoreFunc3d.hpp:11, and CMake options) with one dataclass.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """All tunables for one solve.

    Defaults mirror the reference drivers (ongrav3d.cpp:474-481):
    blockSize 128, thetas {treecode1: 2.0, pointwise: 1.05, boxwise: 1.0,
    dtt: 1.35}, order -1 (pair-merge equivalents).
    """

    # the basic unit of direct-sum work; 128 == MXU tile dimension
    block_size: int = 128

    # barycentric Lagrange order; < 0 selects pair-merge equivalents
    # (ref ongrav3d.cpp:543-550)
    order: int = -1

    # multipole-acceptance-criterion thetas per method
    theta_treecode1: float = 2.0
    theta_pointwise: float = 1.05
    theta_boxwise: float = 1.0
    theta_dtt: float = 1.35

    # core function family: 'rm' (Rosenhead-Moore, default) or 'exp'
    # (compact exponential) — ref CoreFunc2d.hpp:11-12, CoreFunc3d.hpp:11-12
    core_func: str = "rm"

    # tree construction: 'median' (VAMsplit-equivalent, one sort per
    # level), 'span' (one sort per tree_span levels via 2^span-way
    # single-axis splits — exact counts, non-overlapping boxes, ~span-x
    # fewer sorts; see tree/build.py build_tree), or 'morton' (single
    # space-filling-curve sort; fastest, overlapping boxes — overflows
    # DTT frontiers, treecode-only)
    tree_mode: str = "median"
    tree_span: int = 2
    tree_span_top: int = 6
    # consecutive build-schedule steps fused per dispatch (tree/build.py
    # _run_steps): >1 amortizes the measured ~35 ms/dispatch fixed cost
    # (docs/PERF.md r2i) at the price of up to fuse+1 column sets of
    # peak HBM — keep 1 for N >= ~4e7 on 16 GB
    tree_fuse: int = 1
    # apply the multi-way skip from this level DOWN as well (bitonic
    # passes touch the whole array at every level, so bottom sorts cost
    # as much as mid sorts); None disables. Fattens leaf boxes —
    # near-field volume tradeoff, measure before adopting.
    tree_span_bot: Optional[int] = None
    # tree_mode='bisect': exact per-level median splits via 32-round
    # integer bisection (counts only, no data movement) and ONE variadic
    # sort per tree_bisect_group levels (max 4). Same slot-exact VAMsplit
    # semantics as 'median'; in-group split axes come from plane-derived
    # boxes (recorded boxes are exact). See build._bisect_group_step.
    tree_bisect_group: int = 4

    # build the source and target trees from ONE sequence of stacked
    # variadic sorts (build_trees_paired — bit-identical trees, half the
    # sort dispatches). Requires equal padded sizes; prepare() falls
    # back to two build_tree calls when shapes differ or mode='morton'.
    tree_paired: bool = False

    # leave radii/strengths out of the per-level sort network and gather
    # them once through the final permutation (build_tree defer_rs —
    # bit-identical; fewer operands per bitonic pass, also a peak-HBM
    # win for the chunked 1e8 path)
    tree_defer_rs: bool = False

    # quantized-payload sort: run the median/span schedule on packed u16
    # coordinate codes (tree/quant.py) — 3 sort columns in 3D instead
    # of 4 (-25% sort traffic, the dominant tree-build cost). 'gather'
    # recovers exact f32 coordinates through the final permutation;
    # 'dequant' uses cell centers (error <= half a grid step ~1.5e-5 of
    # the domain) with zero gather cost. Requires tree_defer_rs and
    # tree_mode in {median, span}; 'off' disables.
    tree_quant: str = "off"

    # storage / accumulation dtypes — the reference's STORE/ACCUM template
    # pair (ongrav3d.cpp:7-8). prepare() casts incoming particles to
    # storage_dtype; accum_dtype=float64 promotes the whole per-pair chain
    # (mycast semantics, MathHelper.hpp:50-59) for the ~4e-7-RMS accuracy
    # tier (README.md:107-110; forces the jnp executor — Mosaic has no
    # fp64). Tested in tests/test_precision.py.
    storage_dtype: jnp.dtype = jnp.float32
    accum_dtype: jnp.dtype = jnp.float32

    # interaction-list construction widths (static shapes under jit).
    # frontier_width bounds the per-target-block candidate list per level;
    # list_width bounds the total accepted interactions per target block.
    frontier_width: int = 512
    list_width: int = 2048
    # row front-compaction mover in the level DTT builder: 'scatter'
    # (cumsum + flat scatter) or 'sort' (stable lane-dim sort) — same
    # rows, different primitive (lists._compact_rows)
    list_compact: str = "scatter"
    # global group-compaction mover (lists.group_pairs over the full
    # flattened pair list): 'scatter' or 'sort' (stable invalid-last
    # variadic sort — same groups, same order)
    group_compact: str = "scatter"

    # execution backend for the pair executor: 'auto' (pallas on TPU,
    # jnp elsewhere), 'pallas', or 'jnp'
    pair_backend: str = "auto"

    # DTT traversal scheme: 'level' (simultaneous descent, one MAC round
    # per level — fastest) or 'refine' (refine-the-larger-box with an
    # inner source-refinement loop, mirroring ongrav3d.cpp:374-397 —
    # more robust to strongly non-uniform source/target distributions)
    dtt_traversal: str = "level"

    # sibling-paired leaf execution: at the target leaf level both
    # children of a parent carry IDENTICAL accepted source lists (the
    # leaf candidate rows are literally jnp.repeat of the parent rows —
    # lists._dtt_lists_level), so the executor can evaluate each fetched
    # source group against a (2, B) sibling target block and halve the
    # serialized per-block DMA-issue cost (~0.24us/block, the measured
    # exec floor — docs/PERF.md r2s8) on the leaf-leaf pairs that
    # dominate the pair volume. Requires the level/rows builder, any
    # non-static pair_fetch (dma-family or pregather — _body_pre_t2),
    # and the pallas backend; silently off otherwise (the pair set and
    # per-target accumulation order are unchanged — outputs are
    # bit-identical on real rows).
    dtt_leaf_pair2: bool = False

    # candidate-list layout for the level traversal: 'rows' (dense
    # per-target frontier rows of frontier_width slots — lane-dim
    # compaction scans, fastest at every measured N) or 'flat' (one
    # compacted (tgt, src) array per level; touches only real
    # candidates, but its global 1-D scans and per-entry target
    # gathers measured net-slower: 13.6 vs 12.8s at 1e7, 0.73 vs 0.67s
    # at 1e6)
    dtt_lists: str = "rows"

    # flat layout: per-target-row candidate budget (the level-l flat cap
    # is 2^l * this). Mean occupancy is ~67 at theta=1.4; overflow is
    # detected, not silent
    flat_row_cap: int = 128

    # source blocks fetched per Pallas grid step: the work tile is
    # (block_size, pair_group*block_size); larger groups amortize
    # per-step overheads at the cost of more padding waste on short runs
    pair_group: int = 8

    # source fetch strategy inside the executor: 'pregather' (one XLA
    # row-gather per chunk feeds the kernel a contiguous block per step),
    # 'dma' (GROUP small in-kernel row DMAs per step — measured
    # ~3.8us/step of pure fetch latency, ~95% of step time), or 'dma_i'
    # (dma with the next step's starts software-pipelined through the
    # compute sub-tiles — ops/pallas_pairs._body_interleaved)
    pair_fetch: str = "pregather"

    # blocks per TILE_FM sub-call in the interleaved dma kernel (caps
    # the (B, tile_g*B) VPU intermediates; also the issue/compute
    # interleave granularity)
    pair_tile_g: int = 4

    # static interaction-list capacity, in 8-wide source groups per
    # emitted target row (keeps the solve path free of host syncs; the
    # pallas kernel skips padding-tail steps nearly for free, and
    # overflow is still detected). DTT emits ~8-10 groups/row at
    # theta=1.4; boxwise treecodes ~25-35 groups/leaf at theta=1.0.
    cap_groups_dtt: int = 16
    cap_groups_treecode: int = 48

    # compute d2 via centered Gram matmul (MXU) or elementwise broadcast
    d2_mode: str = "exact"

    # MXU pass count for the source-contraction matmuls (the (B, G*B) x
    # (G*B, F) reductions in ops/kernels.py tile_fm; measured ~0.4s per
    # pass at N=1e7 — 'highest' spends ~2.5s of an 8.3s solve there):
    # 'highest' = full f32 (6 bf16 passes); '3x' = manual bf16-split of
    # both operands, 3 passes, ~2^-16 rel (below the fp32 pair-chain
    # floor); 'w2x' = split only the weight matrix, 2 passes, rows in
    # one bf16 pass over tile-CENTERED coordinates; 'default' = one
    # bf16 pass (measured 9e-3 rel-RMS at 1e7 — experiments only). The
    # distance pipeline is unaffected (always exact f32 on the VPU).
    mxu_precision: str = "highest"

    # MAC classify geometry fetch: 'quant' (one c64 gather of 16-bit
    # grid-quantized cm+nr per candidate — half the gather traffic,
    # <0.2% MAC-distance jitter) or 'f32' (two c64 gathers, exact)
    mac_geometry: str = "quant"

    # lean plan: build ONLY the feature-major executor arrays (src_fm /
    # tgt_geo, unpadded feature rows), no point-major Blocks — the HBM
    # diet that fits N=1e8 on one 16 GB chip. Requires order >= 0 and
    # the pallas/xla pair backend with fetch='pregather'.
    lean_plan: bool = False

    def replace(self, **kw) -> "SolverConfig":
        return dataclasses.replace(self, **kw)

    @property
    def ncp(self) -> int:
        """Chebyshev points per dimension (order+1)."""
        return self.order + 1


def tuned_config(n: int, kernel: str = "grav3d") -> SolverConfig:
    """Measured-best full-evaluation (DTT) configuration per problem
    size on one TPU v5e chip (sweep history in docs/PERF.md; the
    reference analogue is the hard-coded library tuning of
    interface2dvort.cpp:189-195). bench.py and callers that just want
    "the fast settings for this N" use this single table.

    kernel: per-workload MAC adjustments on top of the size-tuned
    settings — the 2D Biot-Savart kernel decays slower (1/r vs 1/r^2),
    so the grav-tuned theta 1.2 measured 1.9-2.2e-4 rel-RMS at 1e6/1e7;
    theta 1.3 restores the 1e-4 class (the reference's own 2D tuning is
    theta=1.3 at order 4, interface2dvort.cpp:189-192).

    Frontier widths are overflow-verified for the bench seed (12345) at
    the bench sizes; other particle distributions should check
    PairList.overflow (the API layer retries wider automatically).
    """
    cfg = _tuned_config_n(n)
    if kernel == "vort2d":
        # exp_v2theta at 1e6: 1.3 -> 1.03e-4 (just outside the
        # envelope), 1.4 -> 5.97e-5 at +2% time; 1e7 at 1.3 measured
        # 1.21e-4, so 1.4 is the envelope-restoring setting
        cfg = cfg.replace(theta_dtt=max(cfg.theta_dtt, 1.4))
    if kernel == "vortgrad3d" and n >= 4_000_000:
        # the lean 7-row layout (pad8 -> 8, dma-aligned) replaced the
        # 28-row absolute moments that OOMed the point-major plan at
        # 1e7; keep the lean fm plan for headroom but the dma_i fetch
        # now applies (q21 measured the pregather path at 17.5 s)
        cfg = cfg.replace(lean_plan=True)
    return cfg


def _tuned_config_n(n: int) -> SolverConfig:
    if n >= 40_000_000:
        # beyond ~4e7 the monolithic plan exceeds 16 GB HBM: callers
        # should run traverse/chunked.solve_dtt_chunked with this
        # settings measured at N=1e8 (scripts/exp_1e8.py, docs/PERF.md
        # r2s7): W128 zero-overflow, transposed 3xt MXU tier, sort
        # row-compaction, fused tree dispatches (clamped to 2 in
        # chunked). cap 8 was tried and OVERFLOWED (440k dropped groups:
        # per-target ceil(v/g) quantization inflates the group count far
        # above pairs/g) — 16 is the verified setting.
        # theta 1.15 (the 1e7-class MAC) measured 62.4 s / rms 8.5e-5 /
        # overflow 0 at 1e8 (r3 e8own). tree_fuse=1: the fuse=2 layout
        # that fit in r2 OOMed in the r3 environment even after the
        # ownership/donation reliefs — one sort per dispatch keeps two
        # live column sets instead of three (~-2.1 GB peak) for ~0.5 s
        # of the 62 s total.
        return SolverConfig(block_size=256, order=5, theta_dtt=1.15,
                            frontier_width=128, cap_groups_dtt=16,
                            tree_mode="span", pair_backend="pallas",
                            pair_group=16, pair_fetch="pregather",
                            mxu_precision="3xt", lean_plan=True,
                            tree_defer_rs=True, tree_fuse=1,
                            list_compact="sort")
    if n >= 4_000_000:
        # r2 session-4 sweeps (docs/PERF.md): paired+defer tree build
        # -0.45s, W128 -0.25s (zero overflow at theta 1.2), transposed
        # MXU '3xt' -0.14s, sort row-compaction -0.08s
        # tree_fuse=8: exp_fuse at 1e7 measured prepare 2.22 (fuse 1)
        # -> 2.05 s (8) / 2.02 (99); 8 keeps per-dispatch live column
        # sets bounded (the 1e8 chunked path shares this code).
        # dma_i g32/tg4: exp_dmai measured 4.36 vs 4.45 (dma g16) —
        # the interleaved-issue kernel's win is small (Mosaic still
        # serializes scalar DMA starts with vector compute) but free
        # dtt_leaf_pair2 + g16: exp_p2 at 1e7 — pair2 g16 3.478 s vs
        # ctrl g32 3.660 / pair2 g32 3.632 (one source fetch serves
        # both target siblings; smaller groups cut ceil(v/g) padding
        # once the issue cost halves)
        # theta 1.15: exp_r3b fine sweep — 3.804 s / rms 9.09e-5 vs
        # 3.846 / 6.61e-5 at 1.2; 1.12 (3.779, 9.71e-5) leaves <3%
        # margin to the 1e-4 envelope, 1.15 keeps ~9%
        return SolverConfig(block_size=256, order=5, theta_dtt=1.15,
                            frontier_width=128, list_width=320,
                            cap_groups_dtt=16, pair_backend="pallas",
                            pair_group=16, pair_fetch="dma_i",
                            pair_tile_g=4, dtt_leaf_pair2=True,
                            tree_mode="span", mxu_precision="3xt",
                            tree_paired=True, tree_defer_rs=True,
                            list_compact="sort", tree_fuse=8)
    # 1e6 retune at the 1e7-class knobs (exp_r4g6, docs/PERF.md r2s12):
    # W128 + 3xt + sort-compact + dma_i g32/tg4 + paired+defer+fuse8
    # measured 0.352 s vs 0.367 ctrl — the individual knobs are washes
    # or slight losses at this N (3xt 0.389, dma_i 0.384) but the combo
    # wins. theta 1.15 REJECTED here: rms 1.02e-4 breaches the 1e-4
    # envelope at 1e6 (the 1e7 problem has more far-field averaging).
    if n <= 300_000:
        # below the bench sizes the verified-tight widths can overflow
        # (shallow trees concentrate partners: 76 dropped rows for the
        # 3D vortex kernels at 1e5 with W128/L320) and the wider-list
        # cost is noise at this scale — keep generous static shapes
        return SolverConfig(block_size=256, order=5, theta_dtt=1.2,
                            frontier_width=256, list_width=1024,
                            cap_groups_dtt=32, tree_mode="span",
                            pair_backend="pallas", pair_group=32,
                            pair_fetch="dma_i", pair_tile_g=4,
                            mxu_precision="3xt", tree_paired=True,
                            tree_defer_rs=True, tree_fuse=8,
                            list_compact="sort")
    # sibling-paired leaf exec wins on the fused path too (exp_r3p6:
    # ctrl 0.354 / p2 g16 0.316 / p2 g32 0.333 / pregather-p2 0.323)
    return SolverConfig(block_size=256, order=5, theta_dtt=1.2,
                        frontier_width=128, list_width=320,
                        cap_groups_dtt=16, tree_mode="span",
                        pair_backend="pallas", pair_group=16,
                        pair_fetch="dma_i", pair_tile_g=4,
                        dtt_leaf_pair2=True,
                        mxu_precision="3xt", tree_paired=True,
                        tree_defer_rs=True, tree_fuse=8,
                        list_compact="sort")
