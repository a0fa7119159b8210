"""End-to-end accuracy of the fast methods vs the fp64 direct oracle.

Mirrors the reference's self-validation strategy: every method's outputs
are compared to direct summation as relative RMS error
(ongrav3d.cpp:781-790), with thresholds from the published accuracy
envelope (README.md:99-110, interface2dvort.cpp:189-192).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onbody_tpu import parts as P
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import KERNELS
from onbody_tpu.traverse import direct, dtt, treecode


def rel_rms(out, ref):
    out = np.asarray(out, np.float64)
    ref = np.asarray(ref, np.float64)
    return np.linalg.norm(out - ref) / np.linalg.norm(ref)


def _problem(kernel, n=2048, seed=0):
    ks, kt = jax.random.split(jax.random.PRNGKey(seed))
    srcs = P.random_in_cube(ks, n, kernel.pd, kernel.sd, True)
    targs = P.random_in_cube(kt, n, kernel.pd, 0, False)
    return srcs, targs


CFG = SolverConfig(block_size=64, order=4, frontier_width=256,
                   list_width=512)


@pytest.mark.parametrize("name", ["grav3d", "vort2d", "vort3d",
                                  "vortgrad3d"])
def test_treecode3_accuracy(name):
    kernel = KERNELS[name]
    srcs, targs = _problem(kernel)
    ref = direct.direct_oracle(kernel, srcs, targs)
    plan = treecode.prepare(kernel, CFG, srcs, targs)
    out, pl = treecode.solve_treecode3(kernel, CFG, plan)
    assert int(pl.overflow) == 0
    assert rel_rms(out, ref) < 3e-3, rel_rms(out, ref)


def test_treecode2_accuracy():
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel)
    ref = direct.direct_oracle(kernel, srcs, targs)
    plan = treecode.prepare(kernel, CFG, srcs, targs)
    out, pl = treecode.solve_treecode2(kernel, CFG, plan)
    assert int(pl.overflow) == 0
    assert rel_rms(out, ref) < 3e-3, rel_rms(out, ref)


def test_treecode1_accuracy():
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel)
    ref = direct.direct_oracle(kernel, srcs, targs)
    plan = treecode.prepare(kernel, CFG, srcs, targs)
    out, pl = treecode.solve_treecode1(kernel, CFG, plan)
    assert int(pl.overflow) == 0
    # monopole approximation at theta=2.0: coarse but bounded
    assert rel_rms(out, ref) < 5e-2, rel_rms(out, ref)


@pytest.mark.parametrize("name", ["grav3d", "vort2d", "vort3d",
                                  "vortgrad3d"])
def test_dtt_accuracy(name):
    """DTT accuracy for all four workloads. vort2d DTT mirrors
    onvort2d.cpp:194; vortgrad3d DTT is a capability the reference ships
    disabled (onvortgrad3d.cpp:264 has no nbody_fastsumm) — here it is a
    first-class path (docs/PARITY.md deviation 4) and must validate like
    the rest."""
    kernel = KERNELS[name]
    srcs, targs = _problem(kernel)
    ref = direct.direct_oracle(kernel, srcs, targs)
    plan = treecode.prepare(kernel, CFG, srcs, targs)
    out, pl = dtt.solve_dtt(kernel, CFG, plan)
    assert int(pl.overflow) == 0
    assert rel_rms(out, ref) < 3e-3, rel_rms(out, ref)


def test_pairmerge_treecode_and_dtt():
    """order<0 path: pair-merge equivalents + copy prolongation."""
    kernel = KERNELS["grav3d"]
    cfg = CFG.replace(order=-1)
    srcs, targs = _problem(kernel)
    ref = direct.direct_oracle(kernel, srcs, targs)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    out2, _ = treecode.solve_treecode2(kernel, cfg, plan)
    assert rel_rms(out2, ref) < 3e-2, rel_rms(out2, ref)
    outd, _ = dtt.solve_dtt(kernel, cfg, plan)
    assert rel_rms(outd, ref) < 5e-2, rel_rms(outd, ref)


@pytest.mark.parametrize("nsrc,ntgt", [(2048, 2048), (4096, 1024),
                                       (1024, 4096)])
def test_dtt_level_traversal(nsrc, ntgt):
    """Simultaneous-descent DTT matches the refine walk's accuracy across
    equal and unequal tree depths (deep-source case exercises the
    leaf-level source-refinement tail)."""
    kernel = KERNELS["grav3d"]
    ks, kt = jax.random.split(jax.random.PRNGKey(3))
    srcs = P.random_in_cube(ks, nsrc, 3, 1, True)
    targs = P.random_in_cube(kt, ntgt, 3, 0, False)
    ref = direct.direct_oracle(kernel, srcs, targs)
    cfg = CFG.replace(dtt_traversal="level", frontier_width=128)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    out, pl = dtt.solve_dtt(kernel, cfg, plan)
    assert int(pl.overflow) == 0
    assert rel_rms(out, ref) < 3e-3, rel_rms(out, ref)


@pytest.mark.parametrize("nsrc,ntgt", [(600, 600), (5000, 5000),
                                       (4096, 1500), (1500, 4096)])
def test_dtt_level_live_prefix(nsrc, ntgt):
    """Static live-prefix level slicing (lists._dtt_lists_level n_live)
    emits the IDENTICAL valid pair set as the full padded walk: real
    particles occupy a slot prefix at every level (pads sort last in
    every build mode), so dead rows beyond ceil(n_real/m_l) can be
    statically dropped. Shapes chosen so padding is heavy (ceil to the
    next power-of-two leaf count) and both tree-depth orders occur."""
    from onbody_tpu.tree import equivalents as eq
    from onbody_tpu.traverse import lists

    kernel = KERNELS["grav3d"]
    ks, kt = jax.random.split(jax.random.PRNGKey(7))
    srcs = P.random_in_cube(ks, nsrc, 3, 1, True)
    targs = P.random_in_cube(kt, ntgt, 3, 0, False)
    cfg = CFG.replace(dtt_traversal="level", frontier_width=160)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    parts = eq.n_eq_parts(plan.tgt_geo.shape[-1], cfg.order, kernel.pd)

    def pairset(pl):
        t = np.asarray(pl.tgt)
        s = np.asarray(pl.src)
        return set(zip(t[s != 0].tolist(), s[s != 0].tolist()))

    pl0 = lists.build_dtt_pairs_level(plan.stree, plan.ttree,
                                      cfg.theta_dtt, cfg.frontier_width,
                                      src_parts=parts, tgt_parts=parts)
    pl1 = lists.build_dtt_pairs_level(plan.stree, plan.ttree,
                                      cfg.theta_dtt, cfg.frontier_width,
                                      src_parts=parts, tgt_parts=parts,
                                      n_live=ntgt)
    assert pl1.tgt.shape[0] <= pl0.tgt.shape[0]
    assert pairset(pl0) == pairset(pl1)
    assert int(pl0.n_valid) == int(pl1.n_valid)
    assert int(pl0.overflow) == int(pl1.overflow) == 0
    # and the full solve (which now passes n_live) stays accurate
    ref = direct.direct_oracle(kernel, srcs, targs)
    out, pl = dtt.solve_dtt(kernel, cfg, plan)
    assert int(pl.overflow) == 0
    assert rel_rms(out, ref) < 3e-3, rel_rms(out, ref)


@pytest.mark.parametrize("nsrc,ntgt", [(2048, 2048), (4096, 1024),
                                       (2080, 2080)])
def test_dtt_flat_lists(nsrc, ntgt):
    """Flat-list traversal matches the dense-rows builder exactly (same
    MAC, same pairs) across equal/unequal depths and heavy padding."""
    kernel = KERNELS["grav3d"]
    ks, kt = jax.random.split(jax.random.PRNGKey(3))
    srcs = P.random_in_cube(ks, nsrc, 3, 1, True)
    targs = P.random_in_cube(kt, ntgt, 3, 0, False)
    ref = direct.direct_oracle(kernel, srcs, targs)
    outs = {}
    for mode in ("flat", "rows"):
        # pin exact f32 MAC geometry: the bit-identical-pairs contract
        # is between the two list LAYOUTS, not the quantized classifier
        cfg = CFG.replace(dtt_lists=mode, mac_geometry="f32")
        plan = treecode.prepare(kernel, cfg, srcs, targs)
        out, info = dtt.solve_dtt(kernel, cfg, plan)
        assert int(info.overflow) == 0
        assert rel_rms(out, ref) < 3e-3, rel_rms(out, ref)
        outs[mode] = (np.asarray(out), int(info.n_valid))
    assert outs["flat"][1] == outs["rows"][1]  # identical pair counts


def test_theta_tightens_error():
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel)
    ref = direct.direct_oracle(kernel, srcs, targs)
    plan = treecode.prepare(kernel, CFG, srcs, targs)
    e = []
    for theta in [0.7, 1.4]:
        out, _ = treecode.solve_treecode3(kernel, CFG, plan, theta=theta)
        e.append(rel_rms(out, ref))
    assert e[1] < e[0] * 2  # larger theta = stricter MAC = lower error


def test_unsorted_targets_roundtrip():
    """Outputs come back in the caller's original target order."""
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel, n=999)
    ref = direct.direct_oracle(kernel, srcs, targs)
    plan = treecode.prepare(kernel, CFG, srcs, targs)
    out, _ = treecode.solve_treecode3(kernel, CFG, plan)
    assert out.shape == (999, 3)
    # correlation per-target (not just global): sort-order bugs would
    # scramble rows
    err = np.abs(np.asarray(out) - np.asarray(ref)).max(axis=1)
    scale = np.abs(np.asarray(ref)).max()
    assert (err < 0.05 * scale).mean() > 0.99


def test_mac_geometry_quant_matches_f32():
    """Quantized MAC geometry (one u16x4 c64 gather) produces the same
    accuracy envelope as exact f32 geometry, with near-identical pair
    volume and zero overflow. Pair sets may differ on razor-edge MAC
    decisions (<0.2% distance jitter), never in validity."""
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel, n=6000)
    ref = direct.direct_oracle(kernel, srcs, targs)
    res = {}
    for mg in ("quant", "f32"):
        cfg = CFG.replace(dtt_traversal="level", frontier_width=160,
                          mac_geometry=mg)
        plan = treecode.prepare(kernel, cfg, srcs, targs)
        out, info = dtt.solve_dtt(kernel, cfg, plan)
        assert int(info.overflow) == 0
        assert rel_rms(out, ref) < 3e-3, (mg, rel_rms(out, ref))
        res[mg] = int(info.n_valid)
    # pair volumes within 1% of each other
    assert abs(res["quant"] - res["f32"]) <= max(20, res["f32"] // 100)


def test_lean_plan_matches_full():
    """lean_plan (direct fm/geo builds, unpadded feature rows, no
    point-major Blocks) produces the same DTT results as the full plan."""
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel, n=3000)
    # order 3: lean fm requires (order+1)^pd <= block_size (64 here)
    cfg = CFG.replace(pair_backend="xla", order=3)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    ref, _ = dtt.solve_dtt(kernel, cfg, plan)

    lean_cfg = cfg.replace(lean_plan=True)
    lp = treecode.prepare(kernel, lean_cfg, srcs, targs)
    assert lp.src_blocks is None and lp.tgt_blocks is None
    assert lp.src_fm.shape[1] == 5      # grav3d true rows, unpadded
    out, info = dtt.solve_dtt(kernel, lean_cfg, lp)
    assert int(info.overflow) == 0
    # atol covers fp32 op-ordering noise: the lean builders evaluate the
    # same proxy math with different reduction/chunk shapes (~4e-8 max)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_bary_fm_leaf_chunking_exact():
    """The fori_loop leaf featurize (leaf_chunk < nleaf — the 1e8 HBM
    path) is bit-identical to the single-dispatch leaf featurize."""
    from onbody_tpu.tree import build as tree_build
    from onbody_tpu.tree import equivalents as eq
    kernel = KERNELS["grav3d"]
    srcs, _ = _problem(kernel, n=3000)
    tree, ss, _ = tree_build.build_tree(srcs, 64)
    ref = eq.barycentric_fm(tree, ss, 3, kernel.name, pad8=False,
                            flat=True)
    chunked_fm = eq.barycentric_fm(tree, ss, 3, kernel.name, pad8=False,
                                   flat=True, leaf_chunk=4)
    np.testing.assert_array_equal(np.asarray(chunked_fm),
                                  np.asarray(ref))


def test_chunked_solve_matches_plain():
    """Subtree-chunked DTT (the 1e8 memory path: lean fm + sequential
    target slabs) matches the monolithic solve."""
    from onbody_tpu.traverse import chunked
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel, n=8192)
    cfg = SolverConfig(block_size=64, order=3, frontier_width=192,
                       list_width=512, pair_backend="xla",
                       cap_groups_dtt=32)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    ref, rinfo = dtt.solve_dtt(kernel, cfg, plan)
    assert int(rinfo.overflow) == 0
    out, info = chunked.solve_dtt_chunked(kernel, cfg, srcs, targs,
                                          n_chunks=4)
    assert int(np.asarray(info.overflow)) == 0
    # ownership path (the 1e8 HBM diet): the solver generates and frees
    # the originals itself — must give the identical answer
    out2, info2 = chunked.solve_dtt_chunked(
        kernel, cfg, make_problem=lambda: _problem(kernel, n=8192),
        n_chunks=4)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out))
    # fp32 accumulation-order differences (per-chunk executor order) sit
    # around 1e-7 absolute; this compares far below the 1e-4 physics
    # accuracy envelope
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)


def test_chunked_solve_dma_fetch_matches():
    """chunked solve with the dma_i Pallas fetch (pad8 feature-major
    source blocks) matches the flat/pregather chunked result — the 1e8
    config switch motivated by the 1e7 pregather-vs-dma_i gap
    (docs/PERF.md r2k/r2s8)."""
    from onbody_tpu.traverse import chunked
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel, n=8192)
    cfg = SolverConfig(block_size=128, order=3, frontier_width=192,
                       list_width=512, pair_backend="xla",
                       cap_groups_dtt=32)
    ref, rinfo = chunked.solve_dtt_chunked(kernel, cfg, srcs, targs,
                                           n_chunks=4)
    assert int(np.asarray(rinfo.overflow)) == 0
    cfg_dma = cfg.replace(pair_backend="pallas", pair_fetch="dma_i",
                          pair_group=8, pair_tile_g=4)
    out, info = chunked.solve_dtt_chunked(kernel, cfg_dma, srcs, targs,
                                          n_chunks=4)
    assert int(np.asarray(info.overflow)) == 0
    # same pairs, different executor/accumulation order (~1e-7 abs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("n_chunks", [2, 4])
def test_chunked_solve_leaf_pair2_matches(n_chunks):
    """chunked solve with sibling-paired leaf execution (the t2
    executor over the slab, cfg.dtt_leaf_pair2) matches the plain
    chunked result. leaf0_loc = 2^split + 2^(levels_t-split) - 1 is
    always odd for real chunk counts, so these exercise the shifted
    geo/accumulator views (the even branch is the monolithic layout's,
    kept for safety)."""
    from onbody_tpu.traverse import chunked
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel, n=8192)
    cfg = SolverConfig(block_size=128, order=3, frontier_width=192,
                       list_width=512, pair_backend="xla",
                       cap_groups_dtt=32)
    ref, rinfo = chunked.solve_dtt_chunked(kernel, cfg, srcs, targs,
                                           n_chunks=n_chunks)
    assert int(np.asarray(rinfo.overflow)) == 0
    cfg_p2 = cfg.replace(pair_backend="pallas", pair_fetch="dma_i",
                         pair_group=8, pair_tile_g=4,
                         dtt_leaf_pair2=True)
    out, info = chunked.solve_dtt_chunked(kernel, cfg_p2, srcs, targs,
                                          n_chunks=n_chunks)
    assert int(np.asarray(info.overflow)) == 0
    # leaf pairs counted twice by the paired builder == once per
    # sibling by the plain one; totals must agree
    assert int(np.asarray(info.n_valid)) == int(np.asarray(rinfo.n_valid))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)


def test_chunked_solve_dead_chunk_skipped():
    """Ragged N where a whole level-`split` subtree is padding: the
    host-side dead-root skip must return the same result as the
    monolithic solve (1e8 has 4 dead roots of 16 at 34% leaf padding)."""
    from onbody_tpu.traverse import chunked
    kernel = KERNELS["grav3d"]
    # 6144 at block 64 -> 96 live leaves of 128 padded; with 4 chunks
    # (level-2 roots of 32 leaves) chunk 3 is entirely dead
    srcs, targs = _problem(kernel, n=6144)
    cfg = SolverConfig(block_size=64, order=3, frontier_width=192,
                       list_width=512, pair_backend="xla",
                       cap_groups_dtt=32)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    ref, rinfo = dtt.solve_dtt(kernel, cfg, plan)
    assert int(rinfo.overflow) == 0
    out, info = chunked.solve_dtt_chunked(kernel, cfg, srcs, targs,
                                          n_chunks=4)
    assert int(np.asarray(info.overflow)) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("trav", ["level", "refine"])
def test_split_equivalent_rows(trav):
    """Split equivalent rows (equivalents.n_eq_parts > 1): a proxy grid
    wider than the block row spans extension rows — the analogue of the
    reference's independent eqBlockSize (ongrav3d.cpp:543-550). Order 5
    in 3D (M=216) at lane-width 128 splits into 2 parts; the DTT must
    match the oracle at the order-5 envelope (tighter than order 4) and
    the higher order must actually pay off."""
    from onbody_tpu.tree import equivalents as eq
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel, n=6000)
    ref = direct.direct_oracle(kernel, srcs, targs)
    cfg = SolverConfig(block_size=128, order=5, theta_dtt=1.3,
                       frontier_width=256, list_width=1024,
                       cap_groups_dtt=64, dtt_traversal=trav)
    assert eq.n_eq_parts(eq.block_width(cfg.block_size), cfg.order,
                         kernel.pd) == 2
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    # extension rows exist: NN + (parts-1)*nleaf block rows
    nleaf = plan.ttree.nleaf
    assert plan.tgt_geo.shape[0] == 3 * nleaf
    out, info = dtt.solve_dtt(kernel, cfg, plan)
    assert int(info.overflow) == 0
    e5 = rel_rms(out, ref)
    assert e5 < 5e-5, e5
    # order 4 (single row) at the same theta is strictly less accurate
    cfg4 = cfg.replace(order=4)
    plan4 = treecode.prepare(kernel, cfg4, srcs, targs)
    out4, _ = dtt.solve_dtt(kernel, cfg4, plan4)
    assert e5 < rel_rms(out4, ref), (e5, rel_rms(out4, ref))


def test_split_equivalent_rows_treecode3():
    """Boxwise treecode with split proxy rows (source side only)."""
    from onbody_tpu.tree import equivalents as eq
    kernel = KERNELS["vort3d"]
    srcs, targs = _problem(kernel, n=4096)
    ref = direct.direct_oracle(kernel, srcs, targs)
    cfg = SolverConfig(block_size=128, order=5, theta_boxwise=1.0,
                       frontier_width=256, list_width=1024,
                       cap_groups_treecode=64)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    out, info = treecode.solve_treecode3(kernel, cfg, plan)
    assert int(info.overflow) == 0
    assert rel_rms(out, ref) < 1e-4, rel_rms(out, ref)


def test_fused_solve_matches_split():
    """solve_dtt_fused (the 1e6 bench path: whole pipeline as one jit)
    matches the phase-split prepare + solve_dtt, in both unscrambled and
    tree-order forms."""
    # compiling the whole-pipeline program after ~35 compiles of module
    # state reproducibly segfaults XLA:CPU's LLVM (r3; passes alone) —
    # shed the in-process compiler state before the big compile
    jax.clear_caches()
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel, n=5000)
    cfg = SolverConfig(block_size=64, order=3, pair_backend="xla")
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    ref, rinfo = dtt.solve_dtt(kernel, cfg, plan)
    out, info = dtt.solve_dtt_fused(kernel, cfg, srcs, targs)
    assert int(np.asarray(info.overflow)) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)
    (outs, inv), _ = dtt.solve_dtt_fused(kernel, cfg, srcs, targs,
                                         unscramble=False)
    res = np.asarray(outs)[np.asarray(inv)]
    np.testing.assert_allclose(res, np.asarray(ref), rtol=1e-5,
                               atol=1e-7)


@pytest.mark.parametrize("name,n,fetch", [("grav3d", 8000, "dma_i"),
                                          ("grav3d", 6700, "dma_i"),
                                          ("grav3d", 6700, "pregather"),
                                          ("vortgrad3d", 8000, "dma_i"),
                                          ("grav3d", 8000, "pregather")])
def test_dtt_leaf_pair2_bit_identical(name, n, fetch):
    """cfg.dtt_leaf_pair2: the sibling-paired leaf execution keeps the
    pair set and per-target accumulation order, so real-row outputs are
    BIT-identical to the unpaired executor (the leaf candidate rows are
    jnp.repeat of the parent rows — lists._dtt_lists_level). n=6700
    makes the alive-leaf count odd (27 of 32 at bs256), so the ragged
    boundary parent has a DEAD right child: n_valid must still match
    the unpaired builder exactly (ADVICE r2 — the dead sibling is
    evaluated but not counted). The pregather cases cover the
    sibling-shared row-gather executor (_body_pre_t2 — the only t2
    form whose fm layout fits N=1e8)."""
    kernel = KERNELS[name]
    ks, kt = jax.random.split(jax.random.PRNGKey(11))
    srcs = P.random_in_cube(ks, n, kernel.pd, kernel.sd, True)
    targs = P.random_in_cube(kt, n, kernel.pd, 0, False)
    cfg = SolverConfig(block_size=256, order=5, theta_dtt=1.2,
                       frontier_width=128, cap_groups_dtt=16,
                       pair_backend="pallas", pair_group=32,
                       pair_fetch=fetch, pair_tile_g=4,
                       tree_mode="span", mxu_precision="3xt",
                       tree_paired=True, tree_defer_rs=True,
                       list_compact="sort")
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    out0, info0 = dtt.solve_dtt(kernel, cfg, plan)
    out1, info1 = dtt.solve_dtt(kernel, cfg.replace(dtt_leaf_pair2=True),
                                plan)
    assert int(info1.overflow) == 0
    assert int(info1.n_valid) == int(info0.n_valid)
    assert np.array_equal(np.asarray(out0), np.asarray(out1))


def test_inert_pad_row_is_featurized_safe():
    """r5 1e9 NaN regression (docs/PERF.md "r5 1e9 NaN hunt"): fm row 0
    is the inert row every padded pair list gathers. It must carry
    RADIUS 1 (featurized: rad^2 for grav3d) — an all-zero row meets a
    target grid point exactly at the origin with d2+sr^2 = 0 and
    rsqrt(0) * 0-strength = NaN, which the downward prolongation then
    spreads to every leaf below the poisoned node (the three top nodes
    cornered exactly at (0,0,0) at 1e9/split 6)."""
    from onbody_tpu.ops import pallas_pairs as pp
    from onbody_tpu.tree import build as tree_build
    from onbody_tpu.tree import equivalents as eq
    kernel = KERNELS["grav3d"]
    srcs, _ = _problem(kernel, n=256)
    tree, ss, _ = tree_build.build_tree(srcs, 64)
    fm = eq.barycentric_fm(tree, ss, 3, kernel.name, pad8=False,
                           flat=True)
    B = 64
    row0 = np.asarray(fm[0]).reshape(5, B)
    assert np.all(row0[:3] == 0.0)          # position: origin
    assert np.all(row0[3] == 1.0)           # rad^2 = 1, NOT 0
    assert np.all(row0[4] == 0.0)           # strength: inert
    # executor-level: a target block sitting EXACTLY at the origin with
    # zero radii, fed only pad entries (source row 0), must come back
    # finite and exactly zero
    pos = jnp.zeros((2, B, 3), jnp.float32)
    rad = jnp.zeros((2, B), jnp.float32)
    tgt_geo = pp.build_tgt_geo(pos, rad)
    gt = jnp.array([1] + [0] * 7, jnp.int32)
    gs = jnp.zeros((8, pp.GROUP), jnp.int32)
    out = pp.exec_pairs_pallas(kernel, tgt_geo, fm, gt, gs,
                               interpret=True, fetch="pregather")
    got = np.asarray(out[1])
    assert np.isfinite(got).all()
    assert np.abs(got).max() == 0.0
