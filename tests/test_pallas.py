"""Pallas pair executor (interpret mode on CPU) vs the jnp backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onbody_tpu import parts as P
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops import pallas_pairs as pp
from onbody_tpu.ops.kernels import KERNELS, TILE_FM, featurize
from onbody_tpu.traverse import direct, dtt, exec as pexec
from onbody_tpu.traverse import lists, treecode

CFG = SolverConfig(block_size=32, order=3, frontier_width=256,
                   list_width=512)
CFG_P = CFG.replace(pair_backend="pallas")


@pytest.mark.parametrize("name", list(KERNELS))
def test_tile_fm_matches_tile(name):
    """Feature-major tile form == point-major tile form."""
    kernel = KERNELS[name]
    k = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(k, 5)
    T, S = 32, 32
    tx = jax.random.uniform(k1, (T, kernel.pd), jnp.float64, -1, 1)
    sx = jax.random.uniform(k2, (S, kernel.pd), jnp.float64, -1, 1)
    sr = jax.random.uniform(k3, (S,), jnp.float64, 0.01, 0.05)
    tr = jax.random.uniform(k4, (T,), jnp.float64, 0.01, 0.05)
    ss = jax.random.uniform(k5, (S, kernel.sd), jnp.float64, -1, 1) / S
    ref = kernel.tile(tx, tr, sx, sr, ss, "rm", jnp.float64, "exact")
    srcT = featurize(name, sx, sr, ss)
    out = TILE_FM[name](tx, tr, srcT, "rm", jnp.float64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("name", ["vort3d", "vortgrad3d"])
def test_tile_fm_off_origin_f32_floor(name):
    """f32 fm tiles must build moment rows from tile-LOCAL coordinates.

    Regression guard: the earlier layout stored ABSOLUTE moments
    (e = w x s, w(x)s, e(x)s) whose f32 rounding is relative to the
    domain scale; recombining them at pair separation d amplifies it by
    (|s|/d)^k — measured 2.2e-4 rel for vortgrad3d with tiles at offset
    5 (and 3.9e-4 end-to-end at N=3e4). The lean in-kernel centered
    form stays at the ~3e-7 f32 floor regardless of tile placement."""
    kernel = KERNELS[name]
    rng = np.random.default_rng(7)
    B, off = 64, 5.0
    tx = jnp.asarray(rng.random((B, 3), np.float32) * 0.05 + off)
    tr = jnp.asarray(rng.random((B,), np.float32) * 0.01)
    sx = jnp.asarray(rng.random((B, 3), np.float32) * 0.05 + off + 0.1)
    sr = jnp.asarray(rng.random((B,), np.float32) * 0.01 + 0.01)
    ss = jnp.asarray(rng.random((B, 3), np.float32) - 0.5)
    ref = np.asarray(kernel.pairwise(
        tx.astype(jnp.float64), tr.astype(jnp.float64),
        sx.astype(jnp.float64), sr.astype(jnp.float64),
        ss.astype(jnp.float64)).sum(axis=1))
    srcT = featurize(name, sx, sr, ss)
    out = np.asarray(TILE_FM[name](tx, tr, srcT, "rm"))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 5e-6, rel


@pytest.mark.parametrize("name", ["grav3d", "vort2d", "vortgrad3d"])
def test_pallas_exec_matches_jnp(name):
    kernel = KERNELS[name]
    ks, kt = jax.random.split(jax.random.PRNGKey(3))
    srcs = P.random_in_cube(ks, 700, kernel.pd, kernel.sd, True)
    targs = P.random_in_cube(kt, 700, kernel.pd, 0, False)
    plan = treecode.prepare(kernel, CFG, srcs, targs)
    raw = lists.build_treecode_pairs(plan.stree, plan.ttree, 1.0,
                                     "boxwise", CFG.frontier_width,
                                     CFG.list_width)
    ref, _ = pexec.exec_pairs(kernel, CFG, plan, raw, CFG.list_width, 48)
    out, pg = pexec.exec_pairs(kernel, CFG_P, plan, raw, CFG.list_width, 48)
    assert int(pg.overflow) == 0
    nleaf = plan.ttree.nleaf
    a = np.asarray(out[nleaf:])
    b = np.asarray(ref[nleaf:])
    np.testing.assert_allclose(a, b, rtol=3e-4, atol=1e-4)


def test_solver_pallas_backend_end_to_end():
    kernel = KERNELS["grav3d"]
    ks, kt = jax.random.split(jax.random.PRNGKey(11))
    srcs = P.random_in_cube(ks, 1500, 3, 1, True)
    targs = P.random_in_cube(kt, 1500, 3, 0, False)
    plan = treecode.prepare(kernel, CFG_P, srcs, targs)
    out, info = dtt.solve_dtt(kernel, CFG_P, plan)
    ref = direct.direct_oracle(kernel, srcs, targs)
    rel = (np.linalg.norm(np.asarray(out) - np.asarray(ref)) /
           np.linalg.norm(np.asarray(ref)))
    assert rel < 3e-3, rel


def test_group_pairs_chunking():
    """Grouped compaction keeps every valid pair exactly once."""
    K, G = 16, 8
    tgt = jnp.repeat(jnp.arange(1, 5, dtype=jnp.int32), K)
    src = jnp.zeros((4, K), jnp.int32)
    src = src.at[0, :3].set(jnp.array([7, 8, 9], jnp.int32))
    src = src.at[2, :10].set(jnp.arange(10, 20, dtype=jnp.int32))
    raw = lists.PairList(tgt=tgt, src=src.reshape(-1),
                         n_valid=jnp.int32(13), overflow=jnp.int32(0))
    pg = lists.group_pairs(raw, cap=8, group=G, slot_width=K)
    assert int(pg.overflow) == 0
    t = np.asarray(pg.tgt)
    s = np.asarray(pg.src)
    # row 1: one chunk with 3 valid; row 3: two chunks (8 + 2)
    got = [(t[i], list(s[i][s[i] != 0])) for i in range(len(t))
           if s[i].any()]
    assert got == [(1, [7, 8, 9]), (3, list(range(10, 18))),
                   (3, [18, 19])]


def test_pallas_direct_matches_oracle():
    from onbody_tpu.ops import pallas_direct as pd
    kernel = KERNELS["grav3d"]
    ks, kt = jax.random.split(jax.random.PRNGKey(21))
    srcs = P.random_in_cube(ks, 300, 3, 1, True)
    targs = P.random_in_cube(kt, 211, 3, 0, False)
    ref = direct.direct_oracle(kernel, srcs, targs)
    tr = jnp.zeros_like(targs.r)
    out = pd.direct_pallas(kernel, targs.x, tr, srcs.x, srcs.r, srcs.s,
                           interpret=True)
    rel = (np.linalg.norm(np.asarray(out) - np.asarray(ref)) /
           np.linalg.norm(np.asarray(ref)))
    assert rel < 2e-5, rel


def test_fm_center_d2_matches_outer_f32():
    """MXU-Gram d2 must track the exact broadcast form in fp32 at the
    accuracy floor (near tiles: centering bounds cancellation)."""
    from onbody_tpu.ops.kernels import TILE_FM, featurize
    kernel = KERNELS["grav3d"]
    k = jax.random.PRNGKey(5)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    # near tile: tight cluster (worst case for Gram cancellation)
    tx = 0.5 + 0.01 * jax.random.uniform(k1, (128, 3), jnp.float32)
    sx = 0.5 + 0.01 * jax.random.uniform(k2, (128, 3), jnp.float32)
    sr = jax.random.uniform(k3, (128,), jnp.float32, 0.005, 0.01)
    ss = jax.random.uniform(k4, (128, 1), jnp.float32, -1, 1) / 128
    tr = jnp.zeros((128,), jnp.float32)
    srcT = featurize("grav3d", sx, sr, ss)
    a = TILE_FM["grav3d"](tx, tr, srcT, "rm", jnp.float32, "outer")
    b = TILE_FM["grav3d"](tx, tr, srcT, "rm", jnp.float32, "center")
    rel = (np.linalg.norm(np.asarray(a) - np.asarray(b)) /
           np.linalg.norm(np.asarray(a)))
    assert rel < 5e-5, rel


@pytest.mark.parametrize("name", ["grav3d", "vort2d"])
def test_pregather_lean_storage_vs_oracle(name):
    """Regression: the pregather executor pads LEAN (unaligned-row)
    feature blocks to the sublane tile with kernel-DERIVED rows
    (pad_fm_rows). A zero pad is silently catastrophic — the tile
    kernels dispatch the folded-product path on the row count and would
    contract zeros (measured rel-RMS 0.12 before the fix)."""
    import dataclasses
    kernel = KERNELS[name]
    ks, kt = jax.random.split(jax.random.PRNGKey(5))
    srcs = P.random_in_cube(ks, 1500, kernel.pd, kernel.sd, True)
    targs = P.random_in_cube(kt, 1500, kernel.pd, 0, False)
    cfg = dataclasses.replace(CFG_P, order=3, lean_plan=True,
                              pair_fetch="pregather")
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    assert plan.src_fm.shape[1] % 8 != 0, "not lean — test is vacuous"
    out, info = dtt.solve_dtt(kernel, cfg, plan)
    assert int(np.asarray(info.overflow)) == 0
    ref = direct.direct_oracle(kernel, srcs, targs)
    rel = (np.linalg.norm(np.asarray(out) - np.asarray(ref)) /
           np.linalg.norm(np.asarray(ref)))
    assert rel < 2e-2, rel


def test_dma_kernel_pad_steps_skipped():
    """Padding group steps (tgt row 0) issue no source DMAs and no
    compute; pads between different targets and at the tail must leave
    results identical to the XLA grouped executor. (Pads may NOT split
    one target's run — _compact_groups front-packs, preserving runs.)"""
    kernel = KERNELS["grav3d"]
    B, NN = 32, 8
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    pos = jax.random.uniform(ks[0], (NN, B, 3))
    rad = jnp.full((NN, B), 0.05).at[0].set(1.0)     # row 0 inert
    s = (jax.random.normal(ks[1], (NN, B, 1)) / B).at[0].set(0.0)
    src_fm = pp.build_fm_blocks(kernel, pos, rad, s)
    tgt_geo = pp.build_tgt_geo(pos, rad)
    for gt_list in ([1, 1, 2, 3, 3, 0, 0, 0],      # tail pads
                    [1, 1, 0, 2, 2, 0, 3, 0],      # between-target pads
                    [0] * 8):                      # all pads
        gt = jnp.array(gt_list, jnp.int32)
        gs = jax.random.randint(ks[2], (8, pp.GROUP), 1, NN)
        gs = jnp.where((gt == 0)[:, None], 0, gs)
        out = pp.exec_pairs_pallas(kernel, tgt_geo, src_fm, gt, gs,
                                   interpret=True, fetch="dma")
        ref = pexec._exec_groups_xla_chunked(
            kernel, tgt_geo, src_fm, (gt, gs), jnp.zeros_like(out),
            "rm", jnp.float32, "outer", pp.GROUP, 1024, "highest")
        scale = max(float(jnp.max(jnp.abs(ref[1:]))), 1e-30)
        rel = float(jnp.max(jnp.abs(out[1:] - ref[1:]))) / scale
        assert rel < 1e-4, (gt_list, rel)
        # interleaved-issue variant: same result modulo sub-tile dot
        # reassociation (~1e-5)
        out_i = pp.exec_pairs_pallas(kernel, tgt_geo, src_fm, gt, gs,
                                     interpret=True, fetch="dma_i",
                                     tile_g=2)
        rel_i = float(jnp.max(jnp.abs(out_i[1:] - ref[1:]))) / scale
        assert rel_i < 1e-4, (gt_list, rel_i)


@pytest.mark.parametrize("name", ["vort3d", "vortgrad3d"])
def test_dma_i_vortex_kernels(name):
    """dma_i fetch for the vector-strength kernels (8-row aligned lean
    layout, in-kernel moments): interpret-mode vs the XLA grouped
    executor. The q21 on-chip coverage only ran grav3d through dma_i at
    the bench sizes; the vortex tiles add the permutation-matmul cross
    path inside the dma pipeline."""
    kernel = KERNELS[name]
    B, NN = 32, 8
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    pos = jax.random.uniform(ks[0], (NN, B, 3))
    rad = jnp.full((NN, B), 0.05)
    s = jax.random.normal(ks[1], (NN, B, 3)) / B
    src_fm = pp.build_fm_blocks(kernel, pos, rad, s)
    tgt_geo = pp.build_tgt_geo(pos, rad)
    gt = jnp.array([1, 1, 2, 3, 3, 0, 0, 0], jnp.int32)
    gs = jax.random.randint(ks[2], (8, pp.GROUP), 1, NN)
    gs = jnp.where((gt == 0)[:, None], 0, gs)
    ref = pexec._exec_groups_xla_chunked(
        kernel, tgt_geo, src_fm, (gt, gs),
        jnp.zeros((NN, B, kernel.od), jnp.float32),
        "rm", jnp.float32, "outer", pp.GROUP, 1024, "highest")
    out = pp.exec_pairs_pallas(kernel, tgt_geo, src_fm, gt, gs,
                               interpret=True, fetch="dma_i", tile_g=2)
    scale = max(float(jnp.max(jnp.abs(ref[1:]))), 1e-30)
    rel = float(jnp.max(jnp.abs(out[1:] - ref[1:]))) / scale
    assert rel < 1e-4, rel


@pytest.mark.parametrize("prec,tol_grad", [("highest", 2e-6),
                                           ("6xt", 2e-6),
                                           ("3xt", 1e-4)])
def test_vortgrad_precision_tiers(prec, tol_grad):
    """Per-tile accuracy of the _dotg_fm tiers on vortgrad3d. The oB
    (gradient) contraction is clamped to 6xt inside the kernel whenever
    a reduced tier is requested — the 3xt row therefore bounds only the
    residual oR noise (the un-clamped 3xt oB measured 1.4e-5/tile and
    1.3e-3 end-to-end, docs/PERF.md r2s12)."""
    kernel = KERNELS["vortgrad3d"]
    rng = np.random.default_rng(11)
    B = 256
    ext = 0.127
    tx = jnp.asarray(rng.random((B, 3), np.float32) * ext + 0.3)
    tr = jnp.zeros((B,), jnp.float32)
    sx = jnp.asarray(rng.random((B, 3), np.float32) * ext + 0.3 + ext)
    sr = jnp.full((B,), 1e-2, jnp.float32)
    ss = jnp.asarray((rng.random((B, 3), np.float32) - 0.5) * 2e-6)
    ref = np.asarray(kernel.pairwise(
        tx.astype(jnp.float64), tr.astype(jnp.float64),
        sx.astype(jnp.float64), sr.astype(jnp.float64),
        ss.astype(jnp.float64)).sum(axis=1))
    srcT = featurize("vortgrad3d", sx, sr, ss)
    out = np.asarray(TILE_FM["vortgrad3d"](tx, tr, srcT, "rm",
                                           jnp.float32, "outer", prec))
    rg = (np.linalg.norm(out[:, 3:] - ref[:, 3:])
          / np.linalg.norm(ref[:, 3:]))
    assert rg < tol_grad, (prec, rg)


def test_dma_pair_bundled_kernel():
    """Adjacent-row bundled fetch (fetch='dma_p') matches the XLA
    executor across adjacency patterns: full ascending runs, mixed
    singles/pairs/pads, last-slot adjacency (cannot head a pair), and
    3-long consecutive runs (greedy takes (a,a+1), then a+2 single)."""
    kernel = KERNELS["grav3d"]
    B, NN = 32, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    pos = jax.random.uniform(ks[0], (NN, B, 3))
    rad = jnp.full((NN, B), 0.05).at[0].set(1.0)
    s = (jax.random.normal(ks[1], (NN, B, 1)) / B).at[0].set(0.0)
    src_fm = pp.build_fm_blocks(kernel, pos, rad, s)
    tgt_geo = pp.build_tgt_geo(pos, rad)
    for rows in ([[2, 3, 4, 5, 6, 7, 8, 9]],
                 [[3, 4, 7, 9, 10, 13, 0, 0]],
                 [[5, 9, 11, 2, 6, 8, 14, 15]],
                 [[4, 5, 6, 1, 12, 2, 0, 0]]):
        gs = jnp.array(rows * 4, jnp.int32)
        gt = jnp.array([1, 2, 3, 3], jnp.int32)
        out = pp.exec_pairs_pallas(kernel, tgt_geo, src_fm, gt, gs,
                                   interpret=True, fetch="dma_p",
                                   tile_g=4)
        ref = pexec._exec_groups_xla_chunked(
            kernel, tgt_geo, src_fm, (gt, gs), jnp.zeros_like(out),
            "rm", jnp.float32, "outer", gs.shape[1], 1024, "highest")
        scale = max(float(jnp.max(jnp.abs(ref[1:]))), 1e-30)
        rel = float(jnp.max(jnp.abs(out[1:] - ref[1:]))) / scale
        assert rel < 1e-4, (rows, rel)


def test_t2_executor_matches_and_preserves_root():
    """Sibling-paired executor: expanded-pair equivalence plus the pad
    contract — padding steps map to out block 0 (rows 0..1) and row 1
    is the ROOT accumulator, which must survive the pipeline writeback
    (the t2 body copies prev through on pads instead of skipping the
    write)."""
    kernel = KERNELS["grav3d"]
    B, NN = 32, 8                       # 4 parent blocks of 2 rows
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    pos = jax.random.uniform(ks[0], (NN, B, 3))
    rad = jnp.full((NN, B), 0.05)
    s = jax.random.normal(ks[1], (NN, B, 1)) / B
    src_fm = pp.build_fm_blocks(kernel, pos, rad, s)
    tgt_geo = pp.build_tgt_geo(pos, rad)
    # parents 1..3 (rows 2..7); trailing pads
    gt2 = jnp.array([1, 1, 2, 3, 0, 0, 0, 0], jnp.int32)
    gs2 = jax.random.randint(ks[2], (8, pp.GROUP), 1, NN)
    gs2 = jnp.where((gt2 == 0)[:, None], 0, gs2)
    od8 = -(-kernel.od // 8) * 8
    root_val = 7.25
    out_fm = jnp.zeros((NN, od8, B), jnp.float32).at[1].set(root_val)
    got = pp.exec_pairs_pallas_t2(kernel, tgt_geo, src_fm, gt2, gs2,
                                  out_fm, interpret=True, tile_g=2)
    # reference: expand each entry to both children rows
    gt_x = jnp.concatenate([2 * gt2, 2 * gt2 + 1])
    gt_x = jnp.where(jnp.concatenate([gt2, gt2]) == 0, 0, gt_x)
    gs_x = jnp.concatenate([gs2, gs2])
    order = jnp.argsort(jnp.where(gt_x == 0, 10 ** 6, gt_x), stable=True)
    ref = pexec._exec_groups_xla_chunked(
        kernel, tgt_geo, src_fm, (gt_x[order], gs_x[order]),
        jnp.zeros((NN, B, kernel.od), jnp.float32),
        "rm", jnp.float32, "outer", pp.GROUP, 1024, "highest")
    got_pm = jnp.transpose(got[:, :kernel.od, :], (0, 2, 1))
    # tile_g-wide sub-tile contraction vs per-block adds: f32 order
    # noise, amplified on cancellation-heavy sums — scale-relative check
    scale = max(float(jnp.max(jnp.abs(ref[2:]))), 1e-30)
    rel = float(jnp.max(jnp.abs(got_pm[2:] - ref[2:]))) / scale
    assert rel < 1e-4, rel
    # the root row (inside the pad block) is preserved exactly
    assert float(jnp.min(got[1])) == root_val
    assert float(jnp.max(got[1])) == root_val
