"""Tree construction invariants and equivalent-particle conservation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onbody_tpu import parts as P
from onbody_tpu.tree import build, equivalents as eq


def _srcs(n=1000, pd=3, sd=1, seed=0):
    return P.random_in_cube(jax.random.PRNGKey(seed), n, pd, sd, True,
                            dtype=jnp.float32)


def test_plan_sizes():
    assert build.plan(1000, 128) == (3, 1024)      # 8 leaves
    assert build.plan(1024, 128) == (3, 1024)
    assert build.plan(1025, 128) == (4, 2048)
    assert build.plan(1, 128) == (0, 128)


def test_tree_boxes_contain_particles():
    """Node boxes tightly bound the REAL particles of their segment;
    padding clones (gidx >= n_real) are excluded from box geometry by
    design (build._masked_box) so MACs never see the padding cluster."""
    p = _srcs(1000)
    tree, sp, gidx = build.build_tree(p, block_size=128)
    x = np.asarray(sp.x)
    real = np.asarray(gidx) < p.n_real
    nleaf = tree.nleaf
    n_pad = x.shape[0]
    for node in range(1, 2 * nleaf):
        l = int(np.log2(node))
        k = node - (1 << l)
        m = n_pad >> l
        seg = x[k * m:(k + 1) * m]
        seg_real = seg[real[k * m:(k + 1) * m]]
        nc = np.asarray(tree.nc[node])
        ns = np.asarray(tree.ns[node])
        if len(seg_real):
            assert np.all(seg_real >= nc - ns / 2 - 1e-6)
            assert np.all(seg_real <= nc + ns / 2 + 1e-6)
            # and the box is TIGHT around the real particles
            np.testing.assert_allclose(nc - ns / 2, seg_real.min(0),
                                       atol=1e-6)
            np.testing.assert_allclose(nc + ns / 2, seg_real.max(0),
                                       atol=1e-6)
        else:
            # pure-padding node: box falls back to the pad positions
            assert np.all(seg >= nc - ns / 2 - 1e-6)
            assert np.all(seg <= nc + ns / 2 + 1e-6)
    # node radius = half-diagonal (barneshut.hpp:637-639)
    nr = np.asarray(tree.nr[1:])
    ns = np.asarray(tree.ns[1:])
    np.testing.assert_allclose(nr, 0.5 * np.sqrt((ns ** 2).sum(1)),
                               rtol=1e-5)


def test_tree_strength_sums_conserved():
    p = _srcs(777, sd=3)
    tree, sp, gidx = build.build_tree(p, block_size=64)
    total = np.asarray(jnp.sum(p.s, axis=0))
    # every level conserves total strength (padding is zero-strength)
    for l in range(tree.levels + 1):
        sl = tree.level_slice(l)
        lvl = np.asarray(tree.s[sl]).sum(axis=0)
        np.testing.assert_allclose(lvl, total, rtol=1e-4, atol=1e-8)


def test_gidx_is_permutation():
    p = _srcs(500)
    tree, sp, gidx = build.build_tree(p, block_size=128)
    g = np.asarray(gidx)
    assert sorted(g.tolist()) == list(range(len(g)))
    # positions really are permuted originals
    orig = np.asarray(P.pad_to(p, len(g)).x)
    np.testing.assert_array_equal(np.asarray(sp.x), orig[g])


def test_bitonic_seg_sort_matches_lax_sort():
    """The explicit bitonic network (build._seg_sort, short tree-level
    segments) reproduces lax.sort exactly for distinct keys, and the
    key order for duplicates."""
    rng = np.random.default_rng(3)
    old = build.BITONIC_MAX_M
    old_chunk = build._BITONIC_CHUNK_ELEMS
    build.BITONIC_MAX_M = 4096
    # tiny chunk budget forces the fori_loop row-chunked path (incl.
    # the clamped-overlap final chunk) on these shapes
    build._BITONIC_CHUNK_ELEMS = 1 << 10
    try:
        for nseg, m in [(3, 64), (7, 512), (2, 2048), (33, 128)]:
            key = rng.permutation(nseg * m).astype(np.float32
                                                   ).reshape(nseg, m)
            p1 = rng.standard_normal((nseg, m)).astype(np.float32)
            p2 = rng.integers(0, 1 << 30, (nseg, m)).astype(np.int32)
            ops = (jnp.asarray(key), jnp.asarray(p1), jnp.asarray(p2))
            got = build._seg_sort(ops, m)
            ref = jax.lax.sort(ops, dimension=1, num_keys=1)
            for g, r in zip(got, ref):
                np.testing.assert_array_equal(np.asarray(g),
                                              np.asarray(r))
    finally:
        build.BITONIC_MAX_M = old
        build._BITONIC_CHUNK_ELEMS = old_chunk


def test_tree_build_bitonic_levels_match():
    """A tree built with the bitonic short-segment sorts is identical
    to the lax.sort build (distinct random coordinates: the permutation
    is unique, so every array matches bit-exactly). The threshold is a
    static jit argument resolved per build call, so toggling the module
    setting takes effect without any cache clearing (ADVICE r2)."""
    p = _srcs(5000, sd=1)
    ref_tree, ref_sp, ref_g = build.build_tree(p, block_size=64)
    old = build.BITONIC_MAX_M
    build.BITONIC_MAX_M = 4096
    try:
        tree, sp, gidx = build.build_tree(p, block_size=64)
    finally:
        build.BITONIC_MAX_M = old
    np.testing.assert_array_equal(np.asarray(gidx), np.asarray(ref_g))
    np.testing.assert_array_equal(np.asarray(sp.x), np.asarray(ref_sp.x))
    for f in ("x", "nc", "ns", "nr", "s"):
        np.testing.assert_array_equal(np.asarray(getattr(tree, f)),
                                      np.asarray(getattr(ref_tree, f)))


def test_median_split_balance():
    """Each split is an exact median along the chosen axis: the two
    children's particle sets are separated by a plane."""
    p = _srcs(512, pd=2, sd=1)
    tree, sp, _ = build.build_tree(p, block_size=128)
    x = np.asarray(sp.x)
    # root split: whichever axis was longest, left max <= right min on it
    ns = np.asarray(tree.ns[1])
    ax = int(np.argmax(ns))
    half = x.shape[0] // 2
    assert x[:half, ax].max() <= x[half:, ax].min() + 1e-7


def test_bary_blocks_conserve_strength():
    p = _srcs(1000, sd=1)
    tree, sp, _ = build.build_tree(p, block_size=128)
    blocks = eq.barycentric_blocks(tree, sp, order=4)
    # barycentric weights form a partition of unity -> each node's proxy
    # strengths sum to its subtree strength
    for node in [1, 2, 3, 4, 7]:
        got = float(jnp.sum(blocks.s[node]))
        want = float(tree.s[node, 0])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-9)


def test_bary_weights_partition_of_unity():
    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (1, 50, 3), jnp.float64, -0.5, 0.5)
    nc = jnp.zeros((1, 3), jnp.float64)
    ns = jnp.ones((1, 3), jnp.float64)
    w = eq.bary_weights(pts, nc, ns, order=4)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=-1)), 1.0,
                               rtol=1e-10)


def test_bary_weights_singularity_capture():
    """A point exactly on a grid node gets a one-hot weight row."""
    sk, _ = eq.chebyshev_sk_wk(4, jnp.float64)
    pts = jnp.array([[[float(sk[2]), float(sk[0]), float(sk[4])]]],
                    jnp.float64)
    nc = jnp.zeros((1, 3), jnp.float64)
    ns = jnp.full((1, 3), 2.0, jnp.float64)
    w = eq.bary_weights(pts, nc, ns, order=4)
    # multi-index (2,0,4), dim0 fastest: i = 2 + 0*5 + 4*25 = 102
    want = np.zeros(125)
    want[102] = 1.0
    np.testing.assert_allclose(np.asarray(w[0, 0]), want, atol=1e-12)


def test_bary_weights_far_outside_point_finite():
    """A point far outside the grid can hit an exactly-zero barycentric
    normalizer via f32 cancellation; its weights must come back 0/finite,
    never inf/NaN (inf * zero-strength padding = NaN that poisons the
    whole upward pass)."""
    nc = jnp.zeros((1, 3), jnp.float32)
    ns = jnp.full((1, 3), 0.01, jnp.float32)
    # equidistant-in-f32 from every grid node along each dim -> rowsum 0
    pts = jnp.full((1, 1, 3), 3.0, jnp.float32)
    w = eq.bary_weights(pts, nc, ns, order=4)
    assert np.all(np.isfinite(np.asarray(w)))


def test_bary_blocks_finite_with_outside_padding():
    """End-to-end: a particle count forcing heavy out-of-domain padding
    must still give finite proxies everywhere (regression: N=1e6 bench
    produced NaN in ~998k of 1e6 outputs)."""
    p = _srcs(1025)                       # 1025 -> n_pad 2048, ~50% pads
    tree, sp, _ = build.build_tree(p, block_size=128)
    blocks = eq.barycentric_blocks(tree, sp, order=4)
    assert np.all(np.isfinite(np.asarray(blocks.s)))
    assert np.all(np.isfinite(np.asarray(blocks.pos)))
    # conservation still holds at the root
    np.testing.assert_allclose(float(jnp.sum(blocks.s[1])),
                               float(tree.s[1, 0]), rtol=1e-4, atol=1e-9)


def test_pairmerge_blocks_conserve_strength():
    p = _srcs(1024, sd=3)
    tree, sp, _ = build.build_tree(p, block_size=128, refine=True)
    blocks = eq.pairmerge_blocks(tree, sp)
    for node in [1, 2, 5]:
        got = np.asarray(jnp.sum(blocks.s[node], axis=0))
        want = np.asarray(tree.s[node])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-8)


def test_bary_proxies_approximate_far_field():
    """Proxy blocks must reproduce the node's far-field influence: compare
    potential-style sum at a distant point."""
    from onbody_tpu.ops.kernels import KERNELS
    kernel = KERNELS["grav3d"]
    p = _srcs(512, sd=1)
    tree, sp, _ = build.build_tree(p, block_size=128)
    blocks = eq.barycentric_blocks(tree, sp, order=4)
    # far target
    tx = jnp.array([[5.0, 5.0, 5.0]], jnp.float32)
    tr = jnp.zeros((1,), jnp.float32)
    ref = jnp.sum(kernel.pairwise(tx, tr, sp.x, sp.r, sp.s, "rm"), axis=1)
    out = jnp.sum(kernel.pairwise(tx, tr, blocks.pos[1], blocks.rad[1],
                                  blocks.s[1], "rm"), axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4)


def test_morton_mode_boxes_and_order():
    """Morton build: boxes still contain their particles, gidx is a
    permutation, and a treecode on the morton tree stays accurate."""
    import jax.numpy as jnp
    from onbody_tpu.config import SolverConfig
    from onbody_tpu.ops.kernels import KERNELS
    from onbody_tpu.traverse import direct, treecode

    p = _srcs(3000)
    tree, sp, gidx = build.build_tree(p, block_size=64, mode="morton")
    x = np.asarray(sp.x)
    real = np.asarray(gidx) < p.n_real
    n_pad = x.shape[0]
    for node in [1, 2, 3, 9, tree.nleaf, 2 * tree.nleaf - 1]:
        l = int(np.log2(node))
        k = node - (1 << l)
        m = n_pad >> l
        seg = x[k * m:(k + 1) * m][real[k * m:(k + 1) * m]]
        if not len(seg):
            continue
        nc = np.asarray(tree.nc[node])
        ns = np.asarray(tree.ns[node])
        assert np.all(seg >= nc - ns / 2 - 1e-6)
        assert np.all(seg <= nc + ns / 2 + 1e-6)
    assert sorted(np.asarray(gidx).tolist()) == list(range(n_pad))

    kernel = KERNELS["grav3d"]
    cfg = SolverConfig(block_size=64, order=4, tree_mode="morton",
                       frontier_width=256, list_width=1024,
                       cap_groups_treecode=96)
    ks, kt = jax.random.split(jax.random.PRNGKey(2))
    srcs = P.random_in_cube(ks, 3000, 3, 1, True)
    targs = P.random_in_cube(kt, 3000, 3, 0, False)
    ref = direct.direct_oracle(kernel, srcs, targs)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    out, info = treecode.solve_treecode3(kernel, cfg, plan)
    assert int(info.overflow) == 0
    rel = (np.linalg.norm(np.asarray(out) - np.asarray(ref)) /
           np.linalg.norm(np.asarray(ref)))
    assert rel < 5e-3, rel


def test_span_mode_boxes_and_dtt():
    """Span build (one sort per 2 levels, 4-way single-axis splits):
    boxes contain their particles and never overlap siblings, gidx is a
    permutation, every split is an exact quantile along the sort axis,
    and the DTT stays inside the accuracy envelope with zero overflow."""
    from onbody_tpu.config import SolverConfig
    from onbody_tpu.ops.kernels import KERNELS
    from onbody_tpu.traverse import direct, dtt, treecode

    p = _srcs(5000)
    tree, sp, gidx = build.build_tree(p, block_size=64, mode="span",
                                      span=2)
    x = np.asarray(sp.x)
    real = np.asarray(gidx) < p.n_real
    n_pad = x.shape[0]
    for node in range(1, 2 * tree.nleaf):
        l = int(np.log2(node))
        k = node - (1 << l)
        m = n_pad >> l
        seg = x[k * m:(k + 1) * m][real[k * m:(k + 1) * m]]
        if not len(seg):
            continue
        nc = np.asarray(tree.nc[node])
        ns = np.asarray(tree.ns[node])
        assert np.all(seg >= nc - ns / 2 - 1e-6)
        assert np.all(seg <= nc + ns / 2 + 1e-6)
    assert sorted(np.asarray(gidx).tolist()) == list(range(n_pad))

    # sorted levels (even): the 4-way split must be exact quantiles
    # along the level's longest REAL axis — children along that axis
    # are disjoint (non-overlapping boxes, the VAMsplit contract)
    for l in (0, 2):
        nseg = 1 << l
        m = n_pad >> l
        for k in range(nseg):
            seg = x[k * m:(k + 1) * m]
            seg_real = seg[real[k * m:(k + 1) * m]]
            if not len(seg_real):
                continue
            ax = int(np.argmax(seg_real.max(0) - seg_real.min(0)))
            # quantile ordering holds on REAL slots (pads keep their
            # incoming order under prefix slicing — build._split_step)
            rl = real[k * m:(k + 1) * m]
            quarts = [seg[j * m // 4:(j + 1) * m // 4, ax][
                rl[j * m // 4:(j + 1) * m // 4]] for j in range(4)]
            quarts = [q for q in quarts if len(q)]
            for a, b in zip(quarts[:-1], quarts[1:]):
                assert a.max() <= b.min() + 1e-6

    kernel = KERNELS["grav3d"]
    cfg = SolverConfig(block_size=64, order=4, tree_mode="span",
                       frontier_width=256,
                       list_width=1024, cap_groups_dtt=64)
    ks, kt = jax.random.split(jax.random.PRNGKey(2))
    srcs = P.random_in_cube(ks, 5000, 3, 1, True)
    targs = P.random_in_cube(kt, 5000, 3, 0, False)
    ref = direct.direct_oracle(kernel, srcs, targs)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    out, info = dtt.solve_dtt(kernel, cfg, plan)
    assert int(info.overflow) == 0
    rel = (np.linalg.norm(np.asarray(out) - np.asarray(ref)) /
           np.linalg.norm(np.asarray(ref)))
    assert rel < 3e-3, rel


def test_span_bot_mode_boxes_and_dtt():
    """span_bot (multi-way splits at the BOTTOM levels too): boxes still
    contain their particles, gidx is a permutation, and the DTT stays in
    the accuracy envelope with zero overflow."""
    from onbody_tpu.config import SolverConfig
    from onbody_tpu.ops.kernels import KERNELS
    from onbody_tpu.traverse import direct, dtt, treecode

    p = _srcs(5000)
    tree, sp, gidx = build.build_tree(p, block_size=64, mode="span",
                                      span=2, span_top=2, span_bot=4)
    x = np.asarray(sp.x)
    real = np.asarray(gidx) < p.n_real
    n_pad = x.shape[0]
    for node in range(1, 2 * tree.nleaf):
        l = int(np.log2(node))
        k = node - (1 << l)
        m = n_pad >> l
        seg = x[k * m:(k + 1) * m][real[k * m:(k + 1) * m]]
        if not len(seg):
            continue
        nc = np.asarray(tree.nc[node])
        ns = np.asarray(tree.ns[node])
        assert np.all(seg >= nc - ns / 2 - 1e-6)
        assert np.all(seg <= nc + ns / 2 + 1e-6)
    assert sorted(np.asarray(gidx).tolist()) == list(range(n_pad))

    kernel = KERNELS["grav3d"]
    cfg = SolverConfig(block_size=64, order=4, tree_mode="span",
                       tree_span_top=2, tree_span_bot=4,
                       frontier_width=256, list_width=1024,
                       cap_groups_dtt=64)
    ks, kt = jax.random.split(jax.random.PRNGKey(2))
    srcs = P.random_in_cube(ks, 5000, 3, 1, True)
    targs = P.random_in_cube(kt, 5000, 3, 0, False)
    ref = direct.direct_oracle(kernel, srcs, targs)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    out, info = dtt.solve_dtt(kernel, cfg, plan)
    assert int(info.overflow) == 0
    rel = (np.linalg.norm(np.asarray(out) - np.asarray(ref)) /
           np.linalg.norm(np.asarray(ref)))
    assert rel < 3e-3, rel


def test_bisect_mode_boxes_and_dtt():
    """Bisect build (exact median splits by integer bisection, ONE sort
    per 4 levels): boxes contain their particles, every split is an
    exact slot-median (children disjoint along some axis up to tie
    values), gidx is a permutation, pair volume matches the median
    build's (measured +-0.1% at 2e5), and the DTT stays in the accuracy
    envelope with zero overflow."""
    from onbody_tpu.config import SolverConfig
    from onbody_tpu.ops.kernels import KERNELS
    from onbody_tpu.traverse import direct, dtt, treecode

    p = _srcs(5000)
    tree, sp, gidx = build.build_tree(p, block_size=64, mode="bisect")
    x = np.asarray(sp.x)
    real = np.asarray(gidx) < p.n_real
    n_pad = x.shape[0]
    for node in range(1, 2 * tree.nleaf):
        l = int(np.log2(node))
        k = node - (1 << l)
        m = n_pad >> l
        seg = x[k * m:(k + 1) * m][real[k * m:(k + 1) * m]]
        if not len(seg):
            continue
        nc = np.asarray(tree.nc[node])
        ns = np.asarray(tree.ns[node])
        assert np.all(seg >= nc - ns / 2 - 1e-6)
        assert np.all(seg <= nc + ns / 2 + 1e-6)
    assert sorted(np.asarray(gidx).tolist()) == list(range(n_pad))

    # every interior node's children must be separated along SOME axis
    # (exact median along the in-group chosen axis; ties may share the
    # plane value)
    for l in range(tree.levels):
        nseg = 1 << l
        m = n_pad >> l
        for k in range(nseg):
            left = x[k * m:k * m + m // 2]
            right = x[k * m + m // 2:(k + 1) * m]
            sep = any(left[:, d].max() <= right[:, d].min() + 1e-7
                      for d in range(3))
            assert sep, (l, k)

    kernel = KERNELS["grav3d"]
    cfg = SolverConfig(block_size=64, order=4, tree_mode="bisect",
                       frontier_width=256,
                       list_width=1024, cap_groups_dtt=64)
    ks, kt = jax.random.split(jax.random.PRNGKey(2))
    srcs = P.random_in_cube(ks, 5000, 3, 1, True)
    targs = P.random_in_cube(kt, 5000, 3, 0, False)
    ref = direct.direct_oracle(kernel, srcs, targs)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    out, info = dtt.solve_dtt(kernel, cfg, plan)
    assert int(info.overflow) == 0
    rel = (np.linalg.norm(np.asarray(out) - np.asarray(ref)) /
           np.linalg.norm(np.asarray(ref)))
    assert rel < 3e-3, rel


def test_bisect_mode_massive_ties():
    """Tie exactness: coordinates on a coarse grid (many exact f32
    duplicates per segment) still split to exact slot counts — the
    tie-rank machinery, not value uniqueness, guarantees VAMsplit
    exactness. Padding clones (all sharing one coordinate) are the
    degenerate case and are present too."""
    ks = jax.random.PRNGKey(3)
    n = 3000
    p0 = P.random_in_cube(ks, n, 3, 1, True)
    import dataclasses
    xq = jnp.round(p0.x * 8.0) / 8.0          # ~17 distinct values/axis
    p = dataclasses.replace(p0, x=xq)
    tree, sp, gidx = build.build_tree(p, block_size=64, mode="bisect")
    n_pad = np.asarray(sp.x).shape[0]
    assert sorted(np.asarray(gidx).tolist()) == list(range(n_pad))
    x = np.asarray(sp.x)
    real = np.asarray(gidx) < p.n_real
    for node in range(1, 2 * tree.nleaf):
        l = int(np.log2(node))
        k = node - (1 << l)
        m = n_pad >> l
        seg = x[k * m:(k + 1) * m][real[k * m:(k + 1) * m]]
        if not len(seg):
            continue
        nc = np.asarray(tree.nc[node])
        ns = np.asarray(tree.ns[node])
        assert np.all(seg >= nc - ns / 2 - 1e-6)
        assert np.all(seg <= nc + ns / 2 + 1e-6)
    # strength conservation through the build
    assert np.isclose(float(jnp.sum(sp.s[np.asarray(gidx) < n])),
                      float(jnp.sum(p.s)), rtol=1e-5)


@pytest.mark.parametrize("mode,refine,defer", [("median", False, False),
                                               ("median", True, False),
                                               ("span", False, False),
                                               ("span", False, True),
                                               ("median", True, True),
                                               ("bisect", False, False),
                                               ("bisect", False, True),
                                               ("bisect", True, True)])
def test_paired_build_bit_identical(mode, refine, defer):
    """build_trees_paired (source + target trees from one sequence of
    stacked sorts) must be BIT-identical to two build_tree calls: the
    stacked (2*nseg, m) segmented sorts are segment-independent, so
    every compare-exchange is the same as in the separate builds."""
    ks, kt = jax.random.split(jax.random.PRNGKey(7))
    srcs = P.random_in_cube(ks, 3000, 3, 1, True)
    targs = P.random_in_cube(kt, 3000, 3, 0, False)

    st_ref = build.build_tree(srcs, 64, refine=refine, mode=mode)
    tt_ref = build.build_tree(targs, 64, refine=refine, mode=mode)
    (st, sp, sg), (tt, tp, tg) = build.build_trees_paired(
        srcs, targs, 64, refine=refine, mode=mode, defer_rs=defer)
    if defer:
        # defer_rs must also be bit-identical for the single build
        st2, sp2, sg2 = build.build_tree(srcs, 64, refine=refine,
                                         mode=mode, defer_rs=True)
        assert np.array_equal(np.asarray(sg2), np.asarray(sg))
        assert np.array_equal(np.asarray(sp2.r), np.asarray(sp.r))
        assert np.array_equal(np.asarray(sp2.s), np.asarray(sp.s))

    for (tree, parts, gidx), (tree_r, parts_r, gidx_r) in [
            ((st, sp, sg), st_ref), ((tt, tp, tg), tt_ref)]:
        for f in ("nc", "ns", "nr", "x", "s", "pr", "alive"):
            a, b = getattr(tree, f), getattr(tree_r, f)
            assert np.array_equal(np.asarray(a), np.asarray(b)), f
        assert np.array_equal(np.asarray(gidx), np.asarray(gidx_r))
        assert np.array_equal(np.asarray(parts.x), np.asarray(parts_r.x))
        assert np.array_equal(np.asarray(parts.r), np.asarray(parts_r.r))
        if parts_r.s is not None:
            assert np.array_equal(np.asarray(parts.s),
                                  np.asarray(parts_r.s))
        else:
            assert parts.s is None


def test_paired_build_via_config():
    """tree_paired=True routes prepare() through the stacked build and
    the DTT result is unchanged."""
    from onbody_tpu.config import SolverConfig
    from onbody_tpu.ops.kernels import KERNELS
    from onbody_tpu.traverse import dtt, treecode

    kernel = KERNELS["grav3d"]
    ks, kt = jax.random.split(jax.random.PRNGKey(3))
    srcs = P.random_in_cube(ks, 4000, 3, 1, True)
    targs = P.random_in_cube(kt, 4000, 3, 0, False)
    cfg = SolverConfig(block_size=64, order=4, tree_mode="span",
                       frontier_width=256, list_width=1024,
                       cap_groups_dtt=64)
    out_ref, _ = dtt.solve_dtt(kernel, cfg, treecode.prepare(
        kernel, cfg, srcs, targs))
    cfgp = dataclasses.replace(cfg, tree_paired=True)
    out, info = dtt.solve_dtt(kernel, cfgp, treecode.prepare(
        kernel, cfgp, srcs, targs))
    assert int(info.overflow) == 0
    assert np.array_equal(np.asarray(out), np.asarray(out_ref))
    # defer_rs through the config path too
    cfgd = dataclasses.replace(cfg, tree_paired=True, tree_defer_rs=True)
    out_d, info_d = dtt.solve_dtt(kernel, cfgd, treecode.prepare(
        kernel, cfgd, srcs, targs))
    assert int(info_d.overflow) == 0
    assert np.array_equal(np.asarray(out_d), np.asarray(out_ref))


@pytest.mark.parametrize("mode", ["median", "span"])
def test_prefix_sort_matches_full_sort(mode, monkeypatch):
    """Prefix slicing (build._split_step sorting only the real prefix
    of each segment; gated by PREFIX_SORT_MIN) must reproduce the full
    sort on every REAL slot and on every tree array. Pad slots may
    permute (they are never coordinate-sorted on the prefix path), but
    no consumer observes pad order: boxes/CM/alive are real-masked and
    dead nodes get far-point geometry."""
    ks, kt = jax.random.split(jax.random.PRNGKey(11))
    srcs = P.random_in_cube(ks, 5000, 3, 1, True)   # 39% padding at b64
    targs = P.random_in_cube(kt, 5000, 3, 0, False)

    monkeypatch.setattr(build, "PREFIX_SORT_MIN", 1 << 62)
    ref = build.build_tree(srcs, 64, mode=mode)
    ref_paired = build.build_trees_paired(srcs, targs, 64, mode=mode,
                                          defer_rs=True)
    monkeypatch.setattr(build, "PREFIX_SORT_MIN", 0)
    got = build.build_tree(srcs, 64, mode=mode)
    got_paired = build.build_trees_paired(srcs, targs, 64, mode=mode,
                                          defer_rs=True)

    def check(got3, ref3):
        tree, parts, gidx = got3
        tree_r, parts_r, gidx_r = ref3
        for f in ("nc", "ns", "nr", "x", "s", "pr", "alive"):
            a = np.asarray(getattr(tree, f))
            b = np.asarray(getattr(tree_r, f))
            assert np.array_equal(a, b), f
        real = np.asarray(gidx_r) < 5000
        assert np.array_equal(np.asarray(gidx)[real],
                              np.asarray(gidx_r)[real])
        assert np.array_equal(np.asarray(parts.x)[real],
                              np.asarray(parts_r.x)[real])
        assert np.array_equal(np.asarray(parts.r)[real],
                              np.asarray(parts_r.r)[real])
        if parts_r.s is not None:
            assert np.array_equal(np.asarray(parts.s)[real],
                                  np.asarray(parts_r.s)[real])

    check(got, ref)
    check(got_paired[0], ref_paired[0])
    check(got_paired[1], ref_paired[1])


@pytest.mark.parametrize("qmode", ["gather", "dequant"])
@pytest.mark.parametrize("tmode", ["median", "span"])
def test_quant_build_invariants(qmode, tmode):
    """Quantized-payload sort (tree/quant.py): exact slot counts, boxes
    contain the final coordinates, gidx a permutation; 'gather' mode
    recovers the original coordinates bit-exactly."""
    n = 5000
    p = _srcs(n, seed=3)
    tree, sp, gidx = build.build_tree(p, 64, mode=tmode, defer_rs=True,
                                      quant=qmode)
    g = np.sort(np.asarray(gidx))
    assert (g[:n] == np.arange(n)).all()           # permutation
    x = np.asarray(sp.x)
    gi = np.asarray(gidx)
    real = gi < n
    if qmode == "gather":
        # bit-exact coordinate recovery through the permutation
        x0 = np.asarray(p.x)
        assert np.array_equal(x[real], x0[gi[real]])
        # and radii/strengths ride the same deferred gather
        assert np.array_equal(np.asarray(sp.r)[real],
                              np.asarray(p.r)[gi[real]])
        assert np.array_equal(np.asarray(sp.s)[real],
                              np.asarray(p.s)[gi[real]])
    else:
        # dequantized cell centers are within half a grid step
        x0 = np.asarray(p.x)
        step = (x0.max(0) - x0.min(0)) / 65534.0
        assert (np.abs(x[real] - x0[gi[real]]) <= 0.5 * step + 1e-7).all()
    # node boxes contain their segment's real final coordinates
    nleaf = tree.nleaf
    nc = np.asarray(tree.nc)
    ns = np.asarray(tree.ns)
    n_pad = x.shape[0]
    for node in [1, 2, 3, 5, nleaf, nleaf + 1, 2 * nleaf - 1]:
        l = int(np.floor(np.log2(node)))
        span_sl = n_pad >> l
        off = (node - (1 << l)) * span_sl
        seg = slice(off, off + span_sl)
        m = real[seg]
        if not m.any():
            continue
        xs = x[seg][m]
        lo = nc[node] - 0.5 * ns[node] - 1e-5
        hi = nc[node] + 0.5 * ns[node] + 1e-5
        assert (xs >= lo).all() and (xs <= hi).all(), node


def test_quant_paired_matches_single():
    """Paired quant build == two single quant builds (same stacked-sort
    bit behavior as the exact paired build)."""
    n = 3000
    ps = _srcs(n, seed=5)
    pt = dataclasses.replace(_srcs(n, sd=0, seed=6), s=None)
    (st_p, sp_p, sg_p), (tt_p, tp_p, tg_p) = build.build_trees_paired(
        ps, pt, 64, mode="span", defer_rs=True, quant="gather")
    st, sp1, sg = build.build_tree(ps, 64, mode="span", defer_rs=True,
                                   quant="gather")
    for f in ("nc", "ns", "nr", "x", "s", "pr", "alive"):
        assert np.array_equal(np.asarray(getattr(st_p, f)),
                              np.asarray(getattr(st, f))), f
    real = np.asarray(sg) < n
    assert np.array_equal(np.asarray(sg_p)[real], np.asarray(sg)[real])
    assert np.array_equal(np.asarray(sp_p.x)[real],
                          np.asarray(sp1.x)[real])


def test_hsplit_exact_counts_and_containment():
    """Histogram top-split (tree/hsplit.py): every subtree gets EXACTLY
    n_slots/2^split slots (the VAMsplit invariant), and each particle's
    codes fall inside its subtree's plane-derived box."""
    from onbody_tpu.tree import hsplit, quant as qm

    n_chunks, m, split = 4, 4096, 3
    pd = 3
    key = jax.random.PRNGKey(7)
    xs = [jax.random.uniform(jax.random.fold_in(key, c), (m, pd),
                             minval=-1.0, maxval=1.0)
          for c in range(n_chunks)]
    lo = np.min([np.asarray(x).min(0) for x in xs], axis=0)
    hi = np.max([np.asarray(x).max(0) for x in xs], axis=0)
    step = (hi - lo) / 65534.0

    def gen_codes(c):
        cd = jnp.clip(jnp.floor((xs[c] - lo[None, :]) / step[None, :]),
                      0, 65534).astype(jnp.int32)
        return cd

    planes, quotas, axes, nids = hsplit.run_top_split(
        gen_codes, n_chunks, m, split, lo, hi)
    ids = np.concatenate([np.asarray(i) for i in nids])
    counts = np.bincount(ids, minlength=1 << split)
    assert (counts == (n_chunks * m) >> split).all(), counts

    # containment: walk each particle's plane decisions
    codes = np.concatenate([np.asarray(gen_codes(c))
                            for c in range(n_chunks)])
    nid = np.zeros(len(codes), np.int64)
    for l in range(split):
        ax = axes[l][nid]
        c = codes[np.arange(len(codes)), ax]
        pl = planes[l][nid]
        # ties may go either side (rank-split); strict sides must agree
        right = c > pl
        left = c < pl
        got_right = (ids >> (split - 1 - l)) & 1
        assert (got_right[right] == 1).all()
        assert (got_right[left] == 0).all()
        nid = 2 * nid + got_right

    # determinism
    _, _, _, nids2 = hsplit.run_top_split(gen_codes, n_chunks, m,
                                          split, lo, hi)
    for a, b in zip(nids, nids2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
