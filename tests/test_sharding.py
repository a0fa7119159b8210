"""Multi-chip sharded execution on the virtual 8-device CPU mesh:
sharded solvers must agree with the single-device ones bitwise-ish."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onbody_tpu import parts as P
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import KERNELS
from onbody_tpu.parallel import mesh as pmesh
from onbody_tpu.traverse import dtt, treecode

CFG = SolverConfig(block_size=32, order=3, frontier_width=256,
                   list_width=512)


def _plan(kernel, n=1024, seed=0):
    ks, kt = jax.random.split(jax.random.PRNGKey(seed))
    srcs = P.random_in_cube(ks, n, kernel.pd, kernel.sd, True)
    targs = P.random_in_cube(kt, n, kernel.pd, 0, False)
    return treecode.prepare(kernel, CFG, srcs, targs)


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_node_owner():
    # 8 devices, split=3: nodes 8..15 are subtree roots owned 0..7
    owner = pmesh.node_owner(np.arange(32), levels=4, split=3)
    assert owner[0] == -1 and owner[1] == -1 and owner[7] == -1
    assert list(owner[8:16]) == list(range(8))
    assert list(owner[16:32]) == [i // 2 for i in range(16)]


@pytest.mark.parametrize("ndev", [2, 8])
def test_treecode3_sharded_matches(ndev):
    kernel = KERNELS["grav3d"]
    plan = _plan(kernel)
    mesh = pmesh.make_mesh(ndev)
    ref, _ = treecode.solve_treecode3(kernel, CFG, plan)
    out, _ = pmesh.solve_treecode3_sharded(kernel, CFG, mesh, plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-8)


def test_dtt_sharded_matches():
    kernel = KERNELS["grav3d"]
    plan = _plan(kernel)
    mesh = pmesh.make_mesh(8)
    ref, _ = dtt.solve_dtt(kernel, CFG, plan)
    out, _ = pmesh.solve_dtt_sharded(kernel, CFG, mesh, plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-8)


def test_partition_groups_device_matches_host():
    """On-device partitioning covers exactly the valid pairs the host
    bucketing covers (same multiset of (local tgt, local src))."""
    kernel = KERNELS["grav3d"]
    plan = _plan(kernel)
    from onbody_tpu.traverse import lists
    cfg = CFG
    pl = lists.build_dtt_pairs_level(plan.stree, plan.ttree,
                                     cfg.theta_dtt, cfg.frontier_width,
                                     cfg.mac_geometry)
    ndev = 8
    levels = plan.ttree.levels
    levels_s = plan.stree.levels
    g = cfg.pair_group
    caps = (4096,) * ndev
    top_t, top_s, gt, gs, ov = pmesh.partition_groups_device(
        pl.tgt, pl.src, levels, levels_s, ndev, cfg.frontier_width, g,
        caps)
    assert int(ov) == 0
    # every valid builder pair appears exactly once: per-device owned
    # pairs + top pairs replicated once in top arrays
    n_owned = int(np.sum(np.asarray(gs) != 0))
    n_top = int(np.sum(np.asarray(top_s) != 0))
    split = 3
    tgt = np.asarray(pl.tgt)
    src = np.asarray(pl.src)
    valid = src != 0
    lev = np.zeros_like(tgt)
    lev[tgt > 0] = np.floor(np.log2(tgt[tgt > 0])).astype(tgt.dtype)
    is_top = valid & (lev < split)
    assert n_top == int(is_top.sum())
    assert n_owned == int((valid & ~is_top).sum())


def test_dtt_sharded_stream_matches():
    """Streamed sharded DTT == single-device DTT, with each device
    holding only 1/D of the source blocks (ring ppermute)."""
    kernel = KERNELS["grav3d"]
    plan = _plan(kernel)
    mesh = pmesh.make_mesh(8)
    ref, _ = dtt.solve_dtt(kernel, CFG, plan)
    out, info = pmesh.solve_dtt_sharded_stream(kernel, CFG, mesh, plan)
    assert int(np.asarray(info.overflow)) == 0
    # atol covers fp32 summation-order noise: ring staging executes the
    # same pair set in a different order (measured max |diff| ~2e-7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # provably sharded sources: the per-device source slab row count is
    # ~NN_s/D + D, far below the full 2*nleaf rows
    glob_s, _ = pmesh.local_rows(plan.stree.levels, 8)
    assert glob_s.shape[1] < plan.src_fm.shape[0] // 4


def test_dtt_sharded_stream_vort3d():
    """Non-grav kernel (3-component strengths) through the mesh."""
    kernel = KERNELS["vort3d"]
    plan = _plan(kernel)
    mesh = pmesh.make_mesh(8)
    ref, _ = dtt.solve_dtt(kernel, CFG, plan)
    out, info = pmesh.solve_dtt_sharded_stream(kernel, CFG, mesh, plan)
    assert int(np.asarray(info.overflow)) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_dtt_sharded_order_neg_copy_prolongation():
    """order<0 sharded DTT: pair-merge equivalents + the side-aware copy
    prolongation (_downward_copy_local) must match single-device."""
    kernel = KERNELS["grav3d"]
    cfg = CFG.replace(order=-1)
    ks, kt = jax.random.split(jax.random.PRNGKey(0))
    srcs = P.random_in_cube(ks, 1024, 3, 1, True)
    targs = P.random_in_cube(kt, 1024, 3, 0, False)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    mesh = pmesh.make_mesh(8)
    ref, _ = dtt.solve_dtt(kernel, cfg, plan)
    out, info = pmesh.solve_dtt_sharded_stream(kernel, cfg, mesh, plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_dtt_sharded_stream_2level_mesh():
    """DCN-aware two-level (2 slices x 4 chips) mesh: the streamed
    solver's collectives run over the combined ("dcn", "ici") axis in
    slice-major flat order — results must match the flat-mesh / single-
    device solve exactly (same pair set, same staging order)."""
    kernel = KERNELS["grav3d"]
    plan = _plan(kernel)
    mesh = pmesh.make_mesh_2level(2, 4)
    assert mesh.axis_names == ("dcn", "ici")
    ref, _ = dtt.solve_dtt(kernel, CFG, plan)
    out, info = pmesh.solve_dtt_sharded_stream(kernel, CFG, mesh, plan)
    assert int(np.asarray(info.overflow)) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_dtt_sharded_stream_vortgrad3d():
    """Highest-OD kernel (12 outputs: velocity + 9 gradients) through
    the streamed mesh path — covers the od8 feature-row padding and the
    f32-only contraction tier on the sharded executor."""
    kernel = KERNELS["vortgrad3d"]
    plan = _plan(kernel)
    mesh = pmesh.make_mesh(8)
    ref, _ = dtt.solve_dtt(kernel, CFG, plan)
    out, info = pmesh.solve_dtt_sharded_stream(kernel, CFG, mesh, plan)
    assert int(np.asarray(info.overflow)) == 0
    a, b = np.asarray(out), np.asarray(ref)
    # gradient columns amplify fp32 summation-order noise (the ring
    # stages the same pairs in a different order): velocities match to
    # ~1e-7, grads to ~3e-5 abs; the whole-field rel-Frobenius is ~8e-6
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 1e-4
