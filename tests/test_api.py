"""Library-API integration tests — the equivalents of run2dvort /
run3dvortgrads (main2dvort.cpp, main3dvortgrads.cpp): build a problem,
call the solver API, validate against the direct API on a subsample."""

import numpy as np
import pytest

from onbody_tpu.api import solver


def _problem_2d(n=1500, seed=0):
    rng = np.random.default_rng(seed)
    sx = rng.uniform(-1, 1, n).astype(np.float32)
    sy = rng.uniform(-1, 1, n).astype(np.float32)
    ss = (rng.uniform(-1, 1, n) / n).astype(np.float32)
    sr = np.full(n, (1.0 / n) ** 0.5, np.float32)
    return sx, sy, ss, sr


def test_2dvort_targets_alias_sources():
    """Targets == sources (deliberately tested by main2dvort.cpp:83-85)."""
    sx, sy, ss, sr = _problem_2d()
    tu, tv = solver.vel_solver_2d(sx, sy, ss, sr, sx, sy, tr=sr)
    du, dv = solver.vel_direct_2d(sx, sy, ss, sr, sx, sy, tr=sr)
    got = np.stack([tu, tv], 1)
    want = np.stack([du, dv], 1)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    # library tuning theta=1.3/order=4 -> ~1e-4 (interface2dvort.cpp:190)
    assert rel < 1e-3, rel


def test_2dvort_no_target_radii():
    sx, sy, ss, sr = _problem_2d()
    n = 700
    rng = np.random.default_rng(7)
    tx = rng.uniform(-1, 1, n).astype(np.float32)
    ty = rng.uniform(-1, 1, n).astype(np.float32)
    tu, tv = solver.vel_solver_2d(sx, sy, ss, sr, tx, ty)
    du, dv = solver.vel_direct_2d(sx, sy, ss, sr, tx, ty)
    rel = (np.linalg.norm(np.stack([tu - du, tv - dv])) /
           np.linalg.norm(np.stack([du, dv])))
    assert rel < 1e-3, rel


def test_3dvortgrads():
    n = 1200
    rng = np.random.default_rng(3)
    sx, sy, sz = (rng.uniform(-1, 1, n).astype(np.float32) for _ in range(3))
    # wave strengths like main3dvortgrads.cpp:56-209
    ssx = (np.cos(0.7 * 10 * sx) / n).astype(np.float32)
    ssy = (np.cos(1.7 * 10 * sy) / n).astype(np.float32)
    ssz = (np.cos(2.7 * 10 * sz) / n).astype(np.float32)
    sr = np.full(n, (1.0 / n) ** (1 / 3), np.float32)
    tx, ty, tz = sx, sy, sz
    got = np.stack(solver.vel_solver_3dvortgrads(
        sx, sy, sz, ssx, ssy, ssz, sr, tx, ty, tz), 1)
    want = np.stack(solver.vel_direct_3dvortgrads(
        sx, sy, sz, ssx, ssy, ssz, sr, tx, ty, tz), 1)
    # velocity components: theta=1.5/order=4 -> ~1e-4 mean error
    relv = (np.linalg.norm(got[:, :3] - want[:, :3]) /
            np.linalg.norm(want[:, :3]))
    assert relv < 2e-3, relv
    relg = (np.linalg.norm(got[:, 3:] - want[:, 3:]) /
            np.linalg.norm(want[:, 3:]))
    assert relg < 2e-2, relg


def test_api_group_cap_overflow_recovers():
    """Group-cap overflow through the API path must be healed by the
    retry (which widens cap_groups_* too, like the drivers) — never an
    assert-death or a truncated sum."""
    from onbody_tpu.api.solver import _CFG_2D, _solve_boxwise
    from onbody_tpu.parts import from_arrays

    sx, sy, ss, sr = _problem_2d(n=3000, seed=11)
    srcs = from_arrays(np.stack([sx, sy], 1), r=sr, s=ss)
    targs = from_arrays(np.stack([sx, sy], 1), r=sr)
    cfg = _CFG_2D.replace(block_size=64, cap_groups_treecode=1)
    out = _solve_boxwise("vort2d", cfg, srcs, targs, theta=1.3)
    du, dv = solver.vel_direct_2d(sx, sy, ss, sr, sx, sy, tr=sr)
    want = np.stack([du, dv], 1)
    rel = np.linalg.norm(out - want) / np.linalg.norm(want)
    assert rel < 1e-3, rel
