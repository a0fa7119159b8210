"""Python side of the C ABI shim (see cabi/onbody_c.cpp).

Receives raw memoryviews over the caller's buffers, runs the solver, and
writes results in place. Returns a flop estimate like the reference's
entry points (interface2dvort.cpp:306-316).
"""

from __future__ import annotations

import os

import numpy as np

# Platform override for embedded use: the JAX_PLATFORMS env var is
# frozen too early when a sitecustomize imports jax at interpreter
# start, so honor an explicit request here via jax.config (the only
# reliable switch — see tests/conftest.py).
if os.environ.get("ONBODY_CABI_PLATFORM"):
    import jax
    jax.config.update("jax_platforms",
                      os.environ["ONBODY_CABI_PLATFORM"])

from onbody_tpu.api import solver


def _arr(mv, n):
    return np.frombuffer(mv, dtype=np.float32, count=n)


def solve_2d(nsrc, sx, sy, ss, sr, ntarg, tx, ty, tu, tv):
    u, v = solver.vel_solver_2d(_arr(sx, nsrc), _arr(sy, nsrc),
                                _arr(ss, nsrc), _arr(sr, nsrc),
                                _arr(tx, ntarg), _arr(ty, ntarg))
    np.frombuffer(tu, np.float32, ntarg)[:] = u
    np.frombuffer(tv, np.float32, ntarg)[:] = v
    return float(nsrc) * ntarg * 12.0


def solve_2d_tr(nsrc, sx, sy, ss, sr, ntarg, tx, ty, tr, tu, tv):
    u, v = solver.vel_solver_2d(_arr(sx, nsrc), _arr(sy, nsrc),
                                _arr(ss, nsrc), _arr(sr, nsrc),
                                _arr(tx, ntarg), _arr(ty, ntarg),
                                tr=_arr(tr, ntarg))
    np.frombuffer(tu, np.float32, ntarg)[:] = u
    np.frombuffer(tv, np.float32, ntarg)[:] = v
    return float(nsrc) * ntarg * 12.0


def direct_2d(nsrc, sx, sy, ss, sr, ntarg, tx, ty, tu, tv):
    u, v = solver.vel_direct_2d(_arr(sx, nsrc), _arr(sy, nsrc),
                                _arr(ss, nsrc), _arr(sr, nsrc),
                                _arr(tx, ntarg), _arr(ty, ntarg))
    np.frombuffer(tu, np.float32, ntarg)[:] = u
    np.frombuffer(tv, np.float32, ntarg)[:] = v
    return float(nsrc) * ntarg * 12.0


def direct_2d_tr(nsrc, sx, sy, ss, sr, ntarg, tx, ty, tr, tu, tv):
    u, v = solver.vel_direct_2d(_arr(sx, nsrc), _arr(sy, nsrc),
                                _arr(ss, nsrc), _arr(sr, nsrc),
                                _arr(tx, ntarg), _arr(ty, ntarg),
                                tr=_arr(tr, ntarg))
    np.frombuffer(tu, np.float32, ntarg)[:] = u
    np.frombuffer(tv, np.float32, ntarg)[:] = v
    return float(nsrc) * ntarg * 12.0


def solve_3dvg(nsrc, sx, sy, sz, ssx, ssy, ssz, sr, ntarg, tx, ty, tz,
               *outs):
    res = solver.vel_solver_3dvortgrads(
        _arr(sx, nsrc), _arr(sy, nsrc), _arr(sz, nsrc),
        _arr(ssx, nsrc), _arr(ssy, nsrc), _arr(ssz, nsrc), _arr(sr, nsrc),
        _arr(tx, ntarg), _arr(ty, ntarg), _arr(tz, ntarg))
    for mv, col in zip(outs, res):
        np.frombuffer(mv, np.float32, ntarg)[:] = col
    return float(nsrc) * ntarg * 64.0


def direct_3dvg(nsrc, sx, sy, sz, ssx, ssy, ssz, sr, ntarg, tx, ty, tz,
                *outs):
    res = solver.vel_direct_3dvortgrads(
        _arr(sx, nsrc), _arr(sy, nsrc), _arr(sz, nsrc),
        _arr(ssx, nsrc), _arr(ssy, nsrc), _arr(ssz, nsrc), _arr(sr, nsrc),
        _arr(tx, ntarg), _arr(ty, ntarg), _arr(tz, ntarg))
    for mv, col in zip(outs, res):
        np.frombuffer(mv, np.float32, ntarg)[:] = col
    return float(nsrc) * ntarg * 64.0
