"""Theta auto-tuner: time-vs-error Pareto sweep.

Python equivalent of the reference's scripts/speedtest.pl (secant-like
bisection on theta until the DTT error hits each target, then record the
best time): for each (N, target error, block size, order), bisect theta
in log-error space (speedtest.pl:53-96) until the measured rel-RMS is
within 3% of target, then time the solve and append a row to new.dat.

Usage: python scripts/speedtest.py [-n=...] [-b=...] [-o=...] [--method=dtt]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import jax

# the axon sitecustomize imports jax before this file runs, freezing
# config from the env at interpreter start; config.update is the only
# reliable way to enable the persistent compile cache here
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                "/tmp/jax_cache"))
import numpy as np

from onbody_tpu import parts as P
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, dtt, treecode

TARGET_ERRORS = [1e-2, 1e-3, 1e-4, 1e-5]


def _sync(x):
    # through the axon tunnel block_until_ready may not block: fetch one
    # scalar (by index — ravel would compile a layout-change copy)
    return float(np.asarray(x[(0,) * x.ndim]))


def measure(kernel, cfg, plan, solver, theta, ref, tskip):
    """Timed solve at one theta; on frontier/group overflow retries with
    doubled list widths (the API layer's recovery, api/solver.py) so a
    tight theta at a small block size yields a real error instead of a
    corrupted one. Returns (err, dt) or (None, dt) if 3 retries still
    overflow."""
    import dataclasses
    for _ in range(3):
        out, pl = solver(kernel, cfg, plan, theta=theta)
        _sync(out)
        t0 = time.perf_counter()
        out, pl = solver(kernel, cfg, plan, theta=theta)
        _sync(out)
        dt = time.perf_counter() - t0
        if int(np.asarray(pl.overflow)) == 0:
            got = np.asarray(out)[::tskip][:ref.shape[0]]
            err = float(np.linalg.norm(got - ref)
                        / np.linalg.norm(ref))
            return err, dt
        cfg = dataclasses.replace(
            cfg, frontier_width=2 * cfg.frontier_width,
            cap_groups_dtt=2 * cfg.cap_groups_dtt)
    return None, dt


def bisect_theta(kernel, cfg, plan, solver, target, ref, tskip,
                 lo=0.8, hi=2.0, max_iter=12):
    """Secant bisection in (theta, log error) space (speedtest.pl:53-96).

    Error decreases with theta (tighter MAC). Endpoints that stay
    invalid (overflow after retries) pull the bracket inward; a
    non-monotone bracket (fp32 floor reached before hi) falls back to
    plain bisection steps."""
    e_lo, t_lo = measure(kernel, cfg, plan, solver, lo, ref, tskip)
    while e_lo is None and lo < hi - 0.05:
        lo += 0.1
        e_lo, t_lo = measure(kernel, cfg, plan, solver, lo, ref, tskip)
    e_hi, t_hi = measure(kernel, cfg, plan, solver, hi, ref, tskip)
    while e_hi is None and hi > lo + 0.05:
        hi -= 0.15
        e_hi, t_hi = measure(kernel, cfg, plan, solver, hi, ref, tskip)
    if e_lo is None or e_hi is None:
        return None
    best = None
    for _ in range(max_iter):
        # interpolate log-error linearly in theta
        le_lo, le_hi, le_t = np.log(e_lo), np.log(e_hi), np.log(target)
        if abs(le_hi - le_lo) < 1e-9 or le_hi >= le_lo:
            mid = 0.5 * (lo + hi)
        else:
            mid = lo + (hi - lo) * (le_t - le_lo) / (le_hi - le_lo)
            mid = min(max(mid, min(lo, hi)), max(lo, hi))
        e_mid, dt = measure(kernel, cfg, plan, solver, float(mid), ref,
                            tskip)
        if e_mid is None:
            hi = float(mid)          # overflow: tighten from above
            continue
        best = (float(mid), e_mid, dt)
        if abs(np.log(e_mid / target)) < np.log(1.03):
            break
        if e_mid > target:
            lo, e_lo = mid, e_mid
        else:
            hi, e_hi = mid, e_mid
        if hi - lo < 1e-3:
            break
    return best


def main(argv):
    n = 100_000
    block = 128
    order = 4
    method = "dtt"
    for a in argv:
        if a.startswith("-n="):
            n = int(float(a[3:]))
        elif a.startswith("-b="):
            block = int(a[3:])
        elif a.startswith("-o="):
            order = int(a[3:])
        elif a.startswith("--method="):
            method = a[9:]

    kernel = get_kernel("grav3d")
    # production round-2 knobs (docs/PERF.md): span tree build, '3x'
    # manual-bf16 MXU tier, Pallas pair executor, lean plan
    # frontier sized for the tightest theta the bisection visits
    # (near-neighbor count ~ 42*theta^3: theta=2.0 -> ~340 rows)
    cfg = SolverConfig(block_size=block, order=order,
                       frontier_width=384, cap_groups_dtt=28,
                       tree_mode="span", mxu_precision="3x",
                       pair_backend="pallas", pair_group=16,
                       lean_plan=order >= 0)
    solver = {"dtt": dtt.solve_dtt,
              "treecode1": treecode.solve_treecode1,
              "treecode2": treecode.solve_treecode2,
              "treecode3": treecode.solve_treecode3}[method]
    # treecode1 is monopole-only: its error floor is ~1e-3-class and its
    # surface MAC runs at larger theta (reference default -t=2.0,
    # ongrav3d.cpp:477), so the bisection bracket shifts right
    bracket = dict(lo=1.0, hi=4.5) if method == "treecode1" else {}

    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    tskip = max(1, int(float(n) * n / 2e9))
    # f32 tiled direct sum as the reference, like speedtest.pl greps the
    # drivers' own (fp32+Vc) direct results; the fp64 oracle would build
    # (chunk, N, OD) broadcast intermediates on-device (GBs at N=1e6)
    sub = P.Parts(x=targs.x[::tskip], r=targs.r[::tskip], s=None,
                  n_real=int(targs.x[::tskip].shape[0]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))
    plan = treecode.prepare(kernel, cfg, srcs, targs)

    rows = []
    for target in TARGET_ERRORS:
        res = bisect_theta(kernel, cfg, plan, solver, target, ref, tskip,
                           **bracket)
        if res is None:
            continue
        theta, err, dt = res
        row = (n, block, order, method, target, theta, err, dt, n / dt)
        rows.append(row)
        print(f"N={n} b={block} o={order} {method}: target {target:.0e} "
              f"-> theta={theta:.4f} err={err:.3e} time={dt:.4f}s "
              f"({n / dt:.3e} parts/s)")

    with open("new.dat", "a") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")


if __name__ == "__main__":
    main(sys.argv[1:])
