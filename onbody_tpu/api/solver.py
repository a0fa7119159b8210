"""Embeddable solver API — the reference's C-ABI library layer, Python-first.

Function-for-function equivalents of the `extern "C"` entry points
(interface2dvort.cpp:182-374, interface2dvorttr.cpp:177-373,
interface3dvortgrads.cpp:247-500): numpy arrays in, numpy arrays out,
float32, with the same hard-coded production tuning (2D: theta=1.3,
order=4, blockSize=128 — interface2dvort.cpp:189-195; 3D: theta=1.5,
order=4 — interface3dvortgrads.cpp:258-261) and the same blockwise
(treecode3) evaluation path. Targets may alias sources (self-interaction
is regularized, main2dvort.cpp:83-85 tests this).

A C ABI shim for Fortran-style callers lives in onbody_tpu/api/cabi
(libonbody_c.so exporting external_vel_solver_f_ etc.).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.parts import Parts, from_arrays
from onbody_tpu.traverse import direct as direct_mod
from onbody_tpu.traverse import treecode

_CFG_2D = SolverConfig(block_size=128, order=4, theta_boxwise=1.3)
_CFG_3D = SolverConfig(block_size=128, order=4, theta_boxwise=1.5)


def _solve_boxwise(kernel_name: str, cfg: SolverConfig, srcs: Parts,
                   targs: Parts, theta: float) -> np.ndarray:
    kernel = get_kernel(kernel_name)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    out, pl = treecode.solve_treecode3(kernel, cfg, plan, theta=theta)
    # two-phase count/fill recovery — never return a truncated sum.
    # Widen ALL FOUR static capacity knobs exactly as the benchmark
    # drivers do (drivers/common.py): frontier/list widths bound the
    # builder, cap_groups_* bound the grouped executor; a group-cap
    # overflow would otherwise survive a width-only retry.
    wide = cfg
    for _ in range(3):
        if int(pl.overflow) == 0:
            break
        wide = wide.replace(
            frontier_width=wide.frontier_width * 4,
            list_width=wide.list_width * 4,
            cap_groups_dtt=wide.cap_groups_dtt * 4,
            cap_groups_treecode=wide.cap_groups_treecode * 4)
        plan = treecode.prepare(kernel, wide, srcs, targs)
        out, pl = treecode.solve_treecode3(kernel, wide, plan, theta=theta)
    assert int(pl.overflow) == 0, "interaction lists kept overflowing"
    return np.asarray(out)


def vel_solver_2d(sx, sy, ss, sr, tx, ty, tr=None,
                  theta: float = 1.3, order: int = 4
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """2D vortex Biot-Savart, treecode3 path.

    external_vel_solver_f_ (interface2dvort.cpp:182) with tr=None;
    external_vel_solver_tr_f_ (interface2dvorttr.cpp:177) with tr given.
    Returns (tu, tv).
    """
    srcs = from_arrays(np.stack([sx, sy], 1), r=sr, s=ss)
    targs = from_arrays(np.stack([tx, ty], 1), r=tr)
    cfg = _CFG_2D.replace(order=order)
    out = _solve_boxwise("vort2d", cfg, srcs, targs, theta)
    return out[:, 0], out[:, 1]


def vel_direct_2d(sx, sy, ss, sr, tx, ty, tr=None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """2D direct sum (external_vel_direct_f_, interface2dvort.cpp:324)."""
    kernel = get_kernel("vort2d")
    srcs = from_arrays(np.stack([sx, sy], 1), r=sr, s=ss)
    targs = from_arrays(np.stack([tx, ty], 1), r=tr)
    out = np.asarray(direct_mod.direct(kernel, srcs, targs))
    return out[:, 0], out[:, 1]


def vel_solver_3dvortgrads(sx, sy, sz, ssx, ssy, ssz, sr, tx, ty, tz,
                           theta: float = 1.5, order: int = 4):
    """3D vortex velocity + 9 gradients, treecode3 path
    (external_vel_solver_f_, interface3dvortgrads.cpp:247).

    Returns a tuple of 12 arrays: (tu, tv, tw, tux, tvx, twx, tuy, tvy,
    twy, tuz, tvz, twz).
    """
    srcs = from_arrays(np.stack([sx, sy, sz], 1), r=sr,
                       s=np.stack([ssx, ssy, ssz], 1))
    targs = from_arrays(np.stack([tx, ty, tz], 1))
    cfg = _CFG_3D.replace(order=order)
    out = _solve_boxwise("vortgrad3d", cfg, srcs, targs, theta)
    return tuple(out[:, d] for d in range(12))


def vel_direct_3dvortgrads(sx, sy, sz, ssx, ssy, ssz, sr, tx, ty, tz):
    """3D vortgrads direct sum (interface3dvortgrads.cpp:422)."""
    kernel = get_kernel("vortgrad3d")
    srcs = from_arrays(np.stack([sx, sy, sz], 1), r=sr,
                       s=np.stack([ssx, ssy, ssz], 1))
    targs = from_arrays(np.stack([tx, ty, tz], 1))
    out = np.asarray(direct_mod.direct(kernel, srcs, targs))
    return tuple(out[:, d] for d in range(12))
