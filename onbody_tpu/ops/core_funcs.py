"""Regularized core functions for particle methods.

TPU-native equivalents of the reference's CoreFunc2d.hpp / CoreFunc3d.hpp:
Rosenhead-Moore (default) and compact-exponential regularizations, with the
3D gradient variants returning (r3, bbb). All piecewise branches are
expressed as `jnp.where` with safe denominators (no data-dependent control
flow), so they vectorize on the VPU and are Pallas-compatible.

Self-interactions (d2 == 0) are finite under RM whenever the radius is
positive; the exponential forms use safe-maximum guards to avoid NaN from
where-evaluated branches.

Flop counts mirror the reference's accounting (CoreFunc2d.hpp:29/36,
CoreFunc3d.hpp:32/41,180-181) for GFlop/s reporting parity.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_TINY = 1e-30


# ---------------------------------------------------------------- 2D cores

def rm_2d(d2, sr, tr=None):
    """Rosenhead-Moore: 1/(d^2 + sr^2 [+ tr^2]) — CoreFunc2d.hpp:24-36."""
    r2 = d2 + sr * sr
    if tr is not None:
        r2 = r2 + tr * tr
    return 1.0 / r2


def exp_2d(d2, sr, tr=None):
    """Compact exponential 2D core — CoreFunc2d.hpp:85-103.

    ood2 = 1/(d^2+1e-6); corefac = 1/(sr^2[+tr^2]); reld2 = corefac*d^2;
    piecewise: far -> ood2, close -> corefac, mid -> ood2*(1-exp(-reld2)).
    """
    ood2 = 1.0 / (d2 + 1e-6)
    s2 = sr * sr
    if tr is not None:
        s2 = s2 + tr * tr
    corefac = 1.0 / jnp.maximum(s2, _TINY)
    reld2 = corefac / ood2
    mid = ood2 * (1.0 - jnp.exp(-reld2))
    out = jnp.where(reld2 > 16.0, ood2, mid)
    return jnp.where(reld2 < 0.001, corefac, out)


# ---------------------------------------------------------------- 3D cores

def rm_3d(d2, sr):
    """RM 3D: (d^2 + sr^2)^-1.5 — CoreFunc3d.hpp:27-31."""
    r2 = d2 + sr * sr
    rinv = lax.rsqrt(r2)
    return rinv * rinv * rinv


def rm_3d_grads(d2, sr):
    """RM 3D with gradient factor: r3 and bbb = -3*r3/r2 — CoreFunc3d.hpp:34-41."""
    r2 = d2 + sr * sr
    rinv = lax.rsqrt(r2)
    r3 = rinv * rinv * rinv
    bbb = -3.0 * r3 / r2
    return r3, bbb


def exp_3d(d2, sr):
    """Compact exponential 3D core — CoreFunc3d.hpp:136-150."""
    dist = jnp.sqrt(d2)
    corefac = 1.0 / jnp.maximum(sr * sr * sr, _TINY)
    d3 = jnp.maximum(d2 * dist, _TINY)
    ood3 = 1.0 / d3
    reld3 = d3 * corefac
    mid = ood3 * (1.0 - jnp.exp(-jnp.minimum(reld3, 87.0)))
    out = jnp.where(reld3 > 16.0, ood3, mid)
    return jnp.where(reld3 < 0.001, corefac, out)


def exp_3d_grads(d2, sr):
    """Exponential 3D core with gradients — CoreFunc3d.hpp:152-177."""
    dist = jnp.sqrt(d2)
    corefac = 1.0 / jnp.maximum(sr * sr * sr, _TINY)
    d3 = jnp.maximum(d2 * dist, _TINY)
    reld3 = d3 * corefac
    dm3 = 1.0 / d3
    dm2 = 1.0 / jnp.maximum(d2, _TINY)
    expreld3 = jnp.exp(-jnp.minimum(reld3, 87.0))

    r3_far = dm3
    bbb_far = -3.0 * dm3 * dm2
    r3_mid = (1.0 - expreld3) * dm3
    bbb_mid = 3.0 * (corefac * expreld3 - r3_mid) * dm2
    r3_close = corefac
    bbb_close = -1.5 * dist * corefac * corefac

    r3 = jnp.where(reld3 > 16.0, r3_far, r3_mid)
    bbb = jnp.where(reld3 > 16.0, bbb_far, bbb_mid)
    r3 = jnp.where(reld3 < 0.001, r3_close, r3)
    bbb = jnp.where(reld3 < 0.001, bbb_close, bbb)
    return r3, bbb


def v2_3d(d2, sr):
    """Vatistas n=2: (d^4 + sr^4)^-0.75 — CoreFunc3d.hpp:185-198
    (off by default in the reference as well)."""
    s2 = sr * sr
    denom = d2 * d2 + s2 * s2
    rsqd = lax.rsqrt(jnp.maximum(denom, _TINY))
    return rsqd * jnp.sqrt(rsqd)


# ----------------------------------------------------------------- registry

_CORES_2D = {"rm": rm_2d, "exp": exp_2d}
_CORES_3D = {"rm": rm_3d, "exp": exp_3d, "v2": v2_3d}
_CORES_3D_GRADS = {"rm": rm_3d_grads, "exp": exp_3d_grads}

FLOPS = {
    ("rm", "2d"): 3, ("rm", "2d_tr"): 5,
    ("rm", "3d"): 5, ("rm", "3d_grads"): 8,
    ("exp", "2d"): 9, ("exp", "2d_tr"): 11,
    ("exp", "3d"): 9, ("exp", "3d_grads"): 15,
    ("v2", "3d"): 7,
}


def core_2d(name: str):
    return _CORES_2D[name]


def core_3d(name: str):
    return _CORES_3D[name]


def core_3d_grads(name: str):
    return _CORES_3D_GRADS[name]
