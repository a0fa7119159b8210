"""Particle sets as SoA pytrees.

TPU-native equivalent of the reference's `Parts<S,A,PD,SD,OD>` container
(Parts.hpp:32-74): structure-of-arrays particle data with initializers
mirroring Parts.hpp:93-177 (random_in_cube, random_in_disk,
smooth/central/wave_strengths, randomize_radii).

Unlike the reference, outputs `u` are not stored on the object — solvers
are pure functions returning output arrays. Padding (the analogue of
`buffer_end`, Parts.hpp:200-218) clones real particles with zero strength
so padded slots are numerically inert in every kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Parts:
    """A set of particles, sources or targets.

    x: (n, pd) positions
    r: (n,)    radii
    s: (n, sd) strengths, or None for pure targets
    n_real:    number of real (un-padded) particles — static metadata
    """

    x: jax.Array
    r: jax.Array
    s: Optional[jax.Array]
    n_real: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n(self) -> int:
        return self.x.shape[0]

    @property
    def pd(self) -> int:
        return self.x.shape[1]

    @property
    def sd(self) -> int:
        return 0 if self.s is None else self.s.shape[1]

    @property
    def are_sources(self) -> bool:
        return self.s is not None


def random_in_cube(key: jax.Array, n: int, pd: int, sd: int,
                   are_sources: bool = True,
                   dtype=jnp.float32) -> Parts:
    """Uniform positions in [-1,1]^pd, strengths in [-1,1]/n, radius n^(-1/pd).

    Mirrors Parts.hpp:100-109 (random_in_cube with engine).
    """
    kx, ks = jax.random.split(key)
    x = jax.random.uniform(kx, (n, pd), dtype=dtype, minval=-1.0, maxval=1.0)
    r = jnp.full((n,), float(n) ** (-1.0 / pd), dtype=dtype)
    s = None
    if are_sources:
        s = jax.random.uniform(ks, (n, sd), dtype=dtype,
                               minval=-1.0, maxval=1.0) / float(n)
    return Parts(x=x, r=r, s=s, n_real=n)


def random_in_disk(key: jax.Array, n: int, pd: int, sd: int,
                   are_sources: bool = True,
                   dtype=jnp.float32) -> Parts:
    """Central star + low-mass orbiters in a disk (Parts.hpp:112-134)."""
    theta = jax.random.uniform(key, (n,), dtype=dtype,
                               minval=0.0, maxval=2.0 * np.pi)
    i = jnp.arange(n, dtype=dtype)
    rad = 0.1 + 5.0 * i / float(n)
    x = jnp.zeros((n, pd), dtype=dtype)
    x = x.at[:, 0].set(rad * jnp.cos(theta))
    x = x.at[:, 1].set(rad * jnp.sin(theta))
    x = x.at[0, :].set(0.0)
    s = None
    if are_sources:
        s = jnp.zeros((n, sd), dtype=dtype)
        s = s.at[:, 0].set(0.1 / float(n))
        s = s.at[0, 0].set(1.0)
    r = jnp.full((n,), (0.1 / float(n)) ** 2, dtype=dtype)
    r = r.at[0].set(0.00465)
    return Parts(x=x, r=r, s=s, n_real=n)


def smooth_strengths(p: Parts) -> Parts:
    """s[d] = (x - y)/n (Parts.hpp:137-145)."""
    if p.s is None:
        return p
    v = (p.x[:, 0] - p.x[:, 1]) / float(p.n_real)
    s = jnp.broadcast_to(v[:, None], p.s.shape).astype(p.s.dtype)
    return dataclasses.replace(p, s=s)


def central_strengths(p: Parts) -> Parts:
    """Radially-modulated cosine strengths (Parts.hpp:159-168)."""
    if p.s is None:
        return p
    dist = jnp.sqrt(jnp.sum((p.x - 0.5) ** 2, axis=1))
    v = jnp.cos(30.0 * jnp.sqrt(dist)) / (5.0 * dist + 1.0) / float(p.n_real)
    s = jnp.broadcast_to(v[:, None], p.s.shape).astype(p.s.dtype)
    return dataclasses.replace(p, s=s)


def wave_strengths(p: Parts) -> Parts:
    """s[d] = cos((d+0.7)*10*x[d])/n (Parts.hpp:171-177)."""
    if p.s is None:
        return p
    d = jnp.arange(p.sd, dtype=p.x.dtype)
    xs = p.x[:, : p.sd] if p.sd <= p.pd else jnp.pad(
        p.x, ((0, 0), (0, p.sd - p.pd)))
    s = jnp.cos((d + 0.7) * 10.0 * xs) / float(p.n_real)
    return dataclasses.replace(p, s=s.astype(p.s.dtype))


def randomize_radii(key: jax.Array, p: Parts) -> Parts:
    """r *= U(0.5, 1.5) (Parts.hpp:152-156)."""
    f = jax.random.uniform(key, p.r.shape, dtype=p.r.dtype,
                           minval=0.5, maxval=1.5)
    return dataclasses.replace(p, r=p.r * f)


def pad_to(p: Parts, n_pad: int) -> Parts:
    """Pad a particle set to n_pad slots.

    Padded slots carry zero strength (numerically inert) and sit in a
    cluster OUTSIDE the real domain (one diameter past the max corner),
    so they sort to the high end of every split axis and concentrate in
    pure-padding leaves instead of diluting every leaf (a 1.68x slowdown
    when n is just above a power-of-two block count). The tree build
    excludes them from node boxes and centers of mass (tree/build.py
    _masked_box/_upward_stats), so MAC geometry sees only real
    particles. Replaces the reference's neutral-element buffer_end trick
    (Parts.hpp:200-218) and its partial-block handling.
    """
    n = p.n
    if n_pad == n:
        return p
    assert n_pad > n
    lo = jnp.min(p.x, axis=0)
    hi = jnp.max(p.x, axis=0)
    # pads are the real cloud translated one diameter past the max corner:
    # realistic spacing keeps pad-node boxes and barycentric weights
    # well-conditioned (a denser fake cluster overflows 1/dist weights)
    offset = (hi - lo) + 1.0
    idx = jnp.arange(n, n_pad) % n
    x = jnp.concatenate([p.x, p.x[idx] + offset[None, :]], axis=0)
    rmean = jnp.mean(p.r)
    r = jnp.concatenate(
        [p.r, jnp.full((n_pad - n,), 1.0, p.r.dtype) * jnp.maximum(
            rmean, 1e-6)], axis=0)
    s = None
    if p.s is not None:
        s = jnp.concatenate(
            [p.s, jnp.zeros((n_pad - n, p.sd), dtype=p.s.dtype)], axis=0)
    return Parts(x=x, r=r, s=s, n_real=p.n_real)


def astype(p: Parts, dtype) -> Parts:
    """Cast a particle set to a storage dtype (SolverConfig.storage_dtype,
    the reference's STORE template parameter, ongrav3d.cpp:7)."""
    if p.x.dtype == jnp.dtype(dtype):
        return p
    return Parts(x=p.x.astype(dtype), r=p.r.astype(dtype),
                 s=None if p.s is None else p.s.astype(dtype),
                 n_real=p.n_real)


def from_arrays(x, r=None, s=None) -> Parts:
    """Build a Parts from plain arrays (library-API entry)."""
    x = jnp.asarray(x)
    n = x.shape[0]
    if r is None:
        r = jnp.zeros((n,), dtype=x.dtype)
    else:
        r = jnp.asarray(r)
    if s is not None:
        s = jnp.asarray(s)
        if s.ndim == 1:
            s = s[:, None]
    return Parts(x=x, r=r, s=s, n_real=n)
