"""Per-phase wall-clock timing and flop accounting.

Equivalent of the reference's std::chrono phase timers with cumulative
tree-time attribution (ongrav3d.cpp:606-614, treetime[]) and the
flop-count-based GFlop/s reporting (ongrav3d.cpp:747).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict, List

import jax


class PhaseTimer:
    def __init__(self):
        self.phases: Dict[str, float] = {}
        self.order: List[str] = []

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        if name not in self.phases:
            self.order.append(name)
            self.phases[name] = 0.0
        self.phases[name] += dt

    def time(self, name: str, fn, *args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        out = jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        if name not in self.phases:
            self.order.append(name)
            self.phases[name] = 0.0
        self.phases[name] += dt
        return out

    def report(self, printer=print):
        for name in self.order:
            printer(f"  {name}:\t[{self.phases[name]:.4f}] seconds")

    def total(self, *names):
        return sum(self.phases.get(n, 0.0) for n in names)


def pair_flops(n_pairs_valid: int, block_size: int,
               kernel_flops: int) -> float:
    """UPPER-BOUND flop estimate: every pair charged a full BxB tile.

    Includes padded slots (parked proxies, pad clones in partial leaf
    blocks) — at bs256/W128 configs this overstates real work ~2x. Use
    block_real_counts + interaction_flops for numbers comparable with
    the reference's per-interaction counters (barneshut.hpp:131,
    ongrav3d.cpp:60)."""
    return float(n_pairs_valid) * block_size * block_size * kernel_flops


def block_real_counts(levels: int, block_size: int, n_real: int,
                      order: int, pd: int, n_rows: int,
                      width: int = 0):
    """Per-Blocks-row REAL slot counts for honest flop accounting.

    Row conventions follow tree/build.py + tree/equivalents.py: rows
    [nleaf, 2*nleaf) are leaf particle blocks, rows [1, nleaf) interior
    proxy blocks (part 0), rows >= 2*nleaf extension parts j >= 1 of
    oversized proxy grids (ext_offset). Real counts:

      * leaf row: pad clones sort past every real particle (pad_to puts
        them beyond the max corner), so reals occupy the global slot
        prefix [0, n_real) of the sorted order — leaf i holds
        clip(n_real - i*bs, 0, bs) reals.
      * interior row, order >= 0: min((order+1)^pd, width) Chebyshev
        proxies (parked overflow slots are strength-inert), 0 for dead
        nodes; extension part j holds the next `width` of the grid.
        `width` is the Blocks row width (>= block_size; equivalents.py
        pads rows to a lane-aligned common width) — pass
        plan.src_fm.shape[-1]; defaults to block_size.
      * interior row, order < 0 (pair-merge): proxies can't exceed the
        node's real particle count (odd-count passthrough keeps them
        ~= min(num, bs), barneshut.hpp:986-1008).
    """
    import numpy as np
    bs = block_size
    W = width or bs
    nleaf = 1 << levels
    n_pad = nleaf * bs
    rows = np.arange(n_rows, dtype=np.int64)
    cnt = np.zeros(n_rows, dtype=np.int64)
    m_eq = bs if order < 0 else (order + 1) ** pd

    leaf = (rows >= nleaf) & (rows < 2 * nleaf)
    cnt[leaf] = np.clip(n_real - (rows[leaf] - nleaf) * bs, 0, bs)

    interior = (rows >= 1) & (rows < nleaf)
    ri = rows[interior]
    lvl = np.frexp(ri.astype(np.float64))[1] - 1     # floor(log2 r)
    span = n_pad >> lvl
    nreal_node = np.clip(n_real - (ri - (1 << lvl)) * span, 0, span)
    if order < 0:
        cnt[interior] = np.minimum(nreal_node, bs)
    else:
        cnt[interior] = np.where(nreal_node > 0, min(m_eq, W), 0)

    ext = rows >= 2 * nleaf
    if ext.any() and order >= 0:
        j = rows[ext] // nleaf - 1                   # extension part
        node = rows[ext] - (j + 1) * nleaf
        lvl = np.frexp(np.maximum(node, 1).astype(np.float64))[1] - 1
        span = n_pad >> lvl
        nreal_node = np.clip(n_real - (node - (1 << lvl)) * span, 0, span)
        cnt[ext] = np.where((node > 0) & (nreal_node > 0),
                            np.clip(m_eq - j * W, 0, W), 0)
    cnt[0] = 0
    return cnt


def interaction_flops(info, cnt_t, cnt_s, kernel_flops: int) -> float:
    """Real interaction count x kernel flops for an executed pair list.

    info: PairList (src (P,)) or PairGroups (src (P, G)) as returned by
    exec_pairs; cnt_t/cnt_s: per-row real slot counts (block_real_counts).
    Runs on device (the group list is large at 1e7 — never pull it
    through the tunnel); one scalar comes back."""
    import jax.numpy as jnp
    import numpy as np
    ct = jnp.asarray(cnt_t, jnp.float32)
    cs = jnp.asarray(cnt_s, jnp.float32)
    src = info.src if info.src.ndim == 2 else info.src[:, None]
    per_tgt = jnp.sum(jnp.where(src != 0, cs[src], 0.0), axis=1)
    total = jnp.sum(ct[info.tgt] * per_tgt, dtype=jnp.float32)
    return float(np.asarray(total)) * kernel_flops
