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
    def phase(self, name: str, result_holder=None):
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
    """Flop estimate for a pair list: every pair is a block x block tile."""
    return float(n_pairs_valid) * block_size * block_size * kernel_flops
