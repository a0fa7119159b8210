"""AOT memory analysis of the N=1e8 chunked tree-build programs.

Compiles (never runs) each fused _run_steps dispatch, the finish pass,
and the deferred r/s gather at the exact 1e8 shapes, and prints XLA's
per-program memory analysis (argument/output/temp bytes). Finds which
program's temp allocation blows the 16 GB budget without paying a
20-minute failed run per hypothesis.

Usage: python scripts/exp_r3mem.py [N] [fuse]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from onbody_tpu.config import SolverConfig
from onbody_tpu.tree import build as tb


def mem(compiled):
    m = compiled.memory_analysis()
    g = 1 / 2**30
    return (f"args {m.argument_size_in_bytes*g:6.2f}  "
            f"out {m.output_size_in_bytes*g:6.2f}  "
            f"temp {m.temp_size_in_bytes*g:6.2f}  "
            f"(alias {m.alias_size_in_bytes*g:5.2f}) GiB")


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000
    fuse = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    cfg = SolverConfig(block_size=256, order=5, tree_mode="span",
                       tree_defer_rs=True, list_compact="sort")
    levels, n_pad = tb.plan(n, cfg.block_size)
    print(f"N={n:.0e} levels={levels} n_pad={n_pad} fuse={fuse}",
          flush=True)
    pd = 3
    f32 = jax.ShapeDtypeStruct((n_pad,), jnp.float32)
    i32 = jax.ShapeDtypeStruct((n_pad,), jnp.int32)
    cols = (f32,) * pd + (i32,)                  # defer_rs source build
    n_real = jax.ShapeDtypeStruct((), jnp.int32)

    sched = tb._build_schedule(levels, levels, n_pad, cfg.tree_span,
                               cfg.tree_span_top, None, n, 1)
    for i in range(0, len(sched), max(1, fuse)):
        sl = tuple(sched[i:i + max(1, fuse)])
        fn = jax.jit(tb._run_steps,
                     static_argnames=("schedule", "pd", "bitonic"),
                     donate_argnums=(0,))
        c = fn.lower(cols, n_real, sl, pd, tb.BITONIC_MAX_M).compile()
        kinds = ",".join(f"{k[0]}{k[1]}" for k in sl)
        print(f"steps [{kinds}]: {mem(c)}", flush=True)

    # deferred r/s gather (perm over padded slots, packed c64)
    perm = jax.ShapeDtypeStruct((n_pad,), jnp.int32)
    gf = jax.jit(lambda p, r, s: tb._gather_rs_packed(p, r, s, 1, True))
    c = gf.lower(perm, f32, jax.ShapeDtypeStruct((n_pad, 1),
                                                 jnp.float32)).compile()
    print(f"gather_rs: {mem(c)}", flush=True)

    # finish pass (boxes assembly + upward stats) at the source shapes
    nlev = levels + 1
    pdv = jax.ShapeDtypeStruct((1, pd), jnp.float32)
    lows = tuple(jax.ShapeDtypeStruct((1 << l, pd), jnp.float32)
                 for l in range(nlev))
    cols_fin = (f32,) * pd + (f32,) + (f32,) + (i32,)  # x3, r, s, gidx
    ff = jax.jit(tb._finish_median,
                 static_argnames=("levels", "block_size", "sd",
                                  "are_targets", "n_live"))
    c = ff.lower(cols_fin, n_real, lows, lows, levels, cfg.block_size,
                 1, False, n_live=n).compile()
    print(f"finish_median: {mem(c)}", flush=True)


if __name__ == "__main__":
    main()
