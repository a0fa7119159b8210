"""Round-2 session-11 sweep: retune 1e6 with the knobs that won at 1e7.

The tuned 1e6 config (b256/o5/t1.2, W192, g16 pregather, '3x') predates
the 1e7 wins: dma_i g32/tg4, W128, '3xt' transposed MXU output,
sort row-compaction, paired+defer tree build (retry — prefix sorts
landed since it measured 0.408), and the theta 1.15 MAC. One process,
all variants on the fused path bench.py uses at this N.

Usage: python scripts/exp_r4g6.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

if os.environ.get("ONBODY_EXP_PLATFORM"):
    # the axon sitecustomize freezes JAX_PLATFORMS at interpreter start;
    # config.update is the only reliable switch (see tests/conftest.py)
    jax.config.update("jax_platforms", os.environ["ONBODY_EXP_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from onbody_tpu import parts as P
from onbody_tpu.config import tuned_config
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, dtt


def _sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    kernel = get_kernel("grav3d")
    base = tuned_config(n)
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync((srcs.x, targs.x))

    tskip = max(1, n * n // int(4e11))
    import dataclasses
    sub = dataclasses.replace(targs, x=jnp.copy(targs.x[::tskip]),
                              r=jnp.copy(targs.r[::tskip]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    variants = [
        ("ctrl (tuned)", {}),
        ("W128", dict(frontier_width=128)),
        ("3xt", dict(mxu_precision="3xt")),
        ("sortcompact", dict(list_compact="sort")),
        ("dma_i g32/tg4", dict(pair_fetch="dma_i", pair_group=32,
                               pair_tile_g=4)),
        ("combo", dict(frontier_width=128, mxu_precision="3xt",
                       list_compact="sort", pair_fetch="dma_i",
                       pair_group=32, pair_tile_g=4)),
        ("combo+paired", dict(frontier_width=128, mxu_precision="3xt",
                              list_compact="sort", pair_fetch="dma_i",
                              pair_group=32, pair_tile_g=4,
                              tree_paired=True, tree_defer_rs=True,
                              tree_fuse=8)),
        ("combo+t1.15", dict(frontier_width=128, mxu_precision="3xt",
                             list_compact="sort", pair_fetch="dma_i",
                             pair_group=32, pair_tile_g=4,
                             theta_dtt=1.15)),
    ]
    for label, kw in variants:
        cfg = base.replace(**kw)
        try:
            (out, inv), info = dtt.solve_dtt_fused(kernel, cfg, srcs,
                                                   targs,
                                                   unscramble=False)
            _sync(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                (out, inv), info = dtt.solve_dtt_fused(
                    kernel, cfg, srcs, targs, unscramble=False)
                _sync(out)
                ts.append(time.perf_counter() - t0)
            got = np.asarray(out[inv[::tskip]])[:ref.shape[0]]
            rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            print(f"{label:16s}: {min(ts):.3f}s rms {rms:.2e} "
                  f"nvalid {int(info.n_valid)} "
                  f"overflow {int(info.overflow)}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must continue
            print(f"{label:16s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
