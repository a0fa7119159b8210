"""Round-2 session-12 sweep: top-sort span width and block-size 128.

(a) span=3/4 top splits — each top-level variadic sort serves `span`
levels; fewer full-array sorts (the 0.92 s top fused dispatch is the
largest single tree cost at 1e7, docs/PERF.md r2s7). Boxes elongate up
to 2^span along the split axis at intermediate levels, which only
matters if the frontier overflows or the pair count inflates — both
printed here.

(b) block 128 at order 4 — the near-field leaf-leaf volume scales with
the block size; bs128 halves it (the reference's own granularity,
barneshut.hpp:229-294 blockSize=128) at the cost of 2x the block
fetches and one more tree level. Never measured against the dma_i
executor + prefix-sort stack.

Usage: python scripts/exp_r5tree.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from onbody_tpu import parts as P
from onbody_tpu.config import tuned_config
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, dtt, treecode


def _sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    kernel = get_kernel("grav3d")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync(srcs.x)

    tskip = max(1, n * n // int(4e11))
    import dataclasses
    sub = dataclasses.replace(targs, x=jnp.copy(targs.x[::tskip]),
                              r=jnp.copy(targs.r[::tskip]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    base = tuned_config(n)
    cases = [
        ("ctrl", base),
        ("span3 top9", base.replace(tree_span=3, tree_span_top=9)),
        ("span4 top8", base.replace(tree_span=4, tree_span_top=8)),
        # o4 at bs128 needs a much stricter MAC (3e4-CPU calibration:
        # t1.05 -> 7e-4; ctrl o5/t1.15 -> 3.9e-5); o5 at bs128 splits
        # the 216 equivalent rows over two blocks (n_eq_parts=2)
        ("bs128 o4 t1.5", base.replace(block_size=128, order=4,
                                       theta_dtt=1.5,
                                       frontier_width=256,
                                       list_width=640)),
        ("bs128 o5 t1.15", base.replace(block_size=128,
                                        theta_dtt=1.15,
                                        frontier_width=256,
                                        list_width=640)),
    ]

    for name, cfg in cases:
        try:
            plan = treecode.prepare(kernel, cfg, srcs, targs,
                                    want_inv=False)
            out, info = dtt.solve_dtt(kernel, cfg, plan,
                                      unscramble=False)
            _sync(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                plan = treecode.prepare(kernel, cfg, srcs, targs,
                                        want_inv=False)
                out, info = dtt.solve_dtt(kernel, cfg, plan,
                                          unscramble=False)
                _sync(out)
                ts.append(time.perf_counter() - t0)
            tg_arr = plan.tgt_gidx
            inv = jnp.zeros((n,), jnp.int32).at[tg_arr].set(
                jnp.arange(tg_arr.shape[0], dtype=jnp.int32),
                mode="drop")
            got = np.asarray(out[inv[::tskip]])[:ref.shape[0]]
            rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            print(f"{name:16s}: full {min(ts):.3f}s rms {rms:.2e} "
                  f"nvalid {int(info.n_valid)} "
                  f"overflow {int(info.overflow)}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must continue
            print(f"{name:16s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
