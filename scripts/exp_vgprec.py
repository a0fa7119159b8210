"""vortgrad3d TPU accuracy bisect at N (default 1e6).

q21 measured rms 3.9e-3 at 1e6 on the tuned stack (mxu_precision 3xt,
fetch dma_i) while the same solve on the CPU jnp executor at 3e4
measures 6.1e-5 — this isolates the TPU-side error source by sweeping
(precision, fetch) pairs against the per-pair-exact f32 direct
reference. If 'highest' is clean, the bf16-split tier interacts badly
with the gradient contraction; if nothing is clean, the Pallas
executor/combine path miscomputes.

Usage: python scripts/exp_vgprec.py [N]
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
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    kernel = get_kernel("vortgrad3d")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 3, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    _sync(srcs.x)

    tskip = max(1, n * n // int(2e11))
    import dataclasses
    sub = dataclasses.replace(targs, x=jnp.copy(targs.x[::tskip]),
                              r=jnp.copy(targs.r[::tskip]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    base = tuned_config(n, kernel.name)
    cases = [
        ("3xt dma_i", base),
        ("highest dma_i", base.replace(mxu_precision="highest")),
        ("3xt pregather", base.replace(pair_fetch="pregather",
                                       pair_group=16)),
        ("highest pregather", base.replace(mxu_precision="highest",
                                           pair_fetch="pregather",
                                           pair_group=16)),
        ("3x dma_i", base.replace(mxu_precision="3x")),
        ("jnp backend", base.replace(pair_backend="jnp",
                                     pair_fetch="pregather",
                                     pair_group=16)),
    ]
    for name, cfg in cases:
        try:
            plan = treecode.prepare(kernel, cfg, srcs, targs,
                                    want_inv=False)
            out, info = dtt.solve_dtt(kernel, cfg, plan,
                                      unscramble=False)
            _sync(out)
            t0 = time.perf_counter()
            plan = treecode.prepare(kernel, cfg, srcs, targs,
                                    want_inv=False)
            out, info = dtt.solve_dtt(kernel, cfg, plan,
                                      unscramble=False)
            _sync(out)
            dt = time.perf_counter() - t0
            tg = plan.tgt_gidx
            inv = jnp.zeros((n,), jnp.int32).at[tg].set(
                jnp.arange(tg.shape[0], dtype=jnp.int32), mode="drop")
            got = np.asarray(out[inv[::tskip]])[:ref.shape[0]]
            rv = (np.linalg.norm(got[:, :3] - ref[:, :3])
                  / np.linalg.norm(ref[:, :3]))
            rg = (np.linalg.norm(got[:, 3:] - ref[:, 3:])
                  / np.linalg.norm(ref[:, 3:]))
            print(f"{name:18s}: {dt:.3f}s vel {rv:.2e} grad {rg:.2e} "
                  f"ovf {int(info.overflow)}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must continue
            print(f"{name:18s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
