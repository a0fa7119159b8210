"""r4 sweep A: gather micro-costs + quantized-sort tree build at 1e7.

Questions:
  1. Gather cost model: is the ~7.4 ns/element cost per COLUMN or per
     ROW?  f32 vs complex64 vs complex128(bitcast-packed) vs (n, k) row
     gathers at 16.8 M rows decides how cheaply the quant build can
     recover exact coordinates (and whether _gather_rs_packed should
     pack 4 f32 per gather instead of 2).
  2. tree_quant='gather' vs control: paired 1e7 grav3d tree build
     (treecode.prepare) wall time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from onbody_tpu import parts as P
from onbody_tpu.config import tuned_config
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import treecode


def sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim].astype(jnp.float32)))


def timeit(fn, *args, iters=3):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def gather_bench(n=16_777_216):
    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, jnp.arange(n, dtype=jnp.int32))
    cols = [jax.random.normal(jax.random.PRNGKey(i), (n,), jnp.float32)
            for i in range(8)]
    x4 = jnp.stack(cols[:4], 1)
    x8 = jnp.stack(cols, 1)

    f_f32 = jax.jit(lambda c, p: c[p])
    f_c64 = jax.jit(lambda a, b, p: jax.lax.complex(a, b)[p])

    def c128(a, b, c, d, p):
        lo = jax.lax.bitcast_convert_type(
            jnp.stack([a, b], -1), jnp.float64)
        hi = jax.lax.bitcast_convert_type(
            jnp.stack([c, d], -1), jnp.float64)
        g = jax.lax.complex(lo, hi)[p]
        out = jax.lax.bitcast_convert_type(jax.lax.real(g), jnp.float32)
        return out[:, 0]
    f_c128 = jax.jit(c128)
    f_row4 = jax.jit(lambda x, p: x[p])
    f_row8 = jax.jit(lambda x, p: x[p])

    t, _ = timeit(f_f32, cols[0], perm)
    print(f"gather f32 1col      : {t:.4f} s  ({t/n*1e9:.2f} ns/row)", flush=True)
    t, _ = timeit(f_c64, cols[0], cols[1], perm)
    print(f"gather c64 2col      : {t:.4f} s  ({t/n*1e9:.2f} ns/row)", flush=True)
    try:
        t, _ = timeit(f_c128, cols[0], cols[1], cols[2], cols[3], perm)
        print(f"gather c128 4col     : {t:.4f} s  ({t/n*1e9:.2f} ns/row)", flush=True)
    except Exception as e:
        print("gather c128 4col     : FAILED", repr(e)[:120], flush=True)
    t, _ = timeit(f_row4, x4, perm)
    print(f"gather row (n,4) f32 : {t:.4f} s  ({t/n*1e9:.2f} ns/row)", flush=True)
    t, _ = timeit(f_row8, x8, perm)
    print(f"gather row (n,8) f32 : {t:.4f} s  ({t/n*1e9:.2f} ns/row)", flush=True)


def tree_bench(n=10_000_000):
    kernel = get_kernel("grav3d")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    sync(srcs.x)
    sync(targs.x)
    base = tuned_config(n)
    for name, cfg in [
            ("ctrl   ", base),
            ("quant-g", base.replace(tree_quant="gather"))]:
        t, plan = timeit(
            lambda c=cfg: treecode.prepare(kernel, c, srcs, targs,
                                           want_inv=False), iters=3)
        print(f"prepare {name}: {t:.4f} s", flush=True)
        del plan


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "gather"):
        gather_bench()
    if which in ("all", "tree"):
        tree_bench()
