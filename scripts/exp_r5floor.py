"""r5: speed-of-light floor analysis for the 1e7 headline phases.

VERDICT r4 #3 ultimatum: either get 1e7 <= 2.8 s or PROVE the two
dominant phases (trees 2.23 s, exec 1.77 s — profile_phases at the
tuned config) sit within ~15% of hardware floors, with a v5p-scaled
projection. This script measures the primitive rates those floors are
built from, on the real chip:

1. HBM stream bandwidth (big f32 copy, add) — the roofline for every
   bandwidth-bound phase.
2. lax.sort rate vs row count, 1 key + 5 payload columns (the
   production tree sort shape) — per-row cost and its implied
   bytes-moved vs the bitonic pass-count model: XLA:TPU sorts are
   bitonic networks, so an L-row segment pays ~log2(L)*(log2(L)+1)/2
   full read+write passes. The tree phase = sum over levels of
   segmented sorts of the FULL padded array.
3. Dense pairwise interaction rate (direct-sum tiles, no list
   machinery) — the kernel-side ceiling for the exec phase in pairs/s.

Usage: python scripts/exp_r5floor.py
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
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct


def _sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    key = jax.random.PRNGKey(0)

    # 1. HBM stream rates
    n = 1 << 27                                   # 512 MB f32
    x = jax.random.uniform(key, (n,), jnp.float32)
    copy = jax.jit(lambda a: a + 1.0)
    t = timeit(copy, x)
    bw_stream = 2 * 4 * n / t / 1e9               # read + write
    print(f"stream add 512MB: {t*1e3:.1f} ms -> {bw_stream:.0f} GB/s "
          f"(r+w)", flush=True)

    # 2. lax.sort, production shape: f32 key + 5 payload columns
    #    (x-key, 2 other coords, radius, strength, index), segmented
    #    as one big sort (top level) and as 2^7 segments (mid level).
    cols = [jax.random.uniform(jax.random.fold_in(key, i), (n // 8,),
                               jnp.float32) for i in range(6)]
    for segs in (1, 128):
        m = (n // 8) // segs

        @jax.jit
        def seg_sort(*cs):
            rs = [c.reshape(segs, m) for c in cs]
            return jax.lax.sort(rs, dimension=1, num_keys=1)[0]

        t = timeit(seg_sort, *cols)
        rows = n // 8
        lg = int(np.log2(m))
        passes = lg * (lg + 1) // 2
        implied = rows * 6 * 4 * 2 * passes / t / 1e9
        print(f"sort {rows/1e6:.0f}M rows x6 cols, {segs} seg "
              f"(len 2^{lg}): {t*1e3:.1f} ms = "
              f"{t/rows*1e9:.2f} ns/row; bitonic {passes} passes -> "
              f"implied {implied:.0f} GB/s", flush=True)

    # 3. dense pairwise rate (the exec-phase kernel ceiling): tiled
    #    direct sum, 2^17 x 2^17 pairs = 17.2 G pairs, grav3d with the
    #    production accumulate dtype
    kernel = get_kernel("grav3d")
    ks, kt = jax.random.split(key)
    m = 1 << 17
    srcs = P.random_in_cube(ks, m, 3, 1, True)
    targs = P.random_in_cube(kt, m, 3, 0, False)
    t = timeit(lambda: direct.direct(kernel, srcs, targs), reps=3)
    pairs = float(m) * m
    print(f"dense direct {m}x{m}: {t:.3f} s -> "
          f"{pairs/t/1e9:.1f} G pairs/s "
          f"({pairs*19/t/1e12:.2f} TFlop/s at 19 flops/pair)",
          flush=True)


if __name__ == "__main__":
    main()
