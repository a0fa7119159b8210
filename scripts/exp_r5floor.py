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

# the axon sitecustomize imports jax before this file runs, freezing
# config from the env at interpreter start; config.update is the only
# reliable way to enable the persistent compile cache here
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                "/tmp/jax_cache"))
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

    # Through the axon tunnel every sync costs ~25-30 ms; all timed
    # bodies therefore CHAIN K iterations inside one jit (bitonic
    # sorts are data-oblivious, so feeding a sort its own output does
    # not change its pass count) and divide by K.
    K = 16

    # 1. HBM stream rates
    n = 1 << 27                                   # 512 MB f32
    x = jax.random.uniform(key, (n,), jnp.float32)

    @jax.jit
    def chain_add(a):
        for _ in range(K):
            a = a + 1.0
        return a

    t = timeit(chain_add, x) / K
    bw_stream = 2 * 4 * n / t / 1e9               # read + write
    print(f"stream add 512MB: {t*1e3:.2f} ms -> {bw_stream:.0f} GB/s "
          f"(r+w)", flush=True)

    # 2. lax.sort at the PRODUCTION shape: f32 key + 3 payload columns
    #    (x-key, 2 other coords, index; radius/strength are deferred —
    #    tree_defer_rs). Rows = 2*n_pad (paired build stacks both
    #    trees). Measure ns/row across the segment lengths the level
    #    walk actually visits.
    rows = 1 << 25                                 # 2*n_pad at 1e7
    cols = [jax.random.uniform(jax.random.fold_in(key, i), (rows,),
                               jnp.float32) for i in range(4)]
    rate = {}
    for lg in (24, 20, 16, 12, 8):
        m = 1 << lg
        segs = rows // m
        ksort = 4 if lg >= 22 else K

        @jax.jit
        def seg_sort(*cs, segs=segs, m=m, ksort=ksort):
            rs = [c.reshape(segs, m) for c in cs]
            for _ in range(ksort):
                rs = jax.lax.sort(rs, dimension=1, num_keys=1)
            return rs[0]

        t = timeit(seg_sort, *cols) / ksort
        passes = lg * (lg + 1) // 2
        implied = rows * 4 * 4 * 2 * passes / t / 1e9
        rate[lg] = t / rows * 1e9
        print(f"sort 32M rows x4 cols, seg 2^{lg}: {t*1e3:7.1f} ms = "
              f"{t/rows*1e9:5.2f} ns/row; bitonic {passes} passes -> "
              f"implied {implied:.0f} GB/s", flush=True)

    # 2b. production sort schedule at 1e7 (tuned: span=2, span_top=6,
    #     defer_rs) — modeled cost from the measured per-length rates
    from onbody_tpu.config import tuned_config
    from onbody_tpu.tree import build as tb
    n7 = 10_000_000
    cfg = tuned_config(n7)
    levels, n_pad = tb.plan(n7, cfg.block_size)
    sched = tb._build_schedule(levels, levels, n_pad, cfg.tree_span,
                               cfg.tree_span_top, None, n7, 2, loff=1)
    tot = 0.0
    nsorts = 0
    for op in sched:
        if op[0] != "sort":
            continue
        nsorts += 1
        l = op[1]
        m = (2 * n_pad) >> l
        lg = np.log2(m)
        # linear interpolation of measured ns/row in log segment length
        ks = sorted(rate)
        lo = max(k for k in ks if k <= lg) if lg >= ks[0] else ks[0]
        hi = min(k for k in ks if k >= lg) if lg <= ks[-1] else ks[-1]
        r = rate[lo] if lo == hi else np.interp(lg, [lo, hi],
                                                [rate[lo], rate[hi]])
        tot += 2 * n_pad * r * 1e-9
    print(f"modeled paired-build sort floor at 1e7: {nsorts} level-"
          f"sorts x {2*n_pad/1e6:.1f}M rows = {tot:.3f} s "
          f"(vs measured prepare tree portion, docs/PERF.md)",
          flush=True)

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

    # 4. PRODUCTION grouped pair executor on dense synthetic groups —
    #    the true exec-phase ceiling (same Pallas kernel, MXU tier,
    #    fetch mode and group layout as the tuned solve; hashed source
    #    rows reproduce the scattered gather pattern).
    from onbody_tpu.config import tuned_config as _tc
    from onbody_tpu.traverse import treecode as _tcm
    from onbody_tpu.ops import pallas_pairs as pp
    n6 = 1 << 20
    cfgx = _tc(1_000_000)
    s6 = P.random_in_cube(jax.random.fold_in(key, 7), n6, 3, 1, True)
    t6 = P.random_in_cube(jax.random.fold_in(key, 8), n6, 3, 0, False)
    plan6 = _tcm.prepare(kernel, cfgx, s6, t6, want_inv=False)
    nn = plan6.tgt_geo.shape[0]
    # geo rows are (nodes, 8 feature slots, block width) — pair width
    # is the LAST axis
    nleaf, b = nn // 2, plan6.tgt_geo.shape[2]
    g = cfgx.pair_group
    Pn = 1 << 17
    gt = nleaf + (jnp.arange(Pn, dtype=jnp.int32) % nleaf)
    gs = nleaf + ((jnp.arange(Pn * g, dtype=jnp.uint32)
                   * jnp.uint32(2654435761)) % nleaf).astype(
        jnp.int32).reshape(Pn, g)
    d2m = "center" if cfgx.d2_mode == "center" else "outer"
    fetch = getattr(cfgx, "pair_fetch", "pregather")

    def run_exec():
        return pp.exec_pairs_pallas(
            kernel, plan6.tgt_geo, plan6.src_fm, gt, gs,
            cfgx.core_func, cfgx.accum_dtype, interpret=False,
            d2_mode=d2m, group=g, fetch=fetch,
            precision=getattr(cfgx, "mxu_precision", "highest"),
            tile_g=getattr(cfgx, "pair_tile_g", 4))

    t = timeit(run_exec, reps=3)
    pairs = float(Pn) * g * b * b
    print(f"grouped executor dense {Pn} groups x{g} (fetch={fetch}): "
          f"{t:.3f} s -> {pairs/t/1e9:.1f} G pairs/s "
          f"({pairs*19/t/1e12:.2f} TFlop/s at 19 flops/pair)",
          flush=True)


if __name__ == "__main__":
    main()
