"""r5: treecode1/2/3 rows at 1e6 and 1e7 (VERDICT r4 #5).

Reference anchors (README.md:82-90, 12-core, incl setup): pointwise
23.65 s / boxwise 21.13 s at 1e7; treecode1 has no published row (it is
the -t1 method, default theta 2.0, ongrav3d.cpp:477) — its 1e-3-class
monopole accuracy is the "1M in ~1 s on a CPU" regime (README.md:105).

The pointwise conservative MAC's list widths are the open risk at 1e7
(r4 measured 1e6 needing 4x DTT widths); each method/theta here walks a
width ladder until the lists stop overflowing, so the output records
BOTH the working width and the time at that width.

Usage: python scripts/exp_r5_tc.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import dataclasses

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
from onbody_tpu.config import tuned_config
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, treecode


def sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]))


def main(n):
    kernel = get_kernel("grav3d")
    base = tuned_config(n).replace(dtt_leaf_pair2=False)
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    sync(srcs.x)
    tskip = max(1, n * n // int(4e11))
    sub = dataclasses.replace(targs, x=jnp.copy(targs.x[::tskip]),
                              r=jnp.copy(targs.r[::tskip]))
    ref = np.asarray(direct.direct(kernel, srcs, sub))

    plan_cfg = base.replace(list_width=max(base.list_width, 512),
                            cap_groups_treecode=64)
    plan = treecode.prepare(kernel, plan_cfg, srcs, targs,
                            want_inv=False)
    sync(plan.src_fm)
    pts = []
    for _ in range(3):
        t0 = time.perf_counter()
        plan = treecode.prepare(kernel, plan_cfg, srcs, targs,
                                want_inv=False)
        sync(plan.src_fm)
        pts.append(time.perf_counter() - t0)
    prep = min(pts)
    print(f"prepare warm: {prep:.4f} s", flush=True)

    # (method, solver, thetas, width ladder [(list_width, cap, W)...])
    methods = (sys.argv[2].split(",") if len(sys.argv) > 2 else None)
    cases = [
        ("treecode3", treecode.solve_treecode3, (0.9, 1.0),
         [(512, 64, None), (1024, 96, None), (2048, 160, None)]),
        # 0.9/0.95 are the matched-accuracy (~1e-4-class) points: the
        # conservative pointwise MAC at 1.05 measured 2.9e-5 at 1e7 —
        # 3.4x tighter than the reference row it is compared against
        ("treecode2", treecode.solve_treecode2, (0.9, 0.95, 1.05),
         [(2048, 192, 256), (4096, 320, 256)]),
        # tc1's conservative surface MAC descends much deeper than the
        # proxy treecodes: its per-leaf FRONTIER (not the accepted
        # list) is what overflows — the r5 first sweep measured an
        # identical overflow count at list widths 1024 and 2048 with
        # W=256 fixed
        ("treecode1", treecode.solve_treecode1, (2.0, 3.0),
         [(2048, 160, 512), (2048, 192, 1024), (4096, 288, 1024)]),
    ]
    for name, fn, thetas, ladder in cases:
        if methods is not None and name not in methods:
            continue
        for th in thetas:
            done = False
            for lw, cap, W in ladder:
                cfg = base.replace(list_width=lw,
                                   cap_groups_treecode=cap)
                if W is not None:
                    cfg = cfg.replace(frontier_width=W)
                try:
                    out, info = fn(kernel, cfg, plan, theta=th)
                    sync(out)
                    ov = int(np.asarray(info.overflow))
                    if ov:
                        print(f"{name} t{th:<5} L{lw}: overflow {ov}, "
                              f"widening", flush=True)
                        del out, info
                        continue
                    ts = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        out, info = fn(kernel, cfg, plan, theta=th)
                        sync(out)
                        ts.append(time.perf_counter() - t0)
                    got = np.asarray(out[::tskip])[:ref.shape[0]]
                    rel = float(np.linalg.norm(got - ref)
                                / np.linalg.norm(ref))
                    nv = int(np.asarray(info.n_valid))
                    print(f"{name} t{th:<5} L{lw}: {min(ts):.3f} s "
                          f"(+prep {prep:.3f})  rms {rel:.3e}  "
                          f"n_valid {nv}", flush=True)
                    del out, info
                    done = True
                    break
                except Exception as e:  # noqa: BLE001
                    print(f"{name} t{th} L{lw}: FAILED "
                          f"{repr(e)[:140]}", flush=True)
            if not done:
                print(f"{name} t{th}: no width in ladder cleared "
                      f"overflow", flush=True)


if __name__ == "__main__":
    main(int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000)
