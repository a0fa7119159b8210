"""N=1e8 single-chip DTT evaluation via the subtree-chunked solver.

The monolithic plan needs ~30 GB at N=1e8; solve_dtt_chunked keeps only
the lean feature-major source blocks resident and materializes one
target subtree at a time (traverse/chunked.py). Reference anchor: the
12-core CPU baseline runs N=1e8 DTT in 114 s (README.md:89).

Usage: python scripts/exp_1e8.py [N] [n_chunks] [theta] [fetch] [group] [p2]
  fetch: pregather (default) | dma | dma_i   group: blocks/step (16)
  p2: literal 'p2' enables sibling-paired leaf execution (dtt_leaf_pair2)
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
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, chunked


def _sync(x):
    # index, never ravel: ravel of a non-contiguous output compiles a
    # full layout copy before the 1-element fetch
    a = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(a[(0,) * a.ndim]))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    theta = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    fetch = sys.argv[4] if len(sys.argv) > 4 else "pregather"
    group = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    pair2 = len(sys.argv) > 6 and sys.argv[6] == "p2"
    kernel = get_kernel("grav3d")
    try:
        st = jax.devices()[0].memory_stats()
        print(f"startup hbm: {st['bytes_in_use'] / 2**30:.2f} GiB in use,"
              f" limit {st.get('bytes_limit', 0) / 2**30:.2f}", flush=True)
    except Exception as e:  # noqa: BLE001 — stats are best-effort
        print(f"startup hbm: memory_stats unavailable ({e})", flush=True)
    # cap_groups_dtt: 8 overflowed (440k dropped groups — per-target
    # ceil(v/g) quantization inflates group count far above pairs/g);
    # 16 is the verified zero-overflow setting
    # ONBODY_E8_FUSE=1 drops the chunked tree build to one sort step
    # per dispatch (2 live column sets instead of 3, ~-2.1 GB peak) —
    # the r3 environment OOMed the fuse=2 layout that fit in r2
    cfg = SolverConfig(block_size=256, order=5, theta_dtt=theta,
                       frontier_width=128, cap_groups_dtt=16,
                       tree_mode="span", pair_backend="pallas",
                       dtt_traversal="level", pair_fetch=fetch,
                       pair_group=group, pair_tile_g=4, lean_plan=True,
                       tree_defer_rs=True, mxu_precision="3xt",
                       list_compact="sort",
                       tree_fuse=int(os.environ.get("ONBODY_E8_FUSE",
                                                    "2")),
                       dtt_leaf_pair2=pair2)
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))

    def gen():
        # regenerated per eval (PRNG is ~free) so nothing outside the
        # solver holds HBM references: at 1e8 the originals are ~4.4 GB
        # the 16 GB budget cannot spare (chunked.py nulls them after the
        # tree builds — only works if the caller passes ownership)
        return (P.random_in_cube(ks, n, 3, 1, True),
                P.random_in_cube(kt, n, 3, 0, False))

    # spot-check error on a small stratified target subsample
    nt_skip = max(1, n // 10000)
    srcs, targs = gen()
    sub = P.Parts(x=jnp.copy(targs.x[::nt_skip]),
                  r=jnp.copy(targs.r[::nt_skip]), s=None,
                  n_real=int(targs.x[::nt_skip].shape[0]))
    t0 = time.perf_counter()
    ref = np.asarray(direct.direct(kernel, srcs, sub))
    print(f"direct subsample ref: {time.perf_counter() - t0:.1f}s",
          flush=True)
    srcs = targs = None

    out = tg = info = None
    for it in range(3):
        # drop the previous iteration's device arrays BEFORE the next
        # solve: out_leaf (1.6 GB) + tg + inv coexisting with a second
        # solve's buffers OOMed the 16 GB chip on iteration 2
        out = tg = info = None
        t0 = time.perf_counter()
        (out, tg), info = chunked.solve_dtt_chunked(
            kernel, cfg,
            make_srcs=lambda: P.random_in_cube(ks, n, 3, 1, True),
            make_targs=lambda: P.random_in_cube(kt, n, 3, 0, False),
            n_chunks=n_chunks, unscramble=False,
            # it0 profiles too: the per-phase syncs localize failures
            # (the dma_i RESOURCE_EXHAUSTED surfaced at lists_top with
            # everything dispatched async) and print HBM watermarks;
            # it1 times clean
            profile=(it != 1))
        _sync(out)
        dt = time.perf_counter() - t0
        # tree-order results (reference-driver convention, see bench.py):
        # map the subsample through the permutation, slice on device
        inv = jnp.zeros((n,), jnp.int32).at[tg].set(
            jnp.arange(tg.shape[0], dtype=jnp.int32), mode="drop")
        got = np.asarray(out[inv[::nt_skip]])[:ref.shape[0]]
        del inv
        rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        print(f"chunked N={n:.0e} c={n_chunks} t={theta}: t={dt:.2f}s "
              f"rms={rms:.2e} nvalid={int(info.n_valid)} "
              f"overflow={int(info.overflow)}", flush=True)


if __name__ == "__main__":
    main()
