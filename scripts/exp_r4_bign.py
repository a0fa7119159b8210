"""Stratified big-N runs on the real chip.

Usage: python scripts/exp_r4_bign.py <N> <split> [slab_cache] [theta]
           [n_val] [exec_groups] [coarse_depth]
1e8 (split 4) validates the machinery + measures chunk/cache behavior;
1e9 (split 6) is the reference's last published row (README.md:90:
85 s build + 1160 s DTT on a 128 GB host).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import json

import jax

# the axon sitecustomize imports jax before this file runs, freezing
# config from the env at interpreter start; config.update is the only
# reliable way to enable the persistent compile cache here
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                "/tmp/jax_cache"))

from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import bigN


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else int(1e8)
    split = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cache = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    theta = float(sys.argv[4]) if len(sys.argv) > 4 else 1.15
    kernel = get_kernel("grav3d")
    # the 1e8-tier tuned settings, pregather fetch (flat fm slabs).
    # Frontier 256 at split 6: the W=128 1e9 run overflowed 34208 and the
    # W=192 stage-scan run still overflowed 322 across 4 chunks at the
    # mid-level fanout below the 64 chunk roots
    # (levels that exist neither at 1e8/split 4 nor in the small-N
    # split-6 CPU repro, both overflow-0 at W=128).
    cfg = SolverConfig(block_size=256, order=5, theta_dtt=theta,
                       frontier_width=256 if split >= 6 else 128,
                       list_width=320,
                       cap_groups_dtt=16, pair_backend="pallas",
                       pair_group=16, pair_fetch="pregather",
                       mxu_precision="3xt", tree_mode="span",
                       tree_defer_rs=True, tree_fuse=2,
                       list_compact="sort")
    n_val = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    # r4 post-mortem (docs/PERF.md "r4 N=1e9 attempts"): at split 6 use
    # slab_cache<=8 (warm-seeded, pre-concatenated) and the default
    # exec_groups=4096 bound (power of two — exact slices); both OOM
    # contributors are sized there.
    eg = int(sys.argv[6]) if len(sys.argv) > 6 else 4096
    # deeper resident coarse tier shrinks each chunk's DEEP owner set
    # (corner/edge neighbors referenced only at mid depth ride the
    # resident slab instead of pulling a full rebuild): +~175 MB at
    # split 6 / depth 8 for a large cut in slab-rebuild volume
    cdepth = int(sys.argv[7]) if len(sys.argv) > 7 else 8
    stats, info = bigN.solve_dtt_stratified(
        kernel, cfg, n, jax.random.PRNGKey(12345), split=split,
        slab_cache=cache, n_val=n_val, profile=True, exec_groups=eg,
        coarse_depth=cdepth)
    print(json.dumps({**stats, **info}), flush=True)


if __name__ == "__main__":
    main()
