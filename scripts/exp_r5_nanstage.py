"""r5: stage-2 NaN localization for the 1e9 run — process ONLY the
chunks the completed run reported as fully-NaN (57-59 plus a clean
neighbor), with per-stage non-finite scans (shared arrays, geo slab,
output after the coarse exec and after each owner slab exec).

Runs the REAL solve path (warm pass + top assembly + per-chunk
classify/exec/prolong) but skips all other chunks, so it answers in
minutes which stage first goes non-finite at the real scale.

Usage: python scripts/exp_r5_nanstage.py <N> <split> [chunks-csv]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jax_cache"))

import json

from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import bigN


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else int(1e9)
    split = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    chunks = ([int(v) for v in sys.argv[3].split(",")]
              if len(sys.argv) > 3 else [60, 59, 58, 57])
    kernel = get_kernel("grav3d")
    cfg = SolverConfig(block_size=256, order=5, theta_dtt=1.15,
                       frontier_width=256 if split >= 6 else 128,
                       list_width=320,
                       cap_groups_dtt=16, pair_backend="pallas",
                       pair_group=16, pair_fetch="pregather",
                       mxu_precision="3xt", tree_mode="span",
                       tree_defer_rs=True, tree_fuse=2,
                       list_compact="sort")
    dbg = {"only_chunks": chunks, "stage_scan": True}
    stats, info = bigN.solve_dtt_stratified(
        kernel, cfg, n, jax.random.PRNGKey(12345), split=split,
        slab_cache=8, n_val=256, profile=True, exec_groups=4096,
        coarse_depth=8, debug_out=dbg)
    print(json.dumps({**stats, **info}), flush=True)


if __name__ == "__main__":
    main()
