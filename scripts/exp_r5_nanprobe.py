"""r5: localize the 1e9 NaN — scan every stratum's source fm slab and
target geo slab for non-finite values.

The diagnosed symptom (bigN per-chunk counters): chunks 57-59 return a
FULLY-NaN leaf array while neighbors are clean — one NaN in any
interior equivalent-target row spreads to every leaf through the
downward prolongation, and a poisoned DEEP fm row in one source
stratum's slab poisons exactly the chunks that deep-reference that
stratum. This scans, per stratum: the rebuilt source slab (all rows +
the deep row range separately) and the target stratum's sorted
positions/radii; prints any stratum with non-finite counts.

Usage: python scripts/exp_r5_nanprobe.py <N> <split> [strata-csv|all]
"""

import os
import sys

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

from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.tree import build as tree_build
from onbody_tpu.tree import equivalents as eq
from onbody_tpu.traverse import bigN


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else int(1e9)
    split = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    which = sys.argv[3] if len(sys.argv) > 3 else "all"
    kernel = get_kernel("grav3d")
    cfg = SolverConfig(block_size=256, order=5, theta_dtt=1.15,
                       frontier_width=192, list_width=320,
                       cap_groups_dtt=16, pair_backend="pallas",
                       pair_group=16, pair_fetch="pregather",
                       mxu_precision="3xt", tree_mode="span",
                       tree_defer_rs=True, tree_fuse=2,
                       list_compact="sort")
    ndev = 1 << split
    strata = (list(range(ndev)) if which == "all"
              else [int(v) for v in which.split(",")])
    bs = cfg.block_size
    levels_glob, n_pad = tree_build.plan(n, bs)
    levels_loc = levels_glob - split
    n_sub_pad = n_pad // ndev
    k_coarse = 8
    n_crows = (2 << k_coarse) - 1
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    gen_s = bigN.make_stratified_gen(ks, n, split, kernel.sd, True)
    gen_t = bigN.make_stratified_gen(kt, n, split, 0, False)

    @jax.jit
    def counts(a):
        bad = ~jnp.isfinite(a)
        return (jnp.sum(bad, dtype=jnp.int32),
                jnp.max(jnp.abs(jnp.where(jnp.isfinite(a), a, 0.0))))

    for t in strata:
        row = [f"stratum {t:3d}:"]
        for name, gen, is_src in (("src", gen_s, True),
                                  ("tgt", gen_t, False)):
            p = gen(t)
            tree, sp, gl = tree_build.build_tree(
                [p], bs, mode=cfg.tree_mode, span=cfg.tree_span,
                span_top=cfg.tree_span_top, defer_rs=True,
                fuse=2, need_r=True, quant="off",
                force_plan=(levels_loc, n_sub_pad))
            for f in ("nc", "ns", "nr", "x", "pr"):
                c, mx = counts(getattr(tree, f))
                c = int(np.asarray(c))
                if c:
                    row.append(f"{name}.tree.{f} BAD {c} "
                               f"(maxfinite {float(np.asarray(mx)):.3e})")
            c, _ = counts(sp.x)
            if int(np.asarray(c)):
                row.append(f"{name}.sorted.x BAD {int(np.asarray(c))}")
            if is_src:
                fm = eq.barycentric_fm(tree, sp, cfg.order, kernel.name,
                                       pad8=False, flat=True)
                c_all, mx = counts(fm)
                c_coarse, _ = counts(fm[1:1 + n_crows])
                c_all = int(np.asarray(c_all))
                c_coarse = int(np.asarray(c_coarse))
                if c_all:
                    row.append(
                        f"src.fm BAD {c_all} (coarse-range {c_coarse}, "
                        f"maxfinite {float(np.asarray(mx)):.3e})")
                del fm
            del tree, sp, gl, p
        print(" ".join(row) if len(row) > 1 else row[0] + " clean",
              flush=True)


if __name__ == "__main__":
    main()
