"""Attribute pair-executor cost using the real pipeline.

Builds a real N=1e6 problem + group list once, then times
exec_pairs_pallas with the grav3d feature-major tile function patched:
  full    — production kernel
  norsqrt — rsqrt replaced by a multiply (measures transcendental cost)
  nod2    — distance matrix replaced by a broadcast copy (VPU cost)
  min     — near-empty compute (DMA + pipeline + reduce only)

Usage: python scripts/exp_kernel2.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from onbody_tpu import parts as P
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops import kernels as K
from onbody_tpu.ops import pallas_pairs as pp
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import dtt, lists, treecode


def _sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def _full(tpos, trad, srcT, core, accum_dtype, d2_mode):
    return K._grav3d_tile_fm(tpos, trad, srcT, core, accum_dtype, d2_mode)


def _norsqrt(tpos, trad, srcT, core, accum_dtype, d2_mode):
    d2 = K._d2_fm(tpos, srcT, 3, d2_mode)
    sr = srcT[3:4, :]
    m = srcT[4:5, :]
    w = m * (d2 + sr * sr)          # rsqrt chain replaced by one mul
    o = K._dotg_fm(w, srcT[0:3, :], accum_dtype)
    o1 = K._rowsum(w, accum_dtype)
    return o - o1 * tpos.astype(accum_dtype)


def _nod2(tpos, trad, srcT, core, accum_dtype, d2_mode):
    w = srcT[4:5, :] + tpos[:, 0:1]  # (B, GB) broadcast, no distance math
    o = K._dotg_fm(w, srcT[0:3, :], accum_dtype)
    o1 = K._rowsum(w, accum_dtype)
    return o - o1 * tpos.astype(accum_dtype)


def _min(tpos, trad, srcT, core, accum_dtype, d2_mode):
    o = K._dotg_fm(srcT[4:5, :] + tpos[:, 0:1], srcT[0:3, :], accum_dtype)
    return o[:, :3]


VARIANTS = {"full": _full, "norsqrt": _norsqrt, "nod2": _nod2,
            "min": _min}


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    kernel = get_kernel("grav3d")
    cfg = SolverConfig(block_size=128, order=4, theta_dtt=1.4,
                       frontier_width=256, list_width=512,
                       pair_backend="pallas", pair_group=16)
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    pl_raw = lists.build_dtt_pairs_level(plan.stree, plan.ttree,
                                         cfg.theta_dtt,
                                         cfg.frontier_width)
    g = cfg.pair_group
    n_rows = pl_raw.tgt.shape[0] // cfg.frontier_width
    cap = max(1024, n_rows * cfg.cap_groups_dtt * pp.GROUP // g)
    pg = lists.group_pairs(pl_raw, cap, g, cfg.frontier_width)
    n_groups = int(jax.device_get(jnp.sum(pg.tgt != 0)))
    chunk = pp._chunk_groups(g)
    trim = min(cap, -(-n_groups // chunk) * chunk)
    gt, gs = pg.tgt[:trim], pg.src[:trim]
    _sync((gt, gs))
    print(f"groups: {n_groups} (trim {trim})", flush=True)

    # isolate the XLA row-gather that feeds the pregather path
    @jax.jit
    def gather_only(src_fm, gs):
        return pp._pregather(src_fm, gs)

    r = gather_only(plan.src_fm, gs[:4096])
    _sync(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(0, trim - 4096, 4096):
            r = gather_only(plan.src_fm, gs[i:i + 4096])
        _sync(r)
        ts.append(time.perf_counter() - t0)
    nbytes = (trim - 4096) * g * plan.src_fm.shape[1] * 128 * 4
    print(f"row-gather alone: {min(ts):.4f}s "
          f"({nbytes / min(ts) / 1e9:.0f} GB/s eff)", flush=True)

    orig = K.TILE_FM["grav3d"]
    for name, fn in VARIANTS.items():
        K.TILE_FM["grav3d"] = fn
        try:
            out = pp.exec_pairs_pallas(kernel, plan.tgt_geo, plan.src_fm,
                                       gt, gs, "rm", jnp.float32, group=g)
            _sync(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = pp.exec_pairs_pallas(kernel, plan.tgt_geo,
                                           plan.src_fm, gt, gs, "rm",
                                           jnp.float32, group=g)
                _sync(out)
                ts.append(time.perf_counter() - t0)
            t = min(ts)
            print(f"{name:>8}: {t:.4f}s  ({t / max(trim,1) * 1e6:.2f}"
                  f"us/step)", flush=True)
        except Exception as e:
            print(f"{name:>8}: FAILED {type(e).__name__} {str(e)[:120]}",
                  flush=True)
        finally:
            K.TILE_FM["grav3d"] = orig


if __name__ == "__main__":
    main()
