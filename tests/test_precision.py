"""The storage/accumulation precision contract (SURVEY.md §7 hard part b).

The reference documents three accuracy tiers (README.md:99-110):
fp32 storage + fp32 accumulation floors at ~6e-6 RMS; fp32 storage +
fp64 accumulation (ACCUM=double, mycast semantics MathHelper.hpp:50-59)
reaches ~4e-7; full fp64 goes lower. These tests demonstrate the same
tiers end-to-end: the fp64-accumulation chain must beat the fp32 floor
by an order of magnitude on identical fp32-stored inputs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onbody_tpu import parts as P
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import KERNELS
from onbody_tpu.traverse import direct, dtt, treecode


def rel_rms(out, ref):
    out = np.asarray(out, np.float64)
    ref = np.asarray(ref, np.float64)
    return np.linalg.norm(out - ref) / np.linalg.norm(ref)


def _problem(kernel, n=4096, seed=7):
    ks, kt = jax.random.split(jax.random.PRNGKey(seed))
    srcs = P.random_in_cube(ks, n, kernel.pd, kernel.sd, True)
    targs = P.random_in_cube(kt, n, kernel.pd, 0, False)
    return srcs, targs


def test_direct_accum_tiers():
    """Tiled direct sum: fp64 accumulation over fp32 storage must land
    ~at the oracle; fp32 accumulation shows the documented rounding
    floor. This isolates the mycast promotion from any tree error."""
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel)
    ref = direct.direct_oracle(kernel, srcs, targs)
    e32 = rel_rms(direct.direct(kernel, srcs, targs,
                                accum_dtype=jnp.float32), ref)
    e64 = rel_rms(direct.direct(kernel, srcs, targs,
                                accum_dtype=jnp.float64), ref)
    # fp64 accumulation leaves only the fp32 storage quantization of the
    # inputs themselves; it must beat the fp32-accum chain by >=10x
    assert e64 < 1e-6, e64
    assert e64 < e32 / 10.0, (e32, e64)


def test_dtt_fp64_accum_tier():
    """Full DTT pipeline at a tight MAC: fp32 storage + fp64 accumulation
    reaches <=1e-6 rel-RMS (reference envelope ~4e-7, README.md:107-110),
    while the identical fp32-accum solve sits above it."""
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel, n=4096)
    ref = direct.direct_oracle(kernel, srcs, targs)
    cfg = SolverConfig(block_size=64, order=7, theta_dtt=2.5,
                       frontier_width=512, list_width=1024,
                       cap_groups_dtt=128, accum_dtype=jnp.float64)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    out64, info = dtt.solve_dtt(kernel, cfg, plan)
    assert int(info.overflow) == 0
    e64 = rel_rms(out64, ref)
    assert e64 <= 1e-6, e64

    cfg32 = cfg.replace(accum_dtype=jnp.float32)
    plan32 = treecode.prepare(kernel, cfg32, srcs, targs)
    out32, _ = dtt.solve_dtt(kernel, cfg32, plan32)
    e32 = rel_rms(out32, ref)
    assert e64 < e32, (e32, e64)


@pytest.mark.parametrize("name", ["grav3d", "vort2d", "vort3d"])
def test_mxu_precision_centered_identity(name):
    """mxu_precision != 'highest' switches the tile kernels to the
    tile-centered contraction (an exact algebraic identity; on TPU it
    additionally drops MXU passes). On an offset domain the centered
    form must be at least as close to the fp64 oracle as the uncentered
    one — centering bounds the sum_j w*x_j vs x_i*sum_j w cancellation
    by the local interaction scale."""
    from onbody_tpu.ops.kernels import TILE_FM, featurize
    kernel = KERNELS[name]
    rng = np.random.default_rng(3)
    B = 64
    tpos = rng.uniform(-1, 1, (B, kernel.pd)).astype(np.float32) + 5.0
    trad = rng.uniform(0.01, 0.02, (B,)).astype(np.float32)
    spos = rng.uniform(-1, 1, (B, kernel.pd)).astype(np.float32) + 5.0
    srad = rng.uniform(0.01, 0.02, (B,)).astype(np.float32)
    ss = rng.uniform(-1, 1, (B, kernel.sd)).astype(np.float32)
    pw = kernel.pairwise(jnp.asarray(tpos, jnp.float64),
                         jnp.asarray(trad, jnp.float64),
                         jnp.asarray(spos, jnp.float64),
                         jnp.asarray(srad, jnp.float64),
                         jnp.asarray(ss, jnp.float64), "rm")
    ref = np.asarray(jnp.sum(pw, axis=1))
    srcT = featurize(name, jnp.asarray(spos), jnp.asarray(srad),
                     jnp.asarray(ss))
    errs = {}
    for prec in ("highest", "3x", "w2x", "default"):
        o = TILE_FM[name](jnp.asarray(tpos), jnp.asarray(trad), srcT,
                          "rm", jnp.float32, "outer", precision=prec)
        errs[prec] = rel_rms(o, ref)
    # the manual bf16-split tiers are real reduced-precision even on CPU
    # (operands are explicitly cast; 'default' is NOT — CPU f32 dots
    # don't truncate, so it is exact here). 3x keeps ~2^-16 on both
    # operands; w2x leaves rows at one bf16 pass whose 2^-8 truncation
    # is amplified by the r^-3 weighting of the closest pairs (this
    # same-box tile is its worst case — measured ~1.5e-2), which is why
    # production uses '3x'.
    assert errs["highest"] < 2e-5, errs
    assert errs["3x"] < 1e-4, errs
    assert errs["w2x"] < 5e-2, errs


def test_mxu_precision_end_to_end():
    """Full DTT solve with the reduced MXU-pass tiers stays inside the
    envelope: '3x' (~2^-16) is indistinguishable from 'highest' at the
    theta/order working point; 'w2x' (rows in one bf16 pass over
    tile-centered coordinates) stays within the 1e-4-class envelope."""
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel, n=4096)
    ref = direct.direct_oracle(kernel, srcs, targs)
    errs = {}
    for prec in ("highest", "3x", "w2x"):
        cfg = SolverConfig(block_size=64, order=4,
                           mxu_precision=prec)
        plan = treecode.prepare(kernel, cfg, srcs, targs)
        out, info = dtt.solve_dtt(kernel, cfg, plan)
        assert int(info.overflow) == 0
        errs[prec] = rel_rms(out, ref)
    assert errs["3x"] < errs["highest"] + 3e-5, errs
    assert errs["3x"] < 3e-4, errs
    assert errs["w2x"] < 4e-4, errs


def test_storage_dtype_wired():
    """storage_dtype is honored: prepare() casts inputs, and a full-fp64
    solve (storage+accum) beats the fp32-storage tier."""
    kernel = KERNELS["grav3d"]
    srcs, targs = _problem(kernel, n=2048)
    ref = direct.direct_oracle(kernel, srcs, targs)
    cfg = SolverConfig(block_size=64, order=7, theta_dtt=2.5,
                       frontier_width=512, list_width=1024,
                       cap_groups_dtt=128,
                       storage_dtype=jnp.float64,
                       accum_dtype=jnp.float64)
    plan = treecode.prepare(kernel, cfg, srcs, targs)
    assert plan.src_sorted.x.dtype == jnp.float64
    assert plan.src_blocks.pos.dtype == jnp.float64
    out, info = dtt.solve_dtt(kernel, cfg, plan)
    assert int(info.overflow) == 0
    assert rel_rms(out, ref) < 3e-7, rel_rms(out, ref)
