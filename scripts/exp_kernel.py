"""Attribute per-step cost inside the Pallas pair executor.

Runs the executor on synthetic dense group lists with the kernel body
progressively stubbed (full / no-rsqrt / d2-only / dma-only), so the
per-step budget (DMA, d2 broadcast, rsqrt, MXU reduce) is measured, not
guessed.

Usage: python scripts/exp_kernel.py [bs] [group]
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onbody_tpu.ops import pallas_pairs as pp
from onbody_tpu.ops.kernels import get_kernel


def _sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def make_variant(mode):
    def body(pt_ref, ps_ref, tgt_ref, src_hbm, prev_ref, out_ref,
             scratch, sems, *, group, pd):
        p = pl.program_id(0)
        n = pl.num_programs(0)

        def dma(bank, step, j):
            return pltpu.make_async_copy(
                src_hbm.at[ps_ref[step * group + j]],
                scratch.at[bank, j], sems.at[bank, j])

        @pl.when(p == 0)
        def _():
            for j in range(group):
                dma(0, 0, j).start()

        @pl.when(p + 1 < n)
        def _():
            for j in range(group):
                dma((p + 1) % 2, p + 1, j).start()

        bank = p % 2
        for j in range(group):
            dma(bank, p, j).wait()

        @pl.when(pt_ref[p] != 0)
        def _():
            tg = tgt_ref[0]
            t = tg[:pd + 1].T
            s = jnp.concatenate([scratch[bank, j] for j in range(group)],
                                axis=1)
            tpos = t[:, :pd]
            if mode == "dma":
                out_ref[0] = prev_ref[0] + s[:8, :out_ref.shape[2]]
                return
            d2 = None
            for d in range(pd):
                diff = tpos[:, d:d + 1] - s[d:d + 1, :]
                d2 = diff * diff if d2 is None else d2 + diff * diff
            if mode == "d2":
                acc = jnp.sum(d2.reshape(t.shape[0], group, -1), axis=1)
                out_ref[0] = prev_ref[0] + jnp.pad(
                    acc.T[:8, :], ((0, 0), (0, 0)))[None][0][
                    :out_ref.shape[1], :out_ref.shape[2]][None][0]
                return
            sr = s[3:4, :]
            m = s[4:5, :]
            r2 = d2 + sr * sr
            if mode == "norsqrt":
                w = m * r2
            else:
                rinv = lax.rsqrt(r2)
                w = m * rinv * rinv * rinv
            o = lax.dot_general(w, s[0:3, :],
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)
            o1 = jnp.sum(w, axis=1, keepdims=True)
            tile = o - o1 * tpos
            tile_fm = jnp.pad(tile.T, ((0, out_ref.shape[1] - 3), (0, 0)))
            prev_t = pt_ref[jnp.maximum(p - 1, 0)]
            first = jnp.logical_or(p == 0, prev_t != pt_ref[p])
            out_ref[0] = jnp.where(first, prev_ref[0], out_ref[0]) + tile_fm
    return body


def run(mode, tgt_geo, src_fm, gt, gs, group, pd):
    nn_t, _, b = tgt_geo.shape
    c = src_fm.shape[1]
    p = gt.shape[0]
    od8 = 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, 8, b), lambda i, pt, ps: (pt[i], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, od8, b), lambda i, pt, ps: (pt[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, od8, b), lambda i, pt, ps: (pt[i], 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, group, c, b), jnp.float32),
            pltpu.SemaphoreType.DMA((2, group)),
        ])
    body = functools.partial(make_variant(mode), group=group, pd=pd)
    out = jnp.zeros((nn_t, od8, b), jnp.float32)
    f = jax.jit(lambda *a: pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nn_t, od8, b), jnp.float32),
        input_output_aliases={4: 0})(*a),
        donate_argnums=(4,))
    return f(gt, gs.reshape(-1), tgt_geo, src_fm, out)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    group = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    kernel = get_kernel("grav3d")
    nn = 16384
    P = 65536
    key = jax.random.PRNGKey(0)
    tgt_geo = jax.random.uniform(key, (nn, 8, bs), jnp.float32)
    src_fm = jax.random.uniform(key, (nn, 8, bs), jnp.float32)
    # ~4 groups per target row, random sources
    gt = jnp.repeat(jnp.arange(1, P // 4 + 1, dtype=jnp.int32) % (nn - 1) + 1, 4)[:P]
    gs = jax.random.randint(key, (P, group), 1, nn, jnp.int32)

    for mode in ["dma", "norsqrt", "full"]:
        try:
            r = run(mode, tgt_geo, src_fm, gt, gs, group, 3)
            _sync(r)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = run(mode, tgt_geo, src_fm, gt, gs, group, 3)
                _sync(r)
                ts.append(time.perf_counter() - t0)
            t = min(ts)
            print(f"bs={bs} g={group} {mode:>8}: {t:.4f}s "
                  f"({t / P * 1e6:.2f}us/step)", flush=True)
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__} {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
