"""Pair-list executor: the single compute primitive behind every fast
method.

Executes a padded (tgt_row, src_row) interaction list over the unified
Blocks arrays: each pair is one dense (block x block) all-pairs tile
evaluated with the workload's matmul-decomposed kernel and scatter-added
into the target row's accumulator. This one primitive subsumes the
reference's ppinter block-block calls in treecode3 (barneshut.hpp:244-287)
and all four DTT interaction types (ongrav3d.cpp:326-365).

Two backends:
* jnp — gather + vmap + scatter-add, chunked with lax.scan (memory-bound
  but simple; XLA fuses the tile pipeline).
* pallas — ops/pallas_pairs.py, scalar-prefetched block indices with
  output revisiting (sorted pair runs stay resident in VMEM).

Padding contract: pair (t, 0) contributes zero to row t (src row 0 has
zero strengths); pair (0, 0) only touches row 0, which is never read.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from onbody_tpu.ops.kernels import Kernel
from onbody_tpu.tree.equivalents import Blocks
from onbody_tpu.traverse.lists import PairList


@partial(jax.jit, static_argnames=("kernel", "core", "accum_dtype",
                                   "d2_mode", "chunk"))
def exec_pairs_jnp(kernel: Kernel, tgt_blocks: Blocks, src_blocks: Blocks,
                   pairs: PairList, core: str = "rm",
                   accum_dtype=jnp.float32, d2_mode: str = "exact",
                   chunk: int = 512) -> jax.Array:
    """Returns out (NN_t, B_t, OD) accumulated over all pairs."""
    nn_t, b_t = tgt_blocks.pos.shape[:2]
    out = jnp.zeros((nn_t, b_t, kernel.od), accum_dtype)

    p = pairs.tgt.shape[0]
    pad = -p % chunk
    tgt = jnp.pad(pairs.tgt, (0, pad))
    src = jnp.pad(pairs.src, (0, pad))

    use_tr = kernel.uses_tr

    def tile_fn(tx, trad, sx, srad, sst):
        return kernel.tile(tx, trad, sx, srad, sst, core, accum_dtype,
                           d2_mode)

    def step(acc, chunk_pairs):
        t, s = chunk_pairs
        tx = tgt_blocks.pos[t]
        trad = tgt_blocks.rad[t] if use_tr else jnp.zeros(
            (chunk, b_t), tgt_blocks.pos.dtype)
        sx = src_blocks.pos[s]
        srad = src_blocks.rad[s]
        sst = src_blocks.s[s]
        tiles = jax.vmap(tile_fn)(tx, trad, sx, srad, sst)
        return acc.at[t].add(tiles), None

    out, _ = jax.lax.scan(step, out,
                          (tgt.reshape(-1, chunk), src.reshape(-1, chunk)))
    return out


@partial(jax.jit, static_argnames=("kernel", "core", "accum_dtype",
                                   "d2_mode", "group", "chunk",
                                   "precision"),
         donate_argnums=(4,))
def _exec_groups_xla_chunked(kernel: Kernel, tgt_geo, src_fm, pairs, out,
                             core: str, accum_dtype, d2_mode: str,
                             group: int, chunk: int,
                             precision: str = "highest"):
    """Grouped executor as plain XLA: per chunk, row-gather the group's
    source blocks and target blocks, evaluate all tiles batched, and
    segment-add into the accumulator.

    No Pallas: kernel attribution showed the Pallas pipeline costs
    ~3.9us/step even with all arithmetic stubbed out (dynamic index
    maps defeat prefetch), while XLA row-gathers run at ~120 GB/s —
    so gather + vmapped compute + scatter-add is the faster schedule.
    tgt_geo here is feature-major (NN, 8, B): [x.. | rad | 0..].
    """
    gt, gs = pairs
    nn_t = out.shape[0]
    b = tgt_geo.shape[2]
    # src_fm (NN, C, B) or flat (NN, C*B) — the gather below reshapes
    # to blocks either way (identical element order)
    c = (src_fm.shape[1] // b if src_fm.ndim == 2 else src_fm.shape[1])
    pd = kernel.pd
    from onbody_tpu.ops.kernels import TILE_FM

    def tile_group(tg, sg):
        # tg (8, B); sg (G*C, B)
        t = tg[:pd + 1].T
        acc = None
        for j in range(group):
            tj = TILE_FM[kernel.name](t[:, :pd], t[:, pd],
                                      sg[j * c:(j + 1) * c], core,
                                      accum_dtype, d2_mode,
                                      precision=precision)
            acc = tj if acc is None else acc + tj
        return acc                                    # (B, OD)

    def step(acc, pr):
        t_idx, s_idx = pr
        tg = tgt_geo[t_idx]                           # (chunk, 8, B)
        sg = src_fm[s_idx.reshape(-1)].reshape(
            chunk, group * c, b)                      # (chunk, G*C, B)
        tiles = jax.vmap(tile_group)(tg, sg)          # (chunk, B, OD)
        return acc.at[t_idx].add(tiles), None

    p = gt.shape[0]
    pad = -p % chunk
    gt = jnp.pad(gt, (0, pad))
    gs = jnp.pad(gs, ((0, pad), (0, 0)))
    out, _ = jax.lax.scan(step, out,
                          (gt.reshape(-1, chunk),
                           gs.reshape(-1, chunk, group)))
    return out


def exec_groups_xla(kernel: Kernel, cfg, plan, gt, gs, group: int):
    """Pure-XLA grouped execution; returns out (NN_t, B, OD)."""
    nn_t, _, b = plan.tgt_geo.shape
    out = jnp.zeros((nn_t, b, kernel.od), cfg.accum_dtype)
    d2m = "center" if cfg.d2_mode == "center" else "outer"
    return _exec_groups_xla_chunked(
        kernel, plan.tgt_geo, plan.src_fm, (gt, gs), out,
        cfg.core_func, cfg.accum_dtype, d2m, group,
        getattr(cfg, "xla_exec_chunk", 1024),
        getattr(cfg, "mxu_precision", "highest"))


def exec_groups(kernel: Kernel, cfg, plan, pg, interpret: bool = False):
    """Run pre-grouped interactions (flat-list builder output).

    Pallas on TPU (with eager tail trimming), jnp elsewhere (groups
    flattened back to a pair list).
    """
    from onbody_tpu.traverse import lists
    backend = cfg.pair_backend
    if backend == "auto":
        backend = ("pallas" if jax.devices()[0].platform == "tpu"
                   else "jnp")
    if jnp.dtype(cfg.accum_dtype) == jnp.float64:
        backend = "jnp"   # Mosaic has no fp64; the accuracy tier is jnp
    g = pg.src.shape[1]
    if backend == "xla":
        out = exec_groups_xla(kernel, cfg, plan, pg.tgt, pg.src, g)
        return out, pg
    if backend == "pallas":
        from onbody_tpu.ops import pallas_pairs as pp
        interpret = interpret or jax.devices()[0].platform == "cpu"
        tgt, src = pg.tgt, pg.src
        fetch = getattr(cfg, "pair_fetch", "pregather")
        if fetch == "pregather":
            # groups are front-packed by the builder: trim the padding
            # tail to the next chunk boundary. The scalar fetch is a
            # full pipeline SYNC (it drains every queued dispatch before
            # the exec kernels can even be enqueued), so it only pays
            # where pad steps have a real cost — the pregather path's
            # row-gathers fetch padded groups too. The dma-family
            # kernels skip pad steps in-kernel for ~free and keep the
            # solve fully asynchronous.
            try:
                n_groups = int(jax.device_get(jnp.sum(tgt != 0)))
                chunk = pp._chunk_groups(g)
                cap = tgt.shape[0]
                trim = min(cap, -(-max(n_groups, 1) // chunk) * chunk)
                tgt, src = tgt[:trim], src[:trim]
            except jax.errors.ConcretizationTypeError:
                pass
        d2m = "center" if cfg.d2_mode == "center" else "outer"
        out = pp.exec_pairs_pallas(kernel, plan.tgt_geo, plan.src_fm,
                                   tgt, src, cfg.core_func,
                                   cfg.accum_dtype, interpret=interpret,
                                   d2_mode=d2m, group=g,
                                   fetch=getattr(cfg, "pair_fetch",
                                                 "pregather"),
                                   precision=getattr(cfg, "mxu_precision",
                                                     "highest"),
                                   tile_g=getattr(cfg, "pair_tile_g", 4))
        return out, pg
    pl = PairList(tgt=jnp.repeat(pg.tgt, g), src=pg.src.reshape(-1),
                  n_valid=pg.n_valid, overflow=pg.overflow)
    out = exec_pairs_jnp(kernel, plan.tgt_blocks, plan.src_blocks, pl,
                         cfg.core_func, cfg.accum_dtype, cfg.d2_mode)
    return out, pg


def exec_pairs(kernel: Kernel, cfg, plan, raw: PairList, slot_width: int,
               cap_groups_per_row: int, interpret: bool = False,
               raw2: Optional[PairList] = None):
    """Backend dispatcher: compacts the raw builder list and runs it.

    cfg.pair_backend in {'jnp', 'pallas'}. Capacity is STATIC
    (cap_groups_per_row 8-wide groups per emitted target row) so the
    entire solve path runs without device->host syncs; overflow is
    detected and carried in the returned info. Returns (out_blocks, info).

    raw2: optional sibling-paired leaf list (build_dtt_pairs_level2
    leaf2) chained through the same feature-major accumulator via the
    t2 executor. Callers must only pass it on the pallas backend with a
    dma-family or pregather fetch (solve_dtt gates this).
    """
    from onbody_tpu.traverse import lists

    n_rows = raw.tgt.shape[0] // slot_width

    backend = cfg.pair_backend
    if backend == "auto":
        backend = ("pallas" if jax.devices()[0].platform == "tpu"
                   else "jnp")
    if jnp.dtype(cfg.accum_dtype) == jnp.float64:
        backend = "jnp"   # Mosaic has no fp64; the accuracy tier is jnp
    if raw2 is not None and not (
            backend == "pallas"
            and getattr(cfg, "pair_fetch", "pregather") != "static"):
        raise ValueError("sibling-paired leaf lists need the pallas "
                         "backend with a dma-family or pregather "
                         "pair_fetch")
    if backend in ("pallas", "xla"):
        from onbody_tpu.ops import pallas_pairs as pp
        # CPU has no Mosaic backend: fall back to the interpreter so the
        # pallas path stays testable on the virtual mesh
        interpret = interpret or jax.devices()[0].platform == "cpu"
        g = getattr(cfg, "pair_group", pp.GROUP)
        cap = max(1024, n_rows * cap_groups_per_row * pp.GROUP // g)
        pg = lists.group_pairs(raw, cap, g, slot_width,
                               getattr(cfg, "group_compact", "scatter"))
        # eager path (not under jit): trim the all-padding tail so the
        # kernel only visits real groups — the static cap is a safety
        # bound, not the work size. Costs one scalar fetch.
        try:
            n_groups = int(jax.device_get(jnp.sum(pg.tgt != 0)))
            chunk = pp._chunk_groups(g)
            trim = min(cap, -(-max(n_groups, 1) // chunk) * chunk)
            pg = pg._replace(tgt=pg.tgt[:trim], src=pg.src[:trim])
        except jax.errors.ConcretizationTypeError:
            pass  # inside jit (fused path): keep static shapes
        if backend == "xla":
            out = exec_groups_xla(kernel, cfg, plan, pg.tgt, pg.src, g)
            return out, pg
        d2m = "center" if cfg.d2_mode == "center" else "outer"
        if raw2 is None:
            out = pp.exec_pairs_pallas(kernel, plan.tgt_geo, plan.src_fm,
                                       pg.tgt, pg.src, cfg.core_func,
                                       cfg.accum_dtype,
                                       interpret=interpret,
                                       d2_mode=d2m, group=g,
                                       fetch=getattr(cfg, "pair_fetch",
                                                     "pregather"),
                                       precision=getattr(
                                           cfg, "mxu_precision",
                                           "highest"))
            return out, pg
        # sibling-paired leaf pass: group the parent-keyed leaf list,
        # then chain both executors over one feature-major accumulator
        n_rows2 = raw2.tgt.shape[0] // slot_width
        cap2 = max(1024, n_rows2 * cap_groups_per_row * pp.GROUP // g)
        pg2 = lists.group_pairs(raw2, cap2, g, slot_width,
                                getattr(cfg, "group_compact", "scatter"))
        try:
            n_g2 = int(jax.device_get(jnp.sum(pg2.tgt != 0)))
            chunk = pp._chunk_groups(g)
            trim = min(cap2, -(-max(n_g2, 1) // chunk) * chunk)
            pg2 = pg2._replace(tgt=pg2.tgt[:trim], src=pg2.src[:trim])
        except jax.errors.ConcretizationTypeError:
            pass  # inside jit (fused path): keep static shapes
        out_fm = pp.exec_pairs_pallas(kernel, plan.tgt_geo, plan.src_fm,
                                      pg.tgt, pg.src, cfg.core_func,
                                      cfg.accum_dtype, interpret=interpret,
                                      d2_mode=d2m, group=g,
                                      fetch=getattr(cfg, "pair_fetch",
                                                    "pregather"),
                                      precision=getattr(
                                          cfg, "mxu_precision", "highest"),
                                      tile_g=getattr(cfg, "pair_tile_g", 4),
                                      final=False)
        out_fm = pp.exec_pairs_pallas_t2(
            kernel, plan.tgt_geo, plan.src_fm, pg2.tgt, pg2.src, out_fm,
            cfg.core_func, cfg.accum_dtype, interpret=interpret,
            d2_mode=d2m, group=g,
            precision=getattr(cfg, "mxu_precision", "highest"),
            tile_g=getattr(cfg, "pair_tile_g", 4),
            fetch=getattr(cfg, "pair_fetch", "pregather"))
        out = jnp.transpose(out_fm[:, :kernel.od, :], (0, 2, 1))
        # n_valid comes from the BUILDER's combined count (interior +
        # per-alive-sibling leaf entries, lists.build_dtt_pairs_level2):
        # doubling the grouped leaf count here would re-count the dead
        # right sibling of a ragged boundary parent (ADVICE r2) — the
        # executor evaluates it, but its rows are discarded downstream
        # and it is not a valid pair.
        info = pg._replace(n_valid=raw.n_valid,
                           overflow=pg.overflow + pg2.overflow)
        return out, info
    cap = max(1024, n_rows * cap_groups_per_row * 8)
    cap = min(cap, raw.tgt.shape[0])
    pl = lists.finalize_pairs(raw, cap)
    out = exec_pairs_jnp(kernel, plan.tgt_blocks, plan.src_blocks, pl,
                         cfg.core_func, cfg.accum_dtype, cfg.d2_mode)
    return out, pl
