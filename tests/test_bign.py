"""Stratified-cube big-N solver (traverse/bigN.py): small-N validation
of the full pipeline (stratum builds, top assembly, slab cache,
per-owner segmented exec, on-device subsample validation)."""

import jax
import numpy as np
import pytest

from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import bigN


@pytest.mark.parametrize("exec_groups", [4096, 1024])
def test_bign_stratified_small(exec_groups):
    # exec_groups=1024 drives every _bucket cap (>= 4096) through the
    # multi-slice _exec_sliced path, covering slice-boundary
    # accumulation equivalence; 4096 is the production single-slice
    # shape at this N
    kernel = get_kernel("grav3d")
    n = 8 * 8192
    cfg = SolverConfig(block_size=128, order=4, theta_dtt=1.3,
                       frontier_width=192, list_width=512,
                       cap_groups_dtt=64, pair_fetch="pregather",
                       tree_defer_rs=True)
    stats, info = bigN.solve_dtt_stratified(
        kernel, cfg, n, jax.random.PRNGKey(9), split=3,
        slab_cache=3, n_val=256, profile=False,
        exec_groups=exec_groups)
    assert info["overflow"] == 0, info
    # subsample validated against the host-fp64-summed streamed direct
    assert stats["val_rel_rms"] < 3e-4, stats
    # the tiny cache forces rebuilds; the machinery must survive them
    # (warm-pass seeding makes SOME gets hit, not all)
    assert stats["cache_misses"] >= 3


def test_prolong_sliced_matches_unsliced():
    """The bounded lax.map prolongation (mesh._prolong_sliced, the
    1e9 chunk-phase OOM fix) must match the whole-level
    prolong_factored when the slicing path engages
    (rows > _PROLONG_SLICE_ROWS). Row-independent math — any
    difference is XLA batched-einsum rewrite noise, bounded tightly."""
    import jax.numpy as jnp
    from onbody_tpu.parallel import mesh
    from onbody_tpu.tree import equivalents as eq
    key = jax.random.PRNGKey(0)
    rows, width, order, od = 4096, 16, 3, 3
    assert rows > mesh._PROLONG_SLICE_ROWS
    ncp = order + 1
    pts = jax.random.uniform(key, (rows, width, 3))
    nc = jax.random.uniform(jax.random.fold_in(key, 1), (rows, 3))
    ns = 0.5 + jax.random.uniform(jax.random.fold_in(key, 2), (rows, 3))
    pu = jax.random.normal(jax.random.fold_in(key, 3),
                           (rows, ncp ** 3, od))
    a = eq.prolong_factored(pts, nc, ns, order, pu)
    b = mesh._prolong_sliced(pts, nc, ns, order, pu)
    scale = float(jnp.max(jnp.abs(a))) + 1e-30
    assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-6
