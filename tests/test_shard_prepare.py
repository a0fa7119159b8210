"""Fully-sharded prepare + solve (parallel/shard_prepare.py): no device
materializes a global block array; results match the fp64 oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onbody_tpu import parts as P
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.parallel import mesh as pmesh
from onbody_tpu.parallel import shard_prepare
from onbody_tpu.traverse import direct


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_shard_prepare_matches_oracle():
    kernel = get_kernel("grav3d")
    n = 32768
    cfg = SolverConfig(block_size=128, order=4, theta_dtt=1.3,
                       frontier_width=192, list_width=512,
                       cap_groups_dtt=64, pair_fetch="pregather")
    ks, kt = jax.random.split(jax.random.PRNGKey(5))
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    targs = P.random_in_cube(kt, n, 3, 0, False)
    mesh = pmesh.make_mesh(8)

    out, overflow = shard_prepare.prepare_and_solve_sharded(
        kernel, cfg, mesh, srcs, targs)
    assert overflow == 0

    ref = np.asarray(direct.direct_oracle(kernel, srcs, targs))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 3e-4, rel


def test_shard_prepare_per_device_scaling():
    """Structural memory-scale-out check: the sharded prepare's
    exchange emits 1/D-sized per-device slabs (no device holds the
    global particle set or a global block array)."""
    from functools import partial
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P_
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    kernel = get_kernel("grav3d")
    n = 16384
    D = 8
    mesh = pmesh.make_mesh(D)
    ks = jax.random.PRNGKey(0)
    srcs = P.random_in_cube(ks, n, 3, 1, True)
    from jax.sharding import NamedSharding
    ax = mesh.axis_names[0]
    sh = lambda a: jax.device_put(a, NamedSharding(
        mesh, P_(*((ax,) + (None,) * (a.ndim - 1)))))
    fn = partial(shard_prepare._split_exchange_fn, split=3,
                 n_total=n, n_pad=n, cap_b=1024, pd=3, sd=1)

    def body(x, r, s, oid):
        xs, rs, ss, g0, orig, cnt, ov = fn(x, r, s, oid, ax)
        return xs, g0, cnt[None], ov[None]

    try:
        sm = partial(shard_map, mesh=mesh, check_vma=False)
        out = sm(body, in_specs=(P_(ax),) * 4,
                 out_specs=(P_(ax),) * 4)(
            sh(srcs.x), sh(srcs.r), sh(srcs.s),
            sh(jnp.arange(n, dtype=jnp.int32)))
    except TypeError:
        sm = partial(shard_map, mesh=mesh, check_rep=False)
        out = sm(body, in_specs=(P_(ax),) * 4,
                 out_specs=(P_(ax),) * 4)(
            sh(srcs.x), sh(srcs.r), sh(srcs.s),
            sh(jnp.arange(n, dtype=jnp.int32)))
    xs, g0, cnt, ov = out
    assert int(np.asarray(ov).sum()) == 0
    # each device's slab is exactly n/D slots — 1/D of the problem
    for shard in xs.addressable_shards:
        assert shard.data.shape[0] == n // D
    assert int(np.asarray(cnt).sum()) == n
