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
