"""Multi-chip sharded execution on the virtual 8-device CPU mesh:
sharded solvers must agree with the single-device ones bitwise-ish."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onbody_tpu import parts as P
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import KERNELS
from onbody_tpu.parallel import mesh as pmesh
from onbody_tpu.traverse import dtt, treecode

CFG = SolverConfig(block_size=32, order=3, frontier_width=256,
                   list_width=512)


def _plan(kernel, n=1024, seed=0):
    ks, kt = jax.random.split(jax.random.PRNGKey(seed))
    srcs = P.random_in_cube(ks, n, kernel.pd, kernel.sd, True)
    targs = P.random_in_cube(kt, n, kernel.pd, 0, False)
    return treecode.prepare(kernel, CFG, srcs, targs)


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_node_owner():
    # 8 devices, split=3: nodes 8..15 are subtree roots owned 0..7
    owner = pmesh.node_owner(np.arange(32), levels=4, split=3)
    assert owner[0] == -1 and owner[1] == -1 and owner[7] == -1
    assert list(owner[8:16]) == list(range(8))
    assert list(owner[16:32]) == [i // 2 for i in range(16)]


@pytest.mark.parametrize("ndev", [2, 8])
def test_treecode3_sharded_matches(ndev):
    kernel = KERNELS["grav3d"]
    plan = _plan(kernel)
    mesh = pmesh.make_mesh(ndev)
    ref, _ = treecode.solve_treecode3(kernel, CFG, plan)
    out, _ = pmesh.solve_treecode3_sharded(kernel, CFG, mesh, plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-8)


def test_dtt_sharded_matches():
    kernel = KERNELS["grav3d"]
    plan = _plan(kernel)
    mesh = pmesh.make_mesh(8)
    ref, _ = dtt.solve_dtt(kernel, CFG, plan)
    out, _ = pmesh.solve_dtt_sharded(kernel, CFG, mesh, plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-8)
