"""Direct-sum paths: tiled production form vs fp64 oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onbody_tpu import parts as P
from onbody_tpu.ops.kernels import KERNELS
from onbody_tpu.traverse import direct


@pytest.mark.parametrize("name", list(KERNELS))
def test_direct_matches_oracle(name):
    kernel = KERNELS[name]
    key = jax.random.PRNGKey(7)
    ks, kt = jax.random.split(key)
    srcs = P.random_in_cube(ks, 500, kernel.pd, kernel.sd, True)
    targs = P.random_in_cube(kt, 300, kernel.pd, 0, False)
    ref = direct.direct_oracle(kernel, srcs, targs)
    out = direct.direct(kernel, srcs, targs, tile_t=128, tile_s=128)
    # fp32 storage+accum floor is ~6e-6 relative RMS (README.md:99-101)
    rel = np.linalg.norm(np.asarray(out) - np.asarray(ref)) / \
        np.linalg.norm(np.asarray(ref))
    assert rel < 2e-5, rel


def test_direct_tskip_subsample():
    kernel = KERNELS["grav3d"]
    key = jax.random.PRNGKey(3)
    srcs = P.random_in_cube(key, 200, 3, 1, True)
    targs = P.random_in_cube(jax.random.PRNGKey(4), 100, 3, 0, False)
    full = direct.direct_oracle(kernel, srcs, targs, tskip=1)
    sub = direct.direct_oracle(kernel, srcs, targs, tskip=7)
    np.testing.assert_allclose(np.asarray(sub), np.asarray(full)[::7],
                               rtol=1e-12)


def test_padding_is_inert():
    kernel = KERNELS["vort3d"]
    key = jax.random.PRNGKey(9)
    srcs = P.random_in_cube(key, 117, 3, 3, True)
    targs = P.random_in_cube(jax.random.PRNGKey(10), 65, 3, 0, False)
    ref = direct.direct_oracle(kernel, srcs, targs)
    padded = P.pad_to(srcs, 256)
    out = direct.direct_oracle(kernel, padded, targs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)
