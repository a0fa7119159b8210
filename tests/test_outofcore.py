"""Out-of-core (host-tiered) DTT solve: small-N equivalence with the
fp64 oracle. The same machinery scales to N=1e9 on one chip + host RAM
(traverse/outofcore.py; reference envelope README.md:90)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onbody_tpu import parts as P
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, outofcore


def _chunk_gen(key, n, m_chunk, pd, sd, sources):
    def gen(c):
        m = min(m_chunk, n - c * m_chunk)
        k = jax.random.fold_in(key, c)
        p = P.random_in_cube(k, m, pd, sd, sources)
        return p
    return gen


def test_outofcore_matches_oracle():
    kernel = get_kernel("grav3d")
    n = 60_000
    m_chunk = 1 << 14
    cfg = SolverConfig(block_size=128, order=4, theta_dtt=1.3,
                       frontier_width=192, list_width=512,
                       cap_groups_dtt=64, pair_fetch="pregather",
                       tree_defer_rs=True)
    ks, kt = jax.random.split(jax.random.PRNGKey(3))
    gen_s = _chunk_gen(ks, n, m_chunk, 3, 1, True)
    gen_t = _chunk_gen(kt, n, m_chunk, 3, 0, False)

    res, info = outofcore.solve_dtt_outofcore(
        kernel, cfg, n, gen_s, gen_t, m_chunk=m_chunk, split=2)
    assert info["overflow"] == 0

    # assemble the full problem for the oracle (small n only)
    n_ch = -(-n // m_chunk)
    sx = np.concatenate([np.asarray(gen_s(c).x) for c in range(n_ch)])
    sr = np.concatenate([np.asarray(gen_s(c).r) for c in range(n_ch)])
    ss = np.concatenate([np.asarray(gen_s(c).s) for c in range(n_ch)])
    tx = np.concatenate([np.asarray(gen_t(c).x) for c in range(n_ch)])
    from onbody_tpu.parts import from_arrays
    srcs = from_arrays(sx, r=sr, s=ss)
    targs = from_arrays(tx)
    ref = np.asarray(direct.direct_oracle(kernel, srcs, targs))

    # map sorted-slot outputs back to original order
    gidx = res["gidx"]
    real = gidx < n
    out = np.zeros((n, kernel.od), np.float32)
    out[gidx[real]] = res["out"][real]
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 3e-4, rel
    # every real target slot must have been produced exactly once
    assert np.sort(gidx[real]).tolist() == list(range(n))
