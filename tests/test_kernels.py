"""Kernel correctness: tile (matmul-decomposed) form vs pairwise oracle.

The pairwise forms are direct transliterations of the reference scalar
kernels (ongrav3d.cpp:44-58 et al.); the tile forms are the production
MXU decompositions. Agreement in fp64 must be to roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onbody_tpu.ops.kernels import KERNELS, dist2
from onbody_tpu.ops import core_funcs as cf


def _random_problem(kernel, T=37, S=53, dtype=jnp.float64, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(k, 5)
    tx = jax.random.uniform(k1, (T, kernel.pd), dtype, -1.0, 1.0)
    sx = jax.random.uniform(k2, (S, kernel.pd), dtype, -1.0, 1.0)
    sr = jax.random.uniform(k3, (S,), dtype, 0.01, 0.05)
    tr = jax.random.uniform(k4, (T,), dtype, 0.01, 0.05)
    ss = jax.random.uniform(k5, (S, kernel.sd), dtype, -1.0, 1.0) / S
    return tx, tr, sx, sr, ss


@pytest.mark.parametrize("name", list(KERNELS))
@pytest.mark.parametrize("core", ["rm", "exp"])
def test_tile_matches_pairwise(name, core):
    kernel = KERNELS[name]
    if name == "grav3d" and core == "exp":
        pytest.skip("gravity hard-codes the RM denominator (ongrav3d.cpp:53)")
    tx, tr, sx, sr, ss = _random_problem(kernel)
    ref = jnp.sum(kernel.pairwise(tx, tr, sx, sr, ss, core), axis=1)
    out = kernel.tile(tx, tr, sx, sr, ss, core, jnp.float64, "exact")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("name", list(KERNELS))
def test_tile_centered_d2(name):
    kernel = KERNELS[name]
    tx, tr, sx, sr, ss = _random_problem(kernel)
    ref = kernel.tile(tx, tr, sx, sr, ss, "rm", jnp.float64, "exact")
    out = kernel.tile(tx, tr, sx, sr, ss, "rm", jnp.float64, "center")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-7, atol=1e-10)


def test_vortgrad_vel_consistent_with_vort3d():
    """vortgrad3d uses d=t-s while vort3d uses d=s-t (ref conventions):
    velocities must be exact negatives."""
    kg = KERNELS["vortgrad3d"]
    kv = KERNELS["vort3d"]
    tx, tr, sx, sr, ss = _random_problem(kg)
    vg = jnp.sum(kg.pairwise(tx, tr, sx, sr, ss, "rm"), axis=1)[:, :3]
    vv = jnp.sum(kv.pairwise(tx, tr, sx, sr, ss, "rm"), axis=1)
    np.testing.assert_allclose(np.asarray(vg), -np.asarray(vv),
                               rtol=1e-8, atol=1e-12)


def test_gradients_match_autodiff():
    """The 9 gradient outputs are d(vel)/d(target position): check against
    jax.jacfwd of the velocity sum."""
    kg = KERNELS["vortgrad3d"]
    tx, tr, sx, sr, ss = _random_problem(kg, T=5, S=11)

    def vel(one_t):
        out = jnp.sum(kg.pairwise(one_t[None, :], tr[:1], sx, sr, ss, "rm"),
                      axis=1)[0, :3]
        return out

    full = jnp.sum(kg.pairwise(tx, tr, sx, sr, ss, "rm"), axis=1)
    for i in range(tx.shape[0]):
        jac = jax.jacfwd(vel)(tx[i])        # jac[a, b] = d vel_a / d x_b
        grads = full[i, 3:].reshape(3, 3)   # grads[b, a] = A[a, b]
        np.testing.assert_allclose(np.asarray(grads.T), np.asarray(jac),
                                   rtol=1e-7, atol=1e-10)


def test_core_funcs_self_interaction_finite():
    z = jnp.zeros((4,), jnp.float64)
    sr = jnp.full((4,), 0.05, jnp.float64)
    for fn in [cf.rm_2d, cf.exp_2d]:
        assert np.all(np.isfinite(np.asarray(fn(z, sr, sr))))
    for fn in [cf.rm_3d, cf.exp_3d]:
        assert np.all(np.isfinite(np.asarray(fn(z, sr))))
    for fn in [cf.rm_3d_grads, cf.exp_3d_grads]:
        r3, bbb = fn(z, sr)
        assert np.all(np.isfinite(np.asarray(r3)))
        assert np.all(np.isfinite(np.asarray(bbb)))


def test_exp_core_branches():
    """Far branch ~ 1/d^k, close branch ~ corefac."""
    sr = jnp.array([0.1], jnp.float64)
    far = jnp.array([100.0], jnp.float64)
    close = jnp.array([1e-9], jnp.float64)
    np.testing.assert_allclose(float(cf.exp_2d(far, sr)[0]), 1.0 / 100.0,
                               rtol=1e-5)
    np.testing.assert_allclose(float(cf.exp_2d(close, sr)[0]), 100.0,
                               rtol=1e-3)
    np.testing.assert_allclose(float(cf.exp_3d(far, sr)[0]), 0.001,
                               rtol=1e-5)
    np.testing.assert_allclose(float(cf.exp_3d(close, sr)[0]), 1000.0,
                               rtol=1e-3)


def test_dotg_fm_precision_modes():
    """All mxu_precision tiers of the pair contraction agree with the
    f32 'highest' reference within their documented envelopes; the
    transposed forms ('3xt', 'defaultt') are the same arithmetic with
    the small dim on sublanes (ops/kernels.py _dotg_fm)."""
    from onbody_tpu.ops.kernels import _dotg_fm
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    w = jax.random.normal(k1, (128, 512), jnp.float32)
    rows = jax.random.normal(k2, (4, 512), jnp.float32)
    ref = np.asarray(_dotg_fm(w, rows, jnp.float32, "highest"))
    scale = np.max(np.abs(ref))
    for prec, tol in [("3x", 1e-5), ("3xt", 1e-5), ("w2x", 1e-2),
                      ("default", 1e-1), ("defaultt", 1e-1)]:
        out = np.asarray(_dotg_fm(w, rows, jnp.float32, prec))
        assert out.shape == ref.shape, prec
        rel = np.max(np.abs(out - ref)) / scale
        assert rel < tol, (prec, rel)
    # 3x and 3xt are the SAME bf16-split sum, transposed
    a = np.asarray(_dotg_fm(w, rows, jnp.float32, "3x"))
    b = np.asarray(_dotg_fm(w, rows, jnp.float32, "3xt"))
    assert np.max(np.abs(a - b)) / scale < 1e-6


def test_vortgrad_combine_2d_matches_3d():
    """The Pallas-safe rank-2 recombination (_vortgrad_combine_2d —
    Mosaic has no scatter-add / rank-3 transpose lowering) is the same
    arithmetic as the point-major _vortgrad_combine, up to f32
    reassociation of the T1+T3 fold."""
    from onbody_tpu.ops.kernels import (_vortgrad_combine,
                                        _vortgrad_combine_2d)
    k = jax.random.PRNGKey(3)
    oR = jax.random.normal(k, (96, 6), jnp.float32)
    oB = jax.random.normal(jax.random.fold_in(k, 1), (96, 24),
                           jnp.float32)
    txa = jax.random.normal(jax.random.fold_in(k, 2), (96, 3),
                            jnp.float32)
    a = np.asarray(_vortgrad_combine(oR, oB, txa))
    b = np.asarray(_vortgrad_combine_2d(oR, oB, txa))
    assert a.shape == b.shape == (96, 12)
    assert np.max(np.abs(a - b)) / np.max(np.abs(a)) < 1e-5
