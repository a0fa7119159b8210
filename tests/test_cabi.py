"""C ABI end-to-end: dlopen libonbody_c.so and call the Fortran-style
pointer API exactly as an external (e.g. Fortran) host would — the
equivalent of the reference's run2dvort smoke driver (main2dvort.cpp)."""

import ctypes
import os
import subprocess
import sys

import numpy as np
import pytest

LIB = os.path.join(os.path.dirname(__file__), "..", "onbody_tpu", "api",
                   "cabi", "libonbody_c.so")

# Embedding CPython inside a pytest process that already runs Python is
# fine (the shim detects the live interpreter), but platform config must
# match the test env — run in a subprocess for isolation instead.
DRIVER = r"""
import ctypes, os, sys
import numpy as np

lib = ctypes.CDLL(sys.argv[1])
n = 600
rng = np.random.default_rng(0)
f32 = np.float32
sx = rng.uniform(-1, 1, n).astype(f32)
sy = rng.uniform(-1, 1, n).astype(f32)
ss = (rng.uniform(-1, 1, n) / n).astype(f32)
sr = np.full(n, (1.0 / n) ** 0.5, f32)
tu = np.zeros(n, f32); tv = np.zeros(n, f32)
du = np.zeros(n, f32); dv = np.zeros(n, f32)

ci = ctypes.c_int(n)
P = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
I = ctypes.byref(ci)

lib.external_vel_solver_f_.restype = ctypes.c_float
lib.external_vel_direct_f_.restype = ctypes.c_float
fl1 = lib.external_vel_solver_f_(I, P(sx), P(sy), P(ss), P(sr),
                                 I, P(sx), P(sy), P(tu), P(tv))
fl2 = lib.external_vel_direct_f_(I, P(sx), P(sy), P(ss), P(sr),
                                 I, P(sx), P(sy), P(du), P(dv))
assert fl1 > 0 and fl2 > 0, (fl1, fl2)
got = np.stack([tu, tv], 1); want = np.stack([du, dv], 1)
rel = np.linalg.norm(got - want) / np.linalg.norm(want)
print("REL", rel)
assert rel < 1e-3, rel
print("CABI_OK")
"""


@pytest.mark.skipif(not os.path.exists(LIB),
                    reason="libonbody_c.so not built (cmake onbody_tpu/api/cabi)")
def test_cabi_2d_solver_vs_direct():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # JAX_PLATFORMS alone is frozen too early under the axon
    # sitecustomize; the bridge honors this explicit override instead
    env["ONBODY_CABI_PLATFORM"] = "cpu"
    env["ONBODY_TPU_ROOT"] = os.path.abspath(
        os.path.join(os.path.dirname(__file__), ".."))
    out = subprocess.run([sys.executable, "-c", DRIVER, os.path.abspath(LIB)],
                         capture_output=True, text=True, env=env,
                         timeout=600)
    assert "CABI_OK" in out.stdout, (out.stdout, out.stderr[-2000:])
