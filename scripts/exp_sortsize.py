"""Does lax.sort cost scale with the true row count or its pow2 pad?

Decides the prefix-sort tree-build lever: reals always form a static
prefix of every segment (pads sit one diameter past the max corner on
every axis — parts.pad_to), so each build level only needs to sort
n_real rows, not n_pad. At 1e7/bs256 that is 10.0M of 16.78M rows
(-40%); worth ~0.4 s of the 1.21 s sort schedule IF sort cost is
~linear in rows. If XLA internally pads the sort dimension to the next
power of two, mid-pow2 sizes cost the same as the pow2 above and the
lever only pays at levels whose partial segment pads to a smaller pow2.

Times a 4-operand variadic sort (the defer_rs payload: key + 2 coords
+ gidx) at pow2 and mid-pow2 row counts, plus segmented shapes
matching the real schedule.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def bench(shape, iters=3):
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    ops = [jax.random.uniform(kk, shape, jnp.float32) for kk in ks[:3]]
    ops.append(jnp.broadcast_to(
        jnp.arange(shape[-1], dtype=jnp.int32), shape))

    @jax.jit
    def f(*a):
        return jax.lax.sort(a, dimension=len(shape) - 1, num_keys=1)

    def sync(o):
        # block_until_ready does not sync through the axon tunnel;
        # fetching one element does (docs/PERF.md measurement rules)
        return float(np.asarray(o[0][(0,) * o[0].ndim]))

    sync(f(*ops))
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(f(*ops))
        best = min(best, time.perf_counter() - t0)
    rows = int(np.prod(shape))
    print(f"sort {str(shape):>22}  rows {rows/1e6:7.2f}M  "
          f"{best*1e3:8.1f} ms  {best/rows*1e9:6.2f} ns/row", flush=True)
    return best


def main():
    M = 1 << 20
    # flat: pow2 vs mid-pow2 (the decisive comparison)
    for n in (16 * M, 10_000_000, 8 * M, 5_000_000, 4 * M, 2_000_000,
              2 * M, 1_200_000, M):
        bench((n,))
    # segmented shapes from the 1e7 paired schedule (m = segment rows):
    # full-vs-prefix forms of the set-level-1 sort
    bench((4, 8 * M))          # today: 2 parts x 2 segs of 8.39M
    bench((2, 8 * M))          # prefix: full segments only
    bench((2, 1_610_612))      # prefix: partial segments
    # set-level-3 (after one span skip): m=2.1M
    bench((16, 2 * M))         # today
    bench((8, 2 * M))          # prefix full (4 per part)
    bench((2, 1_610_612 % (2 * M) or 2 * M))  # prefix partial


if __name__ == "__main__":
    main()
